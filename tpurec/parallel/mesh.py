"""Device mesh construction + sharding planner.

The reference has no distributed layer at all (run.py:32-33 picks one CUDA
device; SURVEY.md §2.7).  This module is the new-build equivalent, following
the scaling-book recipe: pick a mesh, annotate shardings, let XLA insert the
collectives.

Layout:
- ``data`` axis: batch dimension of every input -> gradient psum rides ICI
- ``model`` axis: row-shards the fused embedding table
  (``embedding/table`` is by far the largest tensor — Ali-CCP itemid alone
  is ~1.37M rows, reference config.py:7) and the lookup compiles to a
  sharded gather + reduce; every other parameter is replicated (the dense
  nets are KBs-to-MBs — replication is the right call at this scale)

Optimizer state shards congruently with its parameter (optax trees mirror
the param tree, so the same rule function applies).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int = 0,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
    data_axis: str = "data",
    model_axis: str = "model",
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data <= 0:
        assert len(devices) % n_model == 0
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"{n_data}x{n_model} mesh needs {n_data*n_model} devices, have {len(devices)}"
    )
    dev_array = np.array(devices).reshape(n_data, n_model)
    return Mesh(dev_array, (data_axis, model_axis))


# param paths (joined with '/') that are row-sharded over the model axis
_ROW_SHARDED_SUFFIXES = ("embedding/table",)

# module names whose parameters are [E, ...] expert/tower banks (StackedMLP /
# StackedLinear weight banks — the TPU-first form of the reference's
# ModuleList loops, mmoe.py:56-58, ple.py:97-116, hinet.py:8-21).  With
# ``expert_parallel=True`` these shard their leading expert axis over the
# model mesh axis (expert parallelism for the MoE banks, SURVEY.md §2.7);
# the gate-mixing einsum contracts the expert axis, so XLA inserts the
# psum over ``model`` automatically.
_EXPERT_BANK_NAMES = frozenset(
    {"experts", "experts_specific", "experts_shared",
     "specific_experts", "shared_experts"}
)


class Shardings:
    """Sharding rules for params/opt-state/batches over a (data, model) mesh.

    ``expert_parallel`` additionally shards the leading axis of MoE
    expert-bank parameters (and their BN state / optimizer moments, which
    share tree paths) over the model axis, when the bank size divides it.
    """

    def __init__(self, mesh: Mesh, data_axis: str = "data", model_axis: str = "model",
                 expert_parallel: bool = False):
        self.mesh = mesh
        self.data_axis = data_axis
        self.model_axis = model_axis
        self.expert_parallel = expert_parallel

    def _spec_for_path(self, path: Tuple, leaf=None) -> P:
        # DictKey has .key, GetAttrKey (flax struct fields) has .name
        keys = [getattr(k, "key", None) or getattr(k, "name", None) or str(k)
                for k in path]
        keys = [str(k) for k in keys]
        full = "/".join(keys)
        for suffix in _ROW_SHARDED_SUFFIXES:
            if full.endswith(suffix):
                return P(self.model_axis, None)
        # the hybrid/sparse embedding-update paths keep the table's Adam
        # moments in a SparseEmbedState(m, v) inside opt_state; they are
        # table-shaped and must row-shard WITH the table — leaving them
        # replicated costs 2 full-table copies per chip.  Scoped to
        # opt_state so a future model param named 'm'/'v' can't trip it.
        # (optax's own mu/nu mirror the param tree and are caught by the
        # suffix rule above.)
        if keys and keys[-1] in ("m", "v") and any(
                "opt_state" in k for k in keys):
            return P(self.model_axis, None)
        if self.expert_parallel and any(k in _EXPERT_BANK_NAMES for k in keys):
            n_model = self.mesh.shape[self.model_axis]
            ndim = getattr(leaf, "ndim", 0)
            shape = getattr(leaf, "shape", ())
            # the bank axis is the leading one ([E, in, out] weights,
            # [E, out] biases, [E, H] BN running stats); 1-D leaves (the
            # per-feature BN scale/bias, shared across the bank) and banks
            # whose size doesn't divide the model axis stay replicated.
            if ndim >= 2 and shape[0] % n_model == 0:
                return P(self.model_axis, *([None] * (ndim - 1)))
        return P()  # replicated

    def params_sharding(self, params):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(self.mesh, self._spec_for_path(path, leaf)),
            params,
        )

    def state_sharding(self, state):
        """Sharding tree for a TrainState: params and every congruent
        optimizer-moment tree get the param rule; scalars are replicated."""

        def rule(path, leaf):
            if getattr(leaf, "ndim", 0) >= 2:
                return NamedSharding(self.mesh, self._spec_for_path(path, leaf))
            return NamedSharding(self.mesh, P())

        return jax.tree_util.tree_map_with_path(rule, state)

    def batch_sharding(self, batch):
        def rule(leaf):
            spec = P(self.data_axis) if getattr(leaf, "ndim", 0) >= 1 else P()
            return NamedSharding(self.mesh, spec)

        return jax.tree_util.tree_map(rule, batch)

    def replicated(self):
        return NamedSharding(self.mesh, P())
