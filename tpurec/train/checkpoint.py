"""Checkpointing backends.

The reference torch.saves a dict {epoch, state_dict, optimizer, best
metrics, preprocess_path} on every mean-AUC improvement and reloads the
best before the final test (run.py:447-468,758-760); CDC additionally
persists its clustering state (run.py:455-457).  tpurec keeps that
payload shape with two interchangeable backends:

- 'pickle' (default): flax.serialization bytes in a single file —
  single-host, synchronous, zero dependencies beyond the stdlib.
- 'orbax': versioned step directories with ASYNC array writes (training
  continues while the previous checkpoint flushes) and multi-host-safe
  coordination — the production path for sharded runs.

Both persist: TrainState (params + optimizer state + BN/ADL collections +
step), the early-stop best metrics, and arbitrary ``extra`` metadata
(CDC cluster assignments ride here, mirroring run.py:455-457).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np

# Generation tag of the fused embedding table's ROW LAYOUT
# (tpurec.nn.core.EmbeddingLayout).  v1 = cumsum field order, exact vocab;
# v2 = small-vocab fields first + vocab padded to 8 rows.  Restoring a
# checkpoint across generations would read wrong rows for every
# reordered field — silently, when the padded shapes happen to match —
# so loads refuse mismatched (or missing, i.e. pre-v2) tags.
EMBED_LAYOUT_VERSION = "smallfirst-v2"


def check_embed_layout_version(found, where: str):
    if found != EMBED_LAYOUT_VERSION:
        raise ValueError(
            f"checkpoint {where} was written with embedding-table layout "
            f"{found or 'v1 (pre-tag)'}, but this build uses "
            f"{EMBED_LAYOUT_VERSION}; restoring would silently misread "
            f"embedding rows.  Re-train or convert the checkpoint."
        )


class OrbaxBackend:
    """Async, versioned checkpoints via orbax.checkpoint.CheckpointManager."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: Any, extra: Optional[Dict] = None):
        """Queue an async save of (state pytree, json-able extra)."""
        extra = dict(extra or {})
        extra["embed_layout"] = EMBED_LAYOUT_VERSION
        args = self._ocp.args.Composite(
            state=self._ocp.args.StandardSave(state),
            extra=self._ocp.args.JsonSave(_jsonify(extra)),
        )
        self.manager.save(step, args=args)

    def restore(self, state_template: Any, step: Optional[int] = None):
        """-> (state, extra) from ``step`` (default: latest)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        out = self.manager.restore(
            step,
            args=self._ocp.args.Composite(
                state=self._ocp.args.StandardRestore(state_template),
                extra=self._ocp.args.JsonRestore(),
            ),
        )
        extra = dict(out["extra"])
        check_embed_layout_version(
            extra.pop("embed_layout", None), f"{self.directory}@{step}")
        return out["state"], extra

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def all_steps(self):
        return list(self.manager.all_steps())

    def wait_until_finished(self):
        self.manager.wait_until_finished()

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()


def _jsonify(obj):
    """numpy -> plain python for JsonSave."""
    if isinstance(obj, dict):
        return {str(k): _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj


class PickleBackend:
    """Single-file flax.serialization checkpoints (the default)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import flax.serialization  # noqa: F401

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"ckpt_{step}.pkl")

    def save(self, step: int, state: Any, extra: Optional[Dict] = None):
        import flax.serialization

        payload = {
            "state": flax.serialization.to_bytes(state),
            "extra": extra or {},
            "step": step,
            # fused-table row layout generation (tpurec.nn.core.
            # EmbeddingLayout): restoring across layout generations would
            # silently read wrong embedding rows
            "embed_layout": EMBED_LAYOUT_VERSION,
        }
        tmp = self._path(step) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, self._path(step))
        steps = sorted(self.all_steps())
        for s in steps[: -self.max_to_keep]:
            os.unlink(self._path(s))

    def restore(self, state_template: Any, step: Optional[int] = None):
        import flax.serialization

        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        with open(self._path(step), "rb") as f:
            payload = pickle.load(f)
        check_embed_layout_version(payload.get("embed_layout"), self._path(step))
        state = flax.serialization.from_bytes(state_template, payload["state"])
        return state, payload["extra"]

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return max(steps) if steps else None

    def all_steps(self):
        out = []
        if not os.path.isdir(self.directory):
            return out
        for f in os.listdir(self.directory):
            if f.startswith("ckpt_") and f.endswith(".pkl"):
                try:
                    out.append(int(f[len("ckpt_"):-len(".pkl")]))
                except ValueError:
                    pass
        return out

    def wait_until_finished(self):
        pass

    def close(self):
        pass


def make_backend(kind: str, directory: str, max_to_keep: int = 3):
    if kind == "orbax":
        return OrbaxBackend(directory, max_to_keep)
    if kind == "pickle":
        return PickleBackend(directory, max_to_keep)
    raise ValueError(f"unknown checkpoint backend {kind!r}")
