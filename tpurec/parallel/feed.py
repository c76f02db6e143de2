"""Multi-host data feeding for a global (data, model) mesh.

The reference is single-process/single-GPU (run.py:32-33) and copies the
whole dataset to one device (run.py:239).  On a multi-host TPU slice each
process sees only its local chips; a jitted step over a global mesh needs
*global* jax.Arrays whose per-device shards live on the right chips.  This
module is that glue:

- :func:`process_shard` — contiguous row range of the global dataset this
  process is responsible for (host-side sharded loading: each host reads
  only its slice of the preprocessed columnar file).
- :class:`GlobalBatchFeed` — turns per-process local batches into global
  device arrays via ``jax.make_array_from_process_local_data``: rows are
  sharded over the ``data`` axis, every other dim replicated.  On a
  single-process mesh (tests, the one-chip image, the virtual CPU mesh)
  this degrades to a plain sharded device_put of the full batch.

The per-host batch layout follows the scaling-book recipe: the GLOBAL
batch is fixed (bs_global = bs_per_chip * n_data); each host contributes
``bs_global * (local data-axis share)`` rows per step, so no host ever
materializes the whole global batch.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def process_shard(n_rows: int, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> Tuple[int, int]:
    """[start, end) row range of this process's dataset shard.

    Rows are split as evenly as possible (first ``n_rows % P`` shards get
    one extra row), so every row belongs to exactly one process.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if not 0 <= pi < pc:
        raise ValueError(f"process_index {pi} not in [0, {pc})")
    base, extra = divmod(n_rows, pc)
    start = pi * base + min(pi, extra)
    return start, start + base + (1 if pi < extra else 0)


class GlobalBatchFeed:
    """Assemble global row-sharded batches from process-local rows."""

    def __init__(self, mesh: Mesh, data_axis: str = "data"):
        self.mesh = mesh
        self.data_axis = data_axis
        if data_axis not in mesh.axis_names:
            raise ValueError(f"mesh has no {data_axis!r} axis: {mesh.axis_names}")
        self.n_data = mesh.shape[data_axis]
        self._validate_process_layout()

    def _validate_process_layout(self):
        """Require every data-axis block to be owned by exactly ONE
        process.  If the model axis spans processes, replica devices of
        the same data rows live on different hosts and each host would
        feed them different dataset shards — silently wrong gradients.
        The supported layout is the standard one: model axis within a
        host, data axis across hosts (reorder the mesh axes otherwise).
        """
        if jax.process_count() == 1:
            return
        sh = self.row_sharding(1)
        owner = {}
        for d, idx in sh.devices_indices_map((self.n_data,)).items():
            blk = (idx[0].start, idx[0].stop)
            if owner.setdefault(blk, d.process_index) != d.process_index:
                raise ValueError(
                    "model axis spans processes: data block "
                    f"{blk} has replica devices on processes "
                    f"{owner[blk]} and {d.process_index}; GlobalBatchFeed "
                    "requires each data block on one process — put the "
                    "model axis within a host (e.g. reorder mesh axes)")

    def dataset_range(self, n_rows: int) -> Tuple[int, int]:
        """[start, end) dataset rows THIS process should load, derived
        from the data blocks its devices actually own (consistent with
        local_rows_per_step, unlike a blind even split when block
        ownership is non-uniform)."""
        sh = self.row_sharding(1)
        pi = jax.process_index()
        blocks = sorted(
            {(idx[0].start if idx[0].start is not None else 0,
              idx[0].stop if idx[0].stop is not None else self.n_data)
             for d, idx in sh.devices_indices_map((self.n_data,)).items()
             if d.process_index == pi})
        if not blocks:
            return 0, 0
        lo = blocks[0][0]
        hi = blocks[-1][1]
        if [b for b in blocks] != [(lo + i, lo + i + 1)
                                   for i in range(hi - lo)]:
            raise ValueError(
                f"process {pi}'s data blocks {blocks} are not contiguous; "
                "load per-block shards manually")
        # map block range -> row range (same proportional split as the
        # sharding applies to a [n_rows] array)
        start = lo * n_rows // self.n_data
        end = hi * n_rows // self.n_data
        return start, end

    def row_sharding(self, ndim: int) -> NamedSharding:
        return NamedSharding(
            self.mesh, P(self.data_axis, *([None] * (ndim - 1))))

    def local_rows_per_step(self, global_rows: int) -> int:
        """Rows THIS process must supply for a global batch of
        ``global_rows`` (its share of the data axis)."""
        if global_rows % self.n_data:
            raise ValueError(
                f"global batch {global_rows} not divisible by data axis {self.n_data}")
        sh = self.row_sharding(1)
        imap = sh.devices_indices_map((global_rows,))
        pi = jax.process_index()
        # distinct data-axis row ranges owned by this process's devices
        local_ranges = {
            (idx[0].start, idx[0].stop)
            for d, idx in imap.items() if d.process_index == pi
        }
        return (global_rows // self.n_data) * len(local_ranges)

    def global_array(self, local: np.ndarray, global_rows: int) -> jax.Array:
        """Process-local rows [local_rows, ...] -> global row-sharded array
        [global_rows, ...]."""
        sharding = self.row_sharding(local.ndim)
        if jax.process_count() == 1:
            if local.shape[0] != global_rows:
                raise ValueError(
                    f"single-process feed expects the full batch: "
                    f"{local.shape[0]} != {global_rows}")
            return jax.device_put(local, sharding)
        return jax.make_array_from_process_local_data(
            sharding, local, (global_rows,) + local.shape[1:])

    def global_batch(self, local_batch: Dict[str, np.ndarray],
                     global_rows: int) -> Dict[str, jax.Array]:
        """Shard every [rows, ...] entry of a batch dict."""
        return {k: self.global_array(np.asarray(v), global_rows)
                for k, v in local_batch.items()}

    # -- stacked [K, rows, ...] scan feeds (rows on axis 1) ----------------
    def stacked_sharding(self, ndim: int) -> NamedSharding:
        return NamedSharding(
            self.mesh, P(None, self.data_axis, *([None] * (ndim - 2))))

    def global_stacked(self, local: np.ndarray, global_rows: int) -> jax.Array:
        """Process-local [K, local_rows, ...] scan-stacked batches ->
        global [K, global_rows, ...] sharded over rows (axis 1)."""
        sharding = self.stacked_sharding(local.ndim)
        if jax.process_count() == 1:
            if local.shape[1] != global_rows:
                raise ValueError(
                    f"single-process feed expects the full batch: "
                    f"{local.shape[1]} != {global_rows}")
            return jax.device_put(local, sharding)
        return jax.make_array_from_process_local_data(
            sharding, local,
            (local.shape[0], global_rows) + local.shape[2:])

    def global_stacked_batch(self, local_batch: Dict[str, np.ndarray],
                             global_rows: int) -> Dict[str, jax.Array]:
        return {k: self.global_stacked(np.asarray(v), global_rows)
                for k, v in local_batch.items()}


def epoch_plan(n_global_rows: int, bs_global: int, feed: GlobalBatchFeed
               ) -> Tuple[int, int]:
    """(n_batches, local_rows_per_batch) for one multi-host epoch.

    Every process MUST execute the same number of collective steps or the
    slice deadlocks; deriving the batch count from the GLOBAL row count
    (not the local shard, whose size varies by ±1 row across processes)
    guarantees that.  Each process pads its local stream to n_batches *
    local_rows_per_batch with masked rows.
    """
    if n_global_rows <= 0:
        raise ValueError("empty epoch")
    n_batches = -(-n_global_rows // bs_global)
    return n_batches, feed.local_rows_per_step(bs_global)
