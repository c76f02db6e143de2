"""Pallas TPU kernel: double-buffered embedding row gather from HBM.

The fused embedding table (nn.FusedEmbedding) is the framework's largest
tensor; the standard path is XLA's gather via ``jnp.take``.  This kernel is
the explicit alternative for full control of the HBM traffic: the table
stays in HBM, row indices arrive via scalar prefetch, and rows stream into
VMEM with double-buffered async DMA — the playbook pattern for
latency-hiding gathers.

Used by benchmarks/ablations; ``FusedEmbedding`` keeps ``jnp.take`` as the
default (XLA's gather is already near speed-of-light for these shapes; see
tests for the equivalence check).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, table_ref, out_ref, *, rows_per_block: int):
    """Grid dim 0 walks index blocks; rows stream via double-buffered DMA."""
    blk = pl.program_id(0)

    def body(scratch, sems):
        n_buf = 2

        def get_dma(slot, r):
            row_id = idx_ref[blk * rows_per_block + r]
            return pltpu.make_async_copy(
                table_ref.at[row_id], scratch.at[slot], sems.at[slot]
            )

        get_dma(0, 0).start()

        def loop(r, _):
            slot = r % n_buf
            nxt = (r + 1) % n_buf

            @pl.when(r + 1 < rows_per_block)
            def _():
                get_dma(nxt, r + 1).start()

            get_dma(slot, r).wait()
            out_ref[r, :] = scratch[slot]
            return 0

        jax.lax.fori_loop(0, rows_per_block, loop, 0)

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((2, table_ref.shape[1]), table_ref.dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def embedding_gather_fused(table, ids, rows_per_block: int = 256,
                           interpret: bool = False):
    """table [V, D] (HBM-resident), ids [N] int32 -> [N, D].

    Mosaic DMA row slices must be lane-aligned: requires D % 128 == 0
    (natively compiled path).  Narrow tables fall back to XLA's gather,
    which handles sub-tile rows better than per-row DMA ever could.
    """
    N = ids.shape[0]
    D = table.shape[1]
    if not interpret and D % 128 != 0:
        return jnp.take(table, ids.astype(jnp.int32), axis=0)
    n_blocks = pl.cdiv(N, rows_per_block)
    pad = n_blocks * rows_per_block - N
    ids_p = jnp.pad(ids.astype(jnp.int32), (0, pad))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        # the table must stay HBM-resident (it is the framework's largest
        # tensor); rows are DMA'd into VMEM scratch explicitly
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (rows_per_block, D), lambda b, idx_ref: (b, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, rows_per_block=rows_per_block),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * rows_per_block, D), table.dtype),
        interpret=interpret,
    )(ids_p, table)
    return out[:N]
