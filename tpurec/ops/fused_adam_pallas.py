"""Fused sparse-grad dense-Adam embedding update (Pallas TPU kernel).

The embedding table dominates both parameters and step time: at Ali-CCP
scale (1.66M x 16) the XLA path costs ~2.0ms/step — a dense scatter-into-
zeros grad materialization (run.py:492's backward through the fused
nn.Embedding, layer.py:140) followed by the Adam pass, each a full sweep of
HBM.  But exact torch semantics (dense Adam: every row's moments decay
every step, plus the reference's dense embedding L2, layer.py:31,96-112)
only need the *gradient* sparsely:

    u_row   = scatter(ids, g_rows)[row] + coef * p_row     (coef = 2*l2 + wd)
    m', v'  = Adam moments;  p' = p - lr * m_hat/(sqrt(v_hat)+eps)

This kernel makes ONE pass over (p, m, v) and applies the batch's
touched-row gradients in-register per row-tile, so the dense grad array
never exists.

Touched-row schedule: sort ids, combine duplicates, then per-tile
[start, end) ranges via searchsorted, delivered through scalar prefetch.
The whole deduped-grad array stays VMEM-resident for every grid step —
packed as [N/8, 128] so its VMEM footprint is the true byte count rather
than 8x lane padding (a [N,16] block pads 16 -> 128 lanes), and so its
BlockSpec is static (scalar-dependent input index maps serialize the
Mosaic pipeline; measured 4x slower).  Each grad row's 16 lanes are
recovered with one [1,128]x[128,16] MXU matmul against a constant
slot-selection tensor.

STATUS — correct but NOT the production path.  Measured on v5e at
1.66M x 16 with 11.7k touched rows: the in-kernel per-row loop costs
~0.8us/row (dynamic VMEM slice + MXU latency), ~9.8ms/step total versus
~2.0ms for XLA's scatter+Adam and ~1.6ms for the hybrid small/big-field
split (tpurec/train/hybrid.py), which is the default.  Row-granular
random access is the one shape this hardware dislikes; the hybrid path
sidesteps it by turning most of the scatter into matmuls.  Kept (with an
interpret-mode oracle test) as the starting point for a future
double-buffered DMA variant.

Also emits sum(p**2) of the pre-update table (free — p is already being
read) so a trainer using it can report the reference's embedding L2 loss
term without an extra sweep.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seg_ref, ids_ref, bc_ref, p_ref, m_ref, v_ref, gp_ref, sel_ref,
            p_out, m_out, v_out, sumsq_out, *, tile_rows: int, n_rows: int,
            rows_per_pack: int, lr: float, b1: float, b2: float, eps: float,
            coef: float):
    i = pl.program_id(0)
    base = i * tile_rows

    p = p_ref[:]
    u = coef * p

    def add_row(j, u):
        row = ids_ref[j] - base
        gp = gp_ref[pl.ds(j // rows_per_pack, 1), :]    # [1, 128] packed
        sel = sel_ref[j % rows_per_pack]                # [128, D] slot select
        g = jnp.dot(gp, sel, preferred_element_type=jnp.float32)  # [1, D]
        onehot = (
            lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0) == row
        ).astype(u.dtype)
        return u + onehot * g                           # [T,1]*[1,D]

    u = lax.fori_loop(seg_ref[i], seg_ref[i + 1], add_row, u)

    m2 = b1 * m_ref[:] + (1.0 - b1) * u
    v2 = b2 * v_ref[:] + (1.0 - b2) * (u * u)
    m_hat = m2 / bc_ref[0]
    v_hat = v2 / bc_ref[1]
    p_out[:] = p - lr * m_hat / (jnp.sqrt(v_hat) + eps)
    m_out[:] = m2
    v_out[:] = v2

    @pl.when(i == 0)
    def _init():
        sumsq_out[:] = jnp.zeros((1, 1), jnp.float32)

    # the final tile may extend past n_rows; its padding is garbage
    valid = (
        lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0) + base < n_rows
    )
    # where, not multiply: padding can be NaN and 0*NaN = NaN
    tile_sum = jnp.sum(jnp.where(valid, p * p, 0.0)).reshape(1, 1)
    sumsq_out[:] = sumsq_out[:] + tile_sum


def _dedup_sorted(ids, g_rows, sentinel: int):
    """Sort ids, sum duplicate rows' grads.  -> (sorted unique ids [N] with
    ``sentinel`` padding at the tail, summed grads [N, D])."""
    N = ids.shape[0]
    order = jnp.argsort(ids)
    sid = jnp.take(ids, order).astype(jnp.int32)
    sg = jnp.take(g_rows, order, axis=0)
    head = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sid[1:] != sid[:-1]).astype(jnp.int32)]
    )
    seg = jnp.cumsum(head) - 1                      # [N] segment per entry
    g_u = jax.ops.segment_sum(sg, seg, num_segments=N)
    id_u = jax.ops.segment_max(sid, seg, num_segments=N)
    n_seg = seg[-1] + 1
    valid = jnp.arange(N) < n_seg
    id_u = jnp.where(valid, id_u, sentinel)
    return id_u, g_u


@functools.lru_cache(maxsize=4)
def _selection_tensor(d: int):
    rp = 128 // d
    sel = np.zeros((rp, 128, d), np.float32)
    for k in range(rp):
        sel[k, k * d:(k + 1) * d, :] = np.eye(d)
    return sel


@functools.partial(
    jax.jit,
    static_argnames=("lr", "b1", "b2", "eps", "coef", "tile_rows", "interpret"),
)
def fused_sparse_adam(
    table: jnp.ndarray,     # [V, D] f32
    m: jnp.ndarray,         # [V, D] f32
    v: jnp.ndarray,         # [V, D] f32
    ids: jnp.ndarray,       # [N] int32  (touched rows, duplicates fine)
    g_rows: jnp.ndarray,    # [N, D] f32 (per-occurrence grads)
    t: jnp.ndarray,         # scalar int/float: 1-based Adam step count
    *,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-8,
    coef: float = 0.0,      # 2*l2_reg_embedding + weight_decay
    tile_rows: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One exact dense-Adam step on the table with sparse gradients.

    -> (table', m', v', sumsq) where sumsq = sum(table**2) pre-update.

    The packed-grad view needs 128 %% D == 0 (D=16 is the reference
    embed_dim, config.py:12; any power of two <= 128 works)."""
    V, D = table.shape
    assert 128 % D == 0, f"packed grad layout needs 128 %% D == 0, got {D}"
    rp = 128 // D
    N = ids.shape[0]
    n_tiles = (V + tile_rows - 1) // tile_rows

    # pad N to a pack multiple for the [N/rp, 128] view (id-0 pad rows carry
    # zero grads, so they are semantically inert)
    pad = (-N) % rp
    if pad:
        ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
        g_rows = jnp.concatenate(
            [g_rows, jnp.zeros((pad, D), g_rows.dtype)]
        )
    Np = N + pad

    sid, sg = _dedup_sorted(ids, g_rows, sentinel=n_tiles * tile_rows)
    gp = sg.reshape(Np // rp, 128)
    bounds = jnp.arange(1, n_tiles + 1, dtype=jnp.int32) * tile_rows
    seg = jnp.searchsorted(sid, bounds, side="left").astype(jnp.int32)
    seg_starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), seg])

    tf = jnp.asarray(t, jnp.float32)
    bc = jnp.stack([1.0 - b1 ** tf, 1.0 - b2 ** tf])
    sel = jnp.asarray(_selection_tensor(D))

    block = pl.BlockSpec((tile_rows, D), lambda i, *_: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # seg_starts, sid, bc
        grid=(n_tiles,),
        in_specs=[
            block, block, block,                             # p, m, v
            pl.BlockSpec((Np // rp, 128), lambda i, *_: (0, 0)),  # packed grads
            pl.BlockSpec((rp, 128, D), lambda i, *_: (0, 0, 0)),  # slot select
        ],
        out_specs=[
            block, block, block,
            pl.BlockSpec((1, 1), lambda i, *_: (0, 0)),      # sumsq accumulator
        ],
    )
    kernel = functools.partial(
        _kernel, tile_rows=tile_rows, n_rows=V, rows_per_pack=rp,
        lr=lr, b1=b1, b2=b2, eps=eps, coef=coef,
    )
    p2, m2, v2, sumsq = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((V, D), table.dtype),
            jax.ShapeDtypeStruct((V, D), m.dtype),
            jax.ShapeDtypeStruct((V, D), v.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        # tensor operand k aliases output k (operand indices include the 3
        # scalar-prefetch args)
        input_output_aliases={3: 0, 4: 1, 5: 2},
        interpret=interpret,
    )(seg_starts, sid, bc, table, m, v, gp, sel)
    return p2, m2, v2, sumsq[0, 0]


def _decay_kernel(bc_ref, p_ref, m_ref, v_ref, g_ref,
                  p_out, m_out, v_out, sumsq_out, *,
                  tile: int, n_rows: int, n_g_tiles: int,
                  lr: float, b1: float, b2: float, eps: float, coef: float):
    i = pl.program_id(0)
    p = p_ref[:]
    # compact small-field grad region lives in tiles [0, n_g_tiles); its
    # buffer is zero-padded so no intra-tile masking is needed.  where, not
    # multiply-by-bool: g may contain inf and 0*inf = nan.
    u = coef * p + jnp.where(i < n_g_tiles, g_ref[:], 0.0)
    m2 = b1 * m_ref[:] + (1.0 - b1) * u
    v2 = b2 * v_ref[:] + (1.0 - b2) * (u * u)
    p_out[:] = p - lr * (m2 / bc_ref[0]) / (jnp.sqrt(v2 / bc_ref[1]) + eps)
    m_out[:] = m2
    v_out[:] = v2

    @pl.when(i == 0)
    def _init():
        sumsq_out[:] = jnp.zeros((1, 1), jnp.float32)

    # the final tile may extend past n_rows; mask its padding out of sumsq
    valid = (
        lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + i * tile < n_rows
    )
    sumsq_out[:] = sumsq_out[:] + jnp.sum(
        jnp.where(valid, p * p, 0.0)).reshape(1, 1)


@functools.partial(
    jax.jit,
    static_argnames=("lr", "b1", "b2", "eps", "coef", "tile", "interpret"),
)
def fused_decay_adam(
    table: jnp.ndarray,     # [V, D] f32, V*D % 128 == 0 (EmbeddingLayout pads)
    m: jnp.ndarray,         # [V, D] f32
    v: jnp.ndarray,         # [V, D] f32
    g_small: jnp.ndarray,   # [S, D] f32: dense grads for table rows [0, S)
    t: jnp.ndarray,         # scalar: 1-based Adam step count
    *,
    lr: float,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-8,
    coef: float = 0.0,      # 2*l2_reg_embedding + weight_decay
    tile: int = 1024,       # flat [tile, 128] block per grid step (512KB)
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact dense-Adam sweep with u = coef*p (+ g_small on the prefix).

    ONE elementwise pass over the flat [V*D/128, 128] view of (p, m, v) —
    6 HBM transfers, the roofline for exact per-step dense-Adam semantics —
    folding in the small-vocab fields' dense gradient prefix (see
    EmbeddingLayout) and the reference's sum(p**2) L2 loss term
    (layer.py:31,96-112) for free.

    STATUS — correct but NOT the production path.  Measured on v5e at
    1.63M x 16: ~2.4ms/step (~260GB/s — Mosaic does not stream 7
    concurrent HBM buffers at roofline here), and the scalar-prefetch grid
    spec serializes the pipeline outright (~20ms).  XLA's own fusion of
    the identical chain runs at ~716GB/s (0.88ms), so the production
    hybrid update (tpurec.train.hybrid) keeps the sweep in XLA and fuses
    the prefix grads via lax.pad.  Kept with an interpret-mode oracle test
    as the starting point for a manually double-buffered DMA variant.

    -> (table', m', v', sumsq) with sumsq = sum(table**2) pre-update.
    """
    V, D = table.shape
    flat = V * D
    assert flat % 128 == 0, f"table {table.shape} not lane-alignable"
    R = flat // 128
    n_tiles = (R + tile - 1) // tile

    S = g_small.shape[0]
    g_flat = S * D
    n_g_tiles = (g_flat + tile * 128 - 1) // (tile * 128) if g_flat else 0
    pad = max(n_g_tiles, 1) * tile * 128 - g_flat
    g = jnp.concatenate([g_small.reshape(-1), jnp.zeros((pad,), g_small.dtype)])
    g = g.reshape(max(n_g_tiles, 1) * tile, 128)

    tf = jnp.asarray(t, jnp.float32)
    bc = jnp.stack([1.0 - b1 ** tf, 1.0 - b2 ** tf])

    block = pl.BlockSpec((tile, 128), lambda i, *_: (i, 0))
    g_block = pl.BlockSpec(
        (tile, 128), lambda i, *_: (jnp.minimum(i, max(n_g_tiles - 1, 0)), 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,          # bc
        grid=(n_tiles,),
        in_specs=[block, block, block, g_block],
        out_specs=[
            block, block, block,
            pl.BlockSpec((1, 1), lambda i, *_: (0, 0)),
        ],
    )
    kernel = functools.partial(
        _decay_kernel, tile=tile, n_rows=R, n_g_tiles=n_g_tiles,
        lr=lr, b1=b1, b2=b2, eps=eps, coef=coef,
    )
    fshape = jax.ShapeDtypeStruct((R, 128), table.dtype)
    p2, m2, v2, sumsq = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[fshape, fshape, fshape,
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        # operand k aliases output k (index 0 is the scalar-prefetch arg)
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(bc, table.reshape(R, 128), m.reshape(R, 128), v.reshape(R, 128), g)
    return (p2.reshape(V, D), m2.reshape(V, D), v2.reshape(V, D),
            sumsq[0, 0])


def fused_decay_adam_reference(
    table, m, v, g_small, t, *, lr, b1=0.9, b2=0.99, eps=1e-8, coef=0.0
):
    """Pure-jnp oracle with identical semantics (also the CPU path)."""
    u = coef * table
    if g_small.shape[0]:
        u = u.at[: g_small.shape[0]].add(g_small)
    m2 = b1 * m + (1 - b1) * u
    v2 = b2 * v + (1 - b2) * u * u
    tf = jnp.asarray(t, jnp.float32)
    p2 = table - lr * (m2 / (1 - b1 ** tf)) / (
        jnp.sqrt(v2 / (1 - b2 ** tf)) + eps)
    return p2, m2, v2, jnp.sum(table * table)


def fused_sparse_adam_reference(
    table, m, v, ids, g_rows, t, *, lr, b1=0.9, b2=0.99, eps=1e-8, coef=0.0
):
    """Pure-jnp oracle with identical (dense-Adam) semantics, for tests."""
    g = jnp.zeros_like(table).at[ids].add(g_rows)
    u = g + coef * table
    m2 = b1 * m + (1 - b1) * u
    v2 = b2 * v + (1 - b2) * u * u
    tf = jnp.asarray(t, jnp.float32)
    m_hat = m2 / (1 - b1 ** tf)
    v_hat = v2 / (1 - b2 ** tf)
    p2 = table - lr * m_hat / (jnp.sqrt(v_hat) + eps)
    return p2, m2, v2, jnp.sum(table * table)
