"""Pallas TPU kernel: fused DCN-v1 cross-network stack.

The reference computes each cross layer as a separate Linear + elementwise
round trip (layer.py:321-329).  This kernel keeps a batch tile resident in
VMEM and runs ALL layers back-to-back:

    x_{l+1} = x0 * (x_l . w_l) + b_l + x_l

so the L-layer stack costs one HBM read of x plus one write, instead of
2L round trips.  Ships with a custom VJP whose backward kernel recomputes
the per-layer states in VMEM (cheap: the recurrence is rank-1).

Falls back to pure jnp off-TPU (interpret mode in tests).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def cross_network_reference(x, w, b):
    """jnp reference: w [L, D], b [L, D], x [B, D]."""
    x0 = x
    for l in range(w.shape[0]):
        xw = jnp.einsum("bd,d->b", x, w[l], preferred_element_type=jnp.float32)
        x = x0 * xw[:, None] + b[l][None, :] + x
    return x


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, *, n_layers: int):
    x0 = x_ref[:]
    x = x0
    for l in range(n_layers):
        wl = w_ref[l, :]
        xw = jnp.sum(x * wl[None, :], axis=1, keepdims=True)
        x = x0 * xw + b_ref[l, :][None, :] + x
    o_ref[:] = x


def _bwd_kernel(x_ref, w_ref, b_ref, g_ref, dx_ref, dw_ref, db_ref,
                *, n_layers: int, n_rows: int, tile_b: int):
    # mask tail-tile padding rows out of the weight/bias reductions
    row0 = pl.program_id(0) * tile_b
    row_ids = jax.lax.broadcasted_iota(jnp.int32, x_ref.shape, 0) + row0
    valid = row_ids < n_rows
    # where (not multiply): padding may be NaN-filled and NaN*0 == NaN
    x0 = jnp.where(valid, x_ref[:], 0.0)
    g = jnp.where(valid, g_ref[:], 0.0)
    # recompute forward states (rank-1 recurrence, cheap in VMEM)
    xs = [x0]
    x = x0
    for l in range(n_layers):
        wl = w_ref[l, :]
        xw = jnp.sum(x * wl[None, :], axis=1, keepdims=True)
        x = x0 * xw + b_ref[l, :][None, :] + x
        xs.append(x)

    dx0_extra = jnp.zeros_like(x0)
    for l in range(n_layers - 1, -1, -1):
        wl = w_ref[l, :]
        x_l = xs[l]
        xw = jnp.sum(x_l * wl[None, :], axis=1, keepdims=True)  # [B,1]
        # x_{l+1} = x0 * xw + b_l + x_l
        dxw = jnp.sum(g * x0, axis=1, keepdims=True)             # [B,1]
        db_ref[0, l, :] = jnp.sum(g, axis=0)
        dw_ref[0, l, :] = jnp.sum(dxw * x_l, axis=0)
        dx0_extra = dx0_extra + g * xw
        g = g + dxw * wl[None, :]
    dx_ref[:] = g + dx0_extra


def _pallas_fwd(x, w, b, interpret=False):
    B, D = x.shape
    L = w.shape[0]
    tile_b = min(_round_up(B, 8), 512)
    grid = (pl.cdiv(B, tile_b),)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers=L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D), x.dtype),
        interpret=interpret,
    )(x, w, b)


def _pallas_bwd(x, w, b, g, interpret=False):
    B, D = x.shape
    L = w.shape[0]
    tile_b = min(_round_up(B, 8), 512)
    n_tiles = pl.cdiv(B, tile_b)
    grid = (n_tiles,)
    dx, dw_t, db_t = pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers=L, n_rows=B, tile_b=tile_b),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            # per-tile partial reductions, summed on the host side of the call
            pl.BlockSpec((1, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), x.dtype),
            jax.ShapeDtypeStruct((n_tiles, L, D), x.dtype),
            jax.ShapeDtypeStruct((n_tiles, L, D), x.dtype),
        ],
        interpret=interpret,
    )(x, w, b, g)
    return dx, dw_t.sum(0), db_t.sum(0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def cross_network_fused(x, w, b, interpret: bool = False):
    """Fused cross-network stack. x [B, D], w [L, D], b [L, D] -> [B, D]."""
    return _pallas_fwd(x, w, b, interpret=interpret)


def _fused_fwd(x, w, b, interpret):
    return _pallas_fwd(x, w, b, interpret=interpret), (x, w, b)


def _fused_bwd(interpret, res, g):
    x, w, b = res
    return _pallas_bwd(x, w, b, g, interpret=interpret)


cross_network_fused.defvjp(_fused_fwd, _fused_bwd)
