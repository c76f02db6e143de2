"""Fused field-attention stack (Pallas TPU kernels + custom VJP).

The reference's aux attention head (layer.py:58-84: project fields to
atten_embed_dim, 3 torch MultiheadAttention layers over the ~23-field
axis, V_res residual, ReLU) is ~half the model's fwd+bwd compute time on
TPU at CTR shapes — not from FLOPs (~35 MFLOP) but from HBM traffic on
lane-padded intermediates: every [B,F,64] activation pads 64->128 lanes,
every [B,H,F,F] score/softmax/dropout tensor pads F=23->128 lanes (5.6x),
and XLA materializes ~15 of them per layer between matmul fusions.
Measured 0.93 ms/step fwd+bwd at B=512 — unchanged by transpose-free
rewrites, made worse by remat.

These kernels run the whole 3-layer stack in VMEM: one read of the field
embeddings + weights, one write of the output (plus the per-layer inputs
saved for backward), with none of the padded intermediates touching HBM.
The backward kernel is flash-style: it recomputes each layer's internals
in VMEM from the saved layer inputs (dropout bits regenerate from the
same per-(tile, layer, head) seeds via the TPU PRNG) and accumulates
weight gradients across batch tiles in revisited output blocks.

Semantics match tpurec.nn.interactions.FieldAttention's jnp path exactly
for train=False; the train path applies the same dropout distribution
with kernel-owned PRNG bits (a different stream than flax's nn.Dropout,
as any two dropout implementations differ).

STATUS — correct but NOT the production path; XLA wins at these shapes.
Two generations measured on v5e (B=512, F=23, A=64, H=2, L=3):

1. The fused 3-layer STACK kernel below: interpret-mode oracle tests
   pass (fwd bit-exact, grads ~1e-7 rel), but Mosaic takes minutes to
   compile the unrolled stack and tile_rows=128 exceeds the 16MB
   scoped-VMEM budget (28.7MB).
2. The restructured PER-LAYER kernels (its planned fix — one small
   program per layer, weight grads via dot_general dimension numbers,
   tile_rows 32; `fused_attention_layer` / function
   `fused_field_attention_layered` at the bottom of this file): fixes
   both problems (compiles in ~65s cold / cached after, fits VMEM at
   tile 32 — tile 64 needs 24.3MB and OOMs) and matches XLA grads to
   <=7e-4 rel on-chip, but runs **2.87 ms/step fwd+bwd vs XLA's 1.04**
   (chained-dispatch timing, r2).  Root cause: the per-(row, head)
   [F, hd] x [hd, F] dots are too small for the MXU — Mosaic issues
   them serially per batch row (~190 tiny dots per tile), so the
   kernel is MXU-latency-bound, while XLA's batched-GEMM path keeps
   the MXU streaming despite its padded HBM intermediates.  A VPU
   mul-reduce formulation pencils out 4x lane-padding-bound (F=23 ->
   128 lanes) — no better.  CONCLUSION: the jnp/XLA path in
   nn.interactions.FieldAttention is the production path at CTR field
   counts; these kernels are kept as tested, documented evidence and
   for the day F*hd shapes grow MXU-sized.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bdot(x, y, cx, cy):
    """Batched (leading-dim) matmul contracting x's axis cx with y's cy."""
    return lax.dot_general(
        x, y, (((cx,), (cy,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _mm(x2d, w):
    return jnp.dot(x2d, w, preferred_element_type=jnp.float32)


def _keep_mask(shape, rate):
    bits = pltpu.prng_random_bits(shape)
    thresh = np.uint32(min(int((1.0 - rate) * 2**32), 2**32 - 1))
    return bits.astype(jnp.uint32) < thresh


def _layer_internals(x, w_in, b_in, n_heads, rate, train, seed_base):
    """Shared fwd recompute: -> (heads, o) where heads[h] =
    (q, k, v, a_soft, keep|None, a_drop) and o = concat_h(a_drop @ v)."""
    Bt, F, A = x.shape
    hd = A // n_heads
    qkv = (_mm(x.reshape(Bt * F, A), w_in) + b_in).reshape(Bt, F, 3 * A)
    heads, outs = [], []
    for h in range(n_heads):
        q = qkv[..., h * hd:(h + 1) * hd]
        k = qkv[..., A + h * hd:A + (h + 1) * hd]
        v = qkv[..., 2 * A + h * hd:2 * A + (h + 1) * hd]
        s = _bdot(q, k, 2, 2) / math.sqrt(hd)          # [Bt, F, F]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        a_soft = e / jnp.sum(e, axis=-1, keepdims=True)
        if train and rate > 0.0:
            pltpu.prng_seed(seed_base + h)
            keep = _keep_mask(a_soft.shape, rate)
            a_drop = jnp.where(keep, a_soft / (1.0 - rate), 0.0)
        else:
            keep, a_drop = None, a_soft
        heads.append((q, k, v, a_soft, keep, a_drop))
        outs.append(_bdot(a_drop, v, 2, 1))            # [Bt, F, hd]
    return heads, jnp.concatenate(outs, axis=-1)


def _layer_fwd(x, w_in, b_in, w_out, b_out, n_heads, rate, train, seed_base):
    Bt, F, A = x.shape
    _, o = _layer_internals(x, w_in, b_in, n_heads, rate, train, seed_base)
    return (_mm(o.reshape(Bt * F, A), w_out) + b_out).reshape(Bt, F, A)


def _fwd_kernel(seed_ref, emb_ref, *refs, n_layers, n_heads, rate, train):
    wrefs = refs[: 4 + 4 * n_layers]
    y_ref = refs[4 + 4 * n_layers]
    saved_refs = refs[5 + 4 * n_layers:]
    w_emb_ref, b_emb_ref, w_res_ref, b_res_ref = wrefs[:4]
    layer_wrefs = wrefs[4:]

    i = pl.program_id(0)
    emb = emb_ref[:]
    Bt, F, D = emb.shape
    A = w_emb_ref.shape[1]
    x = (_mm(emb.reshape(Bt * F, D), w_emb_ref[:])
         + b_emb_ref[:]).reshape(Bt, F, A)
    for l in range(n_layers):
        saved_refs[l][:] = x
        x = _layer_fwd(
            x, layer_wrefs[4 * l][:], layer_wrefs[4 * l + 1][:],
            layer_wrefs[4 * l + 2][:], layer_wrefs[4 * l + 3][:],
            n_heads, rate, train,
            seed_base=seed_ref[0] + (i * n_layers + l) * n_heads,
        )
    res = (_mm(emb.reshape(Bt * F, D), w_res_ref[:])
           + b_res_ref[:]).reshape(Bt, F, A)
    y_ref[:] = jax.nn.relu(x + res)


def _bwd_kernel(seed_ref, emb_ref, dy_ref, *refs, n_layers, n_heads, rate,
                train, n_rows, tile_rows):
    wrefs = refs[: 4 + 4 * n_layers]
    saved_refs = refs[4 + 4 * n_layers: 4 + 5 * n_layers]
    demb_ref = refs[4 + 5 * n_layers]
    gw_refs = refs[5 + 5 * n_layers:]   # same ordering as wrefs
    w_emb_ref, b_emb_ref, w_res_ref, b_res_ref = wrefs[:4]
    layer_wrefs = wrefs[4:]

    i = pl.program_id(0)
    base = i * tile_rows
    valid = (
        lax.broadcasted_iota(jnp.int32, (tile_rows, 1, 1), 0) + base < n_rows
    )
    emb = jnp.where(valid, emb_ref[:], 0.0)
    dy = jnp.where(valid, dy_ref[:], 0.0)
    Bt, F, D = emb.shape
    A = w_emb_ref.shape[1]

    @pl.when(i == 0)
    def _init():
        for r in gw_refs:
            r[:] = jnp.zeros_like(r)

    def seed_base(l):
        return seed_ref[0] + (i * n_layers + l) * n_heads

    # recompute the last layer's output for the ReLU mask
    x_last = jnp.where(valid, saved_refs[n_layers - 1][:], 0.0)
    x_out = _layer_fwd(
        x_last, layer_wrefs[4 * (n_layers - 1)][:],
        layer_wrefs[4 * (n_layers - 1) + 1][:],
        layer_wrefs[4 * (n_layers - 1) + 2][:],
        layer_wrefs[4 * (n_layers - 1) + 3][:],
        n_heads, rate, train, seed_base(n_layers - 1),
    )
    emb2 = emb.reshape(Bt * F, D)
    res = (_mm(emb2, w_res_ref[:]) + b_res_ref[:]).reshape(Bt, F, A)
    dz = dy * ((x_out + res) > 0.0)

    dz2 = dz.reshape(Bt * F, A)
    gw_refs[2][:] += _mm(emb2.T, dz2)
    gw_refs[3][:] += jnp.sum(dz2, axis=0)
    demb = _mm(dz2, w_res_ref[:].T).reshape(Bt, F, D)

    dx = dz
    hd = A // n_heads
    for l in range(n_layers - 1, -1, -1):
        x_in = jnp.where(valid, saved_refs[l][:], 0.0)
        w_in = layer_wrefs[4 * l][:]
        b_in = layer_wrefs[4 * l + 1][:]
        w_out = layer_wrefs[4 * l + 2][:]
        heads, o = _layer_internals(
            x_in, w_in, b_in, n_heads, rate, train, seed_base(l))
        # out-proj backward
        o2 = o.reshape(Bt * F, A)
        dx2 = dx.reshape(Bt * F, A)
        gw_refs[4 + 4 * l + 2][:] += _mm(o2.T, dx2)
        gw_refs[4 + 4 * l + 3][:] += jnp.sum(dx2, axis=0)
        do = _mm(dx2, w_out.T).reshape(Bt, F, A)
        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(n_heads):
            q, k, v, a_soft, keep, a_drop = heads[h]
            do_h = do[..., h * hd:(h + 1) * hd]
            d_adrop = _bdot(do_h, v, 2, 2)             # [Bt, F, F]
            d_v = _bdot(a_drop, do_h, 1, 1)            # [Bt, F, hd]
            if keep is not None:
                d_asoft = jnp.where(keep, d_adrop / (1.0 - rate), 0.0)
            else:
                d_asoft = d_adrop
            d_s = (d_asoft - jnp.sum(d_asoft * a_soft, axis=-1,
                                     keepdims=True)) * a_soft
            d_s = d_s / math.sqrt(hd)
            dq_parts.append(_bdot(d_s, k, 2, 1))
            dk_parts.append(_bdot(d_s, q, 1, 1))
            dv_parts.append(d_v)
        d_qkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)
        x2 = x_in.reshape(Bt * F, A)
        dqkv2 = d_qkv.reshape(Bt * F, 3 * A)
        gw_refs[4 + 4 * l][:] += _mm(x2.T, dqkv2)
        gw_refs[4 + 4 * l + 1][:] += jnp.sum(dqkv2, axis=0)
        dx = _mm(dqkv2, w_in.T).reshape(Bt, F, A)

    dx2 = dx.reshape(Bt * F, A)
    gw_refs[0][:] += _mm(emb2.T, dx2)
    gw_refs[1][:] += jnp.sum(dx2, axis=0)
    demb_ref[:] = demb + _mm(dx2, w_emb_ref[:].T).reshape(Bt, F, D)


# ---------------------------------------------------------------------------
# host wrappers + custom VJP
# ---------------------------------------------------------------------------


def _flat_weights(w_emb, b_emb, w_in, b_in, w_out, b_out, w_res, b_res):
    flat = [w_emb, b_emb, w_res, b_res]
    for i in range(len(w_in)):
        flat += [w_in[i], b_in[i], w_out[i], b_out[i]]
    return flat


def _run_fwd(emb, flat_w, seed, *, n_layers, n_heads, rate, train,
             tile_rows, interpret):
    B, F, D = emb.shape
    A = flat_w[0].shape[1]
    n_tiles = (B + tile_rows - 1) // tile_rows
    tile = lambda shape: pl.BlockSpec(shape, lambda i, *_: (i,) + (0,) * (len(shape) - 1))
    full = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[tile((tile_rows, F, D))] + [full(w.shape) for w in flat_w],
        out_specs=[tile((tile_rows, F, A))]
        + [tile((tile_rows, F, A)) for _ in range(n_layers)],
    )
    kernel = functools.partial(
        _fwd_kernel, n_layers=n_layers, n_heads=n_heads, rate=rate,
        train=train,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, F, A), jnp.float32)]
        + [jax.ShapeDtypeStruct((B, F, A), jnp.float32)
           for _ in range(n_layers)],
        interpret=interpret,
    )(jnp.asarray([seed]).astype(jnp.int32).reshape(1), emb, *flat_w)
    return out[0], out[1:]


def _run_bwd(emb, dy, saved, flat_w, seed, *, n_layers, n_heads, rate,
             train, tile_rows, interpret):
    B, F, D = emb.shape
    A = flat_w[0].shape[1]
    n_tiles = (B + tile_rows - 1) // tile_rows
    tile = lambda shape: pl.BlockSpec(shape, lambda i, *_: (i,) + (0,) * (len(shape) - 1))
    full = lambda shape: pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=(
            [tile((tile_rows, F, D)), tile((tile_rows, F, A))]
            + [full(w.shape) for w in flat_w]
            + [tile((tile_rows, F, A)) for _ in range(n_layers)]
        ),
        out_specs=[tile((tile_rows, F, D))] + [full(w.shape) for w in flat_w],
    )
    kernel = functools.partial(
        _bwd_kernel, n_layers=n_layers, n_heads=n_heads, rate=rate,
        train=train, n_rows=B, tile_rows=tile_rows,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, F, D), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in flat_w],
        interpret=interpret,
    )(jnp.asarray([seed]).astype(jnp.int32).reshape(1), emb, dy, *flat_w,
      *saved)
    return out[0], out[1:]


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8),
)
def fused_field_attention(
    emb, flat_w, seed,
    n_layers, n_heads, rate, train, tile_rows, interpret,
):
    """[B, F, D] field embeddings -> [B, F, A] attention-stack output
    (post V_res residual + ReLU; the caller flattens and applies its
    Linear(1) head).  ``flat_w`` = [w_emb, b_emb, w_res, b_res,
    (w_in, b_in, w_out, b_out) x n_layers]."""
    y, _ = _run_fwd(
        emb, flat_w, seed, n_layers=n_layers, n_heads=n_heads, rate=rate,
        train=train, tile_rows=tile_rows, interpret=interpret,
    )
    return y


def _ffa_fwd(emb, flat_w, seed, n_layers, n_heads, rate, train, tile_rows,
             interpret):
    y, saved = _run_fwd(
        emb, flat_w, seed, n_layers=n_layers, n_heads=n_heads, rate=rate,
        train=train, tile_rows=tile_rows, interpret=interpret,
    )
    return y, (emb, flat_w, seed, saved)


def _ffa_bwd(n_layers, n_heads, rate, train, tile_rows, interpret,
             residuals, dy):
    emb, flat_w, seed, saved = residuals
    demb, dws = _run_bwd(
        emb, dy, saved, flat_w, seed, n_layers=n_layers, n_heads=n_heads,
        rate=rate, train=train, tile_rows=tile_rows, interpret=interpret,
    )
    dseed = np.zeros((), jax.dtypes.float0)
    return demb, list(dws), dseed


fused_field_attention.defvjp(_ffa_fwd, _ffa_bwd)


# ---------------------------------------------------------------------------
# PER-LAYER kernels — the production restructuring of the stack kernel
# above (its docstring plan: one small program per attention layer instead
# of one unrolled 3-layer program, weight grads via dot_general dimension
# numbers instead of transposed operands, tile_rows 64).  The embedding
# projection and the V_res residual + ReLU stay in XLA: they are proper
# [B*F, D]@[D, A] matmuls that XLA already fuses well; the kernels own
# exactly the lane-padded part (everything between a layer's input and
# output, where XLA materializes ~15 padded [B,F,F]/[B,F,A] intermediates
# to HBM per layer — see module docstring).
# ---------------------------------------------------------------------------


def _layer_only_fwd_kernel(seed_ref, x_ref, w_in_ref, b_in_ref, w_out_ref,
                           b_out_ref, y_ref, *, n_heads, rate, train):
    i = pl.program_id(0)
    x = x_ref[:]
    Bt, F, A = x.shape
    _, o = _layer_internals(
        x, w_in_ref[:], b_in_ref[:], n_heads, rate, train,
        seed_base=seed_ref[0] + i * n_heads,
    )
    y_ref[:] = (_mm(o.reshape(Bt * F, A), w_out_ref[:])
                + b_out_ref[:]).reshape(Bt, F, A)


def _layer_only_bwd_kernel(seed_ref, x_ref, dy_ref, w_in_ref, b_in_ref,
                           w_out_ref, b_out_ref,
                           dx_ref, gw_in_ref, gb_in_ref, gw_out_ref,
                           gb_out_ref, *, n_heads, rate, train, n_rows,
                           tile_rows):
    i = pl.program_id(0)
    base = i * tile_rows
    valid = (
        lax.broadcasted_iota(jnp.int32, (tile_rows, 1, 1), 0) + base < n_rows
    )
    x = jnp.where(valid, x_ref[:], 0.0)
    dy = jnp.where(valid, dy_ref[:], 0.0)
    Bt, F, A = x.shape
    hd = A // n_heads

    @pl.when(i == 0)
    def _init():
        gw_in_ref[:] = jnp.zeros_like(gw_in_ref)
        gb_in_ref[:] = jnp.zeros_like(gb_in_ref)
        gw_out_ref[:] = jnp.zeros_like(gw_out_ref)
        gb_out_ref[:] = jnp.zeros_like(gb_out_ref)

    heads, o = _layer_internals(
        x, w_in_ref[:], b_in_ref[:], n_heads, rate, train,
        seed_base=seed_ref[0] + i * n_heads,
    )
    o2 = o.reshape(Bt * F, A)
    dy2 = dy.reshape(Bt * F, A)
    # weight grads contract the row axis via dimension numbers (no
    # transposed operand materialization: o2^T @ dy2 == dot_general
    # contracting axis 0 with axis 0)
    gw_out_ref[:] += lax.dot_general(
        o2, dy2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    gb_out_ref[:] += jnp.sum(dy2, axis=0)
    # do = dy2 @ w_out^T: contract dy2 axis 1 with w_out axis 1
    do = lax.dot_general(
        dy2, w_out_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(Bt, F, A)

    dq_parts, dk_parts, dv_parts = [], [], []
    for h in range(n_heads):
        q, k, v, a_soft, keep, a_drop = heads[h]
        do_h = do[..., h * hd:(h + 1) * hd]
        d_adrop = _bdot(do_h, v, 2, 2)                 # [Bt, F, F]
        d_v = _bdot(a_drop, do_h, 1, 1)                # [Bt, F, hd]
        if keep is not None:
            d_asoft = jnp.where(keep, d_adrop / (1.0 - rate), 0.0)
        else:
            d_asoft = d_adrop
        d_s = (d_asoft - jnp.sum(d_asoft * a_soft, axis=-1,
                                 keepdims=True)) * a_soft
        d_s = d_s / math.sqrt(hd)
        dq_parts.append(_bdot(d_s, k, 2, 1))
        dk_parts.append(_bdot(d_s, q, 1, 1))
        dv_parts.append(d_v)
    d_qkv = jnp.concatenate(dq_parts + dk_parts + dv_parts, axis=-1)
    x2 = x.reshape(Bt * F, A)
    dqkv2 = d_qkv.reshape(Bt * F, 3 * A)
    gw_in_ref[:] += lax.dot_general(
        x2, dqkv2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    gb_in_ref[:] += jnp.sum(dqkv2, axis=0)
    # dx = dqkv2 @ w_in^T
    dx_ref[:] = lax.dot_general(
        dqkv2, w_in_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(Bt, F, A)


def _run_layer_fwd(x, w_in, b_in, w_out, b_out, seed, *, n_heads, rate,
                   train, tile_rows, interpret):
    B, F, A = x.shape
    n_tiles = (B + tile_rows - 1) // tile_rows
    tile = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (i,) + (0,) * (len(shape) - 1))
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (0,) * len(shape))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[tile((tile_rows, F, A)), full(w_in.shape),
                  full(b_in.shape), full(w_out.shape), full(b_out.shape)],
        out_specs=[tile((tile_rows, F, A))],
    )
    kernel = functools.partial(
        _layer_only_fwd_kernel, n_heads=n_heads, rate=rate, train=train)
    (y,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, F, A), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray([seed]).astype(jnp.int32).reshape(1), x,
      w_in, b_in, w_out, b_out)
    return y


def _run_layer_bwd(x, dy, w_in, b_in, w_out, b_out, seed, *, n_heads, rate,
                   train, tile_rows, interpret):
    B, F, A = x.shape
    n_tiles = (B + tile_rows - 1) // tile_rows
    tile = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (i,) + (0,) * (len(shape) - 1))
    full = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (0,) * len(shape))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[tile((tile_rows, F, A)), tile((tile_rows, F, A)),
                  full(w_in.shape), full(b_in.shape),
                  full(w_out.shape), full(b_out.shape)],
        out_specs=[tile((tile_rows, F, A)), full(w_in.shape),
                   full(b_in.shape), full(w_out.shape), full(b_out.shape)],
    )
    kernel = functools.partial(
        _layer_only_bwd_kernel, n_heads=n_heads, rate=rate, train=train,
        n_rows=B, tile_rows=tile_rows)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, F, A), jnp.float32),
                   jax.ShapeDtypeStruct(w_in.shape, jnp.float32),
                   jax.ShapeDtypeStruct(b_in.shape, jnp.float32),
                   jax.ShapeDtypeStruct(w_out.shape, jnp.float32),
                   jax.ShapeDtypeStruct(b_out.shape, jnp.float32)],
        interpret=interpret,
    )(jnp.asarray([seed]).astype(jnp.int32).reshape(1), x, dy,
      w_in, b_in, w_out, b_out)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_attention_layer(x, w_in, b_in, w_out, b_out, seed,
                          n_heads, rate, train, tile_rows, interpret):
    """ONE attention layer [B, F, A] -> [B, F, A] as a Pallas kernel
    (2-head MHA over the field axis, softmax + attention-weight dropout,
    out-projection).  Residuals for backward are just the layer input —
    internals are recomputed in VMEM, flash-style."""
    return _run_layer_fwd(
        x, w_in, b_in, w_out, b_out, seed, n_heads=n_heads, rate=rate,
        train=train, tile_rows=tile_rows, interpret=interpret)


def _fal_fwd(x, w_in, b_in, w_out, b_out, seed,
             n_heads, rate, train, tile_rows, interpret):
    y = _run_layer_fwd(
        x, w_in, b_in, w_out, b_out, seed, n_heads=n_heads, rate=rate,
        train=train, tile_rows=tile_rows, interpret=interpret)
    return y, (x, w_in, b_in, w_out, b_out, seed)


def _fal_bwd(n_heads, rate, train, tile_rows, interpret, residuals, dy):
    x, w_in, b_in, w_out, b_out, seed = residuals
    dx, gw_in, gb_in, gw_out, gb_out = _run_layer_bwd(
        x, dy, w_in, b_in, w_out, b_out, seed, n_heads=n_heads, rate=rate,
        train=train, tile_rows=tile_rows, interpret=interpret)
    dseed = np.zeros((), jax.dtypes.float0)
    return dx, gw_in, gb_in, gw_out, gb_out, dseed


fused_attention_layer.defvjp(_fal_fwd, _fal_bwd)


# per-layer seed stride: tiles consume n_heads seeds each, layers must not
# overlap for any realistic tile count
_LAYER_SEED_STRIDE = 1 << 20


def fused_field_attention_layered(emb, flat_w, seed, n_layers, n_heads,
                                  rate, train, tile_rows, interpret):
    """The full aux-attention head with PER-LAYER kernels: XLA computes the
    atten-embedding projection and the V_res residual + ReLU (dense
    MXU-friendly matmuls it fuses well); each attention layer runs as one
    Pallas program.  Same parameter layout and eval math as
    :func:`fused_field_attention` / the jnp path."""
    B, F, D = emb.shape
    w_emb, b_emb, w_res, b_res = flat_w[:4]
    A = w_emb.shape[1]
    x = (_mm(emb.reshape(B * F, D), w_emb) + b_emb).reshape(B, F, A)
    for l in range(n_layers):
        w_in, b_in, w_out, b_out = flat_w[4 + 4 * l: 8 + 4 * l]
        x = fused_attention_layer(
            x, w_in, b_in, w_out, b_out, seed + l * _LAYER_SEED_STRIDE,
            n_heads, rate, train, tile_rows, interpret)
    res = (_mm(emb.reshape(B * F, D), w_res) + b_res).reshape(B, F, A)
    return jax.nn.relu(x + res)


def field_attention_reference(emb, flat_w, n_layers, n_heads):
    """jnp oracle of the train=False path (same math as
    nn.interactions.FieldAttention with dropout off)."""
    B, F, D = emb.shape
    w_emb, b_emb, w_res, b_res = flat_w[:4]
    A = w_emb.shape[1]
    hd = A // n_heads
    x = jnp.einsum("bfd,da->bfa", emb, w_emb) + b_emb
    for l in range(n_layers):
        w_in, b_in, w_out, b_out = flat_w[4 + 4 * l: 8 + 4 * l]
        qkv = jnp.einsum("bfa,ac->bfc", x, w_in) + b_in
        outs = []
        for h in range(n_heads):
            q = qkv[..., h * hd:(h + 1) * hd]
            k = qkv[..., A + h * hd:A + (h + 1) * hd]
            v = qkv[..., 2 * A + h * hd:2 * A + (h + 1) * hd]
            s = jnp.einsum("bfd,bgd->bfg", q, k) / math.sqrt(hd)
            a = jax.nn.softmax(s, axis=-1)
            outs.append(jnp.einsum("bfg,bgd->bfd", a, v))
        o = jnp.concatenate(outs, axis=-1)
        x = jnp.einsum("bfa,ao->bfo", o, w_out) + b_out
    res = jnp.einsum("bfd,da->bfa", emb, w_res) + b_res
    return jax.nn.relu(x + res)
