"""Bisect the fused_decay_adam slowdown: aliasing / g index_map / sumsq."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

V, D = 1627096, 16
R = V * D // 128
TILE = int(os.environ.get("TILE", "2048"))
N_TILES = (R + TILE - 1) // TILE


def timed(fn, *args, warmup=2, measure=16):
    for _ in range(warmup):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[-1])
    t0 = time.perf_counter()
    for _ in range(measure):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[-1])
    return (time.perf_counter() - t0) / measure


def build(alias=True, with_g=True, with_sumsq=True, g_min_map=True):
    def kernel(*refs):
        if with_g:
            p_ref, m_ref, v_ref, g_ref = refs[:4]
            outs = refs[4:]
        else:
            p_ref, m_ref, v_ref = refs[:3]
            outs = refs[3:]
        if with_sumsq:
            p_out, m_out, v_out, ss_out = outs
        else:
            p_out, m_out, v_out = outs
        i = pl.program_id(0)
        p = p_ref[:]
        u = 2e-5 * p
        if with_g:
            u = u + jnp.where(i < 1, g_ref[:], 0.0)
        m2 = 0.9 * m_ref[:] + 0.1 * u
        v2 = 0.99 * v_ref[:] + 0.01 * (u * u)
        p_out[:] = p - 1e-3 * (m2 / 0.1) / (jnp.sqrt(v2 / 0.01) + 1e-8)
        m_out[:] = m2
        v_out[:] = v2
        if with_sumsq:
            @pl.when(i == 0)
            def _():
                ss_out[:] = jnp.zeros((1, 1), jnp.float32)
            valid = (lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
                     + i * TILE < R)
            ss_out[:] = ss_out[:] + jnp.sum(
                jnp.where(valid, p * p, 0.0)).reshape(1, 1)

    block = pl.BlockSpec((TILE, 128), lambda i: (i, 0))
    if g_min_map:
        g_block = pl.BlockSpec((TILE, 128), lambda i: (jnp.minimum(i, 0), 0))
    else:
        g_block = pl.BlockSpec((TILE, 128), lambda i: (0, 0))
    in_specs = [block, block, block] + ([g_block] if with_g else [])
    fshape = jax.ShapeDtypeStruct((R, 128), jnp.float32)
    out_shape = [fshape, fshape, fshape]
    out_specs = [block, block, block]
    if with_sumsq:
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0)))
    aliases = {0: 0, 1: 1, 2: 2} if alias else {}

    @jax.jit
    def run(p, m, v, g):
        args = (p, m, v) + ((g,) if with_g else ())
        return pl.pallas_call(
            kernel,
            grid=(N_TILES,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases=aliases,
        )(*args)

    return run


def main():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(R, 128)).astype(np.float32) * 0.01)
    m = jnp.zeros((R, 128), jnp.float32)
    v = jnp.zeros((R, 128), jnp.float32)
    g = jnp.asarray(rng.normal(size=(TILE, 128)).astype(np.float32))

    for name, kw in [
        ("full (alias+g+sumsq)", dict()),
        ("no alias", dict(alias=False)),
        ("no g", dict(with_g=False)),
        ("no sumsq", dict(with_sumsq=False)),
        ("g fixed map", dict(g_min_map=False)),
        ("bare (no alias/g/sumsq)", dict(alias=False, with_g=False, with_sumsq=False)),
    ]:
        t = timed(build(**kw), p, m, v, g)
        print(f"{name:26s} {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
