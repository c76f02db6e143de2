"""Standalone timing of fused_decay_adam vs the XLA sweep at bench scale."""

import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from tpurec.ops.fused_adam_pallas import fused_decay_adam

V, D, S = 1627096, 16, 8904  # padded bench vocab / prefix


def timed(fn, *args, warmup=2, measure=16):
    for _ in range(warmup):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[-1])
    t0 = time.perf_counter()
    for _ in range(measure):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[-1])
    return (time.perf_counter() - t0) / measure


def main():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32) * 0.01)
    m = jnp.zeros((V, D), jnp.float32)
    v = jnp.zeros((V, D), jnp.float32)
    g = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32))
    kw = dict(lr=1e-3, b1=0.9, b2=0.99, eps=1e-8, coef=2e-5)

    for tile in (512, 1024, 2048, 4096, 8192):
        f = functools.partial(fused_decay_adam, tile=tile, **kw)
        t = timed(f, p, m, v, g, 3)
        print(f"pallas tile={tile:5d}:  {t*1e3:7.3f} ms")

    @jax.jit
    def xla_sweep(p, m, v, g):
        u = 2e-5 * p
        u = u.at[:S].add(g)
        m2 = 0.9 * m + 0.1 * u
        v2 = 0.99 * v + 0.01 * u * u
        p2 = p - 1e-3 * (m2 / 0.1) / (jnp.sqrt(v2 / 0.01) + 1e-8)
        return p2, m2, v2, jnp.sum(p * p)

    t = timed(xla_sweep, p, m, v, g)
    print(f"xla sweep:          {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
