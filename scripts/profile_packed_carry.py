"""Embedding-update-only scan: packed [V,3,D] carry (1 gather + 1 scatter)
vs separate (p, m, v) carries (1+3), at bench scale.  No model — isolates
the sweep + big-row correction cost under each layout."""

import time

import numpy as np
import jax
import jax.numpy as jnp

V, D = 1627120, 16
S = 8904          # small prefix rows
N_BIG = 1024      # deduped big-row count
K = 16


def timed(fn, *args, warmup=2, measure=8):
    r = fn(*args)
    for _ in range(warmup - 1):
        r = fn(*jax.tree.map(lambda x: x, args))
    np.asarray(jax.tree.leaves(r)[-1])
    t0 = time.perf_counter()
    for _ in range(measure):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[-1])
    return (time.perf_counter() - t0) / measure / K


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(np.sort(rng.choice(V, N_BIG, replace=False)).astype(np.int32))
    g_u = jnp.asarray(rng.normal(size=(N_BIG, D)).astype(np.float32))
    g_cat = jnp.asarray(rng.normal(size=(S, D)).astype(np.float32))
    b1, b2, lr, eps, coef = 0.9, 0.99, 1e-3, 1e-8, 2e-5

    p = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32) * 0.01)
    m = jnp.zeros((V, D), jnp.float32)
    v = jnp.zeros((V, D), jnp.float32)

    def sweep(p, m, v):
        gpad = jax.lax.pad(g_cat, jnp.float32(0), ((0, V - S, 0), (0, 0, 0)))
        u = coef * p + gpad
        m2 = b1 * m + (1 - b1) * u
        v2 = b2 * v + (1 - b2) * u * u
        p2 = p - lr * (m2 / 0.1) / (jnp.sqrt(v2 / 0.01) + eps)
        ss = jnp.sum(p * p)
        return p2, m2, v2, ss

    def correct(p, m, v):
        ub = g_u + coef * p
        mb = b1 * m + (1 - b1) * ub
        vb = b2 * v + (1 - b2) * ub * ub
        pb = p - lr * (mb / 0.1) / (jnp.sqrt(vb / 0.01) + eps)
        return pb, mb, vb

    @jax.jit
    def run_sep(p, m, v):
        def body(c, _):
            p, m, v = c
            p2, m2, v2, ss = sweep(p, m, v)
            pb, mb, vb = correct(
                jnp.take(p, ids, axis=0), jnp.take(m, ids, axis=0),
                jnp.take(v, ids, axis=0))
            kw = dict(mode="drop", unique_indices=True, indices_are_sorted=True)
            p2 = p2.at[ids].set(pb, **kw)
            m2 = m2.at[ids].set(mb, **kw)
            v2 = v2.at[ids].set(vb, **kw)
            return (p2, m2, v2), ss
        (p, m, v), sss = jax.lax.scan(body, (p, m, v), None, length=K)
        return sss[-1]

    t = timed(run_sep, p, m, v)
    print(f"separate p/m/v (1+3 scatters): {t*1e3:7.3f} ms/step")

    pmv = jnp.stack([p, m, v], axis=1)  # [V, 3, D]

    @jax.jit
    def run_packed(pmv):
        def body(pmv, _):
            p, m, v = pmv[:, 0], pmv[:, 1], pmv[:, 2]
            p2, m2, v2, ss = sweep(p, m, v)
            old = jnp.take(pmv, ids, axis=0)  # [N, 3, D]
            pb, mb, vb = correct(old[:, 0], old[:, 1], old[:, 2])
            pmv2 = jnp.stack([p2, m2, v2], axis=1)
            pmv2 = pmv2.at[ids].set(
                jnp.stack([pb, mb, vb], axis=1), mode="drop",
                unique_indices=True, indices_are_sorted=True)
            return pmv2, ss
        pmv, sss = jax.lax.scan(body, pmv, None, length=K)
        return sss[-1]

    t = timed(run_packed, pmv)
    print(f"packed [V,3,D] (1+1 scatter):  {t*1e3:7.3f} ms/step")

    @jax.jit
    def run_packed_inline(pmv):
        # keep everything in packed form end-to-end (no unstack/restack):
        # sweep computed directly on [V, 3, D] via broadcast selects
        sel = jnp.arange(3).reshape(1, 3, 1)
        bvec = jnp.asarray([0.0, b1, b2]).reshape(1, 3, 1)
        wvec = jnp.asarray([1.0, 1 - b1, 1 - b2]).reshape(1, 3, 1)

        def adam(pmv_rows, u):
            p = pmv_rows[:, 0]
            m2 = b1 * pmv_rows[:, 1] + (1 - b1) * u
            v2 = b2 * pmv_rows[:, 2] + (1 - b2) * u * u
            p2 = p - lr * (m2 / 0.1) / (jnp.sqrt(v2 / 0.01) + eps)
            return jnp.stack([p2, m2, v2], axis=1)

        def body(pmv, _):
            p = pmv[:, 0]
            gpad = jax.lax.pad(g_cat, jnp.float32(0), ((0, V - S, 0), (0, 0, 0)))
            u = coef * p + gpad
            ss = jnp.sum(p * p)
            m2 = b1 * pmv[:, 1] + (1 - b1) * u
            v2 = b2 * pmv[:, 2] + (1 - b2) * u * u
            p2 = p - lr * (m2 / 0.1) / (jnp.sqrt(v2 / 0.01) + eps)
            pmv2 = jnp.stack([p2, m2, v2], axis=1)
            old = jnp.take(pmv, ids, axis=0)
            ub = g_u + coef * old[:, 0]
            pmv2 = pmv2.at[ids].set(
                adam(old, ub), mode="drop", unique_indices=True,
                indices_are_sorted=True)
            return pmv2, ss
        pmv, sss = jax.lax.scan(body, pmv, None, length=K)
        return sss[-1]

    t = timed(run_packed_inline, pmv)
    print(f"packed inline variant:         {t*1e3:7.3f} ms/step")


if __name__ == "__main__":
    main()
