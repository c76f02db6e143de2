"""Micro-profile of the hybrid embedding-update sub-components at bench shapes."""

import time

import numpy as np

FIELD_DIMS = (
    250000, 10, 10, 10, 10, 10, 10, 10, 10,
    1368287,
    50,
    5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4,
)
BS = 512
K = 16
THRESH = 8192


def timed(fn, *args, warmup=2, measure=8):
    for _ in range(warmup):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(measure):
        r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / measure / K


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpurec.train.sparse import combine_duplicate_rows  # noqa: E402


def main():
    D = 16
    V = int(sum(FIELD_DIMS))
    offsets = np.concatenate([[0], np.cumsum(FIELD_DIMS)[:-1]]).astype(np.int32)
    small = [f for f, d in enumerate(FIELD_DIMS) if d <= THRESH]
    big = [f for f, d in enumerate(FIELD_DIMS) if d > THRESH]

    rng = np.random.default_rng(0)
    xs = rng.integers(0, 10, size=(K, BS, len(FIELD_DIMS))).astype(np.int32)
    for f, d in enumerate(FIELD_DIMS):
        xs[:, :, f] = rng.integers(0, d, size=(K, BS))
    x_all = jnp.asarray(xs)
    g_rows_all = jnp.asarray(rng.normal(size=(K, BS, len(FIELD_DIMS), D)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32) * 0.01)
    m0 = jnp.zeros_like(table)
    v0 = jnp.zeros_like(table)

    # --- small-field one-hot matmuls + slice adds
    @jax.jit
    def small_block(table, x_all, g_rows_all):
        def body(c, xg):
            x, g_rows = xg
            u = 2e-5 * table
            for f in small:
                v_f, off = FIELD_DIMS[f], int(offsets[f])
                oh = (x[:, f][:, None] == jnp.arange(v_f, dtype=jnp.int32)[None, :])
                g_f = jax.lax.dot_general(
                    oh.astype(g_rows.dtype), g_rows[:, f, :],
                    (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST)
                u = u.at[off:off + v_f].add(g_f)
            return c + u[0, 0], None
        out, _ = jax.lax.scan(body, 0.0, (x_all, g_rows_all))
        return out

    t = timed(small_block, table, x_all, g_rows_all)
    print(f"small-field block:     {t*1e3:8.3f} ms/step")

    # --- big-field dedup + 3 gathers + 3 scatters (no sweep)
    @jax.jit
    def big_block(table, m, v, x_all, g_rows_all):
        def body(c, xg):
            table, m, v = c
            x, g_rows = xg
            big_ids = (x[:, big] + offsets[None, big]).reshape(-1)
            g_big = g_rows[:, big, :].reshape(-1, D)
            id_u, g_u, _ = combine_duplicate_rows(big_ids, g_big, V)
            p_old = jnp.take(table, id_u, axis=0, mode="clip")
            m_old = jnp.take(m, id_u, axis=0, mode="clip")
            v_old = jnp.take(v, id_u, axis=0, mode="clip")
            ub = g_u + 2e-5 * p_old
            mb = 0.9 * m_old + 0.1 * ub
            vb = 0.99 * v_old + 0.01 * (ub * ub)
            pb = p_old - 1e-3 * mb / (jnp.sqrt(vb) + 1e-8)
            table = table.at[id_u].set(pb, mode="drop")
            m = m.at[id_u].set(mb, mode="drop")
            v = v.at[id_u].set(vb, mode="drop")
            return (table, m, v), None
        (table, m, v), _ = jax.lax.scan(body, (table, m, v), (x_all, g_rows_all))
        return table[0, 0]

    t = timed(big_block, table, m0, v0, x_all, g_rows_all)
    print(f"big-field correction:  {t*1e3:8.3f} ms/step")

    # --- dedup alone
    @jax.jit
    def dedup_block(x_all, g_rows_all):
        def body(c, xg):
            x, g_rows = xg
            big_ids = (x[:, big] + offsets[None, big]).reshape(-1)
            g_big = g_rows[:, big, :].reshape(-1, D)
            id_u, g_u, _ = combine_duplicate_rows(big_ids, g_big, V)
            return c + g_u[0, 0] + id_u[0], None
        out, _ = jax.lax.scan(body, 0.0, (x_all, g_rows_all))
        return out

    t = timed(dedup_block, x_all, g_rows_all)
    print(f"  dedup alone:         {t*1e3:8.3f} ms/step")

    # --- scatters alone (3x set of 1024 deduped rows)
    ids_fixed = jnp.asarray(
        np.sort(rng.choice(V, size=1024, replace=False)).astype(np.int32))
    rows_fixed = jnp.asarray(rng.normal(size=(1024, D)).astype(np.float32))

    @jax.jit
    def scatter_block(table, m, v, ids, rows):
        def body(c, _):
            table, m, v = c
            table = table.at[ids].set(rows, mode="drop", unique_indices=True,
                                      indices_are_sorted=True)
            m = m.at[ids].set(rows, mode="drop", unique_indices=True,
                              indices_are_sorted=True)
            v = v.at[ids].set(rows, mode="drop", unique_indices=True,
                              indices_are_sorted=True)
            return (table, m, v), None
        (table, m, v), _ = jax.lax.scan(body, (table, m, v), None, length=K)
        return table[0, 0]

    t = timed(scatter_block, table, m0, v0, ids_fixed, rows_fixed)
    print(f"  3x scatter-set 1024: {t*1e3:8.3f} ms/step")

    # --- sumsq fused with u-pass vs separate
    @jax.jit
    def sweep_plus_sumsq(table):
        def body(c, _):
            u = 2e-5 * table
            s = jnp.sum(table * table)
            return c + u[0, 0] + s, None
        out, _ = jax.lax.scan(body, 0.0, None, length=K)
        return out

    t = timed(sweep_plus_sumsq, table)
    print(f"  u-pass + sumsq read: {t*1e3:8.3f} ms/step")


if __name__ == "__main__":
    main()
