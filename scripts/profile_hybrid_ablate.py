"""Ablate pieces of the real hybrid train step (bench config) to attribute cost.

Variants: full / no-small-fields / no-big-correction / no-sumsq / sweep-only /
no-optimizer.  Each toggles a piece of the exact one_step graph; differences
attribute step time to that piece under real fusion.
"""

import time

import numpy as np

FIELD_DIMS = (
    250000, 10, 10, 10, 10, 10, 10, 10, 10,
    1368287,
    50,
    5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4,
)
DOMAIN_IDX = 10
N_TOWER = 4
BS = 512
K = 16
THRESH = 8192


def main():
    import functools

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import optax

    from tpurec.config import ModelConfig, TrainConfig
    from tpurec.models import build_model
    from tpurec.train.reg import reg_coef_tree, regularization_loss
    from tpurec.train.sparse import SparseEmbedState, combine_duplicate_rows, init_sparse_opt_state
    from tpurec.train.step import TrainState, bce_with_logits, make_optimizer, select_tower

    mcfg = ModelConfig(
        model="mmoe", embed_dim=16,
        mmoe_expert_dims=(256, 128, 64), mmoe_tower_dims=(64, 32),
        use_atten=True, atten_embed_dim=64, att_layer_num=3, att_head_num=2,
    )
    tcfg = TrainConfig(bs=BS)
    model = build_model("mmoe", FIELD_DIMS, N_TOWER, DOMAIN_IDX, mcfg)

    rng = np.random.default_rng(0)
    xs = np.stack([rng.integers(0, d, size=(K, BS)) for d in FIELD_DIMS], axis=2).astype(np.int32)
    batches = {
        "x": jnp.asarray(xs),
        "y": jnp.asarray(rng.integers(0, 2, (K, BS)).astype(np.float32)),
        "group": jnp.asarray((xs[:, :, DOMAIN_IDX] % N_TOWER).astype(np.int32)),
        "mask": jnp.ones((K, BS), jnp.float32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batches["x"][0])
    params0 = variables["params"]
    model_state0 = {k: v for k, v in variables.items() if k != "params"}
    mutable_keys = tuple(model_state0.keys())
    reg_coefs = reg_coef_tree(params0, "mmoe", 1e-5, 1e-5, 1e-5)
    reg_coefs_rest = {k: v for k, v in reg_coefs.items() if k != "embedding"}
    tx = make_optimizer(tcfg)

    offsets = np.concatenate([[0], np.cumsum(FIELD_DIMS)[:-1]]).astype(np.int32)
    vocab = int(sum(FIELD_DIMS))
    small = [f for f, d in enumerate(FIELD_DIMS) if d <= THRESH]
    big = [f for f, d in enumerate(FIELD_DIMS) if d > THRESH]
    b1, b2, eps, lr, wd = tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps, tcfg.lr, tcfg.wd
    coef = 2.0 * 1e-5 + wd
    l2_reg_embedding = 1e-5

    def make(do_small=True, do_big=True, do_sumsq=True, do_sweep=True,
             small_mode="dus"):
        def loss_fn(rest_params, rows, model_state, batch, rng_):
            out, new_state = model.apply(
                {"params": rest_params, **model_state}, batch["x"],
                group=batch.get("group"), train=True, row_mask=batch.get("mask"),
                mutable=list(mutable_keys), rngs={"dropout": rng_},
                embed_rows=rows)
            logit = select_tower(out, batch["group"])
            loss = bce_with_logits(logit, batch["y"], batch.get("mask"))
            return loss + regularization_loss(rest_params, reg_coefs_rest), new_state

        def one_step(ts, batch_rng):
            batch, rng_ = batch_rng
            table = ts.params["embedding"]["table"]
            rest = {k: v for k, v in ts.params.items() if k != "embedding"}
            opt_rest, emb_opt = ts.opt_state
            x = batch["x"].astype(jnp.int32)
            B, F = x.shape
            D = table.shape[1]
            flat_ids = (x + offsets[None, :]).reshape(-1)
            rows = jnp.take(table, flat_ids, axis=0)
            (loss, new_state), (g_rest, g_rows) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(rest, rows, ts.model_state, batch, rng_)
            g_rows = g_rows.reshape(B, F, D)
            updates, new_opt_rest = tx.update(g_rest, opt_rest, rest)
            new_rest = optax.apply_updates(rest, updates)
            t = (ts.step + 1).astype(jnp.float32)
            bc1 = 1.0 - b1 ** t
            bc2 = 1.0 - b2 ** t
            if do_small and small_mode == "prefix":
                # current production scheme: pure decay sweep + contiguous
                # prefix-slice correction (simulated at rows [0, S))
                segs = []
                for f in small:
                    v_f = FIELD_DIMS[f]
                    oh = (x[:, f][:, None] == jnp.arange(v_f, dtype=jnp.int32)[None, :])
                    segs.append(jax.lax.dot_general(
                        oh.astype(g_rows.dtype), g_rows[:, f, :],
                        (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST))
                g_cat = jnp.concatenate(segs, axis=0)
                S = g_cat.shape[0]
                sumsq = jnp.sum(table * table) if do_sumsq else jnp.float32(0)
                u_d = coef * table
                m2 = b1 * emb_opt.m + (1.0 - b1) * u_d
                v2 = b2 * emb_opt.v + (1.0 - b2) * (u_d * u_d)
                p2 = table - lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
                p_s = jax.lax.slice_in_dim(table, 0, S, axis=0)
                m_s = jax.lax.slice_in_dim(emb_opt.m, 0, S, axis=0)
                v_s = jax.lax.slice_in_dim(emb_opt.v, 0, S, axis=0)
                u_s = coef * p_s + g_cat
                m2s = b1 * m_s + (1.0 - b1) * u_s
                v2s = b2 * v_s + (1.0 - b2) * (u_s * u_s)
                p2s = p_s - lr * (m2s / bc1) / (jnp.sqrt(v2s / bc2) + eps)
                m2 = jax.lax.dynamic_update_slice_in_dim(m2, m2s, 0, axis=0)
                v2 = jax.lax.dynamic_update_slice_in_dim(v2, v2s, 0, axis=0)
                p2 = jax.lax.dynamic_update_slice_in_dim(p2, p2s, 0, axis=0)
                if do_big:
                    big_ids = (x[:, big] + offsets[None, big]).reshape(-1)
                    g_big = g_rows[:, big, :].reshape(-1, D)
                    id_u, g_u, _ = combine_duplicate_rows(big_ids, g_big, vocab)
                    p_old = jnp.take(table, id_u, axis=0, mode="clip")
                    m_old = jnp.take(emb_opt.m, id_u, axis=0, mode="clip")
                    v_old = jnp.take(emb_opt.v, id_u, axis=0, mode="clip")
                    ub = g_u + coef * p_old
                    mb = b1 * m_old + (1.0 - b1) * ub
                    vb = b2 * v_old + (1.0 - b2) * (ub * ub)
                    pb = p_old - lr * (mb / bc1) / (jnp.sqrt(vb / bc2) + eps)
                    p2 = p2.at[id_u].set(pb, mode="drop")
                    m2 = m2.at[id_u].set(mb, mode="drop")
                    v2 = v2.at[id_u].set(vb, mode="drop")
                new_params = {**new_rest, "embedding": {"table": p2}}
                new_ts = ts.replace(
                    params=new_params,
                    opt_state=(new_opt_rest, SparseEmbedState(m=m2, v=v2)),
                    model_state=new_state, step=ts.step + 1)
                return new_ts, loss + l2_reg_embedding * sumsq
            if do_small and small_mode == "mv_pack":
                # m,v packed along the LAST dim as one [V, 2D] array:
                # 2 scatters / 2 gathers instead of 3, same HBM bytes
                segs = []
                for f in small:
                    v_f = FIELD_DIMS[f]
                    oh = (x[:, f][:, None] == jnp.arange(v_f, dtype=jnp.int32)[None, :])
                    segs.append(jax.lax.dot_general(
                        oh.astype(g_rows.dtype), g_rows[:, f, :],
                        (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST))
                g_cat = jnp.concatenate(segs, axis=0)
                S = g_cat.shape[0]
                Vp = table.shape[0]
                gpad = jax.lax.pad(g_cat, jnp.float32(0), ((0, Vp - S, 0), (0, 0, 0)))
                sumsq = jnp.sum(table * table)
                mv = ts.opt_state[1]  # [V, 2D] in this variant
                u = coef * table + gpad
                m2 = b1 * mv[:, :D] + (1.0 - b1) * u
                v2 = b2 * mv[:, D:] + (1.0 - b2) * (u * u)
                p2 = table - lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
                mv2 = jnp.concatenate([m2, v2], axis=1)
                big_ids = (x[:, big] + offsets[None, big]).reshape(-1)
                g_big = g_rows[:, big, :].reshape(-1, D)
                eq = (big_ids[:, None] == big_ids[None, :])
                g_sum = jax.lax.dot_general(
                    eq.astype(jnp.float32), g_big,
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST)
                p_old = jnp.take(table, big_ids, axis=0)
                mv_old = jnp.take(mv, big_ids, axis=0)
                ub = g_sum + coef * p_old
                mb = b1 * mv_old[:, :D] + (1.0 - b1) * ub
                vb = b2 * mv_old[:, D:] + (1.0 - b2) * (ub * ub)
                pb = p_old - lr * (mb / bc1) / (jnp.sqrt(vb / bc2) + eps)
                p2 = p2.at[big_ids].set(pb)
                mv2 = mv2.at[big_ids].set(jnp.concatenate([mb, vb], axis=1))
                new_params = {**new_rest, "embedding": {"table": p2}}
                new_ts = ts.replace(
                    params=new_params, opt_state=(new_opt_rest, mv2),
                    model_state=new_state, step=ts.step + 1)
                return new_ts, loss + l2_reg_embedding * sumsq
            if do_small and small_mode in ("pad_hints", "eq_dedup"):
                segs = []
                for f in small:
                    v_f = FIELD_DIMS[f]
                    oh = (x[:, f][:, None] == jnp.arange(v_f, dtype=jnp.int32)[None, :])
                    segs.append(jax.lax.dot_general(
                        oh.astype(g_rows.dtype), g_rows[:, f, :],
                        (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST))
                g_cat = jnp.concatenate(segs, axis=0)
                S = g_cat.shape[0]
                Vp = table.shape[0]
                gpad = jax.lax.pad(g_cat, jnp.float32(0), ((0, Vp - S, 0), (0, 0, 0)))
                sumsq = jnp.sum(table * table)
                big_ids = (x[:, big] + offsets[None, big]).reshape(-1)
                g_big = g_rows[:, big, :].reshape(-1, D)
                id_u, g_u, _ = combine_duplicate_rows(big_ids, g_big, Vp)
                if small_mode == "eq_dedup":
                    u = coef * table + gpad
                    m2 = b1 * emb_opt.m + (1.0 - b1) * u
                    v2 = b2 * emb_opt.v + (1.0 - b2) * (u * u)
                    p2 = table - lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
                    # duplicate combining WITHOUT sort: equality matmul gives
                    # each occurrence its id's total grad; .set then writes
                    # identical values for duplicates (idempotent)
                    eq = (big_ids[:, None] == big_ids[None, :])
                    g_sum = jax.lax.dot_general(
                        eq.astype(jnp.float32), g_big,
                        (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST)
                    p_old = jnp.take(table, big_ids, axis=0)
                    m_old = jnp.take(emb_opt.m, big_ids, axis=0)
                    v_old = jnp.take(emb_opt.v, big_ids, axis=0)
                    ub = g_sum + coef * p_old
                    mb = b1 * m_old + (1.0 - b1) * ub
                    vb = b2 * v_old + (1.0 - b2) * (ub * ub)
                    pb = p_old - lr * (mb / bc1) / (jnp.sqrt(vb / bc2) + eps)
                    p2f = p2.at[big_ids].set(pb)
                    m2f = m2.at[big_ids].set(mb)
                    v2f = v2.at[big_ids].set(vb)
                elif True:
                    u = coef * table + gpad
                    m2 = b1 * emb_opt.m + (1.0 - b1) * u
                    v2 = b2 * emb_opt.v + (1.0 - b2) * (u * u)
                    p2 = table - lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
                    p_old = jnp.take(table, id_u, axis=0, mode="clip")
                    m_old = jnp.take(emb_opt.m, id_u, axis=0, mode="clip")
                    v_old = jnp.take(emb_opt.v, id_u, axis=0, mode="clip")
                    ub = g_u + coef * p_old
                    mb = b1 * m_old + (1.0 - b1) * ub
                    vb = b2 * v_old + (1.0 - b2) * (ub * ub)
                    pb = p_old - lr * (mb / bc1) / (jnp.sqrt(vb / bc2) + eps)
                    p2f = p2.at[id_u].set(pb, mode="drop", unique_indices=True,
                                          indices_are_sorted=True)
                    m2f = m2.at[id_u].set(mb, mode="drop", unique_indices=True,
                                          indices_are_sorted=True)
                    v2f = v2.at[id_u].set(vb, mode="drop", unique_indices=True,
                                          indices_are_sorted=True)
                new_params = {**new_rest, "embedding": {"table": p2f}}
                new_ts = ts.replace(
                    params=new_params,
                    opt_state=(new_opt_rest, SparseEmbedState(m=m2f, v=v2f)),
                    model_state=new_state, step=ts.step + 1)
                return new_ts, loss + l2_reg_embedding * sumsq
            if do_small and small_mode == "pad":
                segs = []
                for f in small:
                    v_f = FIELD_DIMS[f]
                    oh = (x[:, f][:, None] == jnp.arange(v_f, dtype=jnp.int32)[None, :])
                    segs.append(jax.lax.dot_general(
                        oh.astype(g_rows.dtype), g_rows[:, f, :],
                        (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST))
                g_cat = jnp.concatenate(segs, axis=0)
                S = g_cat.shape[0]
                u = coef * table + jax.lax.pad(
                    g_cat, jnp.float32(0),
                    ((0, table.shape[0] - S, 0), (0, 0, 0)))
            else:
                u = coef * table
            if do_small and small_mode == "dus":
                for f in small:
                    v_f, off = FIELD_DIMS[f], int(offsets[f])
                    oh = (x[:, f][:, None] == jnp.arange(v_f, dtype=jnp.int32)[None, :])
                    g_f = jax.lax.dot_general(
                        oh.astype(g_rows.dtype), g_rows[:, f, :],
                        (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST)
                    u = u.at[off:off + v_f].add(g_f)
            elif do_small and small_mode == "concat":
                segs = []
                for f in range(F):
                    v_f = FIELD_DIMS[f]
                    if f in small:
                        oh = (x[:, f][:, None] == jnp.arange(v_f, dtype=jnp.int32)[None, :])
                        segs.append(jax.lax.dot_general(
                            oh.astype(g_rows.dtype), g_rows[:, f, :],
                            (((0,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST))
                    else:
                        segs.append(jnp.zeros((v_f, D), g_rows.dtype))
                u = u + jnp.concatenate(segs, axis=0)
            elif do_small and small_mode == "single_dus":
                # simulates small-first field reorder: all small-field grads
                # land in one contiguous region [0, S) -> ONE dus add
                segs = []
                for f in small:
                    v_f = FIELD_DIMS[f]
                    oh = (x[:, f][:, None] == jnp.arange(v_f, dtype=jnp.int32)[None, :])
                    segs.append(jax.lax.dot_general(
                        oh.astype(g_rows.dtype), g_rows[:, f, :],
                        (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST))
                g_cat = jnp.concatenate(segs, axis=0)  # [S, D], S ~ 8900
                u = u.at[0:g_cat.shape[0]].add(g_cat)
            elif do_small and small_mode == "one_matmul":
                # one [B, S_tot] one-hot over the concatenated small vocabs
                col_off = []
                acc = 0
                for f in small:
                    col_off.append(acc)
                    acc += FIELD_DIMS[f]
                s_tot = acc
                cols = jnp.stack(
                    [x[:, f] + col_off[i] for i, f in enumerate(small)], axis=1
                )  # [B, n_small]
                oh = (cols[:, :, None] ==
                      jnp.arange(s_tot, dtype=jnp.int32)[None, None, :])
                oh = jnp.any(oh, axis=1) if False else oh
                g_small_in = g_rows[:, small, :]  # [B, n_small, D]
                g_cat = jax.lax.dot_general(
                    oh.reshape(B * len(small), s_tot).astype(g_rows.dtype),
                    g_small_in.reshape(B * len(small), D),
                    (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST)  # [s_tot, D]
                segs = []
                pos = 0
                si = 0
                for f in range(F):
                    v_f = FIELD_DIMS[f]
                    if f in small:
                        segs.append(jax.lax.dynamic_slice_in_dim(g_cat, col_off[si], v_f, 0))
                        si += 1
                    else:
                        segs.append(jnp.zeros((v_f, D), g_rows.dtype))
                u = u + jnp.concatenate(segs, axis=0)
            sumsq = jnp.sum(table * table) if do_sumsq else jnp.float32(0)
            if do_sweep:
                m2 = b1 * emb_opt.m + (1.0 - b1) * u
                v2 = b2 * emb_opt.v + (1.0 - b2) * (u * u)
                p2 = table - lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            else:
                m2, v2, p2 = emb_opt.m, emb_opt.v, table + u[0, 0] * 0
            if do_big:
                big_ids = (x[:, big] + offsets[None, big]).reshape(-1)
                g_big = g_rows[:, big, :].reshape(-1, D)
                id_u, g_u, _ = combine_duplicate_rows(big_ids, g_big, vocab)
                p_old = jnp.take(table, id_u, axis=0, mode="clip")
                m_old = jnp.take(emb_opt.m, id_u, axis=0, mode="clip")
                v_old = jnp.take(emb_opt.v, id_u, axis=0, mode="clip")
                ub = g_u + coef * p_old
                mb = b1 * m_old + (1.0 - b1) * ub
                vb = b2 * v_old + (1.0 - b2) * (ub * ub)
                pb = p_old - lr * (mb / bc1) / (jnp.sqrt(vb / bc2) + eps)
                p2 = p2.at[id_u].set(pb, mode="drop")
                m2 = m2.at[id_u].set(mb, mode="drop")
                v2 = v2.at[id_u].set(vb, mode="drop")
            new_params = {**new_rest, "embedding": {"table": p2}}
            new_ts = ts.replace(
                params=new_params, opt_state=(new_opt_rest, SparseEmbedState(m=m2, v=v2)),
                model_state=new_state, step=ts.step + 1)
            return new_ts, loss + l2_reg_embedding * sumsq

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scan_steps(ts, batches, rngs):
            return jax.lax.scan(one_step, ts, (batches, rngs))

        return scan_steps

    def run(name, **kw):
        scan_steps = make(**kw)
        if kw.get("small_mode") == "mv_pack":
            tbl = params0["embedding"]["table"]
            opt = (tx.init({k: v for k, v in params0.items() if k != "embedding"}),
                   jnp.zeros((tbl.shape[0], 2 * tbl.shape[1]), jnp.float32))
        else:
            opt = init_sparse_opt_state(params0, tx)
        state = TrainState(
            params=jax.tree.map(jnp.copy, params0),
            opt_state=opt,
            model_state=jax.tree.map(jnp.copy, model_state0),
            step=jnp.zeros((), jnp.int32))
        for i in range(2):
            state, losses = scan_steps(state, batches, jax.random.split(jax.random.PRNGKey(i), K))
        np.asarray(losses)
        t0 = time.perf_counter()
        for i in range(8):
            state, losses = scan_steps(state, batches, jax.random.split(jax.random.PRNGKey(i + 9), K))
        np.asarray(losses)
        dt = (time.perf_counter() - t0) / 8 / K
        print(f"{name:26s} {dt*1e3:8.3f} ms/step  ({BS/dt:,.0f} ex/s)")

    run("pad + eq dedup", small_mode="eq_dedup")
    run("eq dedup + mv pack", small_mode="mv_pack")
    run("pad, no big corr", small_mode="pad", do_big=False)


if __name__ == "__main__":
    main()
