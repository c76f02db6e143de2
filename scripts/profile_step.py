"""Ablation profile of the flagship (bench.py) train step on the real chip.

Times, per step at bs=512 on the bench config (MMoE, Ali-CCP-scale schema):
  - forward only
  - forward+backward (grads wrt rest params + gathered rows; no optimizer)
  - forward+backward without the attention aux head
  - the dense optimizer sweep alone (hybrid update's table pass)
  - the full hybrid step (bench baseline)

All timings hard-synced by fetching a scalar to host.
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


def timed(fn, *args, warmup=2, measure=8, sync=lambda r: np.asarray(r)):
    for _ in range(warmup):
        r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(measure):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / measure


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from tpurec.config import ModelConfig, TrainConfig
    from tpurec.models import build_model
    from tpurec.train.hybrid import make_hybrid_train_step
    from tpurec.train.reg import reg_coef_tree, regularization_loss
    from tpurec.train.sparse import init_sparse_opt_state
    from tpurec.train.step import TrainState, make_optimizer, bce_with_logits, select_tower

    tcfg = TrainConfig(bs=BS)
    rng = np.random.default_rng(0)
    xs = np.stack([rng.integers(0, d, size=(K, BS)) for d in FIELD_DIMS], axis=2).astype(np.int32)
    batches = {
        "x": jnp.asarray(xs),
        "y": jnp.asarray(rng.integers(0, 2, (K, BS)).astype(np.float32)),
        "group": jnp.asarray((xs[:, :, DOMAIN_IDX] % N_TOWER).astype(np.int32)),
        "mask": jnp.ones((K, BS), jnp.float32),
    }

    def setup(use_atten=True):
        mcfg = ModelConfig(
            model="mmoe", embed_dim=16,
            mmoe_expert_dims=(256, 128, 64), mmoe_tower_dims=(64, 32),
            use_atten=use_atten, atten_embed_dim=64, att_layer_num=3, att_head_num=2,
        )
        model = build_model("mmoe", FIELD_DIMS, N_TOWER, DOMAIN_IDX, mcfg)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), batches["x"][0])
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return model, params, model_state

    model, params, model_state = setup()
    mutable_keys = tuple(model_state.keys())
    offsets = jnp.asarray(
        np.concatenate([[0], np.cumsum(FIELD_DIMS)[:-1]]).astype(np.int32))

    batch0 = {k: v[0] for k, v in batches.items()}

    # --- forward only (train mode, K-scan to amortize dispatch)
    def fwd_loss(params, model_state, batch, r):
        out, _ = model.apply(
            {"params": params, **model_state}, batch["x"], group=batch["group"],
            train=True, row_mask=batch["mask"], mutable=list(mutable_keys),
            rngs={"dropout": r})
        return bce_with_logits(select_tower(out, batch["group"]), batch["y"], batch["mask"])

    @jax.jit
    def scan_fwd(params, model_state, batches, rngs):
        def body(c, br):
            b, r = br
            return c + fwd_loss(params, model_state, b, r), None
        out, _ = jax.lax.scan(body, 0.0, (batches, rngs))
        return out

    rngs = jax.random.split(jax.random.PRNGKey(1), K)
    t = timed(scan_fwd, params, model_state, batches, rngs)
    print(f"fwd only:            {t/K*1e3:8.3f} ms/step")

    # --- forward+backward (rest + rows grads, like hybrid), no optimizer
    rest = {k: v for k, v in params.items() if k != "embedding"}
    table = params["embedding"]["table"]

    def fwdbwd(rest, table, model_state, batch, r):
        x = batch["x"].astype(jnp.int32)
        flat_ids = (x + offsets[None, :]).reshape(-1)
        rows = jnp.take(table, flat_ids, axis=0)

        def loss_fn(rest, rows):
            out, _ = model.apply(
                {"params": rest, **model_state}, batch["x"], group=batch["group"],
                train=True, row_mask=batch["mask"], mutable=list(mutable_keys),
                rngs={"dropout": r}, embed_rows=rows)
            return bce_with_logits(select_tower(out, batch["group"]), batch["y"], batch["mask"])

        loss, (g_rest, g_rows) = jax.value_and_grad(loss_fn, argnums=(0, 1))(rest, rows)
        return loss, g_rest, g_rows

    @jax.jit
    def scan_fwdbwd(rest, table, model_state, batches, rngs):
        def body(c, br):
            b, r = br
            loss, g_rest, g_rows = fwdbwd(rest, table, model_state, b, r)
            return c + loss + jnp.sum(g_rows[0]) + sum(jnp.sum(l) for l in jax.tree.leaves(g_rest)), None
        out, _ = jax.lax.scan(body, 0.0, (batches, rngs))
        return out

    t = timed(scan_fwdbwd, rest, table, model_state, batches, rngs)
    print(f"fwd+bwd:             {t/K*1e3:8.3f} ms/step")

    # --- fwd+bwd without attention aux
    model_na, params_na, state_na = setup(use_atten=False)
    rest_na = {k: v for k, v in params_na.items() if k != "embedding"}
    table_na = params_na["embedding"]["table"]
    mk_na = tuple(state_na.keys())

    def fwdbwd_na(rest, table, model_state, batch, r):
        x = batch["x"].astype(jnp.int32)
        flat_ids = (x + offsets[None, :]).reshape(-1)
        rows = jnp.take(table, flat_ids, axis=0)

        def loss_fn(rest, rows):
            out, _ = model_na.apply(
                {"params": rest, **model_state}, batch["x"], group=batch["group"],
                train=True, row_mask=batch["mask"], mutable=list(mk_na),
                rngs={"dropout": r}, embed_rows=rows)
            return bce_with_logits(select_tower(out, batch["group"]), batch["y"], batch["mask"])

        loss, (g_rest, g_rows) = jax.value_and_grad(loss_fn, argnums=(0, 1))(rest, rows)
        return loss, g_rest, g_rows

    @jax.jit
    def scan_fwdbwd_na(rest, table, model_state, batches, rngs):
        def body(c, br):
            b, r = br
            loss, g_rest, g_rows = fwdbwd_na(rest, table, model_state, b, r)
            return c + loss + jnp.sum(g_rows[0]) + sum(jnp.sum(l) for l in jax.tree.leaves(g_rest)), None
        out, _ = jax.lax.scan(body, 0.0, (batches, rngs))
        return out

    t = timed(scan_fwdbwd_na, rest_na, table_na, state_na, batches, rngs)
    print(f"fwd+bwd no-atten:    {t/K*1e3:8.3f} ms/step")

    # --- dense optimizer sweep alone (the hybrid table pass, no correction)
    b1, b2 = tcfg.adam_b1, tcfg.adam_b2
    coef = 2e-5 + tcfg.wd

    @jax.jit
    def sweeps(table, m, v):
        def body(c, _):
            table, m, v = c
            u = coef * table
            m2 = b1 * m + (1 - b1) * u
            v2 = b2 * v + (1 - b2) * (u * u)
            p2 = table - tcfg.lr * (m2 / 0.1) / (jnp.sqrt(v2 / 0.01) + 1e-8)
            return (p2, m2, v2), None
        (table, m, v), _ = jax.lax.scan(body, (table, m, v), None, length=K)
        return table[0, 0]

    m = jnp.zeros_like(table)
    v = jnp.zeros_like(table)
    t = timed(sweeps, table, m, v)
    print(f"dense table sweep:   {t/K*1e3:8.3f} ms/step")

    # --- full hybrid step (bench baseline)
    reg = reg_coef_tree(params, "mmoe", 1e-5, 1e-5, 1e-5)
    tx = make_optimizer(tcfg)
    state = TrainState(
        params=params, opt_state=init_sparse_opt_state(params, tx),
        model_state=model_state, step=jnp.zeros((), jnp.int32))
    scan_steps, _ = make_hybrid_train_step(
        model, tcfg, reg, multi_tower=True, mutable_keys=mutable_keys,
        l2_reg_embedding=1e-5, optimizer=tx, scan_k=K)

    def run(state, batches, rngs):
        s2, losses = scan_steps(state, batches, rngs)
        return s2, losses

    # hybrid donates state: rebuild each call is unfair; time the chain like bench
    for _ in range(2):
        state, losses = scan_steps(state, batches, jax.random.split(jax.random.PRNGKey(2), K))
    np.asarray(losses)
    t0 = time.perf_counter()
    for _ in range(8):
        state, losses = scan_steps(state, batches, jax.random.split(jax.random.PRNGKey(3), K))
    np.asarray(losses)
    t = (time.perf_counter() - t0) / 8
    print(f"full hybrid step:    {t/K*1e3:8.3f} ms/step  ({BS*K/t:,.0f} ex/s)")


if __name__ == "__main__":
    main()
