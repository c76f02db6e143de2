"""Serving throughput via tpurec.serve.Predictor on the real chip.

Ali-CCP-scale flagship (MMoE + aux attention, 1.37M-row itemid vocab),
eval forward at several batch sizes and table dtypes (f32 / bf16 / int8
per-row quantization).  The embedding gather dominates serve-time HBM
traffic, so the quantized tables are the lever.  Hard-synced timing.
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
K = 16


def main():
    import jax
    import jax.numpy as jnp

    from tpurec.config import Config, ModelConfig, TrainConfig
    from tpurec.serve import Predictor

    cfg = Config(
        model=ModelConfig(
            model="mmoe", embed_dim=16,
            mmoe_expert_dims=(256, 128, 64), mmoe_tower_dims=(64, 32),
            use_atten=True, atten_embed_dim=64, att_layer_num=3,
            att_head_num=2,
        ),
        train=TrainConfig(bs=512),
    )
    rng = np.random.default_rng(0)
    d2g = (np.arange(50) % N_TOWER).astype(np.int32)

    # random trained-like variables (bench measures compute, not AUC)
    base = Predictor(cfg, FIELD_DIMS, 50, DOMAIN_IDX, domain2group=d2g)
    variables = jax.jit(base.model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((2, len(FIELD_DIMS)), jnp.int32),
        group=jnp.zeros((2,), jnp.int32))
    params = jax.tree.map(np.asarray, variables["params"])
    mstate = {k: jax.tree.map(np.asarray, v)
              for k, v in variables.items() if k != "params"}

    for bs in (4096, 65536):
        xs = np.stack(
            [rng.integers(0, d, size=(K, bs)) for d in FIELD_DIMS], axis=2
        ).astype(np.int32)
        for dt in ("float32", "bfloat16", "int8"):
            pred = Predictor(cfg, FIELD_DIMS, 50, DOMAIN_IDX,
                             domain2group=d2g, batch_sizes=(bs,),
                             table_dtype=dt).load_variables(params, mstate)
            pred.warm()
            fn = pred._fn(bs)
            args = (pred._qtable, pred._scales, pred._rest,
                    pred._model_state, pred._d2g_dev)
            xdev = [jnp.asarray(xs[i]) for i in range(K)]
            r = None
            for x in xdev[:2]:
                r = fn(*args, x)
            np.asarray(r)
            t0 = time.perf_counter()
            for x in xdev:
                r = fn(*args, x)
            np.asarray(r)  # hard sync (chained through the last result only;
            # per-dispatch latency is amortized by K in-flight dispatches)
            dt_s = time.perf_counter() - t0
            qb, fb = pred.table_bytes()
            print(f"bs={bs:6d} table={dt:9s}: "
                  f"{bs * K / dt_s / 1e3:8.1f}k ex/s   "
                  f"table {qb / 1e6:7.1f}MB (f32 {fb / 1e6:.1f}MB)",
                  flush=True)


if __name__ == "__main__":
    main()
