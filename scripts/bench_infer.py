"""Inference (serving) throughput of the flagship model on the real chip.

Eval-mode forward (running BN stats, no dropout) at several batch sizes,
f32 params and bf16-cast activations paths, hard-synced timing."""

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


def main():
    import jax
    import jax.numpy as jnp

    from tpurec.config import ModelConfig
    from tpurec.models import build_model

    mcfg = ModelConfig(
        model="mmoe", embed_dim=16,
        mmoe_expert_dims=(256, 128, 64), mmoe_tower_dims=(64, 32),
        use_atten=True, atten_embed_dim=64, att_layer_num=3, att_head_num=2,
    )
    model = build_model("mmoe", FIELD_DIMS, N_TOWER, DOMAIN_IDX, mcfg)
    rng = np.random.default_rng(0)

    x0 = jnp.asarray(np.stack(
        [rng.integers(0, d, size=512) for d in FIELD_DIMS], axis=1
    ).astype(np.int32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    def predict(variables, x):
        out = model.apply(variables, x, train=False)
        groups = x[:, DOMAIN_IDX] % N_TOWER
        logit = jnp.take_along_axis(out, groups[:, None], axis=1)[:, 0]
        return jax.nn.sigmoid(logit)

    K = 16

    @jax.jit
    def predict_k(variables, xs):
        # K batches in one dispatch; device-side step time, one scalar fetch
        return jax.lax.scan(
            lambda c, x: (c + jnp.sum(predict(variables, x)), None), 0.0, xs
        )[0]

    for bs in (512, 4096, 16384, 65536):
        xs = jnp.asarray(np.stack(
            [rng.integers(0, d, size=(K, bs)) for d in FIELD_DIMS], axis=2
        ).astype(np.int32))
        s = float(predict_k(variables, xs))
        t0 = time.perf_counter()
        for _ in range(8):
            s = float(predict_k(variables, xs))
        dt = (time.perf_counter() - t0) / 8 / K
        print(f"bs={bs:6d}: {dt*1e3:8.3f} ms/batch  ({bs/dt:12,.0f} examples/sec)  [{s/K:.1f}]")


if __name__ == "__main__":
    main()
