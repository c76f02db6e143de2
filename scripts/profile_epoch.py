"""End-to-end Trainer epoch throughput at bench scale on the real chip:
is the host input pipeline keeping up with the ~230k ex/s step ceiling?"""

import time

import numpy as np


FIELD_DIMS = (
    250000, 10, 10, 10, 10, 10, 10, 10, 10,
    1368287,
    50,
    5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4,
)
DOMAIN_IDX = 10
N_ROWS = 1_000_000


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    from tpurec.config import Config, ModelConfig, TrainConfig
    from tpurec.train import Trainer

    rng = np.random.default_rng(0)
    X = np.stack([rng.integers(0, d, size=N_ROWS) for d in FIELD_DIMS],
                 axis=1).astype(np.int32)
    y = rng.integers(0, 2, N_ROWS).astype(np.float32)

    cfg = Config(
        model=ModelConfig(model="mmoe", embed_dim=16,
                          mmoe_expert_dims=(256, 128, 64),
                          mmoe_tower_dims=(64, 32), use_atten=True,
                          atten_embed_dim=64, att_layer_num=3, att_head_num=2),
        train=TrainConfig(bs=512, epoch=1, seed=0,
                          embedding_moments_dtype="bfloat16"),
    )
    tr = Trainer(cfg, FIELD_DIMS, 50, DOMAIN_IDX,
                 domain2group=(np.arange(50) % 4))

    # warm the compile with a tiny epoch first
    t0 = time.perf_counter()
    tr.train_epoch(X[:16384], y[:16384], 0)
    print(f"compile epoch: {time.perf_counter()-t0:6.1f}s")

    for e in (1, 2):
        t0 = time.perf_counter()
        loss = tr.train_epoch(X, y, e)
        dt = time.perf_counter() - t0
        print(f"epoch {e}: {dt:6.1f}s  ({N_ROWS/dt:,.0f} examples/sec "
              f"end-to-end, loss {loss:.4f})")

    for tag in ("first (compiles)", "steady"):
        t0 = time.perf_counter()
        res = tr.evaluate(X[:500_000], y[:500_000])
        dt = time.perf_counter() - t0
        print(f"eval 500k rows [{tag}]: {dt:6.1f}s ({500_000/dt:,.0f} ex/s), "
              f"auc {res['total_auc']:.4f}")


if __name__ == "__main__":
    main()
