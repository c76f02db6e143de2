"""Attribute CDC matrix-update time: mask/A/B blocks, padded-step cost,
eval cost — at Ali-CCP scale on the real chip."""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from tpurec.cdc.engine import CDCTrainer
    from tpurec.config import Config, CDCConfig, ModelConfig, TrainConfig
    from tpurec.data import make_synthetic

    n_domain = 50
    data = make_synthetic(
        n_rows=200_000, n_fields=23, n_domain=n_domain, domain_idx=10, seed=0,
        field_dims=(250000, 10, 10, 10, 10, 10, 10, 10, 10, 1368287, 50,
                    5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4),
    )
    cfg = Config(
        model=ModelConfig(model="mmoe", embed_dim=16,
                          mlp_dims=(256, 128, 64), use_atten=True,
                          atten_embed_dim=64, att_layer_num=3),
        train=TrainConfig(bs=512, seed=0),
        cdc=CDCConfig(base_model="mmoe", n_cluster=4, n_causal_mask=50,
                      update_matrix_step=4),
    )
    tr = CDCTrainer(cfg, data.field_dims, n_domain, data.domain_idx)
    tr.setup_data(data.train, data.valid)

    k = cfg.cdc.update_matrix_step
    bs = cfg.train.bs
    D = n_domain
    K_max = tr._burst_k_max(k)
    W = cfg.cdc.group_chunk_size * bs
    print(f"K_max={K_max} W={W}")

    def mk_block(R, n_valid):
        bidx = np.zeros((R, K_max, W), np.int32)
        bmask = np.ones((R, K_max, W), np.float32)
        bvalid = np.zeros((R, K_max), np.float32)
        bvalid[:, :n_valid] = 1.0
        eidx = np.zeros((R, D, bs), np.int32)
        emask = np.ones((R, D, bs), np.float32)
        for r in range(R):
            eidx[r], emask[r] = tr._eval_sched()
            for s in range(K_max):
                bidx[r, s] = np.random.randint(0, 100_000, W)
        return bidx, bmask, bvalid, eidx, emask

    # warm compile
    blk = mk_block(2, K_max)
    tr._run_populate(*blk)

    for R, n_valid, label in [
        (10, K_max, f"10 rows, all {K_max} steps valid"),
        (10, K_max // 2, f"10 rows, {K_max//2} valid steps"),
        (10, 0, "10 rows, 0 valid steps (pure eval+rollback)"),
    ]:
        blk = mk_block(R, n_valid)
        t0 = time.perf_counter()
        tr._run_populate(*blk)
        dt = time.perf_counter() - t0
        per_row = dt / R
        print(f"{label:42s}: {dt:6.2f} s  ({per_row*1e3:7.1f} ms/row)")


if __name__ == "__main__":
    main()
