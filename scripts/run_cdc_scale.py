"""Full CDC training run at mid scale on the real chip: 25 domains, 1M
rows, reference hyperparameters (bs=512, update_interval=1000 batches,
k=update_matrix_step=2, 50 causal masks).  Reports wall-clock per phase."""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    from tpurec.cdc.engine import CDCTrainer
    from tpurec.config import Config, CDCConfig, ModelConfig, TrainConfig
    from tpurec.data import make_synthetic

    n_domain = 25
    data = make_synthetic(
        n_rows=1_000_000, n_fields=23, n_domain=n_domain, domain_idx=10,
        seed=0, domain_skew=1.2,
        field_dims=(250000, 10, 10, 10, 10, 10, 10, 10, 10, 1368287, 25,
                    5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4),
    )
    cfg = Config(
        model=ModelConfig(model="cdc", embed_dim=16,
                          mlp_dims=(256, 128, 64), use_atten=True,
                          atten_embed_dim=64, att_layer_num=3),
        train=TrainConfig(bs=512, epoch=1, seed=0,
                          embedding_moments_dtype="bfloat16"),
        cdc=CDCConfig(base_model="mmoe", n_cluster=4, n_causal_mask=50,
                      update_matrix_step=2, warmup_step=100,
                      update_interval=1000),
    )
    tr = CDCTrainer(cfg, data.field_dims, n_domain, data.domain_idx)

    t0 = time.perf_counter()
    out = tr.fit(data.train, data.valid, test=data.test)
    dt = time.perf_counter() - t0
    print(f"CDC fit (1 epoch, 1M rows, 25 domains, 2 matrix updates): "
          f"{dt/60:.1f} min wall")
    print("clusters:", out["domain2group_list"])
    print("valid auc:", round(out["valid"]["total_auc"], 4),
          "mean auc:", round(out["valid"]["mean_auc"], 4))
    print("test auc:", round(out["test"]["total_auc"], 4))


if __name__ == "__main__":
    main()
