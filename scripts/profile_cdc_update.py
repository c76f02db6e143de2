"""Time a full CDC matrix update (reference run.py:528-594 scale:
50 domains, 50 causal masks, k=update_matrix_step=4) on the real chip.

--parallel_rows N times the vmapped per-row-moments populate
(CDCConfig.parallel_rows) against the serial default."""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parallel_rows", type=int, default=0)
    ap.add_argument("--placement", default="auto")
    ap.add_argument("--compute_dtype", default="float32",
                    help="bfloat16 = opt-in MXU-rate bursts/evals "
                         "(documented divergence; sweep math stays f32)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

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
        train=TrainConfig(bs=512, seed=0, compute_dtype=args.compute_dtype),
        cdc=CDCConfig(base_model="mmoe", n_cluster=4, n_causal_mask=50,
                      update_matrix_step=4,
                      parallel_rows=args.parallel_rows,
                      data_placement=args.placement),
    )
    tr = CDCTrainer(cfg, data.field_dims, n_domain, data.domain_idx)
    tr.setup_data(data.train, data.valid)

    t0 = time.perf_counter()
    tr.warm_compile(cfg.cdc.update_matrix_step)  # parallel AOT compiles
    tr.update_matrix_cdc(cfg.cdc.update_matrix_step)
    t1 = time.perf_counter()
    print(f"first matrix update (incl. compiles): {t1-t0:7.1f} s")
    t0 = time.perf_counter()
    tr.update_matrix_cdc(cfg.cdc.update_matrix_step)
    t1 = time.perf_counter()
    print(f"steady-state matrix update:           {t1-t0:7.1f} s")


if __name__ == "__main__":
    main()
