"""Per-block timing of the CDC populate under serial vs parallel_rows.

Isolates where the vmapped populate spends its time: dispatches ONE
mask-shaped block ((R, K_max, W) treatment bursts + eval) per mode and
times it after warmup, at a few lane counts.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=12,
                    help="rows per timed block")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--lanes", default="0,2,4")
    ap.add_argument("--tiny_net", action="store_true",
                    help="shrink the dense net to ~nothing: isolates the "
                         "embedding update + data movement")
    ap.add_argument("--small_vocab", action="store_true",
                    help="cap all vocabs at 1k (tiny table, no big-field "
                         "correction): isolates the network fwd/bwd")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    import dataclasses

    from tpurec.cdc.engine import CDCTrainer
    from tpurec.config import Config, CDCConfig, ModelConfig, TrainConfig
    from tpurec.data import make_synthetic

    n_domain = 50
    field_dims = (250000, 10, 10, 10, 10, 10, 10, 10, 10, 1368287, 50,
                  5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4)
    if args.small_vocab:
        field_dims = tuple(min(d, 1000) for d in field_dims)
    data = make_synthetic(
        n_rows=200_000, n_fields=23, n_domain=n_domain, domain_idx=10, seed=0,
        field_dims=field_dims,
    )
    net = (dict(mlp_dims=(8,), use_atten=False) if args.tiny_net
           else dict(mlp_dims=(256, 128, 64), use_atten=True,
                     atten_embed_dim=64, att_layer_num=3))
    base = Config(
        model=ModelConfig(model="mmoe", embed_dim=16, **net),
        train=TrainConfig(bs=512, seed=0),
        cdc=CDCConfig(base_model="mmoe", n_cluster=4,
                      n_causal_mask=args.rows, update_matrix_step=args.k),
    )

    for lanes in [int(x) for x in args.lanes.split(",")]:
        cfg = dataclasses.replace(
            base, cdc=dataclasses.replace(base.cdc, parallel_rows=lanes))
        tr = CDCTrainer(cfg, data.field_dims, n_domain, data.domain_idx)
        tr.setup_data(data.train, data.valid)
        R = args.rows
        k = args.k
        K_max = tr._burst_k_max(k)
        W = cfg.cdc.group_chunk_size * cfg.train.bs
        ebs = tr._ebs
        D = n_domain

        def sched(all_valid):
            bidx = np.zeros((R, K_max, W), np.int32)
            bmask = np.zeros((R, K_max, W), np.float32)
            bvalid = np.zeros((R, K_max), np.float32)
            eidx = np.zeros((R, D, ebs), np.int32)
            emask = np.zeros((R, D, ebs), np.float32)
            for r in range(R):
                if all_valid:
                    treat = list(range(D))
                else:
                    size = int(tr.np_rng.integers(5, D))
                    treat = list(tr.np_rng.choice(
                        D, p=tr.domain_cnt_weight, size=size))
                bidx[r], bmask[r], bvalid[r] = tr._multi_burst_sched(
                    treat, k, K_max)
                eidx[r], emask[r] = tr._eval_sched()
            return bidx, bmask, bvalid, eidx, emask

        for label, all_valid in (("typical bursts", False),
                                 ("all-valid bursts", True)):
            s = sched(all_valid)
            tr._run_populate(*s)          # compile + warm
            t0 = time.perf_counter()
            tr._run_populate(*s)
            dt = time.perf_counter() - t0
            frac = float(s[2].mean())
            print(f"lanes={lanes:2d} {label:<18} "
                  f"({R} rows, K_max={K_max}, valid {frac*100:4.0f}%): "
                  f"{dt:7.2f} s  ({dt/R*1000:7.1f} ms/row)", flush=True)


if __name__ == "__main__":
    main()
