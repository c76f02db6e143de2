"""Measure exact vs streaming eval throughput on the real chip.

The exact eval hauls every prediction to host (one fetch per EVAL_CHUNK
batches); the streaming eval accumulates per-(domain, bin) histograms on
device and fetches only 2x[n_domain, n_bins] + 2x[n_domain] at the end.
On the remote-TPU runtime (~25ms per host transfer) the streaming path
should remove all per-chunk fetch latency; this script quantifies it and
checks the metric agreement at scale.

Usage: python scripts/bench_eval_streaming.py [--rows 1000000] [--domains 25]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--domains", type=int, default=25)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from tpurec.config import Config, ModelConfig, TrainConfig
    from tpurec.data import make_synthetic
    from tpurec.train import Trainer

    data = make_synthetic(n_rows=args.rows, n_fields=10,
                          n_domain=args.domains, domain_idx=3, seed=7)
    cfg = Config(
        model=ModelConfig(model="mmoe", embed_dim=16,
                          mmoe_expert_dims=(256, 128, 64),
                          mmoe_tower_dims=(64, 32),
                          atten_embed_dim=64, att_layer_num=3),
        train=TrainConfig(bs=512, epoch=1, seed=0),
    )
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                 domain2group=np.arange(data.n_domain))
    tr.train_epoch(*data.train, 0)  # params off init so AUC is meaningful
    X, y = data.train  # big split for the timing
    w = data.domain_cnt_weight()

    for name, fn in (("exact", tr.evaluate), ("streaming", tr.evaluate_streaming)):
        fn(X[:4096], y[:4096], w)  # warm the compile
        t0 = time.perf_counter()
        out = fn(X, y, w)
        dt = time.perf_counter() - t0
        print(f"{name:9s}: {len(y)/dt/1e3:8.0f}k ex/s  "
              f"({dt:.2f}s)  auc={out['total_auc']:.6f} "
              f"mean_auc={out['mean_auc']:.6f} loss={out['total_loss']:.6f}",
              flush=True)


if __name__ == "__main__":
    main()
