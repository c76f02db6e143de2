"""Decompose the stream-placement training-span gap (VERDICT r3 item 7).

Round 3 cut the 20M-row stream-mode train span from 24s to 9.6s per
interval (107k ex/s vs 267k resident) by keeping loss sums on device;
this script breaks the REMAINING gap into its host-side parts at the
current operating point, per 64-step scan chunk:

  idx      — per-domain batch index scheduling (_next_idx_padded x64)
  gather   — Xhost[flat]/yhost[flat] numpy fancy-gather (the window)
  upload   — window transfer to device (blocked, so it is the pure
             link cost on this image's remote-TPU tunnel)
  submit   — dispatch submission of the scanned train step
  chunk    — full async chunk wall via _train_span (the production path,
             which overlaps all of the above with device compute)

plus resident-placement throughput on the identical data/sequence, and
a PCIe projection: upload bytes / 16 GB/s (a v5e host link) vs the
measured tunnel seconds — i.e. what the span would sustain were the
window transfer riding a real host PCIe link instead of this image's
network relay.

Usage: python scripts/profile_stream_span.py [--rows 20000000]
       [--chunks 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIELD_DIMS = (250000, 10, 10, 10, 10, 10, 10, 10, 10, 1368287, 50,
              5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4)


def build(placement, rows, domains, data):
    from tpurec.cdc.engine import CDCTrainer
    from tpurec.config import CDCConfig, Config, ModelConfig, TrainConfig

    cfg = Config(
        model=ModelConfig(model="cdc", embed_dim=16, mlp_dims=(256, 128, 64),
                          use_atten=True, atten_embed_dim=64, att_layer_num=3),
        train=TrainConfig(bs=512, epoch=1, seed=0,
                          embedding_moments_dtype="bfloat16"),
        cdc=CDCConfig(base_model="mmoe", n_cluster=4, n_causal_mask=50,
                      update_matrix_step=2, warmup_step=100,
                      update_interval=1000, data_placement=placement),
    )
    tr = CDCTrainer(cfg, data.field_dims, domains, data.domain_idx)
    tr.setup_data(data.train, data.valid, data.test)
    return tr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--domains", type=int, default=50)
    ap.add_argument("--chunks", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    from tpurec.data import make_synthetic

    t0 = time.perf_counter()
    data = make_synthetic(
        n_rows=args.rows, n_fields=23, n_domain=args.domains, domain_idx=10,
        seed=0, domain_skew=1.2,
        field_dims=FIELD_DIMS[:10] + (args.domains,) + FIELD_DIMS[11:])
    print(f"data gen: {time.perf_counter()-t0:.0f}s", flush=True)

    from tpurec.cdc.engine import CDCTrainer as _CT

    bs, K = 512, _CT._SPAN_SCAN  # warm + account in full scan chunks
    for placement in ("stream", "resident"):
        tr = build(placement, args.rows, args.domains, data)
        seq = tr.train_batcher.epoch_seq()[: (args.chunks + 2) * K]
        # warm the executables + tunnel
        tr._train_span(seq, 0, 2 * K)

        t0 = time.perf_counter()
        loss = tr._train_span(seq, 2 * K, (args.chunks + 2) * K)
        dt = time.perf_counter() - t0
        n_ex = args.chunks * K * bs
        print(f"[{placement}] span: {dt:.2f}s for {args.chunks} chunks "
              f"({n_ex/dt:,.0f} ex/s)  loss={loss/ (args.chunks*K):.4f}",
              flush=True)

        if placement != "stream":
            del tr
            continue

        # decomposition of ONE chunk, each part hard-synced
        reps = 5
        t_idx = t_gather = t_upload = t_submit = t_wait = 0.0
        up_bytes = 0
        for _ in range(reps):
            t0 = time.perf_counter()
            pairs = [tr._next_idx_padded(int(seq[t]), bs) for t in range(K)]
            idxs = np.stack([p[0] for p in pairs])
            masks = np.stack([p[1] for p in pairs])
            t_idx += time.perf_counter() - t0

            t0 = time.perf_counter()
            flat = np.asarray(idxs, np.int64).ravel()
            Xg = tr.Xhost[flat]
            yg = tr.yhost[flat]
            t_gather += time.perf_counter() - t0
            up_bytes = Xg.nbytes + yg.nbytes

            t0 = time.perf_counter()
            Xw = tr._dev(Xg, replicate=True)
            yw = tr._dev(yg, replicate=True)
            jax.block_until_ready((Xw, yw))
            t_upload += time.perf_counter() - t0

            t0 = time.perf_counter()
            pos = tr._dev(np.arange(flat.size, dtype=np.int32).reshape(
                idxs.shape))
            tr.dropout_rng, rng = jax.random.split(tr.dropout_rng)
            rngs = jax.random.split(rng, K)
            state, losses = tr._split_scan(
                tr.state, Xw, yw, pos, tr._dev(masks), tr._dev(rngs),
                tr.domain2group_dev)
            t_submit += time.perf_counter() - t0

            t0 = time.perf_counter()
            _ = np.asarray(losses)
            t_wait += time.perf_counter() - t0
            tr.state = state

        ex = K * bs
        print(f"[stream] per-chunk decomposition (mean of {reps}, "
              f"{ex} examples/chunk):", flush=True)
        for name, t in (("idx sched", t_idx), ("window gather", t_gather),
                        ("window upload (blocked)", t_upload),
                        ("dispatch submit", t_submit),
                        ("device wait", t_wait)):
            print(f"    {name:<24} {t/reps*1e3:8.1f} ms", flush=True)
        mb = up_bytes / 2**20
        pcie_ms = up_bytes / 16e9 * 1e3
        print(f"    upload volume {mb:.1f} MiB/chunk -> measured "
              f"{t_upload/reps*1e3:.1f} ms "
              f"({mb/(t_upload/reps):.0f} MiB/s tunnel); PCIe-projected "
              f"{pcie_ms:.2f} ms at 16 GB/s", flush=True)


if __name__ == "__main__":
    main()
