"""FULL-SCALE CDC run (BASELINE.md config 5 shape): 50 domains, 20M rows,
reference hyperparameters — n_cluster=4, n_causal_mask=50,
update_matrix_step=2, warmup_step=200, update_interval=1000 batches
(/root/reference/main.py:31-40 defaults), bs=512, embed_dim=16, MMoE base
with the default-ON aux attention head, Ali-CCP-like 23-field schema with
the 1.37M-row itemid vocabulary (reference config.py:7).

End-to-end: clustering (iterative re-assignment across the bs-scaled
matrix-update cadence — ~20 updates for the default 20M-row run at
bs=512, where update_interval=1000 counts bs=1024-equivalent batches)
-> early-stop tracking -> checkpoint -> serve roundtrip
(tpurec.serve.predictor_from_checkpoint), with matrix artifacts dumped.
Also times ONE matrix update under data_placement='stream' at the same
scale — the beyond-HBM path (bit-identical to resident by
tests/test_cdc_e2e.py); on this image the remote-TPU tunnel (~30MB/s)
makes stream windows look far more expensive than the PCIe-attached
reality.

Usage: python scripts/run_cdc_full.py [--rows 20000000] [--domains 50]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIELD_DIMS = (
    250000, 10, 10, 10, 10, 10, 10, 10, 10,
    1368287,                                   # itemid (config.py:7)
    50,                                        # domain (overridden below)
    5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4,
)
DOMAIN_IDX = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--domains", type=int, default=50)
    ap.add_argument("--out", default="save/cdc_full")
    ap.add_argument("--skip_stream_probe", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    from tpurec.cdc.engine import CDCTrainer
    from tpurec.config import Config, CDCConfig, ModelConfig, TrainConfig
    from tpurec.data import make_synthetic

    fd = list(FIELD_DIMS)
    fd[DOMAIN_IDX] = args.domains
    t0 = time.perf_counter()
    data = make_synthetic(
        n_rows=args.rows, n_fields=len(fd), n_domain=args.domains,
        domain_idx=DOMAIN_IDX, seed=0, domain_skew=1.2, field_dims=tuple(fd),
    )
    print(f"synthetic {args.rows/1e6:.0f}M rows x {len(fd)} fields, "
          f"{args.domains} domains: {time.perf_counter()-t0:.0f}s "
          f"({data.train[0].nbytes/2**30:.2f} GiB train)", flush=True)

    cfg = Config(
        model=ModelConfig(model="cdc", embed_dim=16,
                          mlp_dims=(256, 128, 64), use_atten=True,
                          atten_embed_dim=64, att_layer_num=3),
        train=TrainConfig(bs=512, epoch=1, seed=0,
                          embedding_moments_dtype="bfloat16",
                          save_path=args.out),
        cdc=CDCConfig(base_model="mmoe", n_cluster=4, n_causal_mask=50,
                      update_matrix_step=2, warmup_step=200,
                      update_interval=1000,
                      save_matrix_artifacts=True),
    )
    tr = CDCTrainer(cfg, tuple(fd), args.domains, DOMAIN_IDX)

    t0 = time.perf_counter()
    out = tr.fit(data.train, data.valid, test=data.test)
    fit_min = (time.perf_counter() - t0) / 60
    nb = -(-len(data.train[1]) // cfg.train.bs)
    # update cadence is bs-scaled like the burst length (engine.py:1011):
    # reference's update_interval counts bs=1024-equivalent batches
    # engine fires at i=0 plus every (i+1)%interval==0 -> 1 + nb//interval
    interval = (cfg.cdc.update_interval * 1024) // cfg.train.bs
    print(f"\nCDC fit: {fit_min:.1f} min wall ({nb} batches, "
          f"~{1 + nb // max(interval, 1)} matrix updates, "
          f"placement={'resident' if tr._resident else 'stream'})")
    print("clusters:", out["domain2group_list"])
    print("s_groups:", out["s_group2domain_list"])
    print("valid auc:", round(out["valid"]["total_auc"], 4),
          " mean auc:", round(out["valid"]["mean_auc"], 4),
          " loss:", round(out["valid"]["total_loss"], 4))
    print("test  auc:", round(out["test"]["total_auc"], 4),
          " mean auc:", round(out["test"]["mean_auc"], 4), flush=True)

    # checkpoint -> serve roundtrip (run.py:447-459 + beyond-reference serve)
    ckpt = os.path.join(args.out, "cdc_full.ckpt")
    tr.save_checkpoint(ckpt)
    from tpurec.serve import predictor_from_checkpoint

    pred = predictor_from_checkpoint(ckpt, batch_sizes=(4096,))
    probs = pred(data.test[0][:4096])
    print(f"serve roundtrip: checkpoint {os.path.getsize(ckpt)/2**20:.0f}MB, "
          f"{len(probs)} probs, finite={np.all(np.isfinite(probs))}")

    if not args.skip_stream_probe:
        # one matrix update in stream placement at the same scale
        import dataclasses

        scfg = dataclasses.replace(
            cfg, cdc=dataclasses.replace(
                cfg.cdc, data_placement="stream",
                save_matrix_artifacts=False))
        st = CDCTrainer(scfg, tuple(fd), args.domains, DOMAIN_IDX)
        st.setup_data(data.train, data.valid)
        assert not st._resident
        t0 = time.perf_counter()
        st.update_matrix_cdc(scfg.cdc.update_matrix_step)
        dt1 = time.perf_counter() - t0          # includes compiles
        t0 = time.perf_counter()
        st.update_matrix_cdc(scfg.cdc.update_matrix_step)
        dt2 = time.perf_counter() - t0
        print(f"stream-placement matrix update: first {dt1:.0f}s "
              f"(incl compiles), steady {dt2:.0f}s "
              f"(dataset stays in host RAM; windows over the tunnel)",
              flush=True)

        # bounded split-mode TRAINING span in stream placement, with the
        # tunnel distortion explicitly bounded (VERDICT round-2 item 2):
        # measure link bandwidth with a device_put probe, then report how
        # much of the span is window transfer at that bandwidth.
        seq = st.train_batcher.epoch_seq()
        span = min(2000, len(seq))
        t0 = time.perf_counter()
        st._train_span(seq, 0, span)
        dt = time.perf_counter() - t0
        probe = np.zeros(16 << 20, np.float32)  # 64 MiB
        t1 = time.perf_counter()
        jax.block_until_ready(jax.device_put(probe))
        bw = probe.nbytes / (time.perf_counter() - t1)
        row_bytes = len(fd) * 4 + 4             # int32 fields + f32 label
        shipped = span * cfg.train.bs * row_bytes
        print(f"stream training span: {span} batches in {dt:.0f}s "
              f"({span * cfg.train.bs / dt:,.0f} ex/s end-to-end); "
              f"shipped {shipped / 2**20:.0f} MiB of windows; link probe "
              f"{bw / 2**20:.0f} MiB/s -> transfer floor "
              f"{shipped / bw:.0f}s of the {dt:.0f}s span "
              f"(PCIe-attached hosts at >10 GB/s make this negligible)")


if __name__ == "__main__":
    main()
