"""jax.profiler trace of ONE CDC populate dispatch (serial or parallel
lanes), top device ops by total time — the op-level view behind
profile_populate_modes.py's numbers."""

import argparse
import glob
import os
import tempfile
from collections import defaultdict

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=4)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--tiny_net", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    import dataclasses

    from tpurec.cdc.engine import CDCTrainer
    from tpurec.config import Config, CDCConfig, ModelConfig, TrainConfig
    from tpurec.data import make_synthetic

    n_domain = 50
    data = make_synthetic(
        n_rows=200_000, n_fields=23, n_domain=n_domain, domain_idx=10, seed=0,
        field_dims=(250000, 10, 10, 10, 10, 10, 10, 10, 10, 1368287, 50,
                    5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4),
    )
    net = (dict(mlp_dims=(8,), use_atten=False) if args.tiny_net
           else dict(mlp_dims=(256, 128, 64), use_atten=True,
                     atten_embed_dim=64, att_layer_num=3))
    cfg = Config(
        model=ModelConfig(model="mmoe", embed_dim=16, **net),
        train=TrainConfig(bs=512, seed=0),
        cdc=CDCConfig(base_model="mmoe", n_cluster=4,
                      n_causal_mask=args.rows, update_matrix_step=args.k,
                      parallel_rows=args.lanes),
    )
    tr = CDCTrainer(cfg, data.field_dims, n_domain, data.domain_idx)
    tr.setup_data(data.train, data.valid)
    R, k = args.rows, args.k
    K_max = tr._burst_k_max(k)
    W = cfg.cdc.group_chunk_size * cfg.train.bs
    D, ebs = n_domain, tr._ebs
    bidx = np.zeros((R, K_max, W), np.int32)
    bmask = np.zeros((R, K_max, W), np.float32)
    bvalid = np.zeros((R, K_max), np.float32)
    eidx = np.zeros((R, D, ebs), np.int32)
    emask = np.zeros((R, D, ebs), np.float32)
    for r in range(R):
        bidx[r], bmask[r], bvalid[r] = tr._multi_burst_sched(
            list(range(D)), k, K_max)
        eidx[r], emask[r] = tr._eval_sched()
    sched = (bidx, bmask, bvalid, eidx, emask)
    tr._run_populate(*sched)  # compile + warm

    tmpdir = tempfile.mkdtemp(prefix="poptrace")
    with jax.profiler.trace(tmpdir):
        tr._run_populate(*sched)

    paths = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no trace written")
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    n_steps = K_max  # report per scan step
    for path in paths:
        xs_pb = xplane_pb2.XSpace()
        xs_pb.ParseFromString(open(path, "rb").read())
        for plane in xs_pb.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                total = defaultdict(float)
                count = defaultdict(int)
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    total[name] += ev.duration_ps / 1e9  # ms
                    count[name] += 1
                if not total:
                    continue
                print(f"\n=== {plane.name} / line {line.name!r}: total "
                      f"{sum(total.values()):.1f} ms over {len(total)} op "
                      f"kinds ({n_steps} scan steps) ===")
                for name, ms in sorted(total.items(),
                                       key=lambda kv: -kv[1])[:30]:
                    print(f"  {ms:9.2f} ms total  {ms/n_steps*1e3:8.0f} "
                          f"us/step  x{count[name]:<5d} {name[:90]}")


if __name__ == "__main__":
    main()
