"""Trace the CDC populate block with 0 valid treatment steps (pure
eval+rollback rows) and attribute the ~75 ms/row device time by op."""

import glob
import os
import tempfile
import time
from collections import defaultdict

import numpy as np


def main():
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
    R = 10

    def mk_block(n_valid):
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

    blk = mk_block(0)
    tr._run_populate(*blk)  # warm compile at the traced shape
    t0 = time.perf_counter()
    tr._run_populate(*blk)
    print(f"block: {(time.perf_counter()-t0)/R*1e3:.1f} ms/row")

    tmpdir = tempfile.mkdtemp(prefix="jaxtrace")
    with jax.profiler.trace(tmpdir):
        tr._run_populate(*blk)

    paths = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no trace produced")
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

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
                print(f"\n=== {plane.name} / {line.name!r}: "
                      f"{sum(total.values())/R:.2f} ms/row, "
                      f"{len(total)} op kinds ===")
                for name, ms in sorted(total.items(), key=lambda kv: -kv[1])[:60]:
                    print(f"  {ms/R*1e3:9.1f} us/row x{count[name]//R:<5d} {name[:95]}")


if __name__ == "__main__":
    main()
