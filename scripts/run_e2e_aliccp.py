"""END-TO-END Ali-CCP pipeline at scale on real hardware: synthetic RAW
Ali-CCP files -> convert_raw_aliccp (the reference's missing
preprocess_ali_ccp.py capability) -> AliCCPPreprocessor (KBins +
frequency/domain filtering + mix_interval_random sampling to 50 domains,
reference preprocess.py:253-414) -> fast CSV load -> CDC training on the
TPU -> checkpoint -> serve roundtrip.

The raw generator plants per-id latent effects (user/item/domain logits)
so AUC is meaningful after the pipeline's re-encoding.

Usage: python scripts/run_e2e_aliccp.py [--rows 2000000] [--workdir /tmp/e2e_aliccp]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_raw(workdir: str, n_rows: int, seed: int = 0,
            n_user: int = None, n_item: int = None,
            n_raw_domain: int = 128):
    """Write sample_skeleton_train.csv + common_features_train.csv in the
    raw Ali-CCP format (field:feat_id:value triples, \\x01-joined).

    Vocab sizes scale with n_rows so the DOWNSTREAM thresh10/ndomain50
    filters (user/item freq >= 10 globally, >= 200 unique users AND items
    per domain, >= ~60 surviving domains for mix_interval_random —
    reference preprocess.py:311-380) keep most of the data, as they do on
    the real dataset."""
    n_user = n_user or max(n_rows // 25, 2000)
    n_item = n_item or max(n_rows // 30, 2000)
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()

    # common features: one entry per "user pv block"; reference raw data
    # keys user-side features by common_feature_index
    n_common = n_user  # one block per user keeps the mapping simple
    u_lat = rng.normal(0, 1.0, n_user)
    i_lat = rng.normal(0, 1.0, n_item)
    d_lat = rng.normal(0, 0.7, n_raw_domain)

    common_path = os.path.join(workdir, "common_features_train.csv")
    with open(common_path, "w") as f:
        # user cats: 101=userid, 121/122 profile cats, 109_14 paired dense
        u121 = rng.integers(1, 98, n_user)
        u122 = rng.integers(1, 14, n_user)
        dv = rng.random(n_user)
        rows = []
        for u in range(n_user):
            feats = (f"101:{u + 1}:1.0\x01121:{u121[u]}:1.0\x01"
                     f"122:{u122[u]}:1.0\x01109_14:{(u % 900) + 1}:{dv[u]:.3f}")
            rows.append(f"c{u},4,{feats}")
            if len(rows) == 200_000:
                f.write("\n".join(rows) + "\n")
                rows = []
        if rows:
            f.write("\n".join(rows) + "\n")

    # skeleton: domain-skewed item interactions (alpha=8 keeps the skew
    # mild enough that >=60 domains survive the per-domain filters)
    dw = rng.dirichlet(np.full(n_raw_domain, 8.0))
    dw = np.maximum(dw, 1e-4)
    dw /= dw.sum()
    skel_path = os.path.join(workdir, "sample_skeleton_train.csv")
    CH = 500_000
    with open(skel_path, "w") as f:
        written = 0
        sid = 0
        while written < n_rows:
            n = min(CH, n_rows - written)
            users = rng.integers(0, n_user, n)
            doms = rng.choice(n_raw_domain, n, p=dw)
            # items are domain-clustered: each domain owns an EXCLUSIVE
            # vocab slice (keeps per-item frequency above the global
            # freq>=10 filter at realistic row counts)
            slice_sz = max(n_item // n_raw_domain, 1)
            base = (doms * slice_sz).astype(np.int64)
            items = base + rng.integers(0, slice_sz, n)
            logits = (u_lat[users] + i_lat[items] + d_lat[doms] - 1.1)
            clicks = (rng.random(n) < 1 / (1 + np.exp(-logits))).astype(int)
            convs = clicks * (rng.random(n) < 0.1)
            f207 = rng.integers(1, 2800, n)
            f508 = rng.integers(1, 9, n)
            dv = rng.random(n)
            lines = []
            for j in range(n):
                feats = (f"205:{items[j] + 1}:1.0\x01206:{doms[j] + 1}:1.0"
                         f"\x01207:{f207[j]}:1.0\x01508:{f508[j]}:{dv[j]:.3f}")
                lines.append(
                    f"{sid + j},{clicks[j]},{convs[j]},c{users[j]},4,{feats}")
            f.write("\n".join(lines) + "\n")
            written += n
            sid += n
    print(f"raw gen: {n_rows/1e6:.1f}M skeleton rows + {n_common/1e3:.0f}k "
          f"common blocks in {time.perf_counter()-t0:.0f}s "
          f"({os.path.getsize(skel_path)/2**20:.0f} MB)", flush=True)
    return skel_path, common_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--workdir", default="/tmp/e2e_aliccp")
    ap.add_argument("--domains", type=int, default=50)
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    from tpurec.data.preprocess import AliCCPPreprocessor, convert_raw_aliccp

    skel, common = gen_raw(args.workdir, args.rows)

    t0 = time.perf_counter()
    train_csv = os.path.join(args.workdir, "ali_ccp_train.csv")
    val_csv = os.path.join(args.workdir, "ali_ccp_val.csv")
    convert_raw_aliccp(skel, common, train_csv, val_fraction=0.5,
                       val_out_csv=val_csv)
    # reference expects a test file too; split val in half
    import pandas as pd

    va = pd.read_csv(val_csv)
    va.iloc[: len(va) // 2].to_csv(val_csv, index=False)
    va.iloc[len(va) // 2:].to_csv(
        os.path.join(args.workdir, "ali_ccp_test.csv"), index=False)
    print(f"convert_raw_aliccp: {time.perf_counter()-t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    pre = AliCCPPreprocessor(args.workdir, sample_n_domain=args.domains)
    df = pre.main(train_csv, val_csv,
                  os.path.join(args.workdir, "ali_ccp_test.csv"))
    print(f"AliCCPPreprocessor: {time.perf_counter()-t0:.0f}s -> "
          f"{len(df)} rows, {df['domain'].nunique()} domains", flush=True)

    # runtime load + CDC training on the preprocessed output
    from tpurec.config import Config, CDCConfig, ModelConfig, TrainConfig
    from tpurec.cdc.engine import CDCTrainer

    x_cols = [c for c in df.columns if c not in ("click", "train_tag")]
    X = df[x_cols].values.astype(np.int32)
    y = df["click"].values.astype(np.float32)
    tag = df["train_tag"].values
    domain_idx = x_cols.index("domain")
    field_dims = tuple(int(X[:, i].max()) + 1 for i in range(X.shape[1]))
    n_domain = int(X[:, domain_idx].max()) + 1
    tr_m, va_m, te_m = tag == 0, tag == 1, tag == 2

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    cfg = Config(
        model=ModelConfig(model="cdc", embed_dim=16,
                          mlp_dims=(256, 128, 64), use_atten=True,
                          atten_embed_dim=64, att_layer_num=3),
        train=TrainConfig(bs=512, epoch=1, seed=0,
                          embedding_moments_dtype="bfloat16",
                          save_path=os.path.join(args.workdir, "save")),
        cdc=CDCConfig(base_model="mmoe", n_cluster=4, n_causal_mask=50,
                      update_matrix_step=2, warmup_step=200,
                      update_interval=1000),
    )
    tr = CDCTrainer(cfg, field_dims, n_domain, domain_idx)
    t0 = time.perf_counter()
    out = tr.fit((X[tr_m], y[tr_m]), (X[va_m], y[va_m]),
                 test=(X[te_m], y[te_m]))
    print(f"CDC fit on preprocessed data: {(time.perf_counter()-t0)/60:.1f} "
          f"min ({tr_m.sum()} train rows, {n_domain} domains)")
    print("clusters:", out["domain2group_list"])
    print("valid auc:", round(out["valid"]["total_auc"], 4),
          " test auc:", round(out["test"]["total_auc"], 4), flush=True)

    ckpt = os.path.join(args.workdir, "e2e.ckpt")
    tr.save_checkpoint(ckpt)
    from tpurec.serve import predictor_from_checkpoint

    pred = predictor_from_checkpoint(ckpt, batch_sizes=(4096,))
    probs = pred(X[te_m][:4096])
    print(f"serve roundtrip ok: {len(probs)} probs, "
          f"finite={np.all(np.isfinite(probs))}")


if __name__ == "__main__":
    main()
