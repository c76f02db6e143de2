"""Head-to-head quality parity: tpurec vs the torch reference on one CSV.

Generates a shared synthetic amazon-format dataset, runs the reference
(/root/reference) with stub wandb + the missing dataset module shimmed,
runs tpurec with identical hyperparameters on the identical split, and
prints both sides' AUC.  See docs/RESULTS.md for recorded numbers.

Usage: python scripts/parity_vs_reference.py [--models mmoe,deepfm,...]
(requires the reference checkout; runs on CPU so both sides share hardware)
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/refrun"


def setup_workdir():
    os.makedirs(f"{WORK}/dataset/aliccp", exist_ok=True)
    os.makedirs(f"{WORK}/dataset/amazon", exist_ok=True)
    os.makedirs(f"{WORK}/wandb_stub/wandb", exist_ok=True)
    open(f"{WORK}/dataset/__init__.py", "w").close()
    open(f"{WORK}/dataset/aliccp/__init__.py", "w").close()
    with open(f"{WORK}/wandb_stub/wandb/__init__.py", "w") as f:
        f.write("def init(*a, **k):\n    return None\n"
                "def log(*a, **k):\n    return None\n")
    with open(f"{WORK}/dataset/aliccp/preprocess_ali_ccp.py", "w") as f:
        f.write("import sys\n"
                f"sys.path.insert(0, {REPO!r})\n"
                "from tpurec.data.preprocess import reduce_mem  # noqa\n")


def gen_data(n_rows=30000, n_domain=6, user_vocab=None, item_vocab=None):
    """Shared amazon-format CSV.  Defaults = the round-1 30k/6-domain set;
    --rows/--domains/--vocab grow it to reference-scale shape (Amazon = 25
    domains, run.py:51 schema) while keeping both sides on the same file."""
    sys.path.insert(0, REPO)
    import numpy as np
    import pandas as pd

    from tpurec.data import make_synthetic

    field_dims = None
    if user_vocab or item_vocab:
        # userid, itemid, weekday, domain, sales_chart, sales_rank, brand,
        # price — the reference's amazon columns (run.py:51)
        field_dims = (user_vocab or 30000, item_vocab or 100000, 7, n_domain,
                      40, 28, 5000, 28)
    data = make_synthetic(n_rows=n_rows, n_fields=8, n_domain=n_domain,
                          domain_idx=3, seed=11, domain_skew=1.2,
                          field_dims=field_dims)
    cols = ["userid", "itemid", "weekday", "domain", "sales_chart",
            "sales_rank", "brand", "price"]
    ts = np.zeros(len(data.y), np.int64)
    rng = np.random.default_rng(0)
    for tag, lo, hi in ((0, 0, 900000), (1, 1000000, 1400000),
                        (2, 1500000, 1900000)):
        m = data.split == tag
        ts[m] = 1_500_000_000 + rng.integers(lo, hi, m.sum())
    df = pd.DataFrame(data.X, columns=cols)
    df["label"] = data.y.astype(int)
    df["timestamp"] = ts
    csv = f"{WORK}/dataset/amazon/prepare2train_filter_12month.csv"
    df.to_csv(csv, index=False)

    # pre-tensorized caches the reference expects without domain_filter
    # (run.py:138-141,212-218)
    import torch

    folder = csv.split(".csv")[0]
    os.makedirs(folder, exist_ok=True)
    x_cols = cols
    tv, vt = df["timestamp"].quantile(0.9), df["timestamp"].quantile(0.95)
    splits = {
        "train": df[df["timestamp"] < tv],
        "valid": df[(df["timestamp"] >= tv) & (df["timestamp"] < vt)],
        "test": df[df["timestamp"] >= vt],
    }
    for mode, d in splits.items():
        torch.save(torch.tensor(d[x_cols].values, dtype=torch.int),
                   os.path.join(folder, f"{mode}_data_loader.pth"))
        torch.save(torch.tensor(d[["label"]].values, dtype=torch.short),
                   os.path.join(folder, f"{mode}_label_loader.pth"))
    return csv


def run_reference(model: str, epochs: int, strategy: str = "mix", seed: int = 7):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{WORK}/wandb_stub:{WORK}:/root/reference"
    cmd = [sys.executable, "/root/reference/main.py", "--model", model,
           "--dataset_name", "amazon", "--bs", "512", "--embed_dim", "16",
           "--epoch", str(epochs), "--lr", "1e-3", "--is_set_seed", "1",
           "--seed", str(seed), "--group_strategy", strategy]
    r = subprocess.run(cmd, cwd=WORK, env=env, capture_output=True,
                       text=True, timeout=3600)
    lines = [l for l in r.stdout.splitlines() if "validation" in l]
    print(f"REFERENCE {model} (seed {seed}):")
    for l in lines:
        print("   ", l)
    return lines


def run_ours(model: str, epochs: int, csv: str, strategy: str = "mix", seed: int = 7):
    sys.path.insert(0, REPO)
    import numpy as np
    import pandas as pd

    from tpurec.config import Config, ModelConfig, TrainConfig
    from tpurec.train import Trainer

    df = pd.read_csv(csv)
    x_cols = ["userid", "itemid", "weekday", "domain", "sales_chart",
              "sales_rank", "brand", "price"]
    X = df[x_cols].values.astype(np.int32)
    y = df["label"].values.astype(np.float32)
    ts = df["timestamp"].values
    tv, vt = np.quantile(ts, 0.9), np.quantile(ts, 0.95)
    tr_m, va_m, te_m = ts < tv, (ts >= tv) & (ts < vt), ts >= vt
    field_dims = tuple(int(v) + 1 for v in X.max(0))
    n_domain = int(df["domain"].nunique())
    w = np.bincount(X[tr_m][:, 3], minlength=n_domain).astype(float)
    w /= w.sum()

    kw = dict(embed_dim=16, dropout=0.2, use_atten=True, atten_embed_dim=64,
              att_layer_num=3, att_head_num=2)
    per_model = {
        "mmoe": dict(mmoe_expert_dims=(256, 128, 64), mmoe_tower_dims=(64, 32)),
        "deepfm": dict(mlp_dims=(256, 128)),
        "dcn": dict(mlp_dims=(256, 128, 64)),
        "dcnv2": dict(mlp_dims=(256, 128, 64)),
        "autoint": dict(mlp_dims=(256, 128, 64)),
        "star": dict(tower_dims=(256, 128, 64, 32)),
        "ple": dict(ple_expert_dims=((256, 128), (64,)), ple_tower_dims=(64, 32)),
        "pepnet": dict(tower_dims=(256, 128, 64, 32), gate_hidden_dim=64),
        "epnet": dict(tower_dims=(256, 128, 64, 32), gate_hidden_dim=64),
        "hinet": dict(sei_dims=(64, 32), tower_dims=(256, 128, 64, 32)),
        "adasparse": dict(mlp_dims=(256, 128, 64)),
        "adl": dict(tower_dims=(256, 128, 64, 32)),
    }
    mcfg = ModelConfig(model=model, **kw, **per_model.get(model, {}))
    cfg = Config(model=mcfg, train=TrainConfig(bs=512, epoch=epochs, seed=seed))
    d2g = (np.arange(n_domain, dtype=np.int64) if strategy == "split"
           else np.zeros(n_domain, np.int64))
    tr = Trainer(cfg, field_dims, n_domain, 3, domain2group=d2g)
    out = tr.fit((X[tr_m], y[tr_m]), (X[va_m], y[va_m]),
                 test=(X[te_m], y[te_m]), domain_cnt_weight=w)
    print(f"OURS {model} (seed {seed}): valid_auc={out['valid']['total_auc']:.4f} "
          f"valid_mean_auc={out['valid']['mean_auc']:.4f} "
          f"test_auc={out['test']['total_auc']:.4f}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="mmoe,deepfm")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--skip_reference", action="store_true")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--skip_ours", action="store_true")
    ap.add_argument("--rows", type=int, default=30000)
    ap.add_argument("--domains", type=int, default=6)
    ap.add_argument("--user_vocab", type=int, default=None)
    ap.add_argument("--item_vocab", type=int, default=None)
    # 'cpu' keeps both sides on identical hardware; 'default' lets ours
    # run on the TPU (AUC parity is hardware-independent — only wall-clock
    # differs, and big-shape reference runs already take tens of minutes)
    ap.add_argument("--ours_platform", default="cpu",
                    choices=["cpu", "default"])
    args = ap.parse_args()

    import jax

    if args.ours_platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    setup_workdir()
    csv = gen_data(args.rows, args.domains, args.user_vocab, args.item_vocab)
    for m in args.models.split(","):
        # reference epnet/hinet squeeze their n_tower=1 output and crash
        # under mix (run.py:484); their working config is group split
        strategy = "split" if ":" not in m and m in ("epnet", "hinet") else "mix"
        if ":" in m:
            m, strategy = m.split(":")
        if not args.skip_reference:
            try:
                run_reference(m, args.epochs, strategy, args.seed)
            except Exception as e:  # reference crashes on torch>=2.6 reload
                print(f"REFERENCE {m} errored: {e}")
        if not args.skip_ours:
            run_ours(m, args.epochs, csv, strategy, args.seed)


if __name__ == "__main__":
    main()
