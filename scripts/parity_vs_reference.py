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
    # the reference saves checkpoints under save/<dataset> and CDC matrix
    # figures under result/<dataset> relative to cwd (run.py:80, cdc.py:60)
    for d in ("save/amazon", "save/aliccp", "result/amazon", "result/aliccp"):
        os.makedirs(f"{WORK}/{d}", exist_ok=True)
    # minimal working openpyxl so the reference CDC's to_excel matrix dumps
    # (cdc.py:400) don't crash on this openpyxl-less image
    os.makedirs(f"{WORK}/wandb_stub/openpyxl", exist_ok=True)
    import shutil

    shutil.copyfile(os.path.join(REPO, "scripts", "openpyxl_stub_src.py"),
                    f"{WORK}/wandb_stub/openpyxl/__init__.py")
    with open(f"{WORK}/wandb_stub/openpyxl/workbook.py", "w") as f:
        f.write("from openpyxl import Workbook  # noqa\n")
    with open(f"{WORK}/wandb_stub/openpyxl/styles.py", "w") as f:
        f.write("from openpyxl import (Alignment, Border, Color, Fill, Font,"
                " GradientFill, NamedStyle, PatternFill, Protection, Side)"
                "  # noqa\n")
    open(f"{WORK}/dataset/__init__.py", "w").close()
    open(f"{WORK}/dataset/aliccp/__init__.py", "w").close()
    with open(f"{WORK}/wandb_stub/wandb/__init__.py", "w") as f:
        f.write("""\
def init(*a, **k):
    return None


def log(*a, **k):
    return None


# --- ADL eval-drift probe (VERDICT r3 item 6) ---------------------------
# The reference's DLM_routing EMA-updates its cluster centers on EVERY
# forward including eval (model/adl.py:63-79 has no training check);
# tpurec freezes centers during eval (documented divergence,
# tpurec/models/adl.py).  With REF_ADL_FREEZE_EVAL_CENTERS=1 this stub
# (imported by the reference's main.py before any training) patches the
# reference to ALSO freeze centers during eval, isolating the effect of
# that one divergence on the reference's own numbers.
import os

if os.environ.get("REF_ADL_FREEZE_EVAL_CENTERS"):
    import torch
    import torch.nn.functional as F
    from model.adl import ADL

    _orig_forward = ADL.forward

    def _forward(self, x, group=None, targets=None, is_training=True):
        self._freeze_centers = not is_training
        return _orig_forward(self, x, group=group, targets=targets,
                             is_training=is_training)

    def _dlm_routing(self, embed_x):
        with torch.no_grad():
            similarity = torch.matmul(embed_x, self.cluster_centers.t())
            coeff = F.softmax(similarity, dim=1)
            if not getattr(self, "_freeze_centers", False):
                weighted_sum = torch.matmul(coeff.t(), embed_x)
                tmp = F.normalize(weighted_sum, p=2, dim=1)
                self.cluster_centers = F.normalize(
                    self.dlm_update_rate * self.cluster_centers
                    + (1 - self.dlm_update_rate) * tmp, p=2, dim=1)
        return coeff

    ADL.forward = _forward
    ADL.DLM_routing = _dlm_routing
""")
    with open(f"{WORK}/dataset/aliccp/preprocess_ali_ccp.py", "w") as f:
        f.write("import sys\n"
                f"sys.path.insert(0, {REPO!r})\n"
                "from tpurec.data.preprocess import reduce_mem  # noqa\n")


def _gt_path(n_domain: int, cluster_k: int) -> str:
    """Settings-keyed ground-truth cluster file, stored with the dataset."""
    return f"{WORK}/dataset/amazon/gt_clusters_d{n_domain}_k{cluster_k}.npy"


def _load_gt(n_expected: int):
    """The unique gt file matching this run's domain count, or None.
    Shape-guarded so a stale file from a different --domains run warns and
    skips ARI instead of raising after training completes (ADVICE round-4)."""
    import glob

    import numpy as np

    hits = sorted(glob.glob(
        f"{WORK}/dataset/amazon/gt_clusters_d{n_expected}_k*.npy"))
    if len(hits) != 1:
        if len(hits) > 1:
            print(f"WARNING: {len(hits)} gt files for d={n_expected}; "
                  "skipping ARI", flush=True)
        return None
    gt = np.load(hits[0])
    if len(gt) != n_expected:
        print(f"WARNING: gt file {hits[0]} has {len(gt)} domains, run has "
              f"{n_expected}; skipping ARI", flush=True)
        return None
    return gt


def gen_data(n_rows=30000, n_domain=6, user_vocab=None, item_vocab=None,
             cluster_k=None, conflict=False):
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
                          field_dims=field_dims,
                          domain_cluster_k=cluster_k,
                          domain_cluster_conflict=conflict)
    # ground truth lives NEXT TO the dataset it describes, keyed by the
    # generation settings (ADVICE round-4: a fixed shared path let a
    # concurrent non-clustered gen_data clobber the gt a clustered run was
    # reading).  Non-clustered runs write nothing and delete only their own
    # settings' file; readers glob by n_domain and shape-guard.
    gt_path = _gt_path(n_domain, cluster_k or 0)
    if data.domain_cluster is not None:
        print(f"GROUND-TRUTH clusters: {data.domain_cluster.tolist()}",
              flush=True)
        os.makedirs(os.path.dirname(gt_path), exist_ok=True)
        np.save(gt_path, data.domain_cluster)
    elif os.path.exists(gt_path):
        os.remove(gt_path)  # stale ground truth from a prior clustered run
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


def gen_data_aliccp(n_rows: int):
    """Raw Ali-CCP-format files for the REFERENCE's own aliccp pipeline:
    gen_raw (scripts/run_e2e_aliccp.py) -> convert_raw_aliccp ->
    WORK/dataset/aliccp/ali_ccp_{train,val,test}.csv.  The reference then
    runs ITS preprocessing (KBins + filtering + 50-domain sampling,
    preprocess.py:253-414) and both sides train on its output CSV."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, REPO)
    import pandas as pd

    from run_e2e_aliccp import gen_raw
    from tpurec.data.preprocess import convert_raw_aliccp

    d = f"{WORK}/dataset/aliccp"
    os.makedirs(d, exist_ok=True)
    train_csv, val_csv = f"{d}/ali_ccp_train.csv", f"{d}/ali_ccp_val.csv"
    test_csv = f"{d}/ali_ccp_test.csv"
    if not os.path.exists(test_csv):
        skel, common = gen_raw(d, n_rows)
        convert_raw_aliccp(skel, common, train_csv, val_fraction=0.5,
                           val_out_csv=val_csv)
        va = pd.read_csv(val_csv)
        va.iloc[: len(va) // 2].to_csv(val_csv, index=False)
        va.iloc[len(va) // 2:].to_csv(test_csv, index=False)
    return d


# the reference's aliccp feature order (run.py:54-58); domain_idx = 10
ALICCP_X_COLS = ["userid", "121", "122", "124", "125", "126", "127", "128",
                 "129", "itemid", "domain", "207", "210", "216", "508",
                 "509", "702", "853", "109_14", "110_14", "127_14",
                 "150_14", "301"]


def ensure_aliccp_caches(pre_csv: str):
    """Pre-tensorize the reference's preprocessed CSV into the .pth caches
    its loader requires: with no --domain_filter, read_split_data returns
    data=None (run.py:141-143) and convert2data_loader can only proceed
    from cached tensors (run.py:212-218)."""
    import pandas as pd
    import torch

    folder = pre_csv.split(".csv")[0]
    if os.path.exists(os.path.join(folder, "test_label_loader.pth")):
        return
    os.makedirs(folder, exist_ok=True)
    df = pd.read_csv(pre_csv)
    for mode, tag in (("train", 0), ("valid", 1), ("test", 2)):
        d = df[df["train_tag"] == tag]
        torch.save(torch.tensor(d[ALICCP_X_COLS].values, dtype=torch.int),
                   os.path.join(folder, f"{mode}_data_loader.pth"))
        torch.save(torch.tensor(d[["click"]].values, dtype=torch.short),
                   os.path.join(folder, f"{mode}_label_loader.pth"))


def run_ours_aliccp(model: str, epochs: int, csv: str, seed: int = 7):
    """Train tpurec on the REFERENCE's preprocessed aliccp CSV (identical
    rows, split by its train_tag column)."""
    sys.path.insert(0, REPO)
    import numpy as np
    import pandas as pd

    from tpurec.config import Config, ModelConfig, TrainConfig
    from tpurec.train import Trainer

    df = pd.read_csv(csv)
    X = df[ALICCP_X_COLS].values.astype(np.int64)
    # guard negative/missing -> 0 (reference reduce_mem keeps ints)
    X = np.maximum(X, 0).astype(np.int32)
    y = df["click"].values.astype(np.float32)
    tag = df["train_tag"].values
    tr_m, va_m, te_m = tag == 0, tag == 1, tag == 2
    field_dims = tuple(int(v) + 1 for v in X.max(0))
    n_domain = field_dims[10]
    w = np.bincount(X[tr_m][:, 10], minlength=n_domain).astype(float)
    w /= w.sum()

    kw = dict(embed_dim=16, dropout=0.2, use_atten=True, atten_embed_dim=64,
              att_layer_num=3, att_head_num=2)
    per_model = {
        "mmoe": dict(mmoe_expert_dims=(256, 128, 64), mmoe_tower_dims=(64, 32)),
        "dcnv2": dict(mlp_dims=(256, 128, 64)),
        "autoint": dict(mlp_dims=(256, 128, 64)),
        "ple": dict(ple_expert_dims=((256, 128), (64,)), ple_tower_dims=(64, 32)),
        "deepfm": dict(mlp_dims=(256, 128)),  # run.py:314 hardcodes these
    }
    mcfg = ModelConfig(model=model, **kw, **per_model.get(model, {}))
    cfg = Config(model=mcfg, train=TrainConfig(bs=512, epoch=epochs, seed=seed))
    d2g = np.zeros(n_domain, np.int64)  # reference default strategy 'mix'
    tr = Trainer(cfg, field_dims, n_domain, 10, domain2group=d2g)
    out = tr.fit((X[tr_m], y[tr_m]), (X[va_m], y[va_m]),
                 test=(X[te_m], y[te_m]), domain_cnt_weight=w)
    print(f"OURS {model} (seed {seed}): valid_auc={out['valid']['total_auc']:.4f} "
          f"valid_mean_auc={out['valid']['mean_auc']:.4f} "
          f"test_auc={out['test']['total_auc']:.4f}", flush=True)
    return out


def run_reference(model: str, epochs: int, strategy: str = "mix", seed: int = 7,
                  dataset: str = "amazon", extra_flags=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{WORK}/wandb_stub:{WORK}:/root/reference"
    cmd = [sys.executable, "/root/reference/main.py", "--model", model,
           "--dataset_name", dataset, "--bs", "512", "--embed_dim", "16",
           "--epoch", str(epochs), "--lr", "1e-3", "--is_set_seed", "1",
           "--seed", str(seed), "--group_strategy", strategy,
           *map(str, extra_flags)]
    r = subprocess.run(cmd, cwd=WORK, env=env, capture_output=True,
                       text=True, timeout=14400)
    keep = ("validation", "test: ", "domain2group_list",
            "current best epoch", "s_group2domain_list")
    lines = [l for l in r.stdout.splitlines()
             if any(k in l for k in keep) and "wandb" not in l]
    print(f"REFERENCE {model} (seed {seed}):")
    for l in lines:
        print("   ", l)
    if not lines:
        print("    (no validation lines; stderr tail:)")
        for l in r.stderr.splitlines()[-6:]:
            print("   ", l)
    sys.stdout.flush()
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


def run_ours_cdc(epochs: int, csv: str, seed: int, cdc_kw: dict,
                 label: str = "cdc"):
    """Full CDC procedure (warmup -> cadence matrix updates -> re-clustered
    split training -> mean-AUC early stop -> best reload) on the shared
    amazon-format CSV — the tpurec side of the head-to-head against the
    reference's train_cdc (run.py:596-645, main.py:31-40)."""
    sys.path.insert(0, REPO)
    import numpy as np
    import pandas as pd

    from tpurec.cdc.engine import CDCTrainer
    from tpurec.config import CDCConfig, Config, ModelConfig, TrainConfig

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

    cfg = Config(
        model=ModelConfig(model="cdc", embed_dim=16, dropout=0.2,
                          mlp_dims=(256, 128, 64), use_atten=True,
                          atten_embed_dim=64, att_layer_num=3,
                          att_head_num=2),
        train=TrainConfig(bs=512, epoch=epochs, seed=seed),
        cdc=CDCConfig(**{"base_model": "mmoe", **cdc_kw}),
    )
    tr = CDCTrainer(cfg, field_dims, n_domain, 3)
    out = tr.fit((X[tr_m], y[tr_m]), (X[va_m], y[va_m]),
                 test=(X[te_m], y[te_m]))
    print(f"OURS {label} (seed {seed}): "
          f"valid_auc={out['valid']['total_auc']:.4f} "
          f"valid_mean_auc={out['valid']['mean_auc']:.4f} "
          f"test_auc={out['test']['total_auc']:.4f} "
          f"test_mean_auc={out['test']['mean_auc']:.4f}", flush=True)
    print(f"OURS {label} (seed {seed}): domain2group_list: "
          f"{out['domain2group_list']}", flush=True)
    # NOTE: fit() restores the BEST-epoch clustering alongside the best
    # weights (engine.py fit: best_cluster captured on stopper.improved and
    # re-installed before building `out`), so this ARI is scored on the
    # partition that produced the reported AUCs.
    gt = _load_gt(len(out["domain2group_list"]))
    if gt is not None:
        from sklearn.metrics import adjusted_rand_score

        d2g = np.asarray(out["domain2group_list"])
        print(f"OURS {label} (seed {seed}): ARI vs ground truth = "
              f"{adjusted_rand_score(gt, d2g):.3f}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="mmoe,deepfm")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--skip_reference", action="store_true")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--seeds", default=None,
                    help="comma-separated seed list; overrides --seed and "
                         "runs every (model, seed) pair on the same data "
                         "(multi-seed parity, VERDICT round-2 item 3)")
    ap.add_argument("--skip_ours", action="store_true")
    ap.add_argument("--reuse_data", action="store_true",
                    help="skip dataset generation when the shared CSV "
                         "already exists (lets parallel invocations share "
                         "one workdir without racing on the writes)")
    ap.add_argument("--rows", type=int, default=30000)
    ap.add_argument("--domains", type=int, default=6)
    ap.add_argument("--user_vocab", type=int, default=None)
    ap.add_argument("--item_vocab", type=int, default=None)
    # 'cpu' keeps both sides on identical hardware; 'default' lets ours
    # run on the TPU (AUC parity is hardware-independent — only wall-clock
    # differs, and big-shape reference runs already take tens of minutes)
    ap.add_argument("--ours_platform", default="cpu",
                    choices=["cpu", "default"])
    ap.add_argument("--dataset", default="amazon",
                    choices=["amazon", "aliccp"])
    # reduced CDC settings (both sides identically) so the reference's
    # train_cdc finishes on CPU — VERDICT r3 item 1
    ap.add_argument("--n_cluster", type=int, default=3)
    ap.add_argument("--cluster_k", type=int, default=None,
                    help="generate domains from K ground-truth clusters")
    ap.add_argument("--conflict", action="store_true",
                    help="antipodal cluster label functions (negative-"
                         "transfer regime) in the shared data")
    ap.add_argument("--n_causal_mask", type=int, default=8)
    ap.add_argument("--cdc_warmup", type=int, default=25,
                    help="warmup_step in the reference's 1024-row units")
    ap.add_argument("--cdc_interval", type=int, default=20,
                    help="update_interval in 1024-row units")
    ap.add_argument("--cdc_matrix_step", type=int, default=2)
    ap.add_argument("--cdc_plus", action="store_true",
                    help="enable the tpurec cdc-plus knobs on OUR side "
                         "only (probe_eval_batches=8, mask_ema=0.5, "
                         "freeze_after_updates=3); the reference side "
                         "still runs its own train_cdc — this races the "
                         "extended procedure against the original")
    # individual cdc-plus knobs (ours only) for mechanism A/Bs — e.g.
    # --probe_eval_batches 8 alone isolates probe-noise as the source of
    # plain-CDC's conflict-seed variance (VERDICT round-4 item 3)
    ap.add_argument("--probe_eval_batches", type=int, default=None)
    ap.add_argument("--mask_ema", type=float, default=None)
    ap.add_argument("--freeze_after_updates", type=int, default=None)
    # CDC base architecture, BOTH sides (reference main.py:19 --base_model;
    # run.py:424-425 wraps mmoe/ple/pepnet/epnet/star) — star exercises the
    # partitioned-norm group=None path end to end (VERDICT round-4 item 1)
    ap.add_argument("--cdc_base", default="mmoe")
    args = ap.parse_args()

    import jax

    if args.ours_platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    setup_workdir()
    if args.dataset == "aliccp":
        d = gen_data_aliccp(args.rows)
        pre_csv = os.path.join(
            d, "thresh10_ndomain50_modemix_interval_random.csv")
        if not os.path.exists(pre_csv) and not args.skip_reference:
            # first invocation runs the REFERENCE's own preprocessing
            # (writes pre_csv), then dies at its cache-only loader quirk —
            # expected; we then build the caches it needs
            run_reference(args.models.split(",")[0], 1, "mix", args.seed,
                          "aliccp")
        if os.path.exists(pre_csv):
            ensure_aliccp_caches(pre_csv)
        seeds = ([int(s) for s in args.seeds.split(",")] if args.seeds
                 else [args.seed])
        for m in args.models.split(","):
            for s in seeds:
                if not args.skip_reference:
                    try:
                        run_reference(m, args.epochs, "mix", s, "aliccp")
                    except Exception as e:
                        print(f"REFERENCE {m} errored: {e}")
                if not args.skip_ours:
                    if not os.path.exists(pre_csv):
                        raise SystemExit(
                            "aliccp mode trains ours on the REFERENCE's "
                            f"preprocessed CSV; {pre_csv} missing — run "
                            "without --skip_reference first")
                    run_ours_aliccp(m, args.epochs, pre_csv, s)
        return
    csv = f"{WORK}/dataset/amazon/prepare2train_filter_12month.csv"
    if not (args.reuse_data and os.path.exists(csv)):
        csv = gen_data(args.rows, args.domains, args.user_vocab,
                       args.item_vocab, cluster_k=args.cluster_k,
                       conflict=args.conflict)
    seeds = ([int(s) for s in args.seeds.split(",")] if args.seeds
             else [args.seed])
    for m in args.models.split(","):
        if m == "cdc":
            cdc_kw = dict(n_cluster=args.n_cluster,
                          n_causal_mask=args.n_causal_mask,
                          warmup_step=args.cdc_warmup,
                          update_matrix_step=args.cdc_matrix_step,
                          update_interval=args.cdc_interval,
                          base_model=args.cdc_base)
            ours_label = ("cdc" if args.cdc_base == "mmoe"
                          else f"cdc({args.cdc_base})")
            if args.cdc_plus:
                cdc_kw.update(probe_eval_batches=8, mask_ema=0.5,
                              freeze_after_updates=3)
                ours_label = "cdc-plus"
            knob_bits = []
            for knob in ("probe_eval_batches", "mask_ema",
                         "freeze_after_updates"):
                val = getattr(args, knob)
                if val is not None:
                    cdc_kw[knob] = val
                    knob_bits.append(f"{knob}={val}")
            if knob_bits:
                ours_label = "cdc[" + ",".join(knob_bits) + "]"
            ref_flags = ["--base_model", args.cdc_base,
                         "--n_cluster", args.n_cluster,
                         "--n_causal_mask", args.n_causal_mask,
                         "--warmup_step", args.cdc_warmup,
                         "--update_matrix_step", args.cdc_matrix_step,
                         "--update_interval", args.cdc_interval]
            for s in seeds:
                if not args.skip_reference:
                    try:
                        run_reference("cdc", args.epochs, "mix", s,
                                      extra_flags=ref_flags)
                    except Exception as e:
                        print(f"REFERENCE cdc errored: {e}")
                if not args.skip_ours:
                    run_ours_cdc(args.epochs, csv, s, cdc_kw,
                                 label=ours_label)
            continue
        # reference epnet/hinet squeeze their n_tower=1 output and crash
        # under mix (run.py:484); their working config is group split
        strategy = "split" if ":" not in m and m in ("epnet", "hinet") else "mix"
        if ":" in m:
            m, strategy = m.split(":")
        for s in seeds:
            if not args.skip_reference:
                try:
                    run_reference(m, args.epochs, strategy, s)
                except Exception as e:  # reference crashes on torch>=2.6 reload
                    print(f"REFERENCE {m} errored: {e}")
            if not args.skip_ours:
                run_ours(m, args.epochs, csv, strategy, s)


if __name__ == "__main__":
    main()
