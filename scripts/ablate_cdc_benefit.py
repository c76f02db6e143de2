"""CDC-benefit ablation (VERDICT r3 item 2): does causal clustering pay?

The CDC paper's core claim is that its causally-derived domain grouping
beats the static built-in strategies (`/root/reference/config.py:61-71`:
``mix`` = one shared group, ``split`` = one group per domain).  This
script races four arms on identical realistic-scale synthetic Ali-CCP
data, same MMoE base (aux attention ON), same epochs/early-stop budget,
>=1 seeds, and reports the reference's own early-stop metric
(count-weighted per-domain ``mean_auc``, run.py:442) plus total AUC:

  cdc     — full CDC procedure (warmup -> cadence matrix updates ->
            re-clustered split training), reference defaults
  mix     — all domains in one group (reference group_strategy=mix)
  split   — one group per domain (reference group_strategy=split)
  random4 — domains frozen into 4 random clusters (the "is it the
            clustering or just having 4 towers?" control)

With --cluster_k K the generator draws per-domain effects from K latent
centers (known ground truth); the cdc arm then also reports the adjusted
Rand index between its final clustering and the truth.

Usage:
  python scripts/ablate_cdc_benefit.py --rows 1000000 --domains 50 \
      --seeds 7,13,23 --epochs 3 [--cluster_k 4] [--arms cdc,mix,...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIELD_DIMS_50 = (250000, 10, 10, 10, 10, 10, 10, 10, 10, 1368287, 50,
                 5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4)


def run_arm(arm, data, seed, epochs, n_cluster, update_interval=1000,
            update_matrix_step=2, warmup_step=200):
    import jax

    from tpurec.config import CDCConfig, Config, ModelConfig, TrainConfig
    from tpurec.train import Trainer

    mcfg_kw = dict(embed_dim=16, mlp_dims=(256, 128, 64),
                   mmoe_expert_dims=(256, 128, 64), mmoe_tower_dims=(64, 32),
                   use_atten=True, atten_embed_dim=64, att_layer_num=3,
                   att_head_num=2)
    tcfg = TrainConfig(bs=512, epoch=epochs, seed=seed,
                       embedding_moments_dtype="bfloat16")
    t0 = time.perf_counter()
    if arm.startswith("cdc"):
        from tpurec.cdc.engine import CDCTrainer

        # "cdc" = reference defaults; "cdc-strong" = 4x counterfactual
        # probe steps (stronger per-probe affinity signal at small scale);
        # "cdc-plus" = strong probe + the tpurec cdc-plus extensions
        # (averaged probe evals, mask EMA, cluster freeze — CDCConfig)
        plus = arm == "cdc-plus"
        ums = (update_matrix_step * 4 if arm in ("cdc-strong", "cdc-plus")
               else update_matrix_step)
        extra = (dict(probe_eval_batches=8, mask_ema=0.5,
                      freeze_after_updates=3) if plus else {})
        cfg = Config(
            model=ModelConfig(model="cdc", **mcfg_kw),
            train=tcfg,
            cdc=CDCConfig(base_model="mmoe", n_cluster=n_cluster,
                          n_causal_mask=50, update_matrix_step=ums,
                          warmup_step=warmup_step,
                          update_interval=update_interval, **extra),
        )
        tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
        out = tr.fit(data.train, data.valid, test=data.test)
    else:
        rng = np.random.default_rng(seed + 1000)
        d2g = {
            "mix": np.zeros(data.n_domain, np.int64),
            "split": np.arange(data.n_domain, dtype=np.int64),
            "random4": rng.integers(0, n_cluster, data.n_domain).astype(np.int64),
            # oracle = the generator's ground-truth clustering (upper bound
            # for what CDC's recovered grouping can buy)
            "oracle": (None if data.domain_cluster is None
                       else data.domain_cluster.astype(np.int64)),
        }[arm]
        if d2g is None:
            raise ValueError("oracle arm requires --cluster_k")
        cfg = Config(model=ModelConfig(model="mmoe", **mcfg_kw), train=tcfg)
        tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                     domain2group=d2g)
        out = tr.fit(data.train, data.valid, test=data.test,
                     domain_cnt_weight=data.domain_cnt_weight())
        out["domain2group_list"] = d2g.tolist()
    out["wall_s"] = round(time.perf_counter() - t0, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--domains", type=int, default=50)
    ap.add_argument("--seeds", default="7,13,23")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--n_cluster", type=int, default=4)
    ap.add_argument("--cluster_k", type=int, default=None,
                    help="generate domains from K ground-truth clusters")
    ap.add_argument("--data_seed", type=int, default=0)
    ap.add_argument("--skew", type=float, default=1.2,
                    help="domain-size dirichlet alpha (smaller = more "
                         "tiny domains that must borrow strength)")
    ap.add_argument("--cluster_noise", type=float, default=0.15,
                    help="within-cluster jitter of domain effects "
                         "(smaller = sharper ground-truth structure)")
    ap.add_argument("--update_interval", type=int, default=1000,
                    help="CDC matrix-update cadence in steps (reference "
                         "default 1000, tuned for 85M-row Ali-CCP; scale "
                         "down proportionally for small synthetic runs)")
    ap.add_argument("--update_matrix_step", type=int, default=2,
                    help="CDC counterfactual probe steps per domain "
                         "(reference default 2; cdc-strong arm uses 4x)")
    ap.add_argument("--warmup_step", type=int, default=200,
                    help="CDC warmup steps before first clustering "
                         "(reference default 200)")
    ap.add_argument("--conflict", action="store_true",
                    help="antipodal cluster label functions (negative-"
                         "transfer regime; see make_synthetic docstring)")
    ap.add_argument("--arms", default="cdc,mix,split,random4")
    ap.add_argument("--platform", default="default", choices=["default", "cpu"])
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_prng_impl", "rbg")

    from tpurec.data import make_synthetic

    data = make_synthetic(
        n_rows=args.rows, n_fields=23, n_domain=args.domains, domain_idx=10,
        seed=args.data_seed, domain_skew=args.skew,
        field_dims=FIELD_DIMS_50[:10] + (args.domains,) + FIELD_DIMS_50[11:],
        domain_cluster_k=args.cluster_k,
        domain_cluster_noise=args.cluster_noise,
        domain_cluster_conflict=args.conflict,
    )
    if data.domain_cluster is not None:
        print(f"ground-truth clusters: {data.domain_cluster.tolist()}",
              flush=True)

    results = {}
    for seed in [int(s) for s in args.seeds.split(",")]:
        for arm in args.arms.split(","):
            out = run_arm(arm, data, seed, args.epochs, args.n_cluster,
                          update_interval=args.update_interval,
                          update_matrix_step=args.update_matrix_step,
                          warmup_step=args.warmup_step)
            rec = {
                "valid_auc": round(float(out["valid"]["total_auc"]), 4),
                "valid_mean_auc": round(float(out["valid"]["mean_auc"]), 4),
                "test_auc": round(float(out["test"]["total_auc"]), 4),
                "test_mean_auc": round(float(out["test"]["mean_auc"]), 4),
                "wall_s": out["wall_s"],
            }
            if arm.startswith("cdc") and data.domain_cluster is not None:
                from sklearn.metrics import adjusted_rand_score

                rec["ari_vs_truth"] = round(adjusted_rand_score(
                    data.domain_cluster, out["domain2group_list"]), 3)
                rec["domain2group"] = list(map(int, out["domain2group_list"]))
            results[f"{arm}/seed{seed}"] = rec
            print(f"ARM {arm} seed {seed}: {json.dumps(rec)}", flush=True)

    # per-arm means
    for arm in args.arms.split(","):
        rows = [v for k, v in results.items() if k.startswith(arm + "/")]
        if rows:
            print(f"MEAN {arm}: "
                  f"valid_mean_auc="
                  f"{np.mean([r['valid_mean_auc'] for r in rows]):.4f} "
                  f"valid_auc={np.mean([r['valid_auc'] for r in rows]):.4f} "
                  f"test_mean_auc="
                  f"{np.mean([r['test_mean_auc'] for r in rows]):.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
