"""Measure the lazy-sparse embedding update vs the hybrid (exact) path
(VERDICT round-2 item 4).

Same shapes as bench.py (MMoE flagship, 23 Ali-CCP-like fields incl. the
1.37M itemid vocab, bs=512, K=16-step scanned dispatches, bf16 table
moments): the hybrid path is the production default (bit-equivalent to
the reference's dense Adam + dense embedding L2, run.py:476-492 +
layer.py:31); the sparse paths are lazy Adam on touched rows only
(tpurec/train/sparse.py) with either duplicate-id dedup strategy —
'scatter' (one dense table-sized scatter-add, O(vocab)/step) or 'sort'
(argsort + segment-sum, vocab-independent).  Sparse is legal ONLY for
plain zoo training (CDCTrainer refuses it, engine.py: it would change
the counterfactual matrices).

Prints one JSON line per path.

Usage: python scripts/bench_sparse.py [--k 16] [--measure 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIELD_DIMS = (
    250000, 10, 10, 10, 10, 10, 10, 10, 10,
    1368287,
    50,
    5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4,
)
DOMAIN_IDX = 10
N_TOWER = 4
BS = 512


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--measure", type=int, default=8)
    ap.add_argument("--item_vocab", type=int, default=None,
                    help="itemid vocab override: the dense Adam sweep "
                    "scales with the table, the sparse scatter doesn't — "
                    "grow this past the reference's 1.37M to find the "
                    "crossover (sparse.py docstring estimates ~5M rows)")
    args = ap.parse_args()
    K = args.k
    fd = (FIELD_DIMS if args.item_vocab is None
          else FIELD_DIMS[:9] + (args.item_vocab,) + FIELD_DIMS[10:])

    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from tpurec.config import ModelConfig, TrainConfig
    from tpurec.models import build_model
    from tpurec.train.hybrid import make_hybrid_train_step
    from tpurec.train.reg import reg_coef_tree
    from tpurec.train.sparse import init_sparse_opt_state, make_sparse_train_step
    from tpurec.train.step import TrainState, make_optimizer

    mcfg = ModelConfig(
        model="mmoe", embed_dim=16,
        mmoe_expert_dims=(256, 128, 64), mmoe_tower_dims=(64, 32),
        use_atten=True, atten_embed_dim=64, att_layer_num=3, att_head_num=2,
    )
    tcfg = TrainConfig(bs=BS, embedding_moments_dtype="bfloat16")
    model = build_model("mmoe", fd, N_TOWER, DOMAIN_IDX, mcfg)

    rng = np.random.default_rng(0)
    xs = np.stack(
        [rng.integers(0, d, size=(K, BS)) for d in fd], axis=2
    ).astype(np.int32)
    batches = {
        "x": jnp.asarray(xs),
        "y": jnp.asarray(rng.integers(0, 2, (K, BS)).astype(np.float32)),
        "group": jnp.asarray((xs[:, :, DOMAIN_IDX] % N_TOWER).astype(np.int32)),
        "mask": jnp.ones((K, BS), jnp.float32),
    }

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batches["x"][0])
    params0 = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    reg = reg_coef_tree(params0, "mmoe", 1e-5, 1e-5, 1e-5)
    tx = make_optimizer(tcfg)
    common = dict(multi_tower=True, mutable_keys=tuple(model_state.keys()),
                  l2_reg_embedding=1e-5, optimizer=tx, scan_k=K)

    paths = {
        "hybrid": make_hybrid_train_step(model, tcfg, reg, **common)[0],
        "sparse-scatter": make_sparse_train_step(
            model, tcfg, reg, dedup="scatter", **common)[0],
        "sparse-sort": make_sparse_train_step(
            model, tcfg, reg, dedup="sort", **common)[0],
    }

    for name, scan_steps in paths.items():
        state = TrainState(
            params=jax.tree_util.tree_map(jnp.copy, params0),
            opt_state=init_sparse_opt_state(
                params0, tx, tcfg.embedding_moments_dtype),
            model_state=jax.tree_util.tree_map(jnp.copy, model_state),
            step=jnp.zeros((), jnp.int32),
        )
        step_rng = jax.random.PRNGKey(1)
        for _ in range(args.warmup):
            step_rng, r = jax.random.split(step_rng)
            state, losses = scan_steps(state, batches, jax.random.split(r, K))
        _ = np.asarray(losses)  # hard sync

        best_dt = float("inf")
        for _pass in range(2):  # best-of-2: discard tunnel-cold pass
            t0 = time.perf_counter()
            for _ in range(args.measure):
                step_rng, r = jax.random.split(step_rng)
                state, losses = scan_steps(
                    state, batches, jax.random.split(r, K))
            _ = np.asarray(losses)
            best_dt = min(best_dt, time.perf_counter() - t0)
        eps = BS * K * args.measure / best_dt
        print(json.dumps({
            "metric": f"mmoe_train_examples_per_sec_per_chip[{name}]",
            "value": round(eps, 1),
            "unit": "examples/sec/chip",
            "ms_per_step": round(1000 * best_dt / (K * args.measure), 3),
            "table_rows": sum(fd),
        }), flush=True)


if __name__ == "__main__":
    main()
