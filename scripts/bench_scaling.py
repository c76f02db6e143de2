"""Scaling-efficiency harness: examples/sec/chip across mesh sizes.

Measures the flagship hybrid train step (bench.py config) data-parallel
over (n, 1) meshes built from however many devices are present, at FIXED
PER-CHIP batch (weak scaling — efficiency = throughput_n / (n *
throughput_1)).  On this image only one real TPU chip is visible, so by
default the harness runs on an 8-device virtual CPU mesh to validate the
mechanics and the collective structure; on real multi-chip hardware run
it as-is (it uses whatever jax.devices() offers).

Usage: python scripts/bench_scaling.py [--real]   (--real: no CPU forcing)
"""

import sys
import time

import numpy as np

if "--real" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpurec.config import ModelConfig, TrainConfig  # noqa: E402
from tpurec.models import build_model  # noqa: E402
from tpurec.parallel.mesh import Shardings, make_mesh  # noqa: E402
from tpurec.train.hybrid import make_hybrid_train_step  # noqa: E402
from tpurec.train.reg import reg_coef_tree  # noqa: E402
from tpurec.train.sparse import init_sparse_opt_state  # noqa: E402
from tpurec.train.step import TrainState, make_optimizer  # noqa: E402

REAL = "--real" in sys.argv
if REAL:
    FIELD_DIMS = (250000, 10, 10, 10, 10, 10, 10, 10, 10, 1368287, 50,
                  5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4)
    PER_CHIP_BS, K, MEASURE = 512, 16, 8
else:  # CPU-mesh validation: tiny table, tiny steps
    FIELD_DIMS = (5000, 10, 10, 10, 10, 9000, 6, 12, 4)
    PER_CHIP_BS, K, MEASURE = 64, 2, 2
DOMAIN_IDX = min(10, len(FIELD_DIMS) - 1)
N_TOWER = 4


def run_mesh(n_data: int) -> float:
    mesh = make_mesh(n_data=n_data, n_model=1,
                     devices=jax.devices()[: n_data])
    sh = Shardings(mesh)
    bs = PER_CHIP_BS * n_data

    mcfg = ModelConfig(
        model="mmoe", embed_dim=16,
        mmoe_expert_dims=(256, 128, 64), mmoe_tower_dims=(64, 32),
        use_atten=True, atten_embed_dim=64, att_layer_num=3, att_head_num=2,
    )
    tcfg = TrainConfig(bs=bs)
    model = build_model("mmoe", FIELD_DIMS, N_TOWER, DOMAIN_IDX, mcfg)

    rng = np.random.default_rng(0)
    xs = np.stack([rng.integers(0, d, size=(K, bs)) for d in FIELD_DIMS],
                  axis=2).astype(np.int32)
    batches = {
        "x": jnp.asarray(xs),
        "y": jnp.asarray(rng.integers(0, 2, (K, bs)).astype(np.float32)),
        "group": jnp.asarray((xs[:, :, DOMAIN_IDX] % N_TOWER).astype(np.int32)),
        "mask": jnp.ones((K, bs), jnp.float32),
    }
    from jax.sharding import NamedSharding, PartitionSpec as P

    batches = {
        k: jax.device_put(v, NamedSharding(mesh, P(None, "data")))
        for k, v in batches.items()
    }

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batches["x"][0])
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    reg = reg_coef_tree(params, "mmoe", 1e-5, 1e-5, 1e-5)
    tx = make_optimizer(tcfg)
    state = TrainState(
        params=params, opt_state=init_sparse_opt_state(params, tx),
        model_state=model_state, step=jnp.zeros((), jnp.int32))
    state = jax.device_put(state, sh.state_sharding(state))

    scan_steps, _ = make_hybrid_train_step(
        model, tcfg, reg, multi_tower=True,
        mutable_keys=tuple(model_state.keys()),
        l2_reg_embedding=1e-5, optimizer=tx, scan_k=K)

    step_rng = jax.random.PRNGKey(1)
    for _ in range(2):
        step_rng, r = jax.random.split(step_rng)
        state, losses = scan_steps(state, batches, jax.random.split(r, K))
    np.asarray(losses)
    t0 = time.perf_counter()
    for _ in range(MEASURE):
        step_rng, r = jax.random.split(step_rng)
        state, losses = scan_steps(state, batches, jax.random.split(r, K))
    np.asarray(losses)
    dt = time.perf_counter() - t0
    return bs * K * MEASURE / dt


def main():
    n_dev = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]
    base = None
    print(f"devices: {n_dev} ({jax.devices()[0].platform})")
    for n in sizes:
        eps = run_mesh(n)
        if base is None:
            base = eps
        eff = eps / (n * base)
        print(f"mesh (data={n:2d}): {eps:12,.0f} ex/s total, "
              f"{eps/n:10,.0f}/chip, scaling efficiency {eff*100:5.1f}%")


if __name__ == "__main__":
    main()
