"""Capture a jax.profiler trace of the bench train step and print the
top device ops by total time (parsed from the xplane protobuf)."""

import glob
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

FIELD_DIMS = (
    250000, 10, 10, 10, 10, 10, 10, 10, 10,
    1368287,
    50,
    5000, 400, 3000, 80, 80, 60, 30, 12, 12, 12, 12, 4,
)
DOMAIN_IDX = 10
N_TOWER = 4
BS = 512
K = 16


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from tpurec.config import ModelConfig, TrainConfig
    from tpurec.models import build_model
    from tpurec.train.hybrid import make_hybrid_train_step
    from tpurec.train.reg import reg_coef_tree
    from tpurec.train.sparse import init_sparse_opt_state
    from tpurec.train.step import TrainState, make_optimizer

    mcfg = ModelConfig(
        model="mmoe", embed_dim=16,
        mmoe_expert_dims=(256, 128, 64), mmoe_tower_dims=(64, 32),
        use_atten=True, atten_embed_dim=64, att_layer_num=3, att_head_num=2,
    )
    tcfg = TrainConfig(bs=BS)
    model = build_model("mmoe", FIELD_DIMS, N_TOWER, DOMAIN_IDX, mcfg)
    rng = np.random.default_rng(0)
    xs = np.stack([rng.integers(0, d, size=(K, BS)) for d in FIELD_DIMS], axis=2).astype(np.int32)
    batches = {
        "x": jnp.asarray(xs),
        "y": jnp.asarray(rng.integers(0, 2, (K, BS)).astype(np.float32)),
        "group": jnp.asarray((xs[:, :, DOMAIN_IDX] % N_TOWER).astype(np.int32)),
        "mask": jnp.ones((K, BS), jnp.float32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batches["x"][0])
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    reg = reg_coef_tree(params, "mmoe", 1e-5, 1e-5, 1e-5)
    tx = make_optimizer(tcfg)
    state = TrainState(
        params=params, opt_state=init_sparse_opt_state(params, tx),
        model_state=model_state, step=jnp.zeros((), jnp.int32))
    scan_steps, _ = make_hybrid_train_step(
        model, tcfg, reg, multi_tower=True,
        mutable_keys=tuple(model_state.keys()),
        l2_reg_embedding=1e-5, optimizer=tx, scan_k=K)

    for i in range(2):
        state, losses = scan_steps(state, batches, jax.random.split(jax.random.PRNGKey(i), K))
    np.asarray(losses)

    tmpdir = tempfile.mkdtemp(prefix="jaxtrace")
    with jax.profiler.trace(tmpdir):
        for i in range(4):
            state, losses = scan_steps(
                state, batches, jax.random.split(jax.random.PRNGKey(9 + i), K))
        np.asarray(losses)

    paths = glob.glob(os.path.join(tmpdir, "**", "*.xplane.pb"), recursive=True)
    print("trace files:", paths)
    if not paths:
        return

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    n_steps = 4 * K
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
                print(f"\n=== {plane.name} / line {line.name!r}: "
                      f"{sum(total.values())/n_steps*1e3:.0f} us/step over "
                      f"{len(total)} op kinds ===")
                for name, ms in sorted(total.items(), key=lambda kv: -kv[1])[:35]:
                    print(f"  {ms/n_steps*1e3:8.1f} us/step  x{count[name]//n_steps:<4d} {name[:100]}")


if __name__ == "__main__":
    main()
