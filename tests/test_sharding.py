"""Distributed tests on the virtual 8-device CPU mesh: sharded-vs-single
same-loss equivalence (SURVEY.md §4 distributed strategy) and embedding
row-sharding placement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpurec.config import ModelConfig, TrainConfig
from tpurec.models import build_model
from tpurec.parallel import Shardings, make_mesh
from tpurec.train.reg import reg_coef_tree
from tpurec.train.step import TrainState, make_optimizer, make_train_step

FIELD_DIMS = (64, 48, 16, 8, 24)
DOMAIN_IDX = 3
BS = 64

CFG = ModelConfig(
    model="mmoe", embed_dim=8, mmoe_expert_dims=(16, 8), mmoe_tower_dims=(8,),
    use_atten=True, atten_embed_dim=8, att_layer_num=1, dropout=0.0,
)


def _setup(mesh=None, shardings=None):
    model = build_model("mmoe", FIELD_DIMS, 2, DOMAIN_IDX, CFG)
    tcfg = TrainConfig(bs=BS)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, d, size=BS) for d in FIELD_DIMS], axis=1)
    batch = {
        "x": jnp.asarray(x, jnp.int32),
        "y": jnp.asarray(rng.integers(0, 2, BS), jnp.float32),
        "group": jnp.asarray(x[:, DOMAIN_IDX] % 2, jnp.int32),
        "mask": jnp.ones((BS,), jnp.float32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["x"])
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    reg = reg_coef_tree(params, "mmoe", 1e-5, 1e-5, 1e-5)
    tx = make_optimizer(tcfg)
    state = TrainState(
        params=params, opt_state=tx.init(params),
        model_state=model_state, step=jnp.zeros((), jnp.int32),
    )
    if mesh is not None:
        state = jax.device_put(state, shardings.state_sharding(state))
        batch = jax.device_put(batch, shardings.batch_sharding(batch))
    step, _ = make_train_step(
        model, tcfg, reg, multi_tower=True,
        mutable_keys=tuple(model_state.keys()), optimizer=tx,
    )
    return state, batch, step


@pytest.mark.slow
def test_sharded_matches_single_device_losses():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    # single device
    state_s, batch_s, step_s = _setup()
    losses_single = []
    for i in range(4):
        state_s, loss = step_s(state_s, batch_s, jax.random.PRNGKey(i))
        losses_single.append(float(loss))

    # 4 (data) x 2 (model) mesh
    mesh = make_mesh(4, 2)
    shardings = Shardings(mesh)
    state_m, batch_m, step_m = _setup(mesh, shardings)
    losses_mesh = []
    with mesh:
        for i in range(4):
            state_m, loss = step_m(state_m, batch_m, jax.random.PRNGKey(i))
            losses_mesh.append(float(loss))

    np.testing.assert_allclose(losses_single, losses_mesh, rtol=2e-5)
    # params stay numerically equal after 4 sharded steps
    t_single = np.asarray(state_s.params["embedding"]["table"])
    t_mesh = np.asarray(jax.device_get(state_m.params["embedding"]["table"]))
    np.testing.assert_allclose(t_single, t_mesh, atol=2e-5)


@pytest.mark.slow
def test_embedding_table_row_sharded_across_model_axis():
    mesh = make_mesh(4, 2)
    shardings = Shardings(mesh)
    state, batch, step = _setup(mesh, shardings)
    with mesh:
        state, loss = step(state, batch, jax.random.PRNGKey(0))
    table = state.params["embedding"]["table"]
    # row-sharded over 'model': each shard holds half the rows
    from jax.sharding import PartitionSpec as P

    assert table.sharding.spec == P("model", None) or table.sharding.spec == P("model")
    shard_shapes = {s.data.shape for s in table.addressable_shards}
    total_rows = sum(FIELD_DIMS)
    assert shard_shapes == {(total_rows // 2, 8)} or shard_shapes == {
        ((total_rows + 1) // 2, 8), (total_rows // 2, 8)
    }
    # dense params replicated
    w = state.params["experts"]["linear_0"]["weight"]
    assert w.sharding.spec == P()


@pytest.mark.slow
def test_expert_parallel_matches_single_device():
    """expert_parallel=True shards the MMoE expert bank's leading axis over
    the model axis (default n_expert=4 divides n_model=2) without changing
    the training math."""
    state_s, batch_s, step_s = _setup()
    losses_single = []
    for i in range(3):
        state_s, loss = step_s(state_s, batch_s, jax.random.PRNGKey(i))
        losses_single.append(float(loss))

    mesh = make_mesh(4, 2)
    shardings = Shardings(mesh, expert_parallel=True)
    state_m, batch_m, step_m = _setup(mesh, shardings)
    from jax.sharding import PartitionSpec as P

    w = state_m.params["experts"]["linear_0"]["weight"]  # [E, in, out]
    assert w.sharding.spec[0] == "model"
    assert w.addressable_shards[0].data.shape[0] == w.shape[0] // 2
    # BN running stats [E, H] shard congruently; 1-D BN scale stays replicated
    bn_mean = state_m.model_state["batch_stats"]["experts"]["bn_0"]["mean"]
    assert bn_mean.sharding.spec[0] == "model"
    bn_scale = state_m.params["experts"]["bn_0"]["scale"]
    assert bn_scale.sharding.spec == P()

    losses_mesh = []
    with mesh:
        for i in range(3):
            state_m, loss = step_m(state_m, batch_m, jax.random.PRNGKey(i))
            losses_mesh.append(float(loss))
    np.testing.assert_allclose(losses_single, losses_mesh, rtol=2e-5)
    # expert-bank optimizer moments shard with the params
    mu = jax.tree_util.tree_leaves_with_path(state_m.opt_state)
    expert_mu = [leaf for path, leaf in mu
                 if any(getattr(k, "key", "") == "experts" for k in path)
                 and getattr(leaf, "ndim", 0) == 3]
    assert expert_mu and all(l.sharding.spec[0] == "model" for l in expert_mu)


def test_batch_sharded_across_data_axis():
    mesh = make_mesh(8, 1)
    shardings = Shardings(mesh)
    batch = {"x": jnp.zeros((BS, 5), jnp.int32), "y": jnp.zeros((BS,))}
    placed = jax.device_put(batch, shardings.batch_sharding(batch))
    assert len(placed["x"].addressable_shards) == 8
    assert placed["x"].addressable_shards[0].data.shape == (BS // 8, 5)


def test_explicit_sharded_embedding_lookup_matches_take(rng):
    from tpurec.parallel.embedding import shard_table, sharded_embedding_lookup

    mesh = make_mesh(2, 4)
    V, D, B, Fn = 103, 8, 16, 5  # V not divisible by 4 -> exercises padding
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, (B, Fn)).astype(np.int32))
    with mesh:
        tbl_sharded = shard_table(table, mesh)
        ids_sharded = jax.device_put(
            ids, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data", None))
        )
        out = sharded_embedding_lookup(tbl_sharded, ids_sharded, mesh)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)
    # result stays sharded over data
    assert len(out.addressable_shards) == 8


def test_explicit_sharded_lookup_grads(rng):
    from tpurec.parallel.embedding import shard_table, sharded_embedding_lookup

    mesh = make_mesh(2, 4)
    V, D, B, Fn = 40, 4, 8, 3
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, (B, Fn)).astype(np.int32))

    def loss_sharded(tbl):
        with mesh:
            t = shard_table(tbl, mesh)
            out = sharded_embedding_lookup(t, ids, mesh)
        return jnp.sum(jnp.tanh(out))

    def loss_ref(tbl):
        return jnp.sum(jnp.tanh(jnp.take(tbl, ids, axis=0)))

    g1 = jax.grad(loss_sharded)(table)
    g2 = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
