"""Model zoo: init/apply shapes, train-mode mutation, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurec.config import ModelConfig
from tpurec.models import MODEL_REGISTRY, MULTI_TOWER_OUTPUT, NEEDS_GROUP, build_model

FIELD_DIMS = (13, 11, 9, 4, 17, 8)  # domain field at idx 3 with 4 domains
DOMAIN_IDX = 3
N_TOWER = 3
B = 16

SMALL_CFG = ModelConfig(
    embed_dim=8,
    mlp_dims=(16, 8),
    tower_dims=(16, 8),
    mmoe_expert_dims=(16, 8),
    mmoe_tower_dims=(8,),
    ple_expert_dims=((16,), (8,)),
    ple_tower_dims=(8,),
    sei_dims=(8, 8),
    atten_embed_dim=8,
    att_layer_num=1,
    gate_hidden_dim=8,
)


def _make_inputs(rng):
    X = np.stack(
        [rng.integers(0, d, size=B) for d in FIELD_DIMS], axis=1
    ).astype(np.int32)
    group = (X[:, DOMAIN_IDX] % N_TOWER).astype(np.int32)
    return jnp.asarray(X), jnp.asarray(group)


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
@pytest.mark.slow
def test_model_shapes_and_grads(name, rng):
    x, group = _make_inputs(rng)
    model = build_model(name, FIELD_DIMS, N_TOWER, DOMAIN_IDX, SMALL_CFG)
    variables = model.init(jax.random.PRNGKey(0), x, group=group)
    params = variables["params"]
    state = {k: v for k, v in variables.items() if k != "params"}

    # eval forward
    out = model.apply({"params": params, **state}, x, group=group, train=False)
    expect_multi = name in MULTI_TOWER_OUTPUT and not name.endswith("-single")
    if expect_multi:
        assert out.shape == (B, N_TOWER)
    else:
        assert out.shape == (B,)
    assert np.all(np.isfinite(np.array(out)))

    # train forward mutates stats & accepts dropout rng
    mutable = [k for k in state] or ["batch_stats"]
    out_t, new_state = model.apply(
        {"params": params, **state}, x, group=group, train=True,
        mutable=mutable, rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out_t.shape == out.shape

    # gradient flows into the embedding table
    def loss_fn(p):
        o = model.apply(
            {"params": p, **state}, x, group=group, train=True,
            mutable=mutable, rngs={"dropout": jax.random.PRNGKey(1)},
        )[0]
        y = jnp.ones_like(o) * 0.5
        return jnp.mean((jax.nn.sigmoid(o) - y) ** 2)

    g = jax.grad(loss_fn)(params)
    g_emb = np.array(g["embedding"]["table"])
    assert np.isfinite(g_emb).all()
    assert np.abs(g_emb).sum() > 0


@pytest.mark.slow
def test_row_mask_padding_invariance(rng):
    """Appending padded rows (mask=0) must not change real rows' outputs in
    train mode (the fixed-shape replacement for variable tail batches)."""
    x, group = _make_inputs(rng)
    model = build_model("mmoe", FIELD_DIMS, N_TOWER, DOMAIN_IDX, SMALL_CFG)
    variables = model.init(jax.random.PRNGKey(0), x, group=group)

    mask_full = jnp.ones((B,), jnp.float32)
    out_full, _ = model.apply(
        variables, x, group=group, train=True, row_mask=mask_full,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
    )

    # pad with garbage rows, mask them out
    x_pad = jnp.concatenate([x, x[::-1]], axis=0)
    group_pad = jnp.concatenate([group, group[::-1]], axis=0)
    mask_pad = jnp.concatenate([mask_full, jnp.zeros((B,), jnp.float32)])
    out_pad, _ = model.apply(
        variables, x_pad, group=group_pad, train=True, row_mask=mask_pad,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
    )
    # dropout rng differs per-position only in shape; use dropout=0 config for
    # exactness — rebuild with dropout 0
    model0 = build_model(
        "mmoe", FIELD_DIMS, N_TOWER, DOMAIN_IDX,
        SMALL_CFG.__class__(**{**SMALL_CFG.__dict__, "dropout": 0.0}),
    )
    variables0 = model0.init(jax.random.PRNGKey(0), x, group=group)
    out_full0, _ = model0.apply(
        variables0, x, group=group, train=True, row_mask=mask_full,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
    )
    out_pad0, _ = model0.apply(
        variables0, x_pad, group=group_pad, train=True, row_mask=mask_pad,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
    )
    np.testing.assert_allclose(
        np.array(out_pad0[:B]), np.array(out_full0), atol=1e-5
    )


@pytest.mark.slow
def test_adl_updates_centers_only_in_train(rng):
    x, group = _make_inputs(rng)
    model = build_model("adl", FIELD_DIMS, N_TOWER, DOMAIN_IDX, SMALL_CFG)
    variables = model.init(jax.random.PRNGKey(0), x, group=group)
    c0 = np.array(variables["adl_state"]["cluster_centers"])
    _, new_state = model.apply(
        variables, x, group=group, train=True,
        mutable=["batch_stats", "adl_state"], rngs={"dropout": jax.random.PRNGKey(1)},
    )
    c1 = np.array(new_state["adl_state"]["cluster_centers"])
    assert not np.allclose(c0, c1)
    # EMA+normalize semantics (adl.py:77-79)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-5)
