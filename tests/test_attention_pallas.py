"""Fused field-attention kernel vs jnp oracle (interpret mode), and the
FieldAttention fused/jnp path param-layout compatibility."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpurec.nn.interactions import FieldAttention
from tpurec.ops.attention_pallas import (
    field_attention_reference,
    fused_field_attention,
)

B, F, D, A, H, L = 36, 7, 16, 32, 2, 3


@pytest.fixture
def weights(rng):
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.2, jnp.float32)
    flat = [mk(D, A), mk(A), mk(D, A), mk(A)]
    for _ in range(L):
        flat += [mk(A, 3 * A), mk(3 * A), mk(A, A), mk(A)]
    return flat


def test_fwd_matches_oracle(rng, weights):
    emb = jnp.asarray(rng.normal(size=(B, F, D)), jnp.float32)
    y = fused_field_attention(emb, weights, 0, L, H, 0.0, False, 16, True)
    yr = field_attention_reference(emb, weights, L, H)
    np.testing.assert_allclose(np.array(y), np.array(yr), atol=1e-5)


def test_grads_match_oracle(rng, weights):
    emb = jnp.asarray(rng.normal(size=(B, F, D)), jnp.float32)

    def loss_k(emb, flat):
        return jnp.sum(
            fused_field_attention(emb, flat, 0, L, H, 0.0, False, 16,
                                  True) ** 2)

    def loss_r(emb, flat):
        return jnp.sum(field_attention_reference(emb, flat, L, H) ** 2)

    g1 = jax.grad(loss_k, argnums=(0, 1))(emb, weights)
    g2 = jax.grad(loss_r, argnums=(0, 1))(emb, weights)
    scale = float(jnp.max(jnp.abs(g2[0])))
    np.testing.assert_allclose(np.array(g1[0]), np.array(g2[0]),
                               atol=2e-5 * scale)
    for a, b in zip(g1[1], g2[1]):
        s = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-5 * s)


def test_tile_edge_masking(rng, weights):
    """B not a multiple of tile_rows: padded rows must not pollute the
    weight grads."""
    emb28 = jnp.asarray(rng.normal(size=(28, F, D)), jnp.float32)

    def loss_k(flat):
        return jnp.sum(
            fused_field_attention(emb28, flat, 0, L, H, 0.0, False, 16,
                                  True) ** 2)

    def loss_r(flat):
        return jnp.sum(field_attention_reference(emb28, flat, L, H) ** 2)

    g1 = jax.grad(loss_k)(weights)
    g2 = jax.grad(loss_r)(weights)
    for a, b in zip(g1, g2):
        s = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-5 * s)


def test_field_attention_paths_share_params_and_eval_output(rng):
    """fused=True and fused=False FieldAttention have identical param trees
    AND identical eval outputs (the fused path in interpret mode)."""
    emb = jnp.asarray(rng.normal(size=(12, F, D)), jnp.float32)
    mod_j = FieldAttention(atten_embed_dim=A, att_layer_num=L,
                           att_head_num=H, fused=False)
    vars_j = mod_j.init(jax.random.PRNGKey(3), emb)

    mod_f = FieldAttention(atten_embed_dim=A, att_layer_num=L,
                           att_head_num=H, fused=True)
    vars_f = mod_f.init(jax.random.PRNGKey(3), emb)

    flat_j = jax.tree_util.tree_leaves_with_path(vars_j)
    flat_f = jax.tree_util.tree_leaves_with_path(vars_f)
    paths_j = {jax.tree_util.keystr(p): v.shape for p, v in flat_j}
    paths_f = {jax.tree_util.keystr(p): v.shape for p, v in flat_f}
    assert paths_j == paths_f
    for (p1, v1), (p2, v2) in zip(sorted(flat_j, key=lambda t: str(t[0])),
                                  sorted(flat_f, key=lambda t: str(t[0]))):
        np.testing.assert_allclose(np.array(v1), np.array(v2),
                                   err_msg=str(p1))


def test_layered_fwd_matches_oracle(rng, weights):
    from tpurec.ops.attention_pallas import fused_field_attention_layered

    emb = jnp.asarray(rng.normal(size=(B, F, D)), jnp.float32)
    y = fused_field_attention_layered(emb, weights, 0, L, H, 0.0, False, 16,
                                      True)
    yr = field_attention_reference(emb, weights, L, H)
    np.testing.assert_allclose(np.array(y), np.array(yr), atol=1e-5)


def test_layered_grads_match_oracle(rng, weights):
    from tpurec.ops.attention_pallas import fused_field_attention_layered

    emb = jnp.asarray(rng.normal(size=(28, F, D)), jnp.float32)  # ragged tile

    def loss_k(emb, flat):
        return jnp.sum(
            fused_field_attention_layered(emb, flat, 0, L, H, 0.0, False, 16,
                                          True) ** 2)

    def loss_r(emb, flat):
        return jnp.sum(field_attention_reference(emb, flat, L, H) ** 2)

    g1 = jax.grad(loss_k, argnums=(0, 1))(emb, weights)
    g2 = jax.grad(loss_r, argnums=(0, 1))(emb, weights)
    scale = float(jnp.max(jnp.abs(g2[0])))
    np.testing.assert_allclose(np.array(g1[0]), np.array(g2[0]),
                               atol=2e-5 * scale)
    for a, b in zip(g1[1], g2[1]):
        s = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-5 * s)
