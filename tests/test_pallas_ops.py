"""Pallas kernels vs jnp references (interpret mode on CPU; the same code
compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurec.ops.crossnet_pallas import cross_network_fused, cross_network_reference
from tpurec.ops.embedding_pallas import embedding_gather_fused


def test_crossnet_fused_forward_matches_reference(rng):
    B, D, L = 32, 24, 3
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.1)
    got = cross_network_fused(x, w, b, True)
    want = cross_network_reference(x, w, b)
    np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-4)


def test_crossnet_fused_gradients_match_reference(rng):
    B, D, L = 16, 12, 2
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.1)

    def loss_fused(x, w, b):
        return jnp.sum(jnp.tanh(cross_network_fused(x, w, b, True)))

    def loss_ref(x, w, b):
        return jnp.sum(jnp.tanh(cross_network_reference(x, w, b)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for gf, gr, name in zip(g_fused, g_ref, "xwb"):
        np.testing.assert_allclose(
            np.array(gf), np.array(gr), atol=1e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_crossnet_fused_multi_tile(rng):
    # B larger than one tile exercises the grid + partial-reduction path
    B, D, L = 1100, 16, 2
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.1)
    got = cross_network_fused(x, w, b, True)
    want = cross_network_reference(x, w, b)
    np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-4)
    g = jax.grad(lambda *a: jnp.sum(cross_network_fused(*a, True)), argnums=1)(x, w, b)
    g_ref = jax.grad(lambda *a: jnp.sum(cross_network_reference(*a)), argnums=1)(x, w, b)
    np.testing.assert_allclose(np.array(g), np.array(g_ref), rtol=2e-4, atol=1e-3)


def test_embedding_gather_matches_take(rng):
    V, D, N = 500, 16, 700
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, N).astype(np.int32))
    got = embedding_gather_fused(table, ids, rows_per_block=128, interpret=True)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.array(got), np.array(want))
