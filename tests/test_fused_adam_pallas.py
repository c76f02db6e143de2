"""Fused sparse-grad dense-Adam Pallas kernel vs its jnp oracle
(interpret mode on the CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpurec.ops.fused_adam_pallas import (
    fused_decay_adam,
    fused_decay_adam_reference,
    fused_sparse_adam,
    fused_sparse_adam_reference,
)


@pytest.mark.parametrize(
    "V,D,N,T",
    [(5000, 16, 700, 256), (4096, 16, 1, 4096), (300, 8, 50, 128),
     (2000, 16, 900, 128)],
)
def test_kernel_matches_oracle(rng, V, D, N, T):
    p = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(V, D)) * 0.01, jnp.float32)
    v = jnp.asarray(np.abs(rng.normal(size=(V, D))) * 0.01, jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    g = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    kw = dict(lr=1e-3, b1=0.9, b2=0.99, eps=1e-8, coef=2e-5)
    got = fused_sparse_adam(p, m, v, ids, g, 3, tile_rows=T, interpret=True,
                            **kw)
    want = fused_sparse_adam_reference(p, m, v, ids, g, 3, **kw)
    for a, b in zip(got[:3], want[:3]):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-6)
    assert float(got[3]) == pytest.approx(float(want[3]), rel=1e-6)


@pytest.mark.parametrize(
    "V,D,S,T",
    [(4096, 16, 900, 64),     # prefix spans >1 g-tile (900*16/128 = 112 rows)
     (4096, 16, 0, 64),       # no small fields at all
     (1000, 16, 1000, 32),    # whole table is the prefix; ragged last tile
     (528, 8, 37, 8)],        # odd sizes, D=8 (528*8/128 = 33 rows, ragged)
)
def test_decay_kernel_matches_oracle(rng, V, D, S, T):
    assert (V * D) % 128 == 0
    p = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(V, D)) * 0.01, jnp.float32)
    v = jnp.asarray(np.abs(rng.normal(size=(V, D))) * 0.01, jnp.float32)
    g = jnp.asarray(rng.normal(size=(S, D)), jnp.float32)
    kw = dict(lr=1e-3, b1=0.9, b2=0.99, eps=1e-8, coef=2e-5)
    got = fused_decay_adam(p, m, v, g, 3, tile=T, interpret=True, **kw)
    want = fused_decay_adam_reference(p, m, v, g, 3, **kw)
    for a, b in zip(got[:3], want[:3]):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-6)
    assert float(got[3]) == pytest.approx(float(want[3]), rel=1e-6)


def test_kernel_duplicate_ids(rng):
    """Duplicate touched rows must segment-sum, matching dense scatter-add."""
    V, D, N = 512, 16, 300
    p = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    m = jnp.zeros((V, D), jnp.float32)
    v = jnp.zeros((V, D), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 10, N), jnp.int32)  # heavy duplication
    g = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    kw = dict(lr=1e-2, coef=0.0)
    got = fused_sparse_adam(p, m, v, ids, g, 1, tile_rows=128, interpret=True,
                            **kw)
    want = fused_sparse_adam_reference(p, m, v, ids, g, 1, **kw)
    np.testing.assert_allclose(np.array(got[0]), np.array(want[0]), atol=2e-5)
