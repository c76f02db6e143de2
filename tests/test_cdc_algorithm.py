"""CDC clustering algorithm unit tests (SURVEY.md §4): causal kernel vs a
scipy oracle, λ formula + clamp, affinity transforms, re-assignment
invariants."""

import numpy as np
import pytest

from tpurec.cdc.algorithm import (
    CDCClusterState,
    calc_causal_matrix,
    calc_domain_lambda_in_group,
    get_center_domain_in_group,
    get_source_domain,
    kmeans_group,
    update_group,
)
from tpurec.config import CDCConfig


def _oracle_causal(X):
    """Direct port of the published dep_con_kernel math (cdc.py:364-393)
    using scipy pdist/squareform as an independent oracle."""
    from scipy.spatial.distance import pdist, squareform

    num_samps, num_feats = X.shape
    thresh = np.eye(num_feats)
    Z = np.zeros((num_feats, num_samps, num_samps))
    for j in range(num_feats):
        D = squareform(pdist(X[:, j].reshape(-1, 1), "cityblock"))
        Z[j] = ((D - D.mean(0) - D.mean(1).reshape(-1, 1)) / D.mean()) + 1
    F = Z.reshape(num_feats * num_samps, num_samps)
    left = np.tensordot(Z, thresh, axes=([0], [0]))
    left_right = np.tensordot(left, Z, axes=([2, 1], [0, 1]))
    gamma = (F.T @ F) ** 2 - 2 * left_right + np.linalg.norm(thresh)
    diag = np.diag(gamma)
    kappa = gamma / np.sqrt(np.outer(diag, diag))
    kappa[kappa > 1] = 1
    return kappa


def test_causal_kernel_matches_oracle(rng):
    X = rng.normal(size=(6, 50))  # domains x treatments
    got = calc_causal_matrix(X)
    want = _oracle_causal(X)
    np.testing.assert_allclose(got, want, atol=1e-10)
    # kernel properties: symmetric, unit diagonal, bounded
    np.testing.assert_allclose(got, got.T, atol=1e-10)
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-12)
    assert got.max() <= 1.0 + 1e-12


def test_causal_kernel_affine_invariance(rng):
    # the doubly-centered/standardized distance construction makes kappa
    # invariant to per-treatment affine transforms x -> a*x + b (a != 0)
    X = rng.normal(size=(6, 20))
    a = rng.uniform(0.5, 3.0, size=20)
    b = rng.normal(size=20)
    k1 = calc_causal_matrix(X)
    k2 = calc_causal_matrix(X * a[None, :] + b[None, :])
    np.testing.assert_allclose(k1, k2, atol=1e-8)


def test_kmeans_separates_block_distance_matrix(rng):
    # kmeans on a block-structured distance matrix recovers the blocks
    # (cdc.py:156-169 seeds clusters from the causal-distance rows)
    n = 6
    dist = np.full((n, n), 1.0)
    dist[:3, :3] = 0.1
    dist[3:, 3:] = 0.1
    np.fill_diagonal(dist, 0.0)
    labels = kmeans_group(dist, 2, seed=0)
    assert len(set(labels[:3])) == 1 and len(set(labels[3:])) == 1
    assert labels[0] != labels[3]


def _mk_state(n_domain=6, n_cluster=2, seed=0):
    cfg = CDCConfig(n_cluster=n_cluster, n_causal_mask=10)
    st = CDCClusterState.create(n_domain, n_cluster, cfg)
    rng = np.random.default_rng(seed)
    st.matrix_causal = np.abs(rng.normal(size=(n_domain, n_domain)))
    st.matrix_causal = (st.matrix_causal + st.matrix_causal.T) / 2
    np.fill_diagonal(st.matrix_causal, 0.0)
    return st, cfg


def test_lambda_formula_and_clamp(rng):
    st, _ = _mk_state()
    group = [0, 2, 4]
    lam = calc_domain_lambda_in_group(st, group, [1, 3])
    # manual formula (cdc.py:321-333)
    gd = st.matrix_causal[np.ix_(group, group)].sum()
    for i, d in enumerate([1, 3]):
        rel = st.matrix_causal[np.ix_(group, [d])].sum()
        expect = np.clip((len(group) - 1) * rel / (gd - rel) * 0.5, 0, 1)
        assert lam[i] == pytest.approx(expect, abs=1e-12)
    assert np.all(lam >= 0) and np.all(lam <= 1)


def test_center_domain_min_total_distance():
    st, _ = _mk_state()
    group = [1, 3, 5]
    centers = get_center_domain_in_group(st, group, center_num=1)
    lam = calc_domain_lambda_in_group(st, group, group)
    assert centers[0] == group[int(np.argmin(lam))]


def test_affinity_minus_transform():
    st, cfg = _mk_state(n_domain=4, n_cluster=2)
    rng = np.random.default_rng(3)
    st.matrix_A = rng.random((5, 4))
    st.matrix_B = rng.random((6, 4))
    st.matrix_mask = rng.random((10, 4))
    st.domain2group = np.array([0, 1, 0, 1])
    st.t_group2domain_list = [[0, 2], [1, 3]]
    st.s_group2domain_list = [[0, 2], [1, 3]]
    A0, B0, M0 = st.matrix_A.copy(), st.matrix_B.copy(), st.matrix_mask.copy()
    g0 = st.domain2group.copy()
    # drive update_group far enough to check the transform (cdc.py:136-140)
    d_w = np.full(4, 0.25)
    update_group(st, cfg, d_w, kmeans_seed=0)
    np.testing.assert_allclose(st.matrix_A[:-1], A0[:-1] - A0[-1], atol=1e-12)
    np.testing.assert_allclose(st.matrix_B[:4], B0[g0 + 4] - B0[:4], atol=1e-12)
    np.testing.assert_allclose(st.matrix_mask, M0 - A0[-1], atol=1e-12)


def test_update_group_partitions_all_domains():
    st, cfg = _mk_state(n_domain=8, n_cluster=3)
    rng = np.random.default_rng(4)
    st.matrix_A = rng.normal(size=(9, 8))
    st.matrix_B = rng.normal(size=(11, 8))
    st.matrix_mask = rng.normal(size=(10, 8))
    w = np.full(8, 1 / 8)
    labels = update_group(st, cfg, w, kmeans_seed=0)
    assert sorted(set(labels)) <= list(range(3))
    assert len(labels) == 8
    # every domain in exactly one target group
    all_domains = sorted(d for g in st.t_group2domain_list for d in g)
    assert all_domains == list(range(8))
    assert st.initial_s_group2domain_list is not None
    # second call exercises the iterative path
    st.matrix_A = rng.normal(size=(9, 8))
    st.matrix_B = rng.normal(size=(11, 8))
    st.matrix_mask = rng.normal(size=(10, 8))
    labels2 = update_group(st, cfg, w, kmeans_seed=0)
    all_domains = sorted(d for g in st.t_group2domain_list for d in g)
    assert all_domains == list(range(8))
    assert st.call_update_group == 2


def test_source_group_contains_centers():
    st, cfg = _mk_state(n_domain=6, n_cluster=2)
    rng = np.random.default_rng(5)
    st.matrix_A = rng.normal(size=(7, 6))
    st.matrix_B = rng.normal(size=(8, 6))
    w = np.full(6, 1 / 6)
    t_group = [0, 2, 4]
    s = get_source_domain(st, t_group, 0, w)
    centers = get_center_domain_in_group(st, t_group, center_num=2)
    assert s[: len(centers)] == centers
    assert len(set(s)) == len(s)


def test_p_weight_exponential_decay():
    st, cfg = _mk_state()
    rng = np.random.default_rng(6)
    st.matrix_A = rng.normal(size=(7, 6))
    st.matrix_B = rng.normal(size=(8, 6))
    st.matrix_mask = rng.normal(size=(10, 6))
    w = np.full(6, 1 / 6)
    p0 = st.p_weight
    update_group(st, cfg, w, kmeans_seed=0)
    assert st.p_weight == pytest.approx(p0 * cfg.p_weight_exp_decay)
