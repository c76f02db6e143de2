"""Tests for the negative-transfer ("conflict") synthetic generator mode.

``make_synthetic(domain_cluster_conflict=True)`` exists to give the CDC
benefit ablation (scripts/ablate_cdc_benefit.py) a regime where grouping
genuinely matters: antipodal cluster label functions, the conflict the
CDC paper targets (/root/reference/model/cdc.py trains per-cluster models
precisely to avoid pooling conflicting domains).  These tests pin the
generator's structural claims with numpy only — no jax, no training.
"""

import numpy as np
import pytest

from tpurec.data import make_synthetic


def _per_value_ctr_profile(data, domain, field):
    """Empirical CTR per feature value of `field` within one domain,
    centered — the domain's 'label function fingerprint' on that field."""
    m = data.X[:, data.domain_idx] == domain
    vals = data.X[m, field]
    y = data.y[m]
    dim = data.field_dims[field]
    s = np.bincount(vals, weights=y, minlength=dim)
    c = np.bincount(vals, minlength=dim).astype(float)
    ctr = s / np.maximum(c, 1)
    return ctr - ctr[c > 0].mean(), c > 0


def test_conflict_requires_cluster_k():
    with pytest.raises(ValueError):
        make_synthetic(n_rows=100, domain_cluster_conflict=True)


def test_conflict_reports_ground_truth_and_balanced_labels():
    data = make_synthetic(
        n_rows=20000, n_fields=6, n_domain=8, domain_idx=3, seed=1,
        domain_cluster_k=2, domain_cluster_conflict=True,
        domain_cluster_noise=0.05,
    )
    assert data.domain_cluster is not None
    assert data.domain_cluster.shape == (8,)
    assert set(np.unique(data.domain_cluster)) <= {0, 1}
    # zero center bias -> labels near balanced overall
    assert 0.35 < data.y.mean() < 0.65


def test_conflict_antipodal_label_functions():
    """Within-cluster domain pairs share a label function; antipodal
    cluster pairs invert it.  Measured on per-value CTR fingerprints of
    the non-domain fields (no access to generator internals)."""
    data = make_synthetic(
        n_rows=120000, n_fields=6, n_domain=6, domain_idx=3, seed=7,
        domain_cluster_k=2, domain_cluster_conflict=True,
        domain_cluster_noise=0.05,
    )
    # need both clusters populated
    assert len(np.unique(data.domain_cluster)) == 2
    within, across = [], []
    for f in range(6):
        if f == data.domain_idx:
            continue
        profs = {}
        for d in range(6):
            p, ok = _per_value_ctr_profile(data, d, f)
            profs[d] = (p, ok)
        for a in range(6):
            for b in range(a + 1, 6):
                pa, oa = profs[a]
                pb, ob = profs[b]
                both = oa & ob
                if both.sum() < 4:
                    continue
                r = np.corrcoef(pa[both], pb[both])[0, 1]
                same = data.domain_cluster[a] == data.domain_cluster[b]
                (within if same else across).append(r)
    # strong positive alignment inside a cluster, negative across
    assert np.mean(within) > 0.3, np.mean(within)
    assert np.mean(across) < -0.3, np.mean(across)


def test_non_conflict_path_unchanged_by_flag_default():
    """domain_cluster_conflict defaults off and must not perturb the
    existing clustered draw sequence (ablation reproducibility)."""
    a = make_synthetic(n_rows=5000, n_fields=6, n_domain=6, domain_idx=3,
                       seed=3, domain_cluster_k=3)
    b = make_synthetic(n_rows=5000, n_fields=6, n_domain=6, domain_idx=3,
                       seed=3, domain_cluster_k=3,
                       domain_cluster_conflict=False)
    np.testing.assert_array_equal(a.X, b.X)
    np.testing.assert_array_equal(a.y, b.y)
    np.testing.assert_array_equal(a.domain_cluster, b.domain_cluster)
