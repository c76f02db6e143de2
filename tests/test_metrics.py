"""Metrics vs sklearn oracles (SURVEY.md §4: AUC oracle-tested vs sklearn)."""

import numpy as np
import pytest
from sklearn.metrics import log_loss as sk_log_loss
from sklearn.metrics import roc_auc_score as sk_auc

from tpurec.metrics import (
    auc_score,
    evaluate_multi_domain,
    gauc_score,
    log_loss_score,
    streaming_auc_bins,
    streaming_auc_from_bins,
)


def test_auc_matches_sklearn(rng):
    for _ in range(20):
        n = int(rng.integers(10, 2000))
        y = (rng.random(n) < 0.3).astype(np.float32)
        if y.sum() == 0 or y.sum() == n:
            continue
        p = rng.random(n)
        assert auc_score(y, p) == pytest.approx(sk_auc(y, p), abs=1e-12)


def test_auc_with_ties(rng):
    y = np.array([0, 0, 1, 1, 0, 1, 0, 1])
    p = np.array([0.1, 0.5, 0.5, 0.5, 0.5, 0.9, 0.9, 0.2])
    assert auc_score(y, p) == pytest.approx(sk_auc(y, p), abs=1e-12)


def test_logloss_matches_sklearn(rng):
    y = (rng.random(500) < 0.4).astype(np.float64)
    p = np.clip(rng.random(500), 1e-4, 1 - 1e-4)
    assert log_loss_score(y, p) == pytest.approx(sk_log_loss(y, p), rel=1e-9)


def test_evaluate_multi_domain(rng):
    n, n_domain = 3000, 5
    y = (rng.random(n) < 0.35).astype(np.float32)
    p = np.clip(rng.random(n) * 0.5 + y * 0.25, 1e-6, 1 - 1e-6)
    d = rng.integers(0, n_domain, n)
    w = np.bincount(d, minlength=n_domain) / n
    res = evaluate_multi_domain(y, p, d, w)
    expect_mean = 0.0
    for dom in range(n_domain):
        m = d == dom
        assert res["domain_auc"][dom] == pytest.approx(sk_auc(y[m], p[m]), abs=1e-12)
        expect_mean += w[dom] * sk_auc(y[m], p[m])
    assert res["mean_auc"] == pytest.approx(expect_mean, abs=1e-12)


def test_gauc_skips_single_class_users(rng):
    # user 0 has both classes, user 1 only positives (skipped, base.py:55-56)
    y = np.array([0, 1, 1, 1, 1, 0])
    p = np.array([0.2, 0.8, 0.9, 0.7, 0.3, 0.6])
    u = np.array([0, 0, 1, 1, 2, 2])
    expected = (2 * sk_auc(y[:2], p[:2]) + 2 * sk_auc(y[4:], p[4:])) / 4
    assert gauc_score(y, p, u) == pytest.approx(expected, abs=1e-12)


def test_streaming_auc_close_to_exact(rng):
    import jax.numpy as jnp

    n = 50000
    y = (rng.random(n) < 0.3).astype(np.float32)
    p = np.clip(rng.beta(2, 5, n) + 0.2 * y, 0, 1).astype(np.float32)
    pos, neg = streaming_auc_bins(jnp.asarray(y), jnp.asarray(p), n_bins=8192)
    approx = streaming_auc_from_bins(pos, neg)[0]
    exact = auc_score(y, p)
    assert approx == pytest.approx(exact, abs=1e-4)


def test_streaming_auc_per_domain(rng):
    import jax.numpy as jnp

    n, n_domain = 40000, 4
    y = (rng.random(n) < 0.3).astype(np.float32)
    p = np.clip(rng.random(n) * 0.6 + 0.3 * y, 0, 1).astype(np.float32)
    d = rng.integers(0, n_domain, n).astype(np.int32)
    pos, neg = streaming_auc_bins(
        jnp.asarray(y), jnp.asarray(p), n_bins=8192, domains=jnp.asarray(d), n_domain=n_domain
    )
    approx = streaming_auc_from_bins(pos, neg)
    for dom in range(n_domain):
        m = d == dom
        assert approx[dom] == pytest.approx(auc_score(y[m], p[m]), abs=2e-4)


def test_streaming_eval_result_single_class_domain_nans_both_metrics():
    """A single-class domain NaNs BOTH auc and loss (matching
    evaluate_multi_domain's try/except), and poisons the weighted means."""
    from tpurec.metrics import streaming_eval_result

    pos = np.zeros((2, 4))
    neg = np.zeros((2, 4))
    pos[0, 1], neg[0, 2] = 5, 5   # domain 0: both classes
    pos[1, 3] = 7                 # domain 1: positives only
    lsum = np.array([2.0, 3.0])
    lcnt = np.array([10.0, 7.0])
    r = streaming_eval_result(pos, neg, lsum, lcnt, np.array([0.5, 0.5]))
    assert np.isfinite(r["domain_auc"][0]) and np.isfinite(r["domain_loss"][0])
    assert np.isnan(r["domain_auc"][1]) and np.isnan(r["domain_loss"][1])
    assert np.isnan(r["mean_auc"]) and np.isnan(r["mean_loss"])


def test_host_hist_accumulator_flush_equivalence():
    """Frequent f64 host flushes and one final flush give identical totals
    (the machinery that keeps counts exact past f32's 2^24 bound)."""
    import jax.numpy as jnp

    from tpurec.train.step import HostHistAccumulator, hist_init

    def init():
        return hist_init(2, 4)

    rng = np.random.default_rng(0)
    adds = [tuple(rng.random(np.shape(c)).astype(np.float32) for c in init())
            for _ in range(7)]
    accs = [HostHistAccumulator(init, flush_every=1),
            HostHistAccumulator(init, flush_every=1000)]
    for add in adds:
        for a in accs:
            a.update(tuple(c + jnp.asarray(d) for c, d in zip(a.carry, add)))
    for t1, t2 in zip(accs[0].totals(), accs[1].totals()):
        np.testing.assert_allclose(t1, t2, rtol=1e-6)
