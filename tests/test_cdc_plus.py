"""Tests for the cdc-plus extensions (CDCConfig.probe_eval_batches /
mask_ema / freeze_after_updates — all default-off, defaults preserve the
reference's exact procedure; see docs/RESULTS.md conflict ablation for
why they exist: the reference's single-batch probe evals and per-update
re-clustering churn make its recovered grouping ~random at small scale).
"""

import dataclasses

import numpy as np
import pytest

from tpurec.cdc import CDCTrainer
from tpurec.cdc.algorithm import CDCClusterState, update_group
from tpurec.config import CDCConfig, Config, ModelConfig, TrainConfig
from tpurec.data import make_synthetic


@pytest.fixture(scope="module")
def data():
    return make_synthetic(n_rows=9000, n_fields=6, n_domain=6, domain_idx=3,
                          seed=3)


def _cfg(**cdc_kw):
    kw = dict(base_model="mmoe", n_cluster=2, n_causal_mask=6,
              warmup_step=5, update_matrix_step=1, update_interval=30,
              cdc_tower_dims=(16, 8))
    kw.update(cdc_kw)
    return Config(
        model=ModelConfig(
            model="cdc", embed_dim=8, mlp_dims=(32, 16), mmoe_n_expert=2,
            tower_dims=(16, 8), ple_expert_dims=((32,), (16,)),
            atten_embed_dim=8, att_layer_num=1, gate_hidden_dim=8,
        ),
        cdc=CDCConfig(**kw),
        train=TrainConfig(bs=128, epoch=1, seed=0),
    )


def test_probe_eval_batches_widens_eval_sched(data):
    tr = CDCTrainer(_cfg(probe_eval_batches=3), data.field_dims,
                    data.n_domain, data.domain_idx)
    tr.setup_data(data.train, data.valid)
    idx, mask = tr._eval_sched()
    assert idx.shape == (data.n_domain, 3 * 128)
    assert mask.shape == idx.shape
    # masked-in indices must be within the train split
    n_train = len(data.train[0])
    assert (idx[mask > 0] < n_train).all()
    # every domain's masked-in rows actually belong to that domain
    Xtr = data.train[0]
    for d in range(data.n_domain):
        rows = idx[d][mask[d] > 0]
        assert (Xtr[rows, data.domain_idx] == d).all()
        # wider than one batch: more eval rows than the bs=128 default
        # (each domain has ~1000+ train rows here)
        assert mask[d].sum() > 128


@pytest.mark.slow
def test_probe_default_width_matches_reference_shape(data):
    tr = CDCTrainer(_cfg(), data.field_dims, data.n_domain, data.domain_idx)
    tr.setup_data(data.train, data.valid)
    idx, mask = tr._eval_sched()
    assert idx.shape == (data.n_domain, 128)


@pytest.mark.slow
def test_freeze_after_updates_stops_reclustering(data):
    cfg = _cfg(freeze_after_updates=1)
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    out = tr.fit(data.train, data.valid)
    # only the initial (epoch 0, step 0) update ever ran; interval
    # boundaries afterwards were skipped
    assert tr.cluster.call_update_group == 1
    assert np.isfinite(out["valid"]["total_auc"])


@pytest.mark.slow
def test_frozen_cdc_runs_wider_probe_evals(data):
    # all three knobs together through the full fit path
    cfg = _cfg(probe_eval_batches=2, mask_ema=0.5, freeze_after_updates=1)
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    out = tr.fit(data.train, data.valid)
    assert tr.cluster.call_update_group == 1
    assert np.isfinite(out["valid"]["total_auc"])
    assert np.isfinite(tr.cluster.matrix_mask).all()


def _mini_state(n_domain=4, n_cluster=2, n_mask=5, seed=0):
    cfg = CDCConfig(base_model="mmoe", n_cluster=n_cluster,
                    n_causal_mask=n_mask)
    st = CDCClusterState.create(n_domain, n_cluster, cfg)
    rng = np.random.default_rng(seed)
    st.matrix_A = rng.random((n_domain + 1, n_domain))
    st.matrix_B = rng.random((n_domain + n_cluster, n_domain))
    st.matrix_mask = rng.random((n_mask, n_domain))
    return cfg, st, rng


def test_mask_ema_blends_raw_mask_across_updates():
    cfg, st, rng = _mini_state()
    cfg = dataclasses.replace(cfg, mask_ema=0.5)
    w = np.ones(st.n_domain) / st.n_domain

    first_mask = st.matrix_mask.copy()
    update_group(st, cfg, w, kmeans_seed=0)
    # first update: no old mask yet -> raw mask used; old stores the RAW
    # (pre-transform) measurement for the next blend
    np.testing.assert_allclose(st.old_matrix_mask, first_mask)

    second_raw = rng.random(first_mask.shape)
    st.matrix_mask = second_raw.copy()
    st.matrix_A = rng.random(st.matrix_A.shape)
    st.matrix_B = rng.random(st.matrix_B.shape)
    update_group(st, cfg, w, kmeans_seed=0)
    np.testing.assert_allclose(
        st.old_matrix_mask, 0.5 * first_mask + 0.5 * second_raw)


def test_mask_ema_zero_is_reference_behavior():
    cfg, st, rng = _mini_state()
    w = np.ones(st.n_domain) / st.n_domain
    update_group(st, cfg, w, kmeans_seed=0)
    second_raw = rng.random(st.matrix_mask.shape)
    st.matrix_mask = second_raw.copy()
    st.matrix_A = rng.random(st.matrix_A.shape)
    st.matrix_B = rng.random(st.matrix_B.shape)
    update_group(st, cfg, w, kmeans_seed=0)
    # mask_ema=0: the new raw mask is used untouched (reference rebuilds
    # the mask from scratch every update, cdc.py:131-134)
    np.testing.assert_allclose(st.old_matrix_mask, second_raw)
