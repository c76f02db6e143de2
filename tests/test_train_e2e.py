"""End-to-end: synthetic multi-domain data -> jitted train loop -> eval ->
early stop -> checkpoint roundtrip (SURVEY.md §4 integration tests)."""

import numpy as np
import pytest

from tpurec.config import Config, DataConfig, ModelConfig, TrainConfig
from tpurec.data import make_synthetic
from tpurec.train import Trainer

SMALL_MODEL = dict(
    embed_dim=8,
    mlp_dims=(32, 16),
    tower_dims=(32, 16),
    mmoe_expert_dims=(32, 16),
    mmoe_tower_dims=(16,),
    ple_expert_dims=((32,), (16,)),
    ple_tower_dims=(16,),
    sei_dims=(16, 16),
    atten_embed_dim=8,
    att_layer_num=1,
    gate_hidden_dim=16,
)


def _cfg(model: str, epoch=2, bs=256) -> Config:
    return Config(
        model=ModelConfig(model=model, **SMALL_MODEL),
        train=TrainConfig(bs=bs, epoch=epoch, seed=0),
    )


@pytest.fixture(scope="module")
def data():
    return make_synthetic(n_rows=12000, n_fields=6, n_domain=4, domain_idx=3, seed=1)


def test_deepfm_learns(data):
    # DeepFM starts from saturated logits (N(0,1) embedding init makes the
    # FM term large — same property as the reference, layer.py:140) and
    # recovers steadily: AUC .535/.559/.582/.602 over epochs 1-4 here.
    cfg = _cfg("deepfm", epoch=4)
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    out = tr.fit(data.train, data.valid, test=data.test,
                 domain_cnt_weight=data.domain_cnt_weight())
    assert out["valid"]["total_auc"] > 0.60
    assert out["test"]["total_auc"] > 0.58
    assert np.isfinite(out["valid"]["total_loss"])


@pytest.mark.slow
def test_multitower_learns_with_group_routing(data):
    # split grouping: one tower per domain (config.py:63 'split' strategy)
    cfg = _cfg("mmoe", epoch=2)
    tr = Trainer(
        cfg, data.field_dims, data.n_domain, data.domain_idx,
        domain2group=np.arange(data.n_domain),
    )
    assert tr.n_tower == data.n_domain
    out = tr.fit(data.train, data.valid, domain_cnt_weight=data.domain_cnt_weight())
    assert out["valid"]["total_auc"] > 0.6
    assert out["valid"]["mean_auc"] > 0.55


@pytest.mark.slow
def test_streaming_eval_matches_exact(data):
    """evaluate_streaming (on-device histograms, SURVEY §7 hard part 5)
    matches the exact host-side eval: AUC within the O(1/n_bins) binning
    error, LogLoss near-exactly, per-domain dicts with the same keys."""
    cfg = _cfg("mmoe", epoch=1)
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                 domain2group=np.arange(data.n_domain))
    tr.fit(data.train, data.valid, domain_cnt_weight=data.domain_cnt_weight())
    Xv, yv = data.valid
    w = data.domain_cnt_weight()
    exact = tr.evaluate(Xv, yv, domain_cnt_weight=w)
    stream = tr.evaluate_streaming(Xv, yv, domain_cnt_weight=w)
    assert abs(stream["total_auc"] - exact["total_auc"]) < 2e-4
    assert abs(stream["total_loss"] - exact["total_loss"]) < 1e-5
    assert abs(stream["mean_auc"] - exact["mean_auc"]) < 5e-4
    assert abs(stream["mean_loss"] - exact["mean_loss"]) < 1e-5
    assert set(stream["domain_auc"]) == set(exact["domain_auc"])
    for d in exact["domain_auc"]:
        assert abs(stream["domain_auc"][d] - exact["domain_auc"][d]) < 1e-3
        assert abs(stream["domain_loss"][d] - exact["domain_loss"][d]) < 1e-5
    # a ragged final batch is mask-padded, not dropped
    exact_odd = tr.evaluate(Xv[:1001], yv[:1001], domain_cnt_weight=w)
    stream_odd = tr.evaluate_streaming(Xv[:1001], yv[:1001], domain_cnt_weight=w)
    assert abs(stream_odd["total_auc"] - exact_odd["total_auc"]) < 1e-3
    assert abs(stream_odd["total_loss"] - exact_odd["total_loss"]) < 1e-5
    # oversized datasets stream through fixed-size zero-padded row windows
    # (forced here by shrinking the HBM budget) with identical results
    tr.DEVICE_RESIDENT_BYTES = 64 << 10
    stream_w = tr.evaluate_streaming(Xv, yv, domain_cnt_weight=w)
    assert abs(stream_w["total_auc"] - stream["total_auc"]) < 1e-6
    assert abs(stream_w["total_loss"] - stream["total_loss"]) < 1e-6


def test_early_stop_and_checkpoint(tmp_path, data):
    cfg = _cfg("deepfm", epoch=1)
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    out = tr.fit(data.train, data.valid, domain_cnt_weight=data.domain_cnt_weight())
    path = str(tmp_path / "ckpt.pkl")
    tr.save_checkpoint(path, extra={"note": "test"})

    r1 = tr.evaluate(data.valid[0], data.valid[1], data.domain_cnt_weight())

    tr2 = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    payload = tr2.load_checkpoint(path)
    assert payload["extra"]["note"] == "test"
    r2 = tr2.evaluate(data.valid[0], data.valid[1], data.domain_cnt_weight())
    assert r1["total_auc"] == pytest.approx(r2["total_auc"], abs=1e-9)


@pytest.mark.slow
def test_device_resident_epoch_matches_host_path(data):
    """The device-resident indexed epoch and the host-batching epoch share
    the batch schedule exactly; with dropout=0 their losses and params are
    bit-comparable."""
    import dataclasses
    import jax
    import numpy as np

    cfg = _cfg("mmoe", epoch=1)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dropout=0.0))
    X, y = data.train

    tr_dev = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                     domain2group=np.arange(data.n_domain))
    loss_dev = tr_dev.train_epoch(X, y, 0)

    tr_host = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                      domain2group=np.arange(data.n_domain))
    tr_host.DEVICE_RESIDENT_BYTES = 0  # force the host-batching path
    loss_host = tr_host.train_epoch(X, y, 0)

    assert loss_dev == pytest.approx(loss_host, rel=1e-5)
    a = np.asarray(tr_dev.state.params["embedding"]["table"])
    b = np.asarray(tr_host.state.params["embedding"]["table"])
    # ulp-level: the paths pad the tail batch with different (masked-out)
    # row ids, so zero-grad row corrections round differently by ~2 ulps
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    # eval paths agree too
    ev_d = tr_dev.evaluate(data.valid[0], data.valid[1])
    tr_host.DEVICE_RESIDENT_BYTES = 0
    ev_h = tr_host.evaluate(data.valid[0], data.valid[1])
    # params equal to 2e-6 -> AUC essentially identical
    assert ev_d["total_auc"] == pytest.approx(ev_h["total_auc"], abs=2e-3)


@pytest.mark.slow
def test_fit_reproducible_same_seed(data):
    """Two Trainer runs with the same seed produce bit-identical parameters
    and metrics (full determinism: init, shuffle schedule, dropout bits)."""
    import jax

    outs, params = [], []
    for _ in range(2):
        cfg = _cfg("mmoe", epoch=1)
        tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                     domain2group=np.arange(data.n_domain))
        out = tr.fit(data.train, data.valid,
                     domain_cnt_weight=data.domain_cnt_weight())
        outs.append(out["valid"]["total_auc"])
        params.append(jax.tree_util.tree_map(np.asarray, tr.state.params))
    assert outs[0] == outs[1]
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params[0]),
            jax.tree_util.tree_leaves_with_path(params[1])):
        np.testing.assert_array_equal(a, b, err_msg=jax.tree_util.keystr(pa))


@pytest.mark.slow
def test_predict_matches_evaluate_ordering(data):
    """Trainer.predict returns the same probabilities evaluate scores."""
    from tpurec.metrics import auc_score

    cfg = _cfg("mmoe", epoch=1)
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                 domain2group=np.arange(data.n_domain))
    tr.fit(data.train, data.valid, domain_cnt_weight=data.domain_cnt_weight())
    Xv, yv = data.valid
    probs = tr.predict(Xv)
    assert probs.shape == (len(yv),)
    assert np.all((probs >= 0) & (probs <= 1))
    r = tr.evaluate(Xv, yv)
    assert abs(auc_score(yv, probs) - r["total_auc"]) < 1e-12
