"""Serving path (tpurec.serve.Predictor): exactness vs the training-time
eval forward, table quantization error bounds, chunk/pad handling, and
checkpoint loading for both Trainer and CDCTrainer payloads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpurec.config import CDCConfig, Config, ModelConfig, TrainConfig
from tpurec.data import make_synthetic
from tpurec.serve import Predictor, quantize_table
from tpurec.train import Trainer
from tpurec.train.step import select_tower


@pytest.fixture(scope="module")
def data():
    return make_synthetic(n_rows=8000, n_fields=6, n_domain=4,
                          domain_idx=3, seed=11)


def _cfg(model="mmoe"):
    return Config(
        model=ModelConfig(
            model=model, embed_dim=8, mmoe_expert_dims=(32, 16),
            mmoe_tower_dims=(16,), mlp_dims=(32, 16),
            atten_embed_dim=8, att_layer_num=1,
        ),
        train=TrainConfig(bs=256, epoch=1, seed=0),
    )


@pytest.fixture(scope="module")
def trained(data):
    cfg = _cfg("mmoe")
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                 domain2group=np.arange(data.n_domain))
    tr.fit(data.train, data.valid,
           domain_cnt_weight=data.domain_cnt_weight())
    return cfg, tr


def _oracle_probs(tr, X, domain2group):
    """Reference forward through the full-precision training model."""
    group = jnp.asarray(domain2group)[jnp.asarray(X[:, 3])]
    out = tr.model.apply(
        {"params": tr.state.params, **tr.state.model_state},
        jnp.asarray(X), group=group, train=False,
    )
    logit = select_tower(out, group) if tr.multi_tower else out
    return np.asarray(jax.nn.sigmoid(logit))


def test_quantize_table_roundtrip_bounds(rng):
    t = rng.normal(size=(64, 8)).astype(np.float32)
    t[5] = 0.0  # all-zero row must stay exact
    q, s = quantize_table(t, "int8")
    assert q.dtype == np.int8 and s.shape == (64,)
    deq = q.astype(np.float32) * s[:, None]
    # symmetric rounding error bound: half a quantization step per element
    assert np.all(np.abs(deq - t) <= s[:, None] / 2 + 1e-7)
    assert np.all(deq[5] == 0.0)

    qb, sb = quantize_table(t, "bfloat16")
    assert sb is None and qb.dtype == jnp.bfloat16
    assert np.max(np.abs(qb.astype(np.float32) - t)) <= 0.01 * np.abs(t).max()


def test_predictor_f32_matches_training_forward(data, trained):
    cfg, tr = trained
    X = data.valid[0][:600]
    pred = Predictor(cfg, data.field_dims, data.n_domain, data.domain_idx,
                     domain2group=np.arange(data.n_domain),
                     batch_sizes=(256,)).load_from_trainer(tr).warm()
    probs = pred(X)
    oracle = _oracle_probs(tr, X, np.arange(data.n_domain))
    # same math (f32 lookup + identical apply): tight tolerance; the tail
    # chunk (600 = 2*256 + 88) exercises the pad-and-slice path
    np.testing.assert_allclose(probs, oracle, rtol=1e-5, atol=1e-6)


def test_predictor_int8_close_and_smaller(data, trained):
    cfg, tr = trained
    X, y = data.valid[0][:2000], data.valid[1][:2000]
    f32 = Predictor(cfg, data.field_dims, data.n_domain, data.domain_idx,
                    domain2group=np.arange(data.n_domain),
                    batch_sizes=(512,)).load_from_trainer(tr)
    q8 = Predictor(cfg, data.field_dims, data.n_domain, data.domain_idx,
                   domain2group=np.arange(data.n_domain),
                   batch_sizes=(512,), table_dtype="int8"
                   ).load_from_trainer(tr)
    p32, p8 = f32(X), q8(X)
    assert np.max(np.abs(p32 - p8)) < 0.05
    from tpurec.metrics import auc_score

    assert abs(auc_score(y, p8) - auc_score(y, p32)) < 0.01
    qb, fb = q8.table_bytes()
    # int8 rows are fb/4; [V] f32 scales add fb/D
    D = cfg.model.embed_dim
    assert qb == fb // 4 + fb // D


def test_predictor_checkpoint_roundtrip(tmp_path, data, trained):
    cfg, tr = trained
    path = str(tmp_path / "ckpt.pkl")
    tr.save_checkpoint(path)
    X = data.valid[0][:300]
    via_ckpt = Predictor(cfg, data.field_dims, data.n_domain,
                         data.domain_idx,
                         domain2group=np.arange(data.n_domain),
                         batch_sizes=(512,)).load_checkpoint(path)
    via_live = Predictor(cfg, data.field_dims, data.n_domain,
                         data.domain_idx,
                         domain2group=np.arange(data.n_domain),
                         batch_sizes=(512,)).load_from_trainer(tr)
    np.testing.assert_allclose(via_ckpt(X), via_live(X), rtol=1e-6)


@pytest.mark.slow
def test_predictor_serves_cdc_checkpoint(tmp_path):
    from tpurec.cdc import CDCTrainer

    data = make_synthetic(n_rows=6000, n_fields=6, n_domain=6,
                          domain_idx=3, seed=3)
    cfg = Config(
        model=ModelConfig(
            model="cdc", embed_dim=8, mlp_dims=(32, 16),
            mmoe_n_expert=2, tower_dims=(16, 8),
            atten_embed_dim=8, att_layer_num=1, gate_hidden_dim=8,
        ),
        cdc=CDCConfig(base_model="mmoe", n_cluster=2, n_causal_mask=4,
                      warmup_step=5, update_matrix_step=1,
                      update_interval=40, cdc_tower_dims=(16, 8)),
        train=TrainConfig(bs=128, epoch=1, seed=0),
    )
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    tr.fit(data.train, data.valid)
    path = str(tmp_path / "cdc.pkl")
    tr.save_checkpoint(path)

    pred = Predictor(cfg, data.field_dims, data.n_domain, data.domain_idx,
                     batch_sizes=(256,)).load_checkpoint(path)
    # routing table == persisted clustering (run.py:455-457 parity)
    np.testing.assert_array_equal(
        pred.domain2group, np.asarray(tr.cluster.domain2group_list))
    X = data.valid[0][:500]
    probs = pred(X)
    assert probs.shape == (X.shape[0],)
    assert np.all((probs > 0) & (probs < 1))
    # oracle: the engine's own model with the persisted grouping
    group = jnp.asarray(pred.domain2group)[jnp.asarray(X[:, 3])]
    out = tr.model.apply(
        {"params": tr.state.params, **tr.state.model_state},
        jnp.asarray(X), group=group, train=False,
    )
    oracle = np.asarray(jax.nn.sigmoid(select_tower(out, group)))
    np.testing.assert_allclose(probs, oracle, rtol=1e-5, atol=1e-6)


def test_self_describing_checkpoint_and_cli(tmp_path, data, trained):
    """Checkpoints embed config + schema; serving needs only the file."""
    from tpurec.config import config_from_dict, config_to_dict
    from tpurec.serve import main as serve_main, predictor_from_checkpoint

    cfg, tr = trained
    # config dict round trip
    cfg2 = config_from_dict(config_to_dict(cfg))
    assert cfg2.model.model == cfg.model.model
    assert cfg2.model.mmoe_expert_dims == cfg.model.mmoe_expert_dims
    assert cfg2.train.bs == cfg.train.bs

    path = str(tmp_path / "ckpt.pkl")
    tr.save_checkpoint(path)
    pred = predictor_from_checkpoint(path, batch_sizes=(256,))
    np.testing.assert_array_equal(pred.domain2group,
                                  np.arange(data.n_domain))
    X = data.valid[0][:200]
    oracle = _oracle_probs(tr, X, np.arange(data.n_domain))
    np.testing.assert_allclose(pred(X), oracle, rtol=1e-5, atol=1e-6)

    # CLI: npy in -> npy out
    xin = str(tmp_path / "X.npy")
    pout = str(tmp_path / "p.npy")
    np.save(xin, X)
    serve_main(["--ckpt", path, "--input", xin, "--output", pout,
                "--bs", "256"])
    np.testing.assert_allclose(np.load(pout), oracle, rtol=1e-5, atol=1e-6)


def test_predictor_matches_bf16_compute_eval(data):
    """A bf16-compute-trained model must serve the same math its
    validation AUC was measured with (train/step.py eval_step's
    precision scope)."""
    from tpurec.train.step import make_eval_step

    cfg = Config(
        model=ModelConfig(model="mmoe", embed_dim=8,
                          mmoe_expert_dims=(16,), mmoe_tower_dims=(8,),
                          atten_embed_dim=8, att_layer_num=1),
        train=TrainConfig(bs=256, epoch=1, seed=0,
                          compute_dtype="bfloat16"),
    )
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                 domain2group=np.arange(data.n_domain))
    X = data.valid[0][:256]
    eval_step = make_eval_step(tr.model, tr.multi_tower,
                               compute_dtype="bfloat16")
    group = np.arange(data.n_domain, dtype=np.int32)[X[:, 3]]
    oracle = np.asarray(eval_step(
        tr.state.params, tr.state.model_state,
        {"x": jnp.asarray(X), "group": jnp.asarray(group)}))
    pred = Predictor(cfg, data.field_dims, data.n_domain, data.domain_idx,
                     domain2group=np.arange(data.n_domain),
                     batch_sizes=(256,)).load_from_trainer(tr)
    np.testing.assert_allclose(pred(X), oracle, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_predictor_serves_extension_models(tmp_path, data):
    """The serving path is model-agnostic: the zoo-extension single-head
    models round-trip through a self-describing checkpoint and match the
    training forward."""
    from tpurec.serve import predictor_from_checkpoint

    for name in ("xdeepfm", "afm"):
        cfg = Config(
            model=ModelConfig(model=name, embed_dim=8, mlp_dims=(32, 16),
                              cin_layer_sizes=(8, 8), afm_attn_size=8),
            train=TrainConfig(bs=256, epoch=1, seed=0),
        )
        tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
        tr.fit(data.train, data.valid,
               domain_cnt_weight=data.domain_cnt_weight())
        path = str(tmp_path / f"{name}.pkl")
        tr.save_checkpoint(path)
        pred = predictor_from_checkpoint(path, batch_sizes=(512,))
        X = data.valid[0][:300]
        out = tr.model.apply(
            {"params": tr.state.params, **tr.state.model_state},
            jnp.asarray(X), train=False)
        want = np.asarray(jax.nn.sigmoid(out))
        np.testing.assert_allclose(pred(X), want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_predictor_applies_checkpoint_hash_spec(tmp_path, data):
    """A hash-trained checkpoint serves RAW ids: the Predictor applies the
    config's hash spec exactly like the training load path, so huge/unseen
    request ids are bucketed instead of indexing out of range."""
    import dataclasses

    from tpurec.data.hashing import apply_hash_trick, hash_ids
    from tpurec.serve import predictor_from_checkpoint

    buckets = ((0, 16), (1, 8))
    cfg = _cfg("mmoe")
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, hash_buckets=buckets))
    Xtr, ytr = data.train
    Xtr2, dims2 = apply_hash_trick(Xtr, data.field_dims, dict(buckets))
    Xva2, _ = apply_hash_trick(data.valid[0], data.field_dims, dict(buckets))
    tr = Trainer(cfg, dims2, data.n_domain, data.domain_idx,
                 domain2group=np.arange(data.n_domain))
    tr.fit((Xtr2, ytr), (Xva2, data.valid[1]),
           domain_cnt_weight=data.domain_cnt_weight())
    path = str(tmp_path / "hashed.pkl")
    tr.save_checkpoint(path)

    pred = predictor_from_checkpoint(path, batch_sizes=(512,))
    rng = np.random.default_rng(3)
    X_raw = np.stack(
        [rng.integers(0, 2**30 if f in (0, 1) else dims2[f], 200)
         for f in range(len(dims2))], 1).astype(np.int64)
    p_raw = pred(X_raw)
    # oracle: hash manually, bypass the predictor's spec
    Xh = X_raw.copy()
    Xh[:, 0] = hash_ids(X_raw[:, 0], 16, salt=0)
    Xh[:, 1] = hash_ids(X_raw[:, 1], 8, salt=1)
    pred.hash_buckets = {}
    np.testing.assert_array_equal(p_raw, pred(Xh.astype(np.int32)))


def test_http_server_predict_and_health(data, trained):
    """tpurec.server: /predict returns the Predictor's probabilities over
    HTTP, /healthz reports status, malformed requests get 400."""
    import json
    import threading
    import urllib.request

    from tpurec.server import make_server

    cfg, tr = trained
    pred = Predictor(cfg, data.field_dims, data.n_domain, data.domain_idx,
                     domain2group=np.arange(data.n_domain),
                     batch_sizes=(64,)).load_from_trainer(tr)
    srv = make_server(pred, port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        rng = np.random.default_rng(0)
        X = np.stack([rng.integers(0, d, 10) for d in data.field_dims],
                     1).astype(int)
        body = json.dumps({"instances": X.tolist()}).encode()
        req = urllib.request.Request(base + "/predict", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        np.testing.assert_allclose(
            np.asarray(out["predictions"], np.float32),
            pred(X.astype(np.int32)), atol=1e-6)
        assert out["latency_ms"] > 0

        with urllib.request.urlopen(base + "/healthz") as r:
            h = json.loads(r.read())
        assert h["status"] == "ok" and h["n_requests"] == 1 \
            and h["n_rows"] == 10

        with urllib.request.urlopen(base + "/metrics") as r:
            m = r.read().decode()
        assert "tpurec_requests_total 1" in m
        assert "tpurec_rows_total 10" in m and "tpurec_table_bytes" in m

        bad = urllib.request.Request(
            base + "/predict", data=b'{"instances": [[1, 2]]}',
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_server_keepalive_404_drains_body(data, trained):
    """Regression (advisor r3): a POST to an unknown path must consume its
    request body before replying, or the unread bytes desync the
    persistent HTTP/1.1 connection and the NEXT request parses garbage."""
    import http.client
    import json
    import threading

    from tpurec.server import make_server

    cfg, tr = trained
    pred = Predictor(cfg, data.field_dims, data.n_domain, data.domain_idx,
                     domain2group=np.arange(data.n_domain),
                     batch_sizes=(64,)).load_from_trainer(tr)
    srv = make_server(pred, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1",
                                          srv.server_address[1], timeout=30)
        big_body = json.dumps({"junk": "x" * 5000}).encode()
        conn.request("POST", "/nope", body=big_body,
                     headers={"Content-Type": "application/json"})
        r1 = conn.getresponse()
        assert r1.status == 404
        r1.read()

        rng = np.random.default_rng(0)
        X = np.stack([rng.integers(0, d, 4) for d in data.field_dims],
                     1).astype(int)
        body = json.dumps({"instances": X.tolist()}).encode()
        # same (kept-alive) connection: succeeds only if the 404 path
        # drained big_body
        conn.request("POST", "/predict", body=body,
                     headers={"Content-Type": "application/json"})
        r2 = conn.getresponse()
        assert r2.status == 200, r2.read()[:200]
        out = json.loads(r2.read())
        assert len(out["predictions"]) == 4
        conn.close()
    finally:
        srv.shutdown()
        srv.server_close()
