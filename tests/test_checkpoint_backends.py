"""Checkpoint backends: pickle + orbax roundtrip, versioning, async."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpurec.config import ModelConfig, TrainConfig
from tpurec.models import build_model
from tpurec.train.checkpoint import make_backend
from tpurec.train.sparse import init_sparse_opt_state
from tpurec.train.step import TrainState, make_optimizer

FIELD_DIMS = (16, 8, 12)


def _state(seed=0):
    model = build_model(
        "mmoe", FIELD_DIMS, 2, 2,
        ModelConfig(model="mmoe", embed_dim=4, mmoe_expert_dims=(8,),
                    mmoe_tower_dims=(4,), use_atten=False),
    )
    x = jnp.asarray(
        np.random.default_rng(seed).integers(0, 8, (4, 3)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed), x)
    params = variables["params"]
    ms = {k: v for k, v in variables.items() if k != "params"}
    tx = make_optimizer(TrainConfig(bs=4))
    return TrainState(params=params, opt_state=init_sparse_opt_state(params, tx),
                      model_state=ms, step=jnp.asarray(seed, jnp.int32))


@pytest.mark.parametrize("kind", ["pickle", "orbax"])
def test_roundtrip(tmp_path, kind):
    be = make_backend(kind, str(tmp_path / kind))
    st = _state(3)
    extra = {"domain2group_list": [0, 1, 1, 0], "best_auc": 0.91}
    be.save(3, st, extra)
    be.wait_until_finished()

    st2, extra2 = be.restore(_state(0))
    assert int(st2.step) == 3
    np.testing.assert_allclose(
        np.array(st.params["embedding"]["table"]),
        np.array(st2.params["embedding"]["table"]))
    np.testing.assert_allclose(
        np.array(st.opt_state[1].m), np.array(st2.opt_state[1].m))
    assert list(extra2["domain2group_list"]) == [0, 1, 1, 0]
    assert extra2["best_auc"] == pytest.approx(0.91)
    be.close()


@pytest.mark.parametrize("kind", ["pickle", "orbax"])
def test_versioning_and_gc(tmp_path, kind):
    be = make_backend(kind, str(tmp_path / kind), max_to_keep=2)
    for s in (1, 2, 3, 4):
        be.save(s, _state(s), {"s": s})
        be.wait_until_finished()
    assert be.latest_step() == 4
    kept = sorted(be.all_steps())
    assert kept[-1] == 4 and len(kept) <= 2
    st, extra = be.restore(_state(0))  # latest by default
    assert int(st.step) == 4 and extra["s"] == 4
    be.close()


def test_restore_missing_raises(tmp_path):
    be = make_backend("pickle", str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        be.restore(_state(0))


@pytest.mark.parametrize("kind", ["pickle", "orbax"])
def test_trainer_versioned_roundtrip(tmp_path, kind):
    from tpurec.config import Config
    from tpurec.data import make_synthetic
    from tpurec.train import Trainer

    data = make_synthetic(n_rows=2000, n_fields=4, n_domain=2, domain_idx=1,
                          seed=5)
    cfg = Config(
        model=ModelConfig(model="deepfm", embed_dim=4, mlp_dims=(8,),
                          use_atten=False),
        train=TrainConfig(bs=256, epoch=1, seed=0, checkpoint_backend=kind),
    )
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                 domain2group=np.zeros(data.n_domain, np.int64))
    tr.fit(data.train, data.valid, domain_cnt_weight=data.domain_cnt_weight())
    be = tr.make_checkpointer(str(tmp_path / "ck"))
    tr.save_versioned(be, 7, extra={"note": "x"})
    be.wait_until_finished()
    table_before = np.array(tr.state.params["embedding"]["table"])

    tr2 = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                  domain2group=np.zeros(data.n_domain, np.int64))
    meta = tr2.load_versioned(tr2.make_checkpointer(str(tmp_path / "ck")))
    np.testing.assert_allclose(
        np.array(tr2.state.params["embedding"]["table"]), table_before)
    assert meta["config_model"] == "deepfm" and meta["extra"]["note"] == "x"
    be.close()


@pytest.mark.parametrize("kind", ["pickle", "orbax"])
@pytest.mark.slow
def test_cdc_versioned_roundtrip(tmp_path, kind):
    """CDCTrainer versioned checkpoints carry the cluster state (matrices,
    assignments, p_weight) through both backends — parity with Trainer
    (VERDICT round-1 item 7; reference semantics run.py:447-459,455-457)."""
    import dataclasses

    from tpurec.config import CDCConfig, Config
    from tpurec.data import make_synthetic
    from tpurec.cdc import CDCTrainer

    data = make_synthetic(n_rows=2000, n_fields=4, n_domain=4, domain_idx=1,
                          seed=6)
    cfg = Config(
        model=ModelConfig(model="cdc", embed_dim=4, mlp_dims=(8,),
                          tower_dims=(4,), gate_hidden_dim=4, use_atten=False),
        cdc=CDCConfig(base_model="mmoe", n_cluster=2, n_causal_mask=3,
                      warmup_step=2, update_matrix_step=1, update_interval=20,
                      cdc_tower_dims=(4,)),
        train=TrainConfig(bs=128, epoch=1, seed=0, checkpoint_backend=kind),
    )
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    tr.setup_data(data.train, data.valid)
    tr.update_matrix_cdc(cfg.cdc.update_matrix_step)
    be = tr.make_checkpointer(str(tmp_path / "cdc_ck"))
    tr.save_versioned(be, 5, extra={"tag": "r2"})
    be.wait_until_finished()
    table_before = np.array(tr.state.params["embedding"]["table"])

    tr2 = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    meta = tr2.load_versioned(tr2.make_checkpointer(str(tmp_path / "cdc_ck")))
    np.testing.assert_allclose(
        np.array(tr2.state.params["embedding"]["table"]), table_before)
    np.testing.assert_allclose(tr2.cluster.matrix_mask, tr.cluster.matrix_mask)
    np.testing.assert_allclose(tr2.cluster.matrix_A, tr.cluster.matrix_A)
    assert list(tr2.cluster.domain2group_list) == \
        list(tr.cluster.domain2group_list)
    assert tr2.cluster.call_update_group == tr.cluster.call_update_group
    assert tr2.cluster.p_weight == pytest.approx(tr.cluster.p_weight)
    assert meta["extra"]["tag"] == "r2"
    be.close()
