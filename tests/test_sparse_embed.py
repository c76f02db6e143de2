"""Row-sparse embedding updates vs the dense reference path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpurec.config import ModelConfig, TrainConfig
from tpurec.models import build_model
from tpurec.train.reg import reg_coef_tree
from tpurec.train.sparse import (
    combine_duplicate_rows,
    init_sparse_opt_state,
    make_sparse_train_step,
)
from tpurec.train.step import TrainState, make_optimizer, make_train_step

FIELD_DIMS = (64, 32, 16, 8, 40)
DOMAIN_IDX = 3
BS = 32
CFG = ModelConfig(model="mmoe", embed_dim=4, mmoe_expert_dims=(8,),
                  mmoe_tower_dims=(4,), use_atten=False, dropout=0.0)


def test_combine_duplicate_rows(rng):
    ids = jnp.asarray(np.array([5, 2, 5, 9, 2, 2], np.int32))
    g = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
    id_u, g_u, valid = combine_duplicate_rows(ids, g, vocab_size=100)
    got = {}
    for i in range(6):
        if int(valid[i]):
            got[int(id_u[i])] = np.array(g_u[i])
    g_np = np.array(g)
    np.testing.assert_allclose(got[2], g_np[[1, 4, 5]].sum(0), atol=1e-6)
    np.testing.assert_allclose(got[5], g_np[[0, 2]].sum(0), atol=1e-6)
    np.testing.assert_allclose(got[9], g_np[3], atol=1e-6)
    # padding segments carry the sentinel
    assert all(int(id_u[i]) == 100 for i in range(6) if not int(valid[i]))


def _mk(sparse: bool, wd=0.0, l2_emb=0.0):
    model = build_model("mmoe", FIELD_DIMS, 2, DOMAIN_IDX, CFG)
    tcfg = TrainConfig(bs=BS, wd=wd)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, d, BS) for d in FIELD_DIMS], 1).astype(np.int32)
    batch = {
        "x": jnp.asarray(x),
        "y": jnp.asarray(rng.integers(0, 2, BS).astype(np.float32)),
        "group": jnp.asarray((x[:, DOMAIN_IDX] % 2).astype(np.int32)),
        "mask": jnp.ones((BS,), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["x"])
    params = variables["params"]
    ms = {k: v for k, v in variables.items() if k != "params"}
    tx = make_optimizer(tcfg)
    if sparse:
        reg = reg_coef_tree(params, "mmoe", l2_emb, l2_emb, l2_emb)
        step, _ = make_sparse_train_step(
            model, tcfg, reg, True, tuple(ms.keys()),
            l2_reg_embedding=l2_emb, optimizer=tx,
        )
        opt = init_sparse_opt_state(params, tx)
    else:
        reg = reg_coef_tree(params, "mmoe", l2_emb, l2_emb, l2_emb)
        step, _ = make_train_step(model, tcfg, reg, True, tuple(ms.keys()), optimizer=tx)
        opt = tx.init(params)
    st = TrainState(params=params, opt_state=opt, model_state=ms,
                    step=jnp.zeros((), jnp.int32))
    return model, st, batch, step


def test_sparse_step_matches_dense_on_touched_rows():
    """With wd=0, l2_emb=0 and zero initial moments, the dense path leaves
    untouched rows unchanged, so sparse and dense must agree EXACTLY on the
    whole table after step 1, and on all dense params."""
    _, st_d, batch, step_d = _mk(sparse=False)
    _, st_s, _, step_s = _mk(sparse=True)

    st_d, loss_d = step_d(st_d, batch, jax.random.PRNGKey(1))
    st_s, loss_s = step_s(st_s, batch, jax.random.PRNGKey(1))
    assert float(loss_d) == pytest.approx(float(loss_s), rel=1e-6)
    np.testing.assert_allclose(
        np.array(st_d.params["embedding"]["table"]),
        np.array(st_s.params["embedding"]["table"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.array(st_d.params["experts"]["linear_0"]["weight"]),
        np.array(st_s.params["experts"]["linear_0"]["weight"]),
        atol=1e-6,
    )

    # second step still matches (moments now nonzero on touched rows)
    st_d, _ = step_d(st_d, batch, jax.random.PRNGKey(2))
    st_s, _ = step_s(st_s, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        np.array(st_d.params["embedding"]["table"]),
        np.array(st_s.params["embedding"]["table"]),
        atol=1e-5,
    )


def test_sparse_step_untouched_rows_frozen(rng):
    """Rows never gathered must be bit-identical after a sparse step."""
    model, st, batch, step = _mk(sparse=True)
    table0 = np.array(st.params["embedding"]["table"])
    offsets = np.concatenate([[0], np.cumsum(FIELD_DIMS)[:-1]])
    touched = np.unique((np.array(batch["x"]) + offsets[None]).reshape(-1))
    st, _ = step(st, batch, jax.random.PRNGKey(1))
    table1 = np.array(st.params["embedding"]["table"])
    untouched = np.setdiff1d(np.arange(sum(FIELD_DIMS)), touched)
    np.testing.assert_array_equal(table0[untouched], table1[untouched])
    assert not np.allclose(table0[touched], table1[touched])


@pytest.mark.slow
def test_sparse_learns_e2e():
    from tpurec.data import make_synthetic
    from tpurec.train.step import bce_with_logits

    data = make_synthetic(n_rows=8000, n_fields=5, n_domain=4, domain_idx=3, seed=4)
    model = build_model("mmoe", data.field_dims, 1, 3,
                        ModelConfig(model="mmoe", embed_dim=8,
                                    mmoe_expert_dims=(32, 16), mmoe_tower_dims=(16,),
                                    use_atten=False, dropout=0.0))
    tcfg = TrainConfig(bs=256)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 5), jnp.int32))
    params = variables["params"]
    ms = {k: v for k, v in variables.items() if k != "params"}
    tx = make_optimizer(tcfg)
    reg0 = jax.tree_util.tree_map(lambda _: 0.0, params)
    step, _ = make_sparse_train_step(
        model, tcfg, reg0, True, tuple(ms.keys()),
        l2_reg_embedding=1e-5, optimizer=tx,
    )
    st = TrainState(params=params, opt_state=init_sparse_opt_state(params, tx),
                    model_state=ms, step=jnp.zeros((), jnp.int32))
    Xtr, ytr = data.train
    rng = np.random.default_rng(0)
    first = last = None
    for i in range(60):
        sl = rng.integers(0, len(ytr), 256)
        batch = {"x": jnp.asarray(Xtr[sl]), "y": jnp.asarray(ytr[sl]),
                 "group": jnp.zeros((256,), jnp.int32),
                 "mask": jnp.ones((256,), jnp.float32)}
        st, loss = step(st, batch, jax.random.PRNGKey(i))
        if i == 0:
            first = float(loss)
        last = float(loss)
    assert last < first * 0.98


def test_trainer_with_sparse_embedding_update():
    from tpurec.config import Config, TrainConfig as TC
    from tpurec.data import make_synthetic
    from tpurec.train import Trainer

    data = make_synthetic(n_rows=8000, n_fields=5, n_domain=4, domain_idx=3, seed=4)
    cfg = Config(
        model=ModelConfig(model="dcn", embed_dim=8, mlp_dims=(32, 16),
                          atten_embed_dim=8, att_layer_num=1),
        train=TC(bs=256, epoch=2, seed=0, embedding_update="sparse"),
    )
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    out = tr.fit(data.train, data.valid, domain_cnt_weight=data.domain_cnt_weight())
    assert out["valid"]["total_auc"] > 0.55


@pytest.mark.slow
def test_sparse_vs_hybrid_auc_delta_bounded():
    """Lazy Adam's semantic deviations (untouched rows' moments don't
    decay, embedding L2 hits touched rows only — module docstring) must
    not cost measurable model quality on plain zoo training: train the
    same model/data/seed under both update paths and bound the AUC gap
    (VERDICT round-2 item 4's quality side; throughput side is
    scripts/bench_sparse.py)."""
    from tpurec.config import Config, TrainConfig as TC
    from tpurec.data import make_synthetic
    from tpurec.train import Trainer

    data = make_synthetic(n_rows=20000, n_fields=6, n_domain=4,
                          domain_idx=3, seed=4)
    aucs = {}
    for upd in ("hybrid", "sparse"):
        cfg = Config(
            model=ModelConfig(model="mmoe", embed_dim=8,
                              mmoe_expert_dims=(32, 16),
                              mmoe_tower_dims=(16,), use_atten=False,
                              dropout=0.0),
            train=TC(bs=256, epoch=3, seed=0, embedding_update=upd),
        )
        tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                     domain2group=np.arange(data.n_domain))
        out = tr.fit(data.train, data.valid,
                     domain_cnt_weight=data.domain_cnt_weight())
        aucs[upd] = out["valid"]["total_auc"]
    assert aucs["hybrid"] > 0.6  # learned something real
    assert abs(aucs["sparse"] - aucs["hybrid"]) < 0.01, aucs


def test_sort_dedup_matches_scatter_dedup():
    """The vocab-independent sort/segment-sum dedup must produce exactly
    the same step as the dense scatter-add dedup (same touched rows, same
    moments), duplicates included."""
    from tpurec.data import make_synthetic

    data = make_synthetic(n_rows=2000, n_fields=5, n_domain=4,
                          domain_idx=3, seed=2)
    model = build_model("mmoe", data.field_dims, 1, 3, CFG)
    tcfg = TrainConfig(bs=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 5), jnp.int32))
    params = variables["params"]
    ms = {k: v for k, v in variables.items() if k != "params"}
    tx = make_optimizer(tcfg)
    reg0 = jax.tree_util.tree_map(lambda _: 0.0, params)
    Xtr, ytr = data.train
    # duplicate-heavy batch: repeat rows so ids collide across and within rows
    sl = np.concatenate([np.arange(32), np.arange(16), np.arange(16)])
    batch = {"x": jnp.asarray(Xtr[sl]), "y": jnp.asarray(ytr[sl]),
             "group": jnp.zeros((64,), jnp.int32),
             "mask": jnp.ones((64,), jnp.float32)}

    outs = {}
    for mode in ("scatter", "sort"):
        step, _ = make_sparse_train_step(
            model, tcfg, reg0, True, tuple(ms.keys()),
            l2_reg_embedding=1e-5, optimizer=tx, dedup=mode)
        st = TrainState(
            params=jax.tree_util.tree_map(jnp.copy, params),
            opt_state=init_sparse_opt_state(params, tx),
            model_state=jax.tree_util.tree_map(jnp.copy, ms),
            step=jnp.zeros((), jnp.int32))
        for i in range(3):
            st, loss = step(st, batch, jax.random.PRNGKey(i))
        outs[mode] = (jax.tree_util.tree_map(np.asarray, st.params),
                      jax.tree_util.tree_map(np.asarray, st.opt_state),
                      float(loss))
    assert outs["sort"][2] == outs["scatter"][2]
    np.testing.assert_allclose(
        outs["sort"][0]["embedding"]["table"],
        outs["scatter"][0]["embedding"]["table"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(outs["sort"][1][1].m), np.asarray(outs["scatter"][1][1].m),
        rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(outs["sort"][1][1].v), np.asarray(outs["scatter"][1][1].v),
        rtol=1e-6, atol=1e-8)


def test_sparse_dedup_auto_and_validation():
    import pytest

    from tpurec.train.sparse import SORT_DEDUP_VOCAB

    assert SORT_DEDUP_VOCAB > sum(FIELD_DIMS)  # tiny vocab -> scatter
    model = build_model("mmoe", FIELD_DIMS, 1, DOMAIN_IDX, CFG)
    tcfg = TrainConfig(bs=8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 5), jnp.int32))
    ms = {k: v for k, v in variables.items() if k != "params"}
    tx = make_optimizer(tcfg)
    reg0 = jax.tree_util.tree_map(lambda _: 0.0, variables["params"])
    with pytest.raises(ValueError, match="dedup"):
        make_sparse_train_step(model, tcfg, reg0, True, tuple(ms.keys()),
                               l2_reg_embedding=0.0, optimizer=tx,
                               dedup="nope")
