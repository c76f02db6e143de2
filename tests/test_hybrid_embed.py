"""Hybrid small/big-field embedding update: exact equivalence with the
dense reference path (tpurec/train/hybrid.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpurec.config import Config, ModelConfig, TrainConfig
from tpurec.models import build_model
from tpurec.train.hybrid import make_hybrid_train_step
from tpurec.train.reg import reg_coef_tree
from tpurec.train.sparse import init_sparse_opt_state
from tpurec.train.step import TrainState, make_optimizer, make_train_step

# field 1 and 4 are "big" with threshold 20
FIELD_DIMS = (16, 64, 12, 8, 40)
DOMAIN_IDX = 3
BS = 32
CFG = ModelConfig(model="mmoe", embed_dim=4, mmoe_expert_dims=(8,),
                  mmoe_tower_dims=(4,), use_atten=False, dropout=0.0)


def _mk(mode: str, wd=1e-8, l2_emb=1e-5, threshold=20, dup_heavy=False):
    model = build_model("mmoe", FIELD_DIMS, 2, DOMAIN_IDX, CFG)
    tcfg = TrainConfig(bs=BS, wd=wd)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, d, BS) for d in FIELD_DIMS], 1).astype(np.int32)
    if dup_heavy:
        # many duplicate big-field ids in one batch
        x[:, 1] = rng.integers(0, 3, BS)
        x[:, 4] = rng.integers(0, 2, BS)
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
    reg = reg_coef_tree(params, "mmoe", l2_emb, l2_emb, l2_emb)
    if mode == "hybrid":
        step, _ = make_hybrid_train_step(
            model, tcfg, reg, True, tuple(ms.keys()),
            l2_reg_embedding=l2_emb, optimizer=tx,
            big_vocab_threshold=threshold,
        )
        opt = init_sparse_opt_state(params, tx)
    else:
        step, _ = make_train_step(model, tcfg, reg, True, tuple(ms.keys()),
                                  optimizer=tx)
        opt = tx.init(params)
    st = TrainState(params=params, opt_state=opt, model_state=ms,
                    step=jnp.zeros((), jnp.int32))
    return model, st, batch, step, tx, reg, ms


@pytest.mark.parametrize("dup_heavy", [False, True])
@pytest.mark.parametrize("threshold", [20, 0, 10**9])
def test_hybrid_matches_dense_exactly(threshold, dup_heavy):
    """Hybrid must reproduce dense Adam + dense embedding L2 step-by-step:
    with threshold=0 every field is 'big' (pure two-phase correction),
    with threshold=inf every field is 'small' (pure matmul grads)."""
    _, st_d, batch, step_d, *_ = _mk("dense", dup_heavy=dup_heavy)
    _, st_h, _, step_h, *_ = _mk("hybrid", threshold=threshold,
                                 dup_heavy=dup_heavy)

    for i in range(4):
        r = jax.random.PRNGKey(i)
        st_d, loss_d = step_d(st_d, batch, r)
        st_h, loss_h = step_h(st_h, batch, r)
        assert float(loss_d) == pytest.approx(float(loss_h), rel=1e-5), i
        np.testing.assert_allclose(
            np.array(st_d.params["embedding"]["table"]),
            np.array(st_h.params["embedding"]["table"]),
            atol=2e-6, err_msg=f"step {i}",
        )
        np.testing.assert_allclose(
            np.array(st_d.params["experts"]["linear_0"]["weight"]),
            np.array(st_h.params["experts"]["linear_0"]["weight"]),
            atol=2e-6, err_msg=f"step {i}",
        )
    # moments match the dense optax state too
    m_dense = None
    for part in jax.tree_util.tree_leaves_with_path(st_d.opt_state):
        path = "/".join(str(p) for p in part[0])
        if "mu" in path and "table" in path:
            m_dense = part[1]
    np.testing.assert_allclose(
        np.array(m_dense), np.array(st_h.opt_state[1].m), atol=1e-7)


def test_hybrid_scan_matches_single_steps():
    _, st_a, batch, step_a, tx, reg, ms = _mk("hybrid")
    model, st_b, _, _, _, _, _ = _mk("hybrid")
    scan, _ = make_hybrid_train_step(
        model, TrainConfig(bs=BS, wd=1e-8), reg, True, tuple(ms.keys()),
        l2_reg_embedding=1e-5, optimizer=tx, scan_k=3, big_vocab_threshold=20,
    )
    rngs = jax.random.split(jax.random.PRNGKey(7), 3)
    losses_a = []
    for i in range(3):
        st_a, l = step_a(st_a, batch, rngs[i])
        losses_a.append(float(l))
    batches = {k: jnp.stack([v] * 3) for k, v in batch.items()}
    st_b, losses_b = scan(st_b, batches, rngs)
    np.testing.assert_allclose(losses_a, np.array(losses_b), rtol=1e-6)
    np.testing.assert_allclose(
        np.array(st_a.params["embedding"]["table"]),
        np.array(st_b.params["embedding"]["table"]), atol=1e-6)


@pytest.mark.slow
def test_trainer_hybrid_end_to_end():
    """Trainer with embedding_update='hybrid' (the default) learns."""
    from tpurec.data import make_synthetic
    from tpurec.train import Trainer

    data = make_synthetic(n_rows=6000, n_fields=5, n_domain=3, domain_idx=2,
                          seed=3)
    cfg = Config(
        model=ModelConfig(model="mmoe", embed_dim=8, mmoe_expert_dims=(16,),
                          mmoe_tower_dims=(8,), use_atten=False),
        train=TrainConfig(bs=256, epoch=2, seed=0, embedding_update="hybrid"),
    )
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                 domain2group=np.arange(data.n_domain))
    out = tr.fit(data.train, data.valid,
                 domain_cnt_weight=data.domain_cnt_weight())
    assert out["valid"]["total_auc"] > 0.62


def test_bf16_moments_mode():
    """embedding_moments_dtype='bfloat16' (documented divergence): moments
    stored bf16, math in f32 — params stay close to the exact-f32 run."""
    model = build_model("mmoe", FIELD_DIMS, 2, DOMAIN_IDX, CFG)
    tcfg = TrainConfig(bs=BS, wd=1e-8, embedding_moments_dtype="bfloat16")
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
    reg = reg_coef_tree(params, "mmoe", 1e-5, 1e-5, 1e-5)
    step, _ = make_hybrid_train_step(
        model, tcfg, reg, True, tuple(ms.keys()),
        l2_reg_embedding=1e-5, optimizer=tx)
    st = TrainState(
        params=params,
        opt_state=init_sparse_opt_state(params, tx, "bfloat16"),
        model_state=ms, step=jnp.zeros((), jnp.int32))

    _, st_f32, _, step_f32, *_ = _mk("hybrid")
    for i in range(4):
        r = jax.random.PRNGKey(i)
        st, loss_b = step(st, batch, r)
        st_f32, loss_f = step_f32(st_f32, batch, r)
    assert st.opt_state[1].m.dtype == jnp.bfloat16
    # bf16 moment rounding perturbs params only slightly after 4 steps
    np.testing.assert_allclose(
        np.array(st.params["embedding"]["table"]),
        np.array(st_f32.params["embedding"]["table"]), atol=5e-4)
    assert float(loss_b) == pytest.approx(float(loss_f), rel=1e-3)


def test_mixed_table_lookup_bit_identical_to_take():
    import jax.numpy as jnp
    import numpy as np
    from tpurec.nn.core import EmbeddingLayout, mixed_table_lookup

    field_dims = (50000, 10, 7, 9000, 12, 300)   # mix of small/big vocabs
    layout = EmbeddingLayout(field_dims)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(layout.vocab, 8)).astype(np.float32))
    x = np.stack([rng.integers(0, d, 64) for d in field_dims], 1).astype(np.int32)
    ref = jnp.take(table, jnp.asarray(x) + jnp.asarray(layout.offsets)[None, :],
                   axis=0)
    got = mixed_table_lookup(table, jnp.asarray(x), layout)
    assert got.shape == ref.shape
    assert bool(jnp.all(got == ref))

    # all-small and all-big degenerate layouts fall back to one take
    for dims in ((10, 12, 7), (50000, 90000)):
        lay = EmbeddingLayout(dims)
        t = jnp.asarray(rng.normal(size=(lay.vocab, 4)).astype(np.float32))
        xx = np.stack([rng.integers(0, d, 32) for d in dims], 1).astype(np.int32)
        r = jnp.take(t, jnp.asarray(xx) + jnp.asarray(lay.offsets)[None, :], axis=0)
    # (value check inside loop)
        assert bool(jnp.all(mixed_table_lookup(t, jnp.asarray(xx), lay) == r))


@pytest.mark.parametrize("B", [16, 300])  # small-N (eq-matmul) & sort paths
def test_update_stacked_matches_per_lane_update(B):
    """EmbeddingUpdater.update_stacked (lane-FLAT [N*V, D] operands) == N
    independent update() calls.  B=300 with 8 big-field columns crosses
    the 2048-id sort path; B=16 stays on the equality-matmul duplicate
    path."""
    from tpurec.train.hybrid import EmbeddingUpdater

    field_dims = (50000, 10, 7, 9000, 12, 300, 70000, 40000,
                  30000, 25000, 21000, 22000, 23000)
    tcfg = TrainConfig(bs=B)
    upd = EmbeddingUpdater(field_dims, tcfg, l2_reg_embedding=1e-5,
                           big_vocab_threshold=500)
    rng = np.random.default_rng(0)
    N = 3
    V, D = upd.vocab, 8
    tables = jnp.asarray(rng.normal(size=(N, V, D)).astype(np.float32))
    ms = jnp.asarray(rng.normal(size=(N, V, D)).astype(np.float32) * 0.01)
    vs = jnp.asarray(np.abs(rng.normal(size=(N, V, D))).astype(np.float32) * 0.01)
    xs = np.stack([rng.integers(0, d, (N, B)) for d in field_dims],
                  axis=2).astype(np.int32)
    # duplicate ids inside each lane exercise the combining paths
    xs[:, : B // 2, 0] = xs[:, B // 2: 2 * (B // 2), 0]
    xs = jnp.asarray(xs)
    g = jnp.asarray(rng.normal(
        size=(N, B * len(field_dims), D)).astype(np.float32))
    steps = jnp.asarray([3, 7, 11], jnp.int32)

    from tpurec.train.sparse import SparseEmbedState

    flat = lambda a: a.reshape(N * V, D)  # noqa: E731
    p_s, st_s, sq_s = jax.jit(
        lambda *a: upd.update_stacked(*a, lanes=N))(
        flat(tables), SparseEmbedState(m=flat(ms), v=flat(vs)), xs, g, steps)
    p_s = p_s.reshape(N, V, D)
    m_s = st_s.m.reshape(N, V, D)
    v_s = st_s.v.reshape(N, V, D)

    one = jax.jit(upd.update)
    for l in range(N):
        p_l, st_l, sq_l = one(
            tables[l], SparseEmbedState(m=ms[l], v=vs[l]), xs[l], g[l],
            steps[l])
        np.testing.assert_allclose(np.asarray(p_s[l]), np.asarray(p_l),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(m_s[l]), np.asarray(st_l.m),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(v_s[l]), np.asarray(st_l.v),
                                   rtol=0, atol=1e-6)
        assert float(sq_s[l]) == pytest.approx(float(sq_l), rel=1e-6)
