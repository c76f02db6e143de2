"""Scanned mega-steps must be step-for-step identical to sequential steps,
and the CDC gated scan must discard invalid steps exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpurec.config import CDCConfig, Config, ModelConfig, TrainConfig
from tpurec.data import make_synthetic
from tpurec.models import build_model
from tpurec.train.reg import reg_coef_tree
from tpurec.train.step import (
    TrainState,
    make_optimizer,
    make_scan_train_steps,
    make_train_step,
)

FIELD_DIMS = (32, 16, 8, 4, 12)
DOMAIN_IDX = 3
BS = 32
K = 5

CFG = ModelConfig(model="mmoe", embed_dim=4, mmoe_expert_dims=(8,),
                  mmoe_tower_dims=(4,), use_atten=False, dropout=0.0)


def _mk():
    model = build_model("mmoe", FIELD_DIMS, 2, DOMAIN_IDX, CFG)
    tcfg = TrainConfig(bs=BS)
    rng = np.random.default_rng(0)
    xs = np.stack([rng.integers(0, d, (K, BS)) for d in FIELD_DIMS], 2).astype(np.int32)
    batches = {
        "x": jnp.asarray(xs),
        "y": jnp.asarray(rng.integers(0, 2, (K, BS)).astype(np.float32)),
        "group": jnp.asarray((xs[:, :, DOMAIN_IDX] % 2).astype(np.int32)),
        "mask": jnp.ones((K, BS), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batches["x"][0])
    params = variables["params"]
    ms = {k: v for k, v in variables.items() if k != "params"}
    reg = reg_coef_tree(params, "mmoe", 1e-5, 1e-5, 1e-5)
    tx = make_optimizer(tcfg)
    st = TrainState(params=params, opt_state=tx.init(params),
                    model_state=ms, step=jnp.zeros((), jnp.int32))
    return model, tcfg, reg, tx, st, batches, tuple(ms.keys())


def test_scan_equals_sequential_steps():
    model, tcfg, reg, tx, st, batches, mutable = _mk()
    rngs = jax.random.split(jax.random.PRNGKey(7), K)

    step, _ = make_train_step(model, tcfg, reg, True, mutable, optimizer=tx)
    st_seq = st
    seq_losses = []
    for i in range(K):
        b = {k: v[i] for k, v in batches.items()}
        st_seq, loss = step(st_seq, b, rngs[i])
        seq_losses.append(float(loss))

    _, _, _, _, st2, _, _ = _mk()
    scan, _ = make_scan_train_steps(model, tcfg, reg, True, mutable, optimizer=tx)
    st_scan, losses = scan(st2, batches, rngs)

    np.testing.assert_allclose(seq_losses, np.asarray(losses), rtol=1e-6)
    a = np.asarray(st_seq.params["embedding"]["table"])
    b = np.asarray(st_scan.params["embedding"]["table"])
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.slow
def test_cdc_gated_scan_discards_invalid_steps():
    data = make_synthetic(n_rows=3000, n_fields=5, n_domain=4, domain_idx=3, seed=2)
    cfg = Config(
        model=ModelConfig(model="cdc", embed_dim=4, mlp_dims=(8,),
                          use_atten=False, dropout=0.0),
        cdc=CDCConfig(base_model="mmoe", n_cluster=2, n_causal_mask=3,
                      cdc_tower_dims=(4,), group_chunk_size=3),
        train=TrainConfig(bs=64, epoch=1, seed=0),
    )
    from tpurec.cdc import CDCTrainer

    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    tr.setup_data(data.train)

    # burst over 2 domains with k=1: 2*1=2 entries -> 1 chunk, K_max=2 ->
    # one valid step + one gated-out step
    p_before = np.asarray(tr.state.params["embedding"]["table"]).copy()
    rng_state = np.asarray(tr.dropout_rng).copy()
    tr._train_burst([0, 1], 1)
    p_gated = np.asarray(tr.state.params["embedding"]["table"]).copy()

    # redo with a fresh trainer but run the equivalent ungated single step
    tr2 = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    tr2.setup_data(data.train)
    assert np.allclose(np.asarray(tr2.state.params["embedding"]["table"]), p_before)
    # consume RNG exactly like _train_burst does (one split for the scan)
    tr2.dropout_rng, rng = jax.random.split(tr2.dropout_rng)
    rngs = jax.random.split(rng, tr2._burst_k_max(1))
    idx, mask = tr2._multi_idx_padded([0, 1], 3 * 64)
    tr2.state, _ = tr2._split_step(
        tr2.state, tr2.Xdev, tr2.ydev,
        jnp.asarray(idx), jnp.asarray(mask), rngs[0], tr2.domain2group_dev,
    )
    p_single = np.asarray(tr2.state.params["embedding"]["table"])
    np.testing.assert_allclose(p_gated, p_single, atol=1e-6)
    assert not np.allclose(p_gated, p_before)  # the valid step DID apply
