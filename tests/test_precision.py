"""Mixed-precision (bf16 matmul-operand) policy tests.

The policy (tpurec.nn.precision) casts only dense-contraction operands to
bf16; accumulation/outputs/params stay f32.  Locked-in behaviors:

- default policy is OFF and bit-identical to the pre-policy code path
- bf16 forward stays close to f32 (operand rounding only, no error
  compounding through activations)
- training under bf16 converges on the synthetic set (AUC sanity)
- trainers with different policies coexist (the policy is baked at trace
  time per jitted step, not read from a live global at run time)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpurec.config import Config, ModelConfig, TrainConfig
from tpurec.data import make_synthetic
from tpurec.nn import precision
from tpurec.train import Trainer


def test_policy_default_off():
    assert precision.get_compute_dtype() is None
    x = jnp.ones((2, 3))
    assert precision.cast_operands(x).dtype == jnp.float32


def test_policy_scope_restores():
    with precision.compute_dtype("bfloat16"):
        assert precision.get_compute_dtype() == jnp.bfloat16
        v = jnp.full((2, 3), 1.0 + 2.0**-12)  # not representable in bf16
        x, w = precision.cast_operands(v, jnp.ones((3, 4)))
        # TPU: bf16 operands; CPU fallback: bf16-rounded f32 operands
        assert x.dtype in (jnp.bfloat16, jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(x, np.float32),
            np.asarray(v.astype(jnp.bfloat16), np.float32))
    assert precision.get_compute_dtype() is None


def test_policy_rejects_unknown():
    with pytest.raises(ValueError):
        precision.set_compute_dtype("float8")
    assert precision.get_compute_dtype() is None


def _make(compute_dtype, model="mmoe"):
    data = make_synthetic(n_rows=12000, n_fields=6, n_domain=4, domain_idx=3,
                          seed=3)
    cfg = Config(
        model=ModelConfig(model=model, embed_dim=8, mmoe_expert_dims=(32, 16),
                          mmoe_tower_dims=(16,), atten_embed_dim=8,
                          att_layer_num=1, mlp_dims=(32, 16)),
        train=TrainConfig(bs=256, epoch=2, seed=0, compute_dtype=compute_dtype,
                          steps_per_dispatch=4),
    )
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                 domain2group=np.arange(data.n_domain))
    return tr, data


@pytest.mark.slow
def test_bf16_forward_close_to_f32():
    tr32, data = _make("float32")
    trbf, _ = _make("bfloat16")
    X = data.valid[0][:512]
    group = np.asarray(tr32.domain2group)[X[:, data.domain_idx]]
    batch = {"x": jnp.asarray(X), "group": jnp.asarray(group)}
    p32 = np.asarray(tr32.eval_step(tr32.state.params, tr32.state.model_state,
                                    batch))
    pbf = np.asarray(trbf.eval_step(tr32.state.params, tr32.state.model_state,
                                    batch))
    assert not np.allclose(p32, pbf, atol=0)      # policy actually engaged
    np.testing.assert_allclose(p32, pbf, atol=2e-2)
    # rank agreement: bf16 rounding must not reshuffle predictions
    from scipy.stats import spearmanr

    rho = spearmanr(p32, pbf).statistic
    assert rho > 0.999


@pytest.mark.slow
def test_bf16_trains_and_coexists_with_f32():
    # build bf16 trainer FIRST, then f32: if the policy leaked from a live
    # global instead of being baked per-trace, the f32 trainer (traced
    # later, lazily, possibly while another policy is current) would drift
    tr_bf, data = _make("bfloat16")
    tr_32, _ = _make("float32")
    w = data.domain_cnt_weight()
    out_bf = tr_bf.fit(data.train, data.valid, domain_cnt_weight=w)
    out_32 = tr_32.fit(data.train, data.valid, domain_cnt_weight=w)
    assert out_bf["valid"]["total_auc"] > 0.60
    assert abs(out_bf["valid"]["total_auc"] - out_32["valid"]["total_auc"]) < 0.03
    assert precision.get_compute_dtype() is None
