"""Regularization spec: the coefficient tree must cover exactly the tensors
the reference registers (SURVEY.md §2.3 'reg machinery')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurec.config import ModelConfig
from tpurec.models import MODEL_REGISTRY, build_model
from tpurec.train.reg import reg_coef_tree, regularization_loss

FIELD_DIMS = (13, 11, 9, 4, 17, 8)
SMALL = ModelConfig(
    embed_dim=4, mlp_dims=(8, 4), tower_dims=(8, 4),
    mmoe_expert_dims=(8,), mmoe_tower_dims=(4,),
    ple_expert_dims=((8,), (4,)), ple_tower_dims=(4,),
    sei_dims=(4, 4), atten_embed_dim=4, att_layer_num=1, gate_hidden_dim=4,
)


def _flat_paths(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {"/".join(getattr(k, "key", str(k)) for k in p): v for p, v in flat}


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_reg_tree_structure(name):
    model = build_model(name, FIELD_DIMS, 2, 3, SMALL)
    x = jnp.zeros((4, len(FIELD_DIMS)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, group=jnp.zeros((4,), jnp.int32))
    params = variables["params"]
    coefs = reg_coef_tree(params, name, 1e-5, 1e-5, 1e-5)
    cpaths = _flat_paths(coefs)

    # embedding + first-order linear always registered (layer.py:31-33);
    # PNN (a zoo extension, not a reference model) has no wide linear term
    assert cpaths["embedding/table"] == 1e-5
    lin_key = "aux/linear/weight" if "aux/linear/weight" in cpaths else "linear/weight"
    if name in ("ipnn", "opnn"):
        assert lin_key not in cpaths
        lin_key = None
    else:
        assert cpaths[lin_key] == 1e-5

    # no bias is ever regularized ('weight' in name filter)
    for path, c in cpaths.items():
        if path.endswith("/bias") or path.split("/")[-1].startswith(("b_", "bias")):
            assert c == 0.0, path
        # BN params never regularized ('bn' not in name filter)
        if "/bn_" in path or "scale" in path.split("/")[-1]:
            assert c == 0.0, path
        # attention aux heads never registered in the reference
        if "/atten/" in path:
            assert c == 0.0, path

    # at least one dnn tensor is regularized for every model
    dnn_regs = [p for p, c in cpaths.items()
                if c > 0 and p not in ("embedding/table", lin_key)]
    assert dnn_regs, f"{name}: no dnn weights regularized"

    # the reg loss itself is positive and differentiable
    loss = regularization_loss(params, coefs)
    assert float(loss) > 0
    g = jax.grad(lambda p: regularization_loss(p, coefs))(params)
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(g)[0])).all()


def test_mmoe_gates_not_regularized():
    # mmoe registers experts+towers but NOT gates (mmoe.py:44-47)
    model = build_model("mmoe", FIELD_DIMS, 2, 3, SMALL)
    x = jnp.zeros((4, len(FIELD_DIMS)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    coefs = _flat_paths(reg_coef_tree(params, "mmoe", 1e-5, 1e-5, 1e-5))
    assert coefs["gates/weight"] == 0.0
    assert coefs["experts/linear_0/weight"] == 1e-5
    assert coefs["towers/linear_0/weight"] == 1e-5


def test_star_final_linears_not_regularized():
    # star registers the dnn stack but NOT the final linears (star.py:58-61)
    model = build_model("star", FIELD_DIMS, 2, 3, SMALL)
    x = jnp.zeros((4, len(FIELD_DIMS)), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), x, group=jnp.zeros((4,), jnp.int32)
    )["params"]
    coefs = _flat_paths(reg_coef_tree(params, "star", 1e-5, 1e-5, 1e-5))
    assert coefs["domain_w_0"] == 1e-5
    assert coefs["shared_w_0"] == 1e-5
    assert coefs["domain_linear_w"] == 0.0
    assert coefs["shared_linear_w"] == 0.0
    assert coefs["pn/weight"] == 0.0
