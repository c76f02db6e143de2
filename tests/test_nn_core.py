"""nn core vs torch oracles: embedding offsets, BN semantics, MLP stacks,
FM identity, cross-layer recurrences (SURVEY.md §4 unit-test list)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tpurec.nn import (
    BatchNorm,
    CrossNetMix,
    CrossNetV2,
    CrossNetwork,
    FactorizationMachine,
    FusedEmbedding,
    InnerProductNetwork,
    Linear,
    MLP,
    StackedLinear,
    StackedMLP,
)


def test_fused_embedding_offsets(rng):
    field_dims = (5, 7, 3)
    emb = FusedEmbedding(field_dims, embed_dim=4)
    ids = jnp.asarray(rng.integers(0, 3, size=(6, 3)), dtype=jnp.int32)
    variables = emb.init(jax.random.PRNGKey(0), ids)
    out = emb.apply(variables, ids)
    table = variables["params"]["table"]
    offsets = np.array([0, 5, 12])
    for b in range(6):
        for f in range(3):
            np.testing.assert_allclose(
                out[b, f], table[offsets[f] + int(ids[b, f])], rtol=1e-6
            )
    flat = emb.apply(variables, ids, flatten=True)
    assert flat.shape == (6, 12)


def test_fused_embedding_init_std_knob(rng):
    """Default init is N(0,1) (reference layer.py:140); init_std is the
    opt-in scaled alternative."""
    field_dims = (4000, 3000)
    ids = jnp.zeros((2, 2), jnp.int32)
    default = FusedEmbedding(field_dims, embed_dim=8).init(
        jax.random.PRNGKey(0), ids)["params"]["table"]
    scaled = FusedEmbedding(field_dims, embed_dim=8, init_std=0.01).init(
        jax.random.PRNGKey(0), ids)["params"]["table"]
    assert abs(float(jnp.std(default)) - 1.0) < 0.02
    assert abs(float(jnp.std(scaled)) - 0.01) < 0.001


def test_linear_matches_torch_math(rng):
    x = rng.normal(size=(4, 8)).astype(np.float32)
    lin = Linear(3)
    variables = lin.init(jax.random.PRNGKey(0), jnp.asarray(x))
    w = np.array(variables["params"]["weight"])
    b = np.array(variables["params"]["bias"])
    tl = torch.nn.Linear(8, 3)
    with torch.no_grad():
        tl.weight.copy_(torch.tensor(w.T))
        tl.bias.copy_(torch.tensor(b))
    got = lin.apply(variables, jnp.asarray(x))
    want = tl(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_linear_init_distribution():
    # torch default: U(-1/sqrt(in), 1/sqrt(in))
    lin = Linear(64)
    variables = lin.init(jax.random.PRNGKey(1), jnp.zeros((1, 256)))
    w = np.array(variables["params"]["weight"])
    bound = 1 / np.sqrt(256)
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.8 * bound  # actually fills the range


def test_batchnorm_matches_torch_train_and_eval(rng):
    x1 = rng.normal(2.0, 3.0, size=(32, 5)).astype(np.float32)
    x2 = rng.normal(-1.0, 0.5, size=(32, 5)).astype(np.float32)
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x1))
    tbn = torch.nn.BatchNorm1d(5)

    state = variables
    for x in (x1, x2):
        out, mut = bn.apply(
            state, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
        )
        state = {"params": state["params"], **mut}
        t_out = tbn(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(out, t_out, atol=1e-4)

    np.testing.assert_allclose(
        state["batch_stats"]["mean"], tbn.running_mean.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        state["batch_stats"]["var"], tbn.running_var.numpy(), atol=1e-4
    )
    tbn.eval()
    x3 = rng.normal(size=(8, 5)).astype(np.float32)
    out = bn.apply(state, jnp.asarray(x3), use_running_average=True)
    np.testing.assert_allclose(out, tbn(torch.tensor(x3)).detach().numpy(), atol=1e-4)


def test_batchnorm_masked_equals_subset(rng):
    """Masked BN stats == BN computed on the gathered subset (the dense-masked
    replacement for star.py:84-86 style row routing)."""
    x = rng.normal(size=(64, 6)).astype(np.float32)
    mask = (rng.random(64) < 0.6).astype(np.float32)
    sub = x[mask > 0]
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_masked, mut = bn.apply(
        variables, jnp.asarray(x), use_running_average=False,
        mask=jnp.asarray(mask), mutable=["batch_stats"],
    )
    out_sub, mut_sub = bn.apply(
        variables, jnp.asarray(sub), use_running_average=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.array(out_masked)[mask > 0], np.array(out_sub), atol=1e-4
    )
    np.testing.assert_allclose(
        mut["batch_stats"]["mean"], mut_sub["batch_stats"]["mean"], atol=1e-5
    )
    np.testing.assert_allclose(
        mut["batch_stats"]["var"], mut_sub["batch_stats"]["var"], atol=1e-4
    )


def test_batchnorm_skips_batch_of_one(rng):
    x = rng.normal(size=(1, 5)).astype(np.float32)
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.zeros((2, 5)))
    out = bn.apply(variables, jnp.asarray(x), use_running_average=False)
    np.testing.assert_allclose(out, x)  # layer.py:202-204 semantics


def test_stacked_linear_equals_per_tower(rng):
    x = rng.normal(size=(10, 8)).astype(np.float32)
    sl = StackedLinear(n_stack=3, features=4)
    variables = sl.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = sl.apply(variables, jnp.asarray(x))
    w = np.array(variables["params"]["weight"])
    b = np.array(variables["params"]["bias"])
    for t in range(3):
        np.testing.assert_allclose(out[:, t], x @ w[t] + b[t], atol=1e-5)
    # rank-3 input: tower t sees slice t
    x3 = rng.normal(size=(10, 3, 8)).astype(np.float32)
    out3 = sl.apply(variables, jnp.asarray(x3))
    for t in range(3):
        np.testing.assert_allclose(out3[:, t], x3[:, t] @ w[t] + b[t], atol=1e-5)


def test_fm_identity_with_pairwise_inner_products(rng):
    """FM square-of-sum trick == sum of pairwise inner products
    (layer.py:160-175 vs layer.py:446-457)."""
    x = jnp.asarray(rng.normal(size=(7, 5, 6)).astype(np.float32))
    fm = FactorizationMachine(reduce_sum=True)
    ipn = InnerProductNetwork()
    fm_out = fm.apply({}, x)
    ipn_out = ipn.apply({}, x)
    np.testing.assert_allclose(
        np.array(fm_out).ravel(), np.sum(np.array(ipn_out), axis=1), atol=1e-4
    )


def test_crossnetwork_recurrence(rng):
    x = rng.normal(size=(4, 6)).astype(np.float32)
    cn = CrossNetwork(num_layers=2)
    variables = cn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = cn.apply(variables, jnp.asarray(x))
    p = variables["params"]
    ref = x.copy()
    for i in range(2):
        xw = ref @ np.array(p[f"w_{i}"])
        ref = x * xw + np.array(p[f"b_{i}"]) + ref
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_crossnetv2_recurrence(rng):
    x = rng.normal(size=(4, 6)).astype(np.float32)
    cn = CrossNetV2(num_layers=2)
    variables = cn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = cn.apply(variables, jnp.asarray(x))
    p = variables["params"]
    ref = x.copy()
    for i in range(2):
        ref = x * (ref @ np.array(p[f"w_{i}"])) + np.array(p[f"b_{i}"]) + ref
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_crossnetmix_matches_torch_reference_math(rng):
    """CrossNetMix einsum formulation == the per-expert loop math
    (layer.py:372-407)."""
    B, D, E, R, L = 3, 8, 2, 4, 2
    x = rng.normal(size=(B, D)).astype(np.float32)
    cnm = CrossNetMix(num_layers=L, low_rank=R, num_experts=E)
    variables = cnm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = cnm.apply(variables, jnp.asarray(x))
    p = variables["params"]
    g = np.array(p["gating"])  # [E, D]
    x0 = x[:, :, None]
    xl = x0.copy()
    for i in range(L):
        u, v, c = np.array(p[f"u_{i}"]), np.array(p[f"v_{i}"]), np.array(p[f"c_{i}"])
        bias = np.array(p[f"bias_{i}"])[:, None]
        outs, gates = [], []
        for e in range(E):
            gates.append(xl[:, :, 0] @ g[e][:, None])
            vx = np.tanh(np.einsum("dr,bdo->bro", v[e], xl))
            vx = np.tanh(np.einsum("rq,bqo->bro", c[e], vx))
            uv = np.einsum("dr,bro->bdo", u[e], vx)
            outs.append((x0 * (uv + bias))[:, :, 0])
        outs = np.stack(outs, 2)  # [B, D, E]
        gates = np.stack(gates, 1)  # [B, E, 1]
        softmax = np.exp(gates) / np.exp(gates).sum(1, keepdims=True)
        xl = np.einsum("bde,beo->bdo", outs, softmax) + xl
    np.testing.assert_allclose(np.array(out), xl[:, :, 0], atol=1e-4)


def test_mlp_shapes_and_dropout_determinism(rng):
    x = jnp.asarray(rng.normal(size=(16, 10)).astype(np.float32))
    mlp = MLP(layer_dims=(8, 4), dropout=0.5, output_layer=True)
    variables = mlp.init(jax.random.PRNGKey(0), x)
    out_eval = mlp.apply(variables, x, train=False)
    assert out_eval.shape == (16, 1)
    out1 = mlp.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(7)},
    )[0]
    out2 = mlp.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(7)},
    )[0]
    np.testing.assert_allclose(out1, out2)


def test_stacked_mlp_equals_independent_mlps(rng):
    """StackedMLP (no BN/dropout) must equal per-tower Linears applied in a
    loop — the einsum bank is a pure batching of layer.py:40-56."""
    x = rng.normal(size=(9, 12)).astype(np.float32)
    smlp = StackedMLP(n_stack=2, layer_dims=(6, 3), dropout=0.0, output_layer=True, use_bn=False)
    variables = smlp.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = smlp.apply(variables, jnp.asarray(x), train=False)
    p = variables["params"]
    for t in range(2):
        h = x.copy()
        for i, _ in enumerate((6, 3)):
            h = np.maximum(
                h @ np.array(p[f"linear_{i}"]["weight"][t]) + np.array(p[f"linear_{i}"]["bias"][t]),
                0,
            )
        h = h @ np.array(p["linear_out"]["weight"][t]) + np.array(p["linear_out"]["bias"][t])
        np.testing.assert_allclose(out[:, t], h, atol=1e-4)


def test_embedding_layout_big_field_reorder(rng):
    """Mixed small/big schema: big-vocab fields are laid out AFTER the
    small prefix; lookups stay correct through the permuted offsets."""
    from tpurec.nn.core import EmbeddingLayout, FusedEmbedding

    field_dims = (9000, 5, 10000, 7)   # fields 0,2 are layout-big
    lay = EmbeddingLayout(field_dims)
    assert lay.small_fields == (1, 3)
    assert lay.big_fields == (0, 2)
    assert lay.small_rows == 12
    assert lay.offsets[1] == 0 and lay.offsets[3] == 5
    assert lay.offsets[0] == 12 and lay.offsets[2] == 12 + 9000
    assert lay.vocab % 8 == 0 and lay.vocab >= lay.n_rows == 19012

    mod = FusedEmbedding(field_dims, 4)
    ids = np.stack([rng.integers(0, d, 16) for d in field_dims], 1).astype(np.int32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    table = np.array(variables["params"]["table"])
    out = np.array(mod.apply(variables, jnp.asarray(ids)))
    for b in range(16):
        for f in range(4):
            np.testing.assert_allclose(
                out[b, f], table[lay.offsets[f] + ids[b, f]], rtol=1e-6)
    # padding rows zero-initialized
    assert np.all(table[lay.n_rows:] == 0.0)
