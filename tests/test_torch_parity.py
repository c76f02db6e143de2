"""Torch-oracle parity: copy weights into independently-built torch modules
and compare full forward outputs (eval mode, dropout off).

This is the apples-to-apples check that our TPU-first formulations compute
the same functions as the reference's torch building blocks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from tpurec.config import ModelConfig
from tpurec.models import build_model
from tpurec.nn.interactions import FieldMultiHeadAttention

torch.manual_seed(0)


def test_field_mha_matches_torch_multihead_attention(rng):
    B, Fn, A, H = 4, 7, 16, 2
    x = rng.normal(size=(B, Fn, A)).astype(np.float32)
    mha = FieldMultiHeadAttention(num_heads=H, dropout=0.0)
    variables = mha.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]

    tm = torch.nn.MultiheadAttention(A, H, dropout=0.0)
    with torch.no_grad():
        tm.in_proj_weight.copy_(torch.tensor(np.array(p["in_proj_weight"]).T))
        tm.in_proj_bias.copy_(torch.tensor(np.array(p["in_proj_bias"])))
        tm.out_proj.weight.copy_(torch.tensor(np.array(p["out_proj_weight"]).T))
        tm.out_proj.bias.copy_(torch.tensor(np.array(p["out_proj_bias"])))
    tm.eval()

    got = mha.apply(variables, jnp.asarray(x), train=False)
    # torch MHA wants [L, N, E] (the reference transposes, autoint.py:51-56)
    t_in = torch.tensor(x).transpose(0, 1)
    want, _ = tm(t_in, t_in, t_in)
    want = want.transpose(0, 1).detach().numpy()
    np.testing.assert_allclose(np.array(got), want, atol=2e-5)


class _TorchDeepFM(torch.nn.Module):
    """Independent torch replica of the reference DeepFM (dfm.py:30-35)."""

    def __init__(self, field_dims, embed_dim, mlp_dims):
        super().__init__()
        self.offsets = torch.tensor(
            np.concatenate([[0], np.cumsum(field_dims)[:-1]]), dtype=torch.long
        )
        self.embedding = torch.nn.Embedding(sum(field_dims), embed_dim)
        self.linear = torch.nn.Linear(len(field_dims) * embed_dim, 1)
        layers, in_dim = [], len(field_dims) * embed_dim
        for d in mlp_dims:
            layers += [torch.nn.Linear(in_dim, d), torch.nn.BatchNorm1d(d),
                       torch.nn.ReLU(), torch.nn.Dropout(0.0)]
            in_dim = d
        layers.append(torch.nn.Linear(in_dim, 1))
        self.mlp = torch.nn.Sequential(*layers)

    def forward(self, x):
        e = self.embedding(x + self.offsets)              # [B, F, D]
        flat = e.flatten(1)
        sq = e.sum(1) ** 2
        ss = (e ** 2).sum(1)
        fm = 0.5 * (sq - ss).sum(1, keepdim=True)
        return (self.linear(flat) + fm + self.mlp(flat)).squeeze(1)


def test_deepfm_full_forward_matches_torch(rng):
    field_dims = (11, 7, 5, 4, 9)
    mlp_dims = (16, 8)
    cfg = ModelConfig(model="deepfm", embed_dim=6, mlp_dims=mlp_dims, dropout=0.0)
    model = build_model("deepfm", field_dims, 1, 3, cfg)
    X = np.stack([rng.integers(0, d, size=12) for d in field_dims], 1).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X))
    p = variables["params"]

    tm = _TorchDeepFM(field_dims, 6, mlp_dims)
    with torch.no_grad():
        # our table is layout-padded; copy the true rows only (field order is
        # preserved here because every test field is small-vocab)
        tm.embedding.weight.copy_(torch.tensor(
            np.array(p["embedding"]["table"])[: sum(field_dims)]))
        tm.linear.weight.copy_(torch.tensor(np.array(p["linear"]["weight"]).T))
        tm.linear.bias.copy_(torch.tensor(np.array(p["linear"]["bias"])))
        linears = [m for m in tm.mlp if isinstance(m, torch.nn.Linear)]
        for i, lin in enumerate(linears[:-1]):
            lin.weight.copy_(torch.tensor(np.array(p["mlp"][f"linear_{i}"]["weight"]).T))
            lin.bias.copy_(torch.tensor(np.array(p["mlp"][f"linear_{i}"]["bias"])))
        linears[-1].weight.copy_(
            torch.tensor(np.array(p["mlp"]["linear_out"]["weight"]).T))
        linears[-1].bias.copy_(
            torch.tensor(np.array(p["mlp"]["linear_out"]["bias"])))
    tm.eval()

    got = model.apply(variables, jnp.asarray(X), train=False)
    want = tm(torch.tensor(X, dtype=torch.long)).detach().numpy()
    np.testing.assert_allclose(np.array(got), want, atol=2e-5)


def test_star_weight_fusion_matches_torch_linear(rng):
    """STAR's fused layer == F.linear(x, domain_w*shared_w, domain_b+shared_b)
    per tower (star.py:90-102)."""
    from tpurec.models.star import STAR

    field_dims = (9, 7, 5, 4)
    cfg = ModelConfig(model="star", embed_dim=4, tower_dims=(8,),
                      dropout=0.0, use_atten=False)
    model = build_model("star", field_dims, 2, 3, cfg)
    X = np.stack([rng.integers(0, d, size=10) for d in field_dims], 1).astype(np.int32)
    group = (X[:, 3] % 2).astype(np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(X), group=jnp.asarray(group))
    p = variables["params"]

    # eval-mode forward: PN and tower BN use running stats (mean 0, var 1)
    out = model.apply(variables, jnp.asarray(X), group=jnp.asarray(group), train=False)

    # torch replica of the logit path for tower t
    emb = np.array(p["embedding"]["table"])
    offsets = np.concatenate([[0], np.cumsum(field_dims)[:-1]])
    flat = emb[X + offsets[None, :]].reshape(10, -1).astype(np.float32)

    for t in range(2):
        # PN eval: (x - 0)/sqrt(1+eps) * (w*shared_w) + (b+shared_b)
        wpn = np.array(p["pn"]["weight"][t]) * np.array(p["pn"]["shared_weight"])
        bpn = np.array(p["pn"]["bias"][t]) + np.array(p["pn"]["shared_bias"])
        h = torch.tensor((flat / np.sqrt(1 + 1e-5) * wpn + bpn).astype(np.float32))
        w0 = torch.tensor(np.array(p["domain_w_0"][t]) * np.array(p["shared_w_0"]))
        b0 = torch.tensor(np.array(p["domain_b_0"][t]) + np.array(p["shared_b_0"]))
        h = F.linear(h, w0.T, b0)
        h = h / torch.sqrt(torch.tensor(1 + 1e-5))  # tower BN eval, stats (0,1)
        h = h * torch.tensor(np.array(p["dnn_bn_0"]["scale"])) + torch.tensor(
            np.array(p["dnn_bn_0"]["bias"]))
        h = F.relu(h)
        wl = torch.tensor(np.array(p["domain_linear_w"][t]) * np.array(p["shared_linear_w"]))
        bl = torch.tensor(np.array(p["domain_linear_b"][t]) + np.array(p["shared_linear_b"]))
        logit = F.linear(h, wl.T, bl)[:, 0]
        # aux linear term
        aux = flat @ np.array(p["aux"]["linear"]["weight"]) + np.array(
            p["aux"]["linear"]["bias"])
        want = logit.detach().numpy() + aux[:, 0]
        np.testing.assert_allclose(np.array(out[:, t]), want, atol=2e-5)


def test_cin_matches_torch_conv1d(rng):
    """CompressedInteractionNetwork == the torch Conv1d(kernel=1) CIN
    (reference layer.py:546-582), including split_half bookkeeping."""
    from tpurec.nn.interactions import CompressedInteractionNetwork

    B, F_, D = 6, 5, 4
    sizes = (8, 6, 4)
    x = rng.normal(size=(B, F_, D)).astype(np.float32)
    ours = CompressedInteractionNetwork(F_, sizes, split_half=True)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]

    convs = torch.nn.ModuleList()
    prev = F_
    for i, s in enumerate(sizes):
        conv = torch.nn.Conv1d(F_ * prev, s, 1)
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(
                np.array(p[f"conv_w_{i}"]).T[:, :, None]))
            conv.bias.copy_(torch.tensor(np.array(p[f"conv_b_{i}"])))
        convs.append(conv)
        prev = s // 2 if i != len(sizes) - 1 else s

    import torch.nn.functional as TF

    xs, x0, h = [], torch.tensor(x).unsqueeze(2), torch.tensor(x)
    for i in range(len(sizes)):
        z = x0 * h.unsqueeze(1)
        bsz, f0, fin, d = z.shape
        z = TF.relu(convs[i](z.reshape(bsz, f0 * fin, d)))
        if i != len(sizes) - 1:
            z, h = torch.split(z, z.shape[1] // 2, dim=1)
        else:
            h = z
        xs.append(z)
    want = torch.sum(torch.cat(xs, dim=1), 2).detach().numpy()

    got = np.array(ours.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_afm_matches_torch(rng):
    """AttentionalFactorizationMachine == the torch AFM
    (reference layer.py:518-543), eval mode (dropout off)."""
    from tpurec.nn.interactions import AttentionalFactorizationMachine

    B, F_, D, A = 7, 5, 6, 4
    x = rng.normal(size=(B, F_, D)).astype(np.float32)
    ours = AttentionalFactorizationMachine(A, dropouts=(0.0, 0.0))
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]

    attn = torch.nn.Linear(D, A)
    proj = torch.nn.Linear(A, 1)
    fc = torch.nn.Linear(D, 1)
    with torch.no_grad():
        attn.weight.copy_(torch.tensor(np.array(p["attention"]["weight"]).T))
        attn.bias.copy_(torch.tensor(np.array(p["attention"]["bias"])))
        proj.weight.copy_(torch.tensor(np.array(p["projection"]["weight"]).T))
        proj.bias.copy_(torch.tensor(np.array(p["projection"]["bias"])))
        fc.weight.copy_(torch.tensor(np.array(p["fc"]["weight"]).T))
        fc.bias.copy_(torch.tensor(np.array(p["fc"]["bias"])))

    import torch.nn.functional as TF

    xt = torch.tensor(x)
    row, col = [], []
    for i in range(F_ - 1):
        for j in range(i + 1, F_):
            row.append(i), col.append(j)
    inner = xt[:, row] * xt[:, col]
    scores = TF.softmax(proj(TF.relu(attn(inner))), dim=1)
    want = fc(torch.sum(scores * inner, dim=1)).detach().numpy()

    got = np.array(ours.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_outer_product_network_matches_torch(rng):
    """OuterProductNetwork vs the reference's torch forward
    (layer.py:460-492) for all three kernel types.  NOTE the 'mat'
    parameterizations are transposes of each other (reference indexes
    kernel[e,i,d], ours kernel[d,i,e] — same function class, xavier init
    symmetric in distribution); the copy below maps between them."""
    from tpurec.nn.interactions import OuterProductNetwork

    B, F_, D = 5, 4, 6
    x = rng.normal(size=(B, F_, D)).astype(np.float32)
    row, col = [], []
    for i in range(F_ - 1):
        for j in range(i + 1, F_):
            row.append(i), col.append(j)
    xt = torch.tensor(x)
    p, q = xt[:, row], xt[:, col]

    for kt in ("mat", "vec", "num"):
        ours = OuterProductNetwork(F_, D, kernel_type=kt)
        variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
        k = torch.tensor(np.array(variables["params"]["kernel"]))
        if kt == "mat":
            kp = torch.sum(p.unsqueeze(1) * k.permute(2, 1, 0), dim=-1) \
                .permute(0, 2, 1)
            want = torch.sum(kp * q, -1)
        else:
            want = torch.sum(p * q * k.unsqueeze(0), -1)
        got = np.array(ours.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want.numpy(), atol=2e-6,
                                   err_msg=f"kernel_type={kt}")


def test_anova_kernel_matches_bruteforce_and_torch(rng):
    """AnovaKernel DP (layer.py:585-606) == brute-force sum over all
    order-t field subsets of their elementwise product."""
    from itertools import combinations

    from tpurec.nn.interactions import AnovaKernel

    B, F_, D, t = 3, 5, 4, 3
    x = rng.normal(size=(B, F_, D)).astype(np.float32)
    got = np.array(AnovaKernel(order=t, reduce_sum=False).apply(
        {}, jnp.asarray(x)))
    want = np.zeros((B, D), np.float64)
    for combo in combinations(range(F_), t):
        want += np.prod(x[:, list(combo), :].astype(np.float64), axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # reduce_sum variant: [B, 1] row sums
    got_rs = np.array(AnovaKernel(order=t, reduce_sum=True).apply(
        {}, jnp.asarray(x)))
    np.testing.assert_allclose(got_rs, want.sum(-1, keepdims=True), rtol=1e-5)
