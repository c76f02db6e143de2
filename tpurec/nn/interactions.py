"""Feature-interaction ops (FM, cross networks, field attention).

TPU-first re-designs of the interaction layers in model/layer.py:

- :class:`FactorizationMachine` — layer.py:160-175
- :class:`CrossNetwork` (DCN v1) — layer.py:303-329
- :class:`CrossNetV2` — layer.py:332-343
- :class:`CrossNetMix` (DCN-v2 low-rank MoE cross) — layer.py:346-407,
  with the per-expert Python loop collapsed into expert-batched einsums
- :class:`FieldMultiHeadAttention` / :class:`FieldAttention` — the AutoInt
  field-axis self-attention stack (autoint.py:48-65, layer.py:58-84)

Plus the reference's additional interaction ops for layer-library parity
(layer.py:446-606): InnerProductNetwork, OuterProductNetwork,
AttentionalFactorizationMachine, CompressedInteractionNetwork, AnovaKernel.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpurec.nn import initializers as tinit
from tpurec.nn.core import Linear
from tpurec.nn.precision import cast_operands


class FactorizationMachine(nn.Module):
    """0.5 * ((sum_f v_f)^2 - sum_f v_f^2), optionally reduced over embed dim."""

    reduce_sum: bool = True

    def __call__(self, x):
        # x: [B, F, D]
        square_of_sum = jnp.square(jnp.sum(x, axis=1))
        sum_of_square = jnp.sum(jnp.square(x), axis=1)
        ix = square_of_sum - sum_of_square
        if self.reduce_sum:
            ix = jnp.sum(ix, axis=1, keepdims=True)
        return 0.5 * ix


class CrossNetwork(nn.Module):
    """DCN-v1 cross stack: x_{l+1} = x0 * (x_l . w_l) + b_l + x_l.

    On TPU the whole stack runs as one fused Pallas kernel (VMEM-resident
    batch tile, custom VJP — tpurec.ops.crossnet_pallas, ~12% faster than
    the XLA-fused per-layer form); elsewhere the per-layer jnp recurrence.
    ``fused=None`` auto-selects by backend.
    """

    num_layers: int
    fused: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        ws, bs = [], []
        for i in range(self.num_layers):
            ws.append(self.param(f"w_{i}", tinit.linear_weight_init(in_dim), (in_dim, 1)))
            bs.append(self.param(f"b_{i}", tinit.zeros_init, (in_dim,)))

        fused = self.fused
        if fused is None:
            import jax as _jax

            fused = _jax.default_backend() not in ("cpu",)
        if fused and x.ndim == 2:
            from tpurec.ops.crossnet_pallas import cross_network_fused

            w = jnp.stack([w[:, 0] for w in ws])
            b = jnp.stack(bs)
            return cross_network_fused(x, w, b, False)

        x0 = x
        for i in range(self.num_layers):
            xc, wc = cast_operands(x, ws[i])
            xw = jnp.einsum("bi,io->bo", xc, wc, preferred_element_type=jnp.float32)
            x = x0 * xw + bs[i] + x
        return x


class CrossNetV2(nn.Module):
    """Full-matrix cross: x_{l+1} = x0 * (W_l x_l) + b_l + x_l."""

    num_layers: int

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        x0 = x
        for i in range(self.num_layers):
            w = self.param(f"w_{i}", tinit.linear_weight_init(in_dim), (in_dim, in_dim))
            b = self.param(f"b_{i}", tinit.zeros_init, (in_dim,))
            xc, wc = cast_operands(x, w)
            x = x0 * jnp.einsum("bi,io->bo", xc, wc, preferred_element_type=jnp.float32) + b + x
        return x


class CrossNetMix(nn.Module):
    """DCN-v2 mixture-of-low-rank-experts cross (layer.py:346-407).

    Per layer l and expert e:
        v = tanh(V[l,e]^T x);  v = tanh(C[l,e] v);  uv = U[l,e] v
        out_e = x0 * (uv + bias[l]);   gate_e = x . g_e  (gates shared
        across layers, layer.py:367)
        x <- sum_e out_e * softmax_e(gate) + x

    The reference's per-expert Python loop (layer.py:378-398) is one
    expert-batched einsum chain here.
    """

    num_layers: int = 2
    low_rank: int = 32
    num_experts: int = 4

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        E, r = self.num_experts, self.low_rank
        # gates are shared across layers (layer.py:367), bias is per layer
        g = self.param("gating", tinit.linear_weight_init(in_dim), (E, in_dim))
        x0 = x
        for i in range(self.num_layers):
            u = self.param(f"u_{i}", tinit.xavier_normal_init(), (E, in_dim, r))
            v = self.param(f"v_{i}", tinit.xavier_normal_init(), (E, in_dim, r))
            c = self.param(f"c_{i}", tinit.xavier_normal_init(), (E, r, r))
            bias = self.param(f"bias_{i}", tinit.zeros_init, (in_dim,))

            xc, gc, vc, uc, cc = cast_operands(x, g, v, u, c)
            gate = jnp.einsum("bi,ei->be", xc, gc, preferred_element_type=jnp.float32)
            vx = jnp.tanh(jnp.einsum("bi,eir->ber", xc, vc, preferred_element_type=jnp.float32))
            vxc = cast_operands(vx)
            cv = jnp.tanh(jnp.einsum("ber,eqr->beq", vxc, cc, preferred_element_type=jnp.float32))
            cvc = cast_operands(cv)
            uv = jnp.einsum("beq,eiq->bei", cvc, uc, preferred_element_type=jnp.float32)
            expert_out = x0[:, None, :] * (uv + bias[None, None, :])  # [B, E, in]
            mix = jnp.einsum(
                "bei,be->bi", expert_out, jax.nn.softmax(gate, axis=1),
                preferred_element_type=jnp.float32,
            )
            x = mix + x
        return x


def _xavier_uniform_2d(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class FieldMultiHeadAttention(nn.Module):
    """Self-attention over the field axis (torch nn.MultiheadAttention semantics).

    Input [B, F, A] -> output [B, F, A].  in_proj is one [A, 3A]
    xavier-uniform weight (+zero bias), out_proj torch-Linear init with zero
    bias, dropout applied to the attention weights, matching
    torch.nn.MultiheadAttention defaults (autoint.py:39-41).
    """

    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, F, A = x.shape
        H = self.num_heads
        assert A % H == 0, "embed dim must divide heads"
        hd = A // H
        w_in = self.param("in_proj_weight", lambda k, s: _xavier_uniform_2d(k, (s[0], s[1])), (A, 3 * A))
        b_in = self.param("in_proj_bias", tinit.zeros_init, (3 * A,))
        xc, w_in_c = cast_operands(x, w_in)
        qkv = jnp.einsum("bfa,ac->bfc", xc, w_in_c, preferred_element_type=jnp.float32) + b_in
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # Two formulations of the same per-head math, chosen by mode
        # (measured on v5e at bench shapes, scripts/profile_attn_variants):
        # - train (fwd+bwd): fold heads into the BATCH dim ([B*H, F, hd])
        #   with one explicit transpose per tensor — plain rank-3 batched
        #   dots compile ~8% faster than the 4D einsums when the backward
        #   is present (0.74 vs 0.81 ms/step for the 3-layer stack).
        # - eval (fwd only): reshape-only 4D einsums win (0.65 vs
        #   0.72 ms) — without a backward, XLA folds the head split into
        #   the dots and the explicit transposes would be pure overhead.
        if train:
            def to_bh(t):
                return t.reshape(B, F, H, hd).transpose(0, 2, 1, 3) \
                        .reshape(B * H, F, hd)
            q3, k3, v3 = to_bh(q), to_bh(k), to_bh(v)
            q3c, k3c = cast_operands(q3, k3)
            scores = jax.lax.dot_general(
                q3c, k3c, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32) / math.sqrt(hd)
            attn = jax.nn.softmax(scores, axis=-1)
            attn = nn.Dropout(rate=self.dropout, deterministic=not train)(attn)
            attnc, v3c = cast_operands(attn, v3)
            out = jax.lax.dot_general(
                attnc, v3c, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            out = out.reshape(B, H, F, hd).transpose(0, 2, 1, 3) \
                     .reshape(B, F, A)
        else:
            q4 = q.reshape(B, F, H, hd)
            k4 = k.reshape(B, F, H, hd)
            v4 = v.reshape(B, F, H, hd)
            q4c, k4c = cast_operands(q4, k4)
            scores = jnp.einsum("bfhd,bghd->bhfg", q4c, k4c,
                                preferred_element_type=jnp.float32)
            scores = scores / math.sqrt(hd)
            attn = jax.nn.softmax(scores, axis=-1)
            attnc, v4c = cast_operands(attn, v4)
            out = jnp.einsum("bhfg,bghd->bfhd", attnc, v4c,
                             preferred_element_type=jnp.float32).reshape(B, F, A)
        w_out = self.param("out_proj_weight", tinit.linear_weight_init(A), (A, A))
        b_out = self.param("out_proj_bias", tinit.zeros_init, (A,))
        outc, w_out_c = cast_operands(out, w_out)
        return jnp.einsum("bfa,ao->bfo", outc, w_out_c, preferred_element_type=jnp.float32) + b_out


class _LinearParams(nn.Module):
    """Param-holder with the same names/shapes/inits as ``Linear`` so the
    fused kernel path shares one checkpoint layout with the jnp path."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        w = self.param("weight", tinit.linear_weight_init(self.in_dim),
                       (self.in_dim, self.features))
        b = self.param("bias", tinit.linear_bias_init(self.in_dim),
                       (self.features,))
        return w, b


class _MHAParams(nn.Module):
    """Param-holder matching ``FieldMultiHeadAttention``'s layout."""

    atten_dim: int

    @nn.compact
    def __call__(self):
        A = self.atten_dim
        w_in = self.param(
            "in_proj_weight",
            lambda k, s: _xavier_uniform_2d(k, (s[0], s[1])), (A, 3 * A))
        b_in = self.param("in_proj_bias", tinit.zeros_init, (3 * A,))
        w_out = self.param("out_proj_weight", tinit.linear_weight_init(A),
                           (A, A))
        b_out = self.param("out_proj_bias", tinit.zeros_init, (A,))
        return w_in, b_in, w_out, b_out


class FieldAttention(nn.Module):
    """AutoInt attention stack: project fields to atten dim, N MHA layers,
    optional V_res residual, ReLU, flatten (autoint.py:48-61, layer.py:71-84).

    Input: field embeddings [B, F, D]; output [B, F*atten_embed_dim].

    ``fused=True`` runs the Pallas fused-stack kernel
    (tpurec.ops.attention_pallas — the whole stack in VMEM); both paths
    share one parameter layout, eval outputs are bit-identical (dropout
    bits differ, as between any two dropout implementations).  The
    kernels stay OFF by default on measured evidence, not as a TODO:
    the restructured per-layer generation compiles fast and matches
    grads on-chip, but is MXU-latency-bound on the tiny per-(row, head)
    dots and runs 2.87 ms/step vs this jnp path's 1.04 under XLA at
    bench shapes — XLA's batched-GEMM fusion wins at CTR field counts
    (F~23).  See tpurec/ops/attention_pallas.py STATUS for the numbers.
    """

    atten_embed_dim: int
    att_layer_num: int = 3
    att_head_num: int = 2
    att_res: bool = True
    dropout: float = 0.2
    fused: Optional[bool] = None

    @nn.compact
    def __call__(self, embed_x, train: bool = False):
        B, F, D = embed_x.shape
        A = self.atten_embed_dim
        use_fused = bool(self.fused) and self.att_res \
            and A % self.att_head_num == 0
        if use_fused:
            from tpurec.ops.attention_pallas import fused_field_attention

            w_emb, b_emb = _LinearParams(D, A, name="atten_embedding")()
            flat = [w_emb, b_emb]
            flat += list(_LinearParams(D, A, name="V_res_embedding")())
            for i in range(self.att_layer_num):
                flat += list(_MHAParams(A, name=f"self_attn_{i}")())
            if train and self.dropout > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, np.int32(2**31 - 1))
            else:
                seed = jnp.zeros((), jnp.int32)
            interpret = jax.default_backend() == "cpu"
            out = fused_field_attention(
                embed_x, flat, seed, self.att_layer_num, self.att_head_num,
                self.dropout if train else 0.0, bool(train), 128, interpret,
            )
            return out.reshape(B, F * A)

        atten_x = Linear(A, name="atten_embedding")(embed_x)
        cross = atten_x
        for i in range(self.att_layer_num):
            cross = FieldMultiHeadAttention(
                self.att_head_num, dropout=self.dropout, name=f"self_attn_{i}"
            )(cross, train=train)
        if self.att_res:
            cross = cross + Linear(A, name="V_res_embedding")(embed_x)
        cross = jax.nn.relu(cross)
        return cross.reshape(B, F * A)


# ---------------------------------------------------------------------------
# Additional interaction ops for layer-library parity (layer.py:446-606).
# Unused by the model zoo in the reference too, but part of its public layer
# surface.
# ---------------------------------------------------------------------------


def _pair_indices(num_fields: int) -> Tuple[np.ndarray, np.ndarray]:
    row, col = np.triu_indices(num_fields, k=1)
    return row, col


class InnerProductNetwork(nn.Module):
    """Pairwise inner products of field embeddings (layer.py:446-457)."""

    def __call__(self, x):
        row, col = _pair_indices(x.shape[1])
        return jnp.sum(x[:, row] * x[:, col], axis=2)


class OuterProductNetwork(nn.Module):
    """Kernel-product pairwise interaction (layer.py:460-492)."""

    num_fields: int
    embed_dim: int
    kernel_type: str = "mat"

    @nn.compact
    def __call__(self, x):
        row, col = _pair_indices(self.num_fields)
        num_ix = len(row)
        if self.kernel_type == "mat":
            kernel = self.param(
                "kernel", lambda k, s: _xavier_uniform_3d(k, s), (self.embed_dim, num_ix, self.embed_dim)
            )
        elif self.kernel_type == "vec":
            kernel = self.param("kernel", lambda k, s: _xavier_uniform_2d(k, s), (num_ix, self.embed_dim))
        elif self.kernel_type == "num":
            kernel = self.param("kernel", lambda k, s: _xavier_uniform_2d(k, s), (num_ix, 1))
        else:
            raise ValueError(f"unknown kernel type {self.kernel_type}")
        p, q = x[:, row], x[:, col]  # [B, num_ix, D]
        if self.kernel_type == "mat":
            kp = jnp.einsum("bnd,dne->bne", p, kernel, preferred_element_type=jnp.float32)
            return jnp.sum(kp * q, axis=-1)
        return jnp.sum(p * q * kernel[None], axis=-1)


def _xavier_uniform_3d(key, shape, dtype=jnp.float32):
    # torch xavier_uniform_ on a 3D tensor: fan_in = shape[1]*shape[2],
    # fan_out = shape[0]*shape[2]
    receptive = shape[2]
    fan_in, fan_out = shape[1] * receptive, shape[0] * receptive
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class AttentionalFactorizationMachine(nn.Module):
    """AFM attention-pooled pairwise interactions (layer.py:518-543)."""

    attn_size: int
    dropouts: Tuple[float, float] = (0.2, 0.2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        row, col = _pair_indices(x.shape[1])
        p, q = x[:, row], x[:, col]
        inner = p * q  # [B, num_ix, D]
        scores = jax.nn.relu(Linear(self.attn_size, name="attention")(inner))
        scores = jax.nn.softmax(Linear(1, name="projection")(scores), axis=1)
        scores = nn.Dropout(rate=self.dropouts[0], deterministic=not train)(scores)
        out = jnp.sum(scores * inner, axis=1)
        out = nn.Dropout(rate=self.dropouts[1], deterministic=not train)(out)
        return Linear(1, name="fc")(out)


class CompressedInteractionNetwork(nn.Module):
    """xDeepFM CIN (layer.py:546-582)."""

    input_dim: int  # num_fields
    cross_layer_sizes: Sequence[int]
    split_half: bool = True

    @nn.compact
    def __call__(self, x):
        # x: [B, F, D]
        xs = []
        x0, h = x[:, :, None, :], x  # x0: [B, F, 1, D]
        prev_dim = self.input_dim
        num_layers = len(self.cross_layer_sizes)
        for i in range(num_layers):
            size = self.cross_layer_sizes[i]
            z = x0 * h[:, None, :, :]  # [B, F0, Fin, D]
            B, f0, fin, D = z.shape
            z = z.reshape(B, f0 * fin, D)
            # Conv1d(kernel=1) == pointwise linear over channel axis
            w = self.param(
                f"conv_w_{i}", tinit.linear_weight_init(f0 * fin), (f0 * fin, size)
            )
            b = self.param(f"conv_b_{i}", tinit.linear_bias_init(f0 * fin), (size,))
            z = jax.nn.relu(
                jnp.einsum("bcd,ce->bed", z, w, preferred_element_type=jnp.float32)
                + b[None, :, None]
            )
            if self.split_half and i != num_layers - 1:
                z, h = jnp.split(z, 2, axis=1)
            else:
                h = z
            xs.append(z)
            prev_dim = h.shape[1]
        return jnp.sum(jnp.concatenate(xs, axis=1), axis=2)


class AnovaKernel(nn.Module):
    """Order-t ANOVA kernel via the DP recurrence (layer.py:585-606)."""

    order: int
    reduce_sum: bool = True

    def __call__(self, x):
        B, F, D = x.shape
        a_prev = jnp.ones((B, F + 1, D), x.dtype)
        for t in range(self.order):
            a = jnp.zeros((B, F + 1, D), x.dtype)
            a = a.at[:, t + 1:, :].add(x[:, t:, :] * a_prev[:, t:-1, :])
            a = jnp.cumsum(a, axis=1)
            a_prev = a
        if self.reduce_sum:
            return jnp.sum(a_prev[:, -1, :], axis=-1, keepdims=True)
        return a_prev[:, -1, :]
