"""STAR (reference: model/star.py).

Star-topology FCN: each domain tower's layer weights are the elementwise
product of its private weights with shared weights; biases add
(star.py:90-102).  Partitioned normalization: per-domain BN whose scale is
domain_gamma*shared_gamma and shift domain_beta+shared_beta (star.py:117-187).

TPU-first: instead of gathering each group's rows into a variable-size
sub-batch (star.py:84-86), all towers compute over the full batch as one
tower-batched einsum with the fused [T, in, out] weights; BatchNorm uses
per-group masked statistics — mathematically identical, statically shaped.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpurec.models.base import AuxLogits, CTRModel
from tpurec.nn import initializers as tinit
from tpurec.nn.core import BatchNorm


class PartitionedNorm(nn.Module):
    """MDR_BatchNorm bank: one BN per domain tower, with shared gamma/beta
    fused in (star.py:38-39,117-187).  Input [B, C]; output [B, T, C] where
    slice t is the input normalized by tower t's (masked) statistics."""

    n_tower: int

    @nn.compact
    def __call__(self, x, group_onehot, train: bool = False, row_mask=None):
        B, C = x.shape
        T = self.n_tower
        shared_w = self.param("shared_weight", tinit.ones_init, (C,))
        shared_b = self.param("shared_bias", tinit.zeros_init, (C,))
        w = self.param("weight", tinit.ones_init, (T, C))
        b = self.param("bias", tinit.zeros_init, (T, C))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((T, C)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((T, C)))

        xt = jnp.broadcast_to(x[:, None, :], (B, T, C))
        if train:
            m = group_onehot  # [B, T]
            if row_mask is not None:
                m = m * row_mask[:, None]
            w_mask = m[:, :, None]
            n = jnp.sum(w_mask, axis=0)  # [T, 1]
            n_safe = jnp.maximum(n, 1.0)
            mean = jnp.sum(w_mask * xt, axis=0) / n_safe
            var = jnp.sum(w_mask * jnp.square(xt - mean[None]), axis=0) / n_safe
            if not self.is_initializing():
                momentum = 0.1
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                has_rows = (n > 0).astype(x.dtype)
                ra_mean.value = ra_mean.value + momentum * has_rows * (mean - ra_mean.value)
                ra_var.value = ra_var.value + momentum * has_rows * (unbiased - ra_var.value)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + 1e-5)
        return (xt - mean[None]) * inv * (w * shared_w)[None] + (b + shared_b)[None]


class STAR(CTRModel):
    """STAR (star.py:12-114): PN -> fused star FCN per tower -> fused final
    linear + aux heads.  Output [B, T] logits; the harness selects each
    row's group tower (equivalent to the reference's mask-gather-concat)."""

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, emb = self.embed(x, embed_rows)
        B = flat.shape[0]
        T = self.n_tower
        if group is None:
            # CDC-wrapped STAR is called without x_group (cdc.py:101,105): every
            # tower then normalizes over the full batch (star.py:84-87 with
            # x_group=None keeps all rows).
            group_onehot = jnp.ones((B, T), flat.dtype)
        else:
            group_onehot = jax.nn.one_hot(group, T, dtype=flat.dtype)  # [B, T]

        aux = AuxLogits(self.cfg, name="aux")(flat, emb, train=train)

        h = PartitionedNorm(T, name="pn")(
            flat, group_onehot, train=train, row_mask=row_mask
        )  # [B, T, C]

        # per-group row masks for the in-tower BNs
        bn_mask = group_onehot if row_mask is None else group_onehot * row_mask[:, None]

        dims = (self.embed_output_dim,) + tuple(self.cfg.tower_dims)
        for i in range(len(self.cfg.tower_dims)):
            in_d, out_d = dims[i], dims[i + 1]
            dw = self.param(f"domain_w_{i}", tinit.linear_weight_init(in_d), (T, in_d, out_d))
            db = self.param(f"domain_b_{i}", tinit.linear_bias_init(in_d), (T, out_d))
            sw = self.param(f"shared_w_{i}", tinit.linear_weight_init(in_d), (in_d, out_d))
            sb = self.param(f"shared_b_{i}", tinit.linear_bias_init(in_d), (out_d,))
            fused_w = dw * sw[None]          # star.py:91
            fused_b = db + sb[None]          # star.py:92
            h = jnp.einsum("bti,tio->bto", h, fused_w, preferred_element_type=jnp.float32)
            h = h + fused_b[None]
            h = BatchNorm(name=f"dnn_bn_{i}")(
                h, use_running_average=not train, mask=bn_mask
            )
            h = jax.nn.relu(h)
            h = nn.Dropout(rate=self.cfg.dropout, deterministic=not train)(h)

        in_d = dims[-1]
        dw = self.param("domain_linear_w", tinit.linear_weight_init(in_d), (T, in_d, 1))
        db = self.param("domain_linear_b", tinit.linear_bias_init(in_d), (T, 1))
        sw = self.param("shared_linear_w", tinit.linear_weight_init(in_d), (in_d, 1))
        sb = self.param("shared_linear_b", tinit.linear_bias_init(in_d), (1,))
        logit = jnp.einsum(
            "bti,tio->bto", h, dw * sw[None], preferred_element_type=jnp.float32
        ) + (db + sb[None])[None]
        return logit[..., 0] + aux  # [B, T]
