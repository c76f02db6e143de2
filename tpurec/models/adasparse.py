"""AdaSparse (reference: model/adasparse.py).

Domain-conditioned pruned DNN: per layer, a pruner produces
pi = beta*sigmoid(alpha*Linear([h, domain_emb])), hard-thresholded at
epsilon, multiplying the layer activations (adasparse.py:48-66).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpurec.models.base import AuxLogits, CTRModel
from tpurec.nn import initializers as tinit
from tpurec.nn.core import BatchNorm, Linear


class AdaSparse(CTRModel):
    """DNN_w_Pruner + linear head + aux heads (adasparse.py:70-116).
    hidden_dims=mlp_dims (run.py:413); alpha=1, beta=2, eps=0.25
    (adasparse.py:44-46); dnn linear weights init N(0, 1e-4)
    (adasparse.py:39-41); domain embedding detached (adasparse.py:100)."""

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, emb = self.embed(x, embed_rows)
        domain_embed = jax.lax.stop_gradient(emb[:, self.domain_idx, :])

        h = flat
        dims = (self.embed_output_dim,) + tuple(self.cfg.mlp_dims)
        for i in range(len(self.cfg.mlp_dims)):
            in_d, out_d = dims[i], dims[i + 1]
            w = self.param(
                f"linear_w_{i}", tinit.normal_init(self.cfg.adasparse_init_std), (in_d, out_d)
            )
            b = self.param(f"linear_b_{i}", tinit.linear_bias_init(in_d), (out_d,))
            fc = jnp.einsum("bi,io->bo", h, w, preferred_element_type=jnp.float32) + b

            pruner_in = jnp.concatenate([h, domain_embed], axis=-1)
            pi = self.cfg.adasparse_beta * jax.nn.sigmoid(
                self.cfg.adasparse_alpha
                * Linear(out_d, name=f"pruner_{i}")(pruner_in)
            )
            pi = jnp.where(jnp.abs(pi) <= self.cfg.adasparse_epsilon, 0.0, pi)
            fc = fc * pi

            fc = BatchNorm(name=f"bn_{i}")(fc, use_running_average=not train, mask=row_mask)
            fc = jax.nn.relu(fc)
            fc = nn.Dropout(rate=self.cfg.dropout, deterministic=not train)(fc)
            h = fc

        logit = Linear(1, name="dnn_linear")(h)
        logit = logit + AuxLogits(self.cfg, name="aux")(flat, emb, train=train)
        return logit[:, 0]
