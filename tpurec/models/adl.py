"""ADL (reference: model/adl.py).

Distribution Learning Module: batch-level routing against EMA cluster
centers (adl.py:63-79), argmax -> tower; per-tower MLP with a shared-linear
fused final layer (adl.py:110-115).

The cluster centers live in the mutable ``adl_state`` collection.

Reference semantics notes:
- adl.py:69-75's dlm_iters loop recomputes identical values every iteration
  (the similarity always reads ``self.cluster_centers``, which is not
  updated inside the loop), so routing == one softmax against the current
  centers; we compute exactly that function.
- The reference updates centers on every forward, including eval
  (adl.py:63-79 has no training check); here centers update only when
  train=True so that eval stays pure (documented divergence).
- ``shared_mlps`` (adl.py:52) is dead weight in the reference — its forward
  use is commented out (adl.py:95-96); only ``shared_mlps_linear`` is live.

TPU-first: the per-tower mask/gather loop (adl.py:105-124) is a dense
tower-batched pass with routing-masked BatchNorm statistics + one-hot
selection of each row's tower logit.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpurec.models.base import AuxLogits, CTRModel
from tpurec.nn import initializers as tinit
from tpurec.nn.core import StackedLinear, StackedMLP


def _l2norm(v, axis=-1, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


class ADL(CTRModel):
    """Returns [B] logits, each row through its DLM-routed tower."""

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, emb = self.embed(x, embed_rows)
        B = flat.shape[0]
        T = self.n_tower

        centers = self.variable(
            "adl_state", "cluster_centers",
            lambda: jax.random.normal(self.make_rng("params"), (T, self.embed_output_dim)),
        )

        # DLM routing (adl.py:63-79) on detached values
        embed_sg = jax.lax.stop_gradient(flat)
        c = jax.lax.stop_gradient(centers.value)
        sims = jnp.einsum("bd,td->bt", embed_sg, c, preferred_element_type=jnp.float32)
        coeff = jax.nn.softmax(sims, axis=1)  # [B, T]
        if train and not self.is_initializing():
            weighted_sum = jnp.einsum(
                "bt,bd->td", coeff, embed_sg, preferred_element_type=jnp.float32
            )
            tmp_centers = _l2norm(weighted_sum)
            centers.value = _l2norm(
                self.cfg.dlm_update_rate * c + (1 - self.cfg.dlm_update_rate) * tmp_centers
            )
        routing = jnp.argmax(coeff, axis=1)  # [B]
        onehot = jax.nn.one_hot(routing, T, dtype=flat.dtype)

        bn_mask = onehot if row_mask is None else onehot * row_mask[:, None]
        tower_out = StackedMLP(
            T, self.cfg.tower_dims, self.cfg.dropout,
            output_layer=False, name="domain_mlps",
        )(flat, train=train, mask=bn_mask)  # [B, T, H]

        # fused final linear: domain_w * shared_w, domain_b + shared_b (adl.py:113-115)
        in_d = self.cfg.tower_dims[-1]
        dw = self.param("domain_linear_w", tinit.linear_weight_init(in_d), (T, in_d, 1))
        db = self.param("domain_linear_b", tinit.linear_bias_init(in_d), (T, 1))
        sw = self.param("shared_linear_w", tinit.linear_weight_init(in_d), (in_d, 1))
        sb = self.param("shared_linear_b", tinit.linear_bias_init(in_d), (1,))
        logits_t = jnp.einsum(
            "bth,tho->bto", tower_out, dw * sw[None], preferred_element_type=jnp.float32
        )[..., 0] + (db + sb[None])[None, :, 0]  # [B, T]

        aux = AuxLogits(self.cfg, name="aux")(flat, emb, train=train)
        logits_t = logits_t + aux
        return jnp.sum(logits_t * onehot, axis=1)  # [B]
