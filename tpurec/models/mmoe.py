"""MMoE (reference: model/mmoe.py).

TPU-first: the reference's per-expert and per-tower Python loops
(mmoe.py:56-60) become expert- and tower-batched einsums; experts and
towers are weight banks with a leading expert/tower axis, one MXU pass each.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpurec.models.base import AuxLogits, CTRModel
from tpurec.nn.core import StackedLinear, StackedMLP


class MMoE(CTRModel):
    """n_expert shared expert MLPs, per-tower softmax gate, per-tower tower MLP
    + aux logit heads (mmoe.py:53-74).  Defaults: n_expert=4,
    expert_dims=(256,128,64), tower_dims=(64,32) (config.py:34-36)."""

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, emb = self.embed(x, embed_rows)
        n_expert = self.cfg.mmoe_n_expert

        # experts: [B, E, H] in one pass (replaces mmoe.py:56-58 loop)
        expert_outs = StackedMLP(
            n_expert, self.cfg.mmoe_expert_dims, self.cfg.dropout,
            output_layer=False, name="experts",
        )(flat, train=train, mask=row_mask)

        # gates: [B, T, E] (mmoe.py:59)
        gates = jax.nn.softmax(
            StackedLinear(self.n_tower, n_expert, name="gates")(flat), axis=-1
        )
        tower_inputs = jnp.einsum(
            "bte,beh->bth", gates, expert_outs, preferred_element_type=jnp.float32
        )

        tower_logits = StackedMLP(
            self.n_tower, self.cfg.mmoe_tower_dims, self.cfg.dropout,
            output_layer=True, name="towers",
        )(tower_inputs, train=train, mask=row_mask)[..., 0]  # [B, T]

        aux = AuxLogits(self.cfg, name="aux")(flat, emb, train=train)  # [B, 1]
        return tower_logits + aux
