"""HiNet (reference: model/hinet.py).

TPU-first: the n_tower specific SEI modules (each a 4-expert MoE,
hinet.py:8-21) are computed as ONE StackedMLP bank of n_tower*expert_num
experts plus a StackedLinear gate bank; scenario selection (hinet.py:75-77's
boolean-mask scatter) is a one-hot einsum.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpurec.models.base import AuxLogits, CTRModel
from tpurec.nn.core import Linear, MLP, StackedLinear, StackedMLP


class HiNet(CTRModel):
    """SEI banks + SAN gate + single tower head (hinet.py:24-93).
    sei_dims=(64,32), tower_dims from config (config.py:48, run.py:405-410).
    Returns [B] logits (single head; group selects the scenario features)."""

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, emb = self.embed(x, embed_rows)
        B = flat.shape[0]
        T = self.n_tower
        E = self.cfg.sei_expert_num
        H = self.cfg.sei_dims[-1]
        domain_embed = emb[:, self.domain_idx, :]
        if group is None:
            group = jnp.zeros((B,), jnp.int32)

        # specific SEIs: T banks x E experts in one pass
        spec_expert_outs = StackedMLP(
            T * E, self.cfg.sei_dims, self.cfg.dropout,
            output_layer=False, name="specific_experts",
        )(flat, train=train, mask=row_mask).reshape(B, T, E, H)
        spec_gates = jax.nn.softmax(
            StackedLinear(T, E, name="specific_gates")(flat), axis=-1
        )  # [B, T, E]
        specific_feas = jnp.einsum(
            "bte,bteh->bth", spec_gates, spec_expert_outs,
            preferred_element_type=jnp.float32,
        )  # [B, T, H]

        # shared SEI
        shared_expert_outs = StackedMLP(
            E, self.cfg.sei_dims, self.cfg.dropout,
            output_layer=False, name="shared_experts",
        )(flat, train=train, mask=row_mask)  # [B, E, H]
        shared_gate = jax.nn.softmax(Linear(E, name="shared_gate")(flat), axis=-1)
        shared_feas = jnp.einsum(
            "be,beh->bh", shared_gate, shared_expert_outs,
            preferred_element_type=jnp.float32,
        )

        # SAN: scenario-aware attentive mixture keyed on the domain embedding
        san_gate = jax.nn.softmax(Linear(T, name="san_gate")(domain_embed), axis=-1)
        san_feas = jnp.einsum(
            "bt,bth->bh", san_gate, specific_feas, preferred_element_type=jnp.float32
        )

        # own-scenario features: one-hot select (replaces hinet.py:75-77 scatter)
        onehot = jax.nn.one_hot(group, T, dtype=flat.dtype)
        con_feas = jnp.einsum(
            "bt,bth->bh", onehot, specific_feas, preferred_element_type=jnp.float32
        )

        feature = jnp.concatenate([shared_feas, con_feas, san_feas], axis=1)
        tower_out = MLP(
            self.cfg.tower_dims, self.cfg.dropout, output_layer=False, name="tower"
        )(feature, train=train, mask=row_mask)
        logit = Linear(1, use_bias=False, name="tower_linear")(tower_out)
        logit = logit + AuxLogits(self.cfg, name="aux")(flat, emb, train=train)
        return logit[:, 0]
