"""PLE / CGC (reference: model/ple.py).

TPU-first: every CGC level's task-specific expert bank
(n_task*n_expert_specific MLPs, ple.py:85-89) and shared expert bank run as
two StackedMLP einsum passes; gate mixing is a single [B,T,E]x[B,E,H]
einsum (replaces ple.py:97-125 loops).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpurec.models.base import AuxLogits, CTRModel
from tpurec.nn.core import Linear, StackedLinear, StackedMLP


class CGC(nn.Module):
    """One Customized-Gate-Control level (ple.py:73-125).

    Input: task_inputs [B, T, in] + shared_input [B, in].
    Output: task_outputs [B, T, H] (+ shared_output [B, H] unless last level).
    Experts use bn=False (ple.py:88).
    """

    cur_level: int
    n_level: int
    n_task: int
    n_expert_specific: int
    n_expert_shared: int
    expert_dims: Tuple[int, ...]
    dropout: float = 0.2

    @nn.compact
    def __call__(self, task_inputs, shared_input, train: bool = False, row_mask=None):
        T, S, P = self.n_task, self.n_expert_specific, self.n_expert_shared
        B = shared_input.shape[0]

        # specific experts: expert (t, s) consumes task t's input
        spec_in = jnp.repeat(task_inputs, S, axis=1)  # [B, T*S, in]
        spec_outs = StackedMLP(
            T * S, self.expert_dims, self.dropout,
            output_layer=False, use_bn=False, name="experts_specific",
        )(spec_in, train=train, mask=row_mask)  # [B, T*S, H]
        shared_outs = StackedMLP(
            P, self.expert_dims, self.dropout,
            output_layer=False, use_bn=False, name="experts_shared",
        )(shared_input, train=train, mask=row_mask)  # [B, P, H]

        # specific gates: task t gates over (its S specific + P shared) experts
        gates = jax.nn.softmax(
            StackedLinear(T, S + P, name="gates_specific")(task_inputs), axis=-1
        )  # [B, T, S+P]
        spec_grouped = spec_outs.reshape(B, T, S, -1)
        shared_b = jnp.broadcast_to(
            shared_outs[:, None], (B, T, P, shared_outs.shape[-1])
        )
        experts_t = jnp.concatenate([spec_grouped, shared_b], axis=2)  # [B,T,S+P,H]
        task_out = jnp.einsum(
            "bte,bteh->bth", gates, experts_t, preferred_element_type=jnp.float32
        )

        if self.cur_level < self.n_level:
            all_experts = jnp.concatenate([spec_outs, shared_outs], axis=1)  # [B, T*S+P, H]
            gate_shared = jax.nn.softmax(
                Linear(T * S + P, name="gate_shared")(shared_input), axis=-1
            )
            shared_out = jnp.einsum(
                "be,beh->bh", gate_shared, all_experts, preferred_element_type=jnp.float32
            )
            return task_out, shared_out
        return task_out, None


class PLE(CTRModel):
    """Progressive Layered Extraction (ple.py:9-70).  Defaults:
    n_expert_specific=2, n_expert_shared=2, expert_dims=((256,128),(64,)),
    tower_dims=(64,32) (config.py:39-42)."""

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, emb = self.embed(x, embed_rows)
        expert_dims = self.cfg.ple_expert_dims
        n_level = len(expert_dims)

        task_inputs = jnp.broadcast_to(
            flat[:, None, :], (flat.shape[0], self.n_tower, flat.shape[-1])
        )
        shared_input = flat
        for i in range(n_level):
            task_inputs, shared_input = CGC(
                cur_level=i + 1,
                n_level=n_level,
                n_task=self.n_tower,
                n_expert_specific=self.cfg.ple_n_expert_specific,
                n_expert_shared=self.cfg.ple_n_expert_shared,
                expert_dims=tuple(expert_dims[i]),
                dropout=self.cfg.dropout,
                name=f"cgc_{i}",
            )(task_inputs, shared_input, train=train, row_mask=row_mask)

        tower_logits = StackedMLP(
            self.n_tower, self.cfg.ple_tower_dims, self.cfg.dropout,
            output_layer=True, name="towers",
        )(task_inputs, train=train, mask=row_mask)[..., 0]

        aux = AuxLogits(self.cfg, name="aux")(flat, emb, train=train)
        return tower_logits + aux
