"""AutoInt (reference: model/autoint.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpurec.models.base import CTRModel
from tpurec.nn.core import Linear, MLP
from tpurec.nn.interactions import FieldAttention


class AutoInt(CTRModel):
    """Field-axis self-attention stack ∥ MLP -> concat -> head + linear term
    (autoint.py:48-65); atten_embed_dim=64 per run.py:335."""

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, emb = self.embed(x, embed_rows)
        cross_term = FieldAttention(
            atten_embed_dim=self.cfg.atten_embed_dim,
            att_layer_num=self.cfg.att_layer_num,
            att_head_num=self.cfg.att_head_num,
            att_res=self.cfg.att_res,
            dropout=self.cfg.dropout,
            name="atten",
        )(emb, train=train)
        dnn_out = MLP(self.cfg.mlp_dims, self.cfg.dropout, output_layer=False, name="dnn")(
            flat, train=train, mask=row_mask
        )
        final = jnp.concatenate([cross_term, dnn_out], axis=1)
        logit = Linear(1, use_bias=False, name="dnn_linear")(final) + Linear(
            1, name="linear"
        )(flat)
        return logit[:, 0]
