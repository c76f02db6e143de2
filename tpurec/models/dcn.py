"""DCN v1 (reference: model/dcn.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpurec.models.base import CTRModel
from tpurec.nn.core import Linear, MLP
from tpurec.nn.interactions import CrossNetwork


class DCN(CTRModel):
    """CrossNetwork ∥ MLP -> concat -> linear head + first-order linear term
    (dcn.py:36-43); n_cross_layers=3 (run.py:321)."""

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, _ = self.embed(x, embed_rows)
        cn_out = CrossNetwork(self.cfg.n_cross_layers, name="cn")(flat)
        mlp_out = MLP(self.cfg.mlp_dims, self.cfg.dropout, output_layer=False, name="mlp")(
            flat, train=train, mask=row_mask
        )
        stack = jnp.concatenate([cn_out, mlp_out], axis=1)
        logit = Linear(1, name="linear")(flat) + Linear(
            1, use_bias=False, name="mlp_linear"
        )(stack)
        return logit[:, 0]
