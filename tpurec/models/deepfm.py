"""DeepFM (reference: model/dfm.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpurec.models.base import CTRModel
from tpurec.nn.core import Linear, MLP
from tpurec.nn.interactions import FactorizationMachine


class DeepFM(CTRModel):
    """linear + 2nd-order FM + MLP head, summed logits (dfm.py:30-35).

    mlp_dims=(256,128) per the factory call at run.py:314.
    """

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, emb = self.embed(x, embed_rows)
        logit = (
            Linear(1, name="linear")(flat)
            + FactorizationMachine(name="fm")(emb)
            + MLP(self.cfg.mlp_dims, self.cfg.dropout, output_layer=True, name="mlp")(
                flat, train=train, mask=row_mask
            )
        )
        return logit[:, 0]
