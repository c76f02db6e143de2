"""DCNv2 (reference: model/dcnv2.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpurec.models.base import CTRModel
from tpurec.nn.core import Linear, MLP
from tpurec.nn.interactions import CrossNetMix, CrossNetV2


class DCNv2(CTRModel):
    """CrossNetMix (default, low_rank=32, 4 experts) or CrossNetV2 with
    crossnet_only/stacked/parallel structures (dcnv2.py:35-70, default
    parallel, n_cross_layers=3 per run.py:328)."""

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, _ = self.embed(x, embed_rows)
        if self.cfg.dcnv2_use_low_rank_mixture:
            cross_out = CrossNetMix(
                num_layers=self.cfg.n_cross_layers,
                low_rank=self.cfg.dcnv2_low_rank,
                num_experts=self.cfg.dcnv2_num_experts,
                name="crossnet",
            )(flat)
        else:
            cross_out = CrossNetV2(self.cfg.n_cross_layers, name="crossnet")(flat)

        structure = self.cfg.dcnv2_structure
        if structure == "crossnet_only":
            final = cross_out
        elif structure == "stacked":
            final = MLP(self.cfg.mlp_dims, self.cfg.dropout, output_layer=False, name="dnn")(
                cross_out, train=train, mask=row_mask
            )
        elif structure == "parallel":
            dnn_out = MLP(self.cfg.mlp_dims, self.cfg.dropout, output_layer=False, name="dnn")(
                flat, train=train, mask=row_mask
            )
            final = jnp.concatenate([cross_out, dnn_out], axis=1)
        else:
            raise ValueError(f"unknown dcnv2 structure {structure!r}")

        logit = Linear(1, use_bias=False, name="dnn_linear")(final) + Linear(
            1, name="linear"
        )(flat)
        return logit[:, 0]
