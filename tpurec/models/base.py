"""Shared model scaffolding.

Output contract (matches the reference's, run.py:477-488):
- single-head models return logits of shape [B]
- multi-tower models return logits of shape [B, n_tower]; the training/eval
  harness selects each row's tower by its group id (run.py:484's
  ``pred.gather(1, group)``)

Models emit LOGITS; sigmoid+BCE are fused at the loss for numerical
stability (the reference applies nn.Sigmoid in the model and BCELoss
outside — the same function, computed stably here).  The only place
probabilities themselves are averaged is CDC warmup mode (cdc.py:99-102),
handled explicitly in tpurec.cdc.

Every tower-style model adds the same auxiliary logit heads to each tower
logit (SURVEY.md §2.3): the first-order linear term, an optional cross
network, and an optional AutoInt-style field-attention head
(``use_atten=True`` by default, config.py:24).  :class:`AuxLogits` packages
that cross-cutting behavior (layer.py:58-84, mmoe.py:63-70).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpurec.config import ModelConfig
from tpurec.nn.core import FusedEmbedding, Linear
from tpurec.nn.interactions import CrossNetwork, FieldAttention


class AuxLogits(nn.Module):
    """Sum of auxiliary scalar logit heads shared by the tower models.

    - linear: FeaturesLinear on the flattened embeddings (layer.py:115-126)
    - cross (``use_dcn``): CrossNetwork -> Linear(1).  NOTE the reference's
      use_dcn aux path adds the [B, embed_dim*F] cross output directly onto a
      [B, 1] logit (mmoe.py:66-67), which broadcasts incorrectly; that flag
      is also never enabled (config.py has no use_dcn).  We project to a
      scalar logit — the obviously intended behavior.
    - attention (``use_atten``, ON by default): 3-layer field MHA stack +
      Linear(1, bias=False) (layer.py:58-84).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, embed_flat, embed_3d, train: bool = False):
        out = Linear(1, name="linear")(embed_flat)
        if self.cfg.use_dcn:
            cn = CrossNetwork(self.cfg.n_cross_layers, name="cn")(embed_flat)
            out = out + Linear(1, use_bias=False, name="cn_linear")(cn)
        if self.cfg.use_atten:
            att = FieldAttention(
                atten_embed_dim=self.cfg.atten_embed_dim,
                att_layer_num=self.cfg.att_layer_num,
                att_head_num=self.cfg.att_head_num,
                att_res=self.cfg.att_res,
                dropout=self.cfg.dropout,
                name="atten",
            )(embed_3d, train=train)
            out = out + Linear(1, use_bias=False, name="atten_linear")(att)
        return out  # [B, 1]


class CTRModel(nn.Module):
    """Base for all zoo models: fused embedding + shared attrs.

    Subclasses implement ``__call__(x, group=None, train=False, row_mask=None)``.
    ``row_mask`` ([B] 0/1) marks padding rows; it feeds masked BatchNorm
    statistics so fixed-shape padded batches reproduce the reference's
    variable-size batch semantics.
    """

    field_dims: Tuple[int, ...]
    embed_dim: int
    cfg: ModelConfig
    n_tower: int = 1
    domain_idx: int = 0

    @property
    def field_num(self) -> int:
        return len(self.field_dims)

    @property
    def embed_output_dim(self) -> int:
        return self.field_num * self.embed_dim

    def embed(self, x, embed_rows=None):
        """-> ([B, F*D] flat, [B, F, D]).

        ``embed_rows`` ([B*F, D]) bypasses the table lookup with
        pre-gathered rows — the hook for the row-sparse embedding-update
        training path (tpurec.train.sparse): gradients then flow to the
        gathered rows instead of materializing a dense [V, D] gradient.
        """
        if embed_rows is not None:
            emb = embed_rows.reshape(x.shape[0], self.field_num, self.embed_dim)
        else:
            emb = FusedEmbedding(
                self.field_dims, self.embed_dim,
                init_std=self.cfg.embed_init_std, name="embedding",
            )(x)
        return emb.reshape(emb.shape[0], -1), emb
