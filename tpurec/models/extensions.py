"""Zoo extensions beyond the reference's 12 architectures.

The reference ships these interaction ops in its layer library but never
wires them into a model (layer.py:446-582 — dead code there; ported and
tested in tpurec.nn.interactions).  These are the standard architectures
built on them, so layer-library parity becomes usable model capability:

- :class:`xDeepFM` — linear + CIN + DNN (Lian et al., KDD'18), on
  CompressedInteractionNetwork (layer.py:546-582).
- :class:`PNN` — product-based NN (Qu et al., ICDM'16): inner- or
  kernel-outer-product pair features concatenated with the embeddings into
  a DNN, on Inner/OuterProductNetwork (layer.py:446-492).
- :class:`AFM` — attentional FM (Xiao et al., IJCAI'17): linear +
  attention-pooled pairwise interactions, on
  AttentionalFactorizationMachine (layer.py:518-543).

All single-head ([B] logits), same contract as deepfm/dcn/autoint.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpurec.models.base import CTRModel
from tpurec.nn.core import Linear, MLP
from tpurec.nn.interactions import (
    AttentionalFactorizationMachine,
    CompressedInteractionNetwork,
    InnerProductNetwork,
    OuterProductNetwork,
)


class xDeepFM(CTRModel):
    """linear + CIN (explicit vector-wise crosses) + implicit DNN, summed
    scalar logits.  CIN sizes/split from ModelConfig.cin_*."""

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, emb = self.embed(x, embed_rows)
        cin = CompressedInteractionNetwork(
            self.field_num, self.cfg.cin_layer_sizes,
            split_half=self.cfg.cin_split_half, name="cin",
        )(emb)
        logit = (
            Linear(1, name="linear")(flat)
            + Linear(1, use_bias=False, name="cin_linear")(cin)
            + MLP(self.cfg.mlp_dims, self.cfg.dropout, output_layer=True,
                  name="mlp")(flat, train=train, mask=row_mask)
        )
        return logit[:, 0]


class PNN(CTRModel):
    """[embeddings ∥ pairwise products] -> DNN.  ``use_inner`` picks the
    inner-product form (ipnn); otherwise the kernel outer product
    (opnn, kernel type from ModelConfig.pnn_kernel_type)."""

    use_inner: bool = True

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, emb = self.embed(x, embed_rows)
        if self.use_inner:
            pairs = InnerProductNetwork(name="product")(emb)
        else:
            pairs = OuterProductNetwork(
                self.field_num, self.embed_dim,
                kernel_type=self.cfg.pnn_kernel_type, name="product",
            )(emb)
        h = jnp.concatenate([flat, pairs], axis=1)
        logit = MLP(self.cfg.mlp_dims, self.cfg.dropout, output_layer=True,
                    name="mlp")(h, train=train, mask=row_mask)
        return logit[:, 0]


class AFM(CTRModel):
    """linear + attention-pooled second-order interactions."""

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, emb = self.embed(x, embed_rows)
        logit = Linear(1, name="linear")(flat) + AttentionalFactorizationMachine(
            self.cfg.afm_attn_size, dropouts=self.cfg.afm_dropouts, name="afm"
        )(emb, train=train)
        return logit[:, 0]
