"""PEPNet / EPNet (+ -single variants) (reference: model/pepnet.py).

- EPNet: a GateNN over (stop_gradient(embed) ⊕ domain_embed) produces a
  2*sigmoid scale on the flattened embeddings (pepnet.py:79-80,133-134).
- PPNet: per tower-layer GateNNs produce per-tower scale vectors applied to
  each tower layer's input (pepnet.py:157-179).

Reference quirk reproduced (cfg.pepnet_share_tower_weights=True): the PPNet
tower layers are ONE module repeated n_tower times (pepnet.py:161,166
``[one_tower_layer]*n_tower``), so all towers share tower-layer weights;
only the gates and the final per-tower linears differ.  BatchNorm running
statistics are kept per-(tower,channel) here (the torch version funnels all
towers' batches through one [C] buffer — a pure eval-time artifact of the
sharing bug; documented divergence).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpurec.models.base import AuxLogits, CTRModel
from tpurec.nn.core import BatchNorm, GateNN, Linear, StackedLinear, StackedMLP


class PPNetBlock(nn.Module):
    """Per-layer gated tower stack (pepnet.py:157-179)."""

    tower_dims: tuple
    gate_hidden_dim: int
    n_tower: int
    dropout: float = 0.0
    share_tower_weights: bool = True

    @nn.compact
    def __call__(self, feature_emb, gate_emb, train: bool = False, row_mask=None):
        B, in_dim = feature_emb.shape
        T = self.n_tower
        gate_input = jnp.concatenate(
            [jax.lax.stop_gradient(feature_emb), gate_emb], axis=-1
        )  # pepnet.py:172

        x = jnp.broadcast_to(feature_emb[:, None, :], (B, T, in_dim))
        dims = (in_dim,) + tuple(self.tower_dims)
        for idx in range(len(self.tower_dims)):
            gw = GateNN(
                self.gate_hidden_dim, dims[idx] * T, dropout=0.0, name=f"gate_{idx}"
            )(gate_input, train=train)  # [B, T*dims[idx]]
            gw = gw.reshape(B, T, dims[idx])
            gated = x * gw
            if self.share_tower_weights:
                w_layer = Linear(dims[idx + 1], name=f"tower_linear_{idx}")
                h = w_layer(gated)  # shared weights broadcast over T
            else:
                h = StackedLinear(T, dims[idx + 1], name=f"tower_linear_{idx}")(gated)
            h = BatchNorm(name=f"tower_bn_{idx}")(
                h, use_running_average=not train, mask=row_mask
            )
            h = jax.nn.relu(h)
            if self.dropout > 0:
                h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
            x = h
        return x  # [B, T, tower_dims[-1]]


class PEPNet(CTRModel):
    """PEPNet/EPNet (pepnet.py:9-134).  ``use_ppnet`` selects the PPNet tower
    stack; n_tower=1 gives the -single variants (run.py:357-387).
    tower_dims=(256,128,64,32), gate_hidden_dim=64 (config.py:21,45)."""

    use_ppnet: bool = True

    @nn.compact
    def __call__(self, x, group=None, train: bool = False, row_mask=None,
                 embed_rows=None):
        flat, emb = self.embed(x, embed_rows)
        domain_embed = emb[:, self.domain_idx, :]  # [B, D]

        # EPNet: detached-embedding gate (pepnet.py:79,133-134)
        ep_in = jnp.concatenate([jax.lax.stop_gradient(flat), domain_embed], axis=-1)
        epnet_weight = GateNN(
            self.cfg.gate_hidden_dim, self.embed_output_dim,
            dropout=self.cfg.dropout, name="epnet",
        )(ep_in, train=train)
        epnet_out = flat * epnet_weight

        aux = AuxLogits(self.cfg, name="aux")(flat, emb, train=train)  # [B,1]

        if self.use_ppnet:
            ppouts = PPNetBlock(
                tower_dims=tuple(self.cfg.tower_dims),
                gate_hidden_dim=self.cfg.gate_hidden_dim,
                n_tower=self.n_tower,
                dropout=self.cfg.dropout,
                share_tower_weights=self.cfg.pepnet_share_tower_weights,
                name="ppnet",
            )(flat, epnet_out, train=train, row_mask=row_mask)
            logits = StackedLinear(self.n_tower, 1, use_bias=False, name="ppnet_linears")(
                ppouts
            )[..., 0]  # [B, T]
        else:
            tower_out = StackedMLP(
                self.n_tower, self.cfg.tower_dims, self.cfg.dropout,
                output_layer=False, name="towers",
            )(epnet_out, train=train, mask=row_mask)
            logits = StackedLinear(self.n_tower, 1, use_bias=False, name="ppnet_linears")(
                tower_out
            )[..., 0]

        logits = logits + aux
        if self.n_tower == 1:
            return logits[:, 0]
        return logits
