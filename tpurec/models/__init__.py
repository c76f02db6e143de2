"""Model zoo registry.

Mirrors the reference factory (run.py:311-438): 13 model names over 12
architectures.  ``n_tower`` derivation follows run.py:43: n_cluster for
cdc/adl, max(domain2group)+1 otherwise.
"""

from __future__ import annotations

from typing import Optional, Tuple

from tpurec.config import Config, ModelConfig
from tpurec.models.adasparse import AdaSparse
from tpurec.models.adl import ADL
from tpurec.models.autoint import AutoInt
from tpurec.models.base import AuxLogits, CTRModel
from tpurec.models.dcn import DCN
from tpurec.models.dcnv2 import DCNv2
from tpurec.models.deepfm import DeepFM
from tpurec.models.extensions import AFM, PNN, xDeepFM
from tpurec.models.hinet import HiNet
from tpurec.models.mmoe import MMoE
from tpurec.models.pepnet import PEPNet
from tpurec.models.ple import PLE
from tpurec.models.star import STAR

# model name -> (class, is_multi_tower_output, needs_group_input)
MODEL_REGISTRY = {
    "deepfm": DeepFM,
    "dcn": DCN,
    "dcnv2": DCNv2,
    "autoint": AutoInt,
    "mmoe": MMoE,
    "ple": PLE,
    "pepnet": PEPNet,
    "epnet": PEPNet,
    "pepnet-single": PEPNet,
    "epnet-single": PEPNet,
    "star": STAR,
    "adl": ADL,
    "adl-split": ADL,
    "hinet": HiNet,
    "adasparse": AdaSparse,
    # zoo extensions beyond the reference (models/extensions.py): built on
    # the interaction ops the reference ships but never uses
    "xdeepfm": xDeepFM,
    "ipnn": PNN,
    "opnn": PNN,
    "afm": AFM,
}

# models whose output is [B, n_tower] and whose loss selects the group tower
# (run.py:481-484); hinet/adl select internally and return [B]
MULTI_TOWER_OUTPUT = {"mmoe", "ple", "pepnet", "epnet", "star"}
# models that consume the per-row group id (run.py:64-65 + STAR PN masking)
NEEDS_GROUP = {"star", "adl", "adl-split", "hinet"}
# CDC-supported base models (cdc.py:32-54)
CDC_BASE_MODELS = {"mmoe", "ple", "pepnet", "epnet", "star"}


def build_model(
    name: str,
    field_dims: Tuple[int, ...],
    n_tower: int,
    domain_idx: int,
    cfg: ModelConfig,
) -> CTRModel:
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model: {name}")
    kls = MODEL_REGISTRY[name]
    kw = dict(
        field_dims=tuple(int(d) for d in field_dims),
        embed_dim=cfg.embed_dim,
        cfg=cfg,
        n_tower=n_tower,
        domain_idx=domain_idx,
    )
    if name in ("pepnet", "pepnet-single"):
        kw["use_ppnet"] = True
    elif name in ("epnet", "epnet-single"):
        kw["use_ppnet"] = False
    elif name == "opnn":
        kw["use_inner"] = False
    if name.endswith("-single"):
        kw["n_tower"] = 1
    return kls(**kw)
