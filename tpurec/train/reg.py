"""Per-model L2 regularization spec.

The reference adds an explicit ``sum(l2*w^2)`` term to the loss every step
over a per-model registry of weight tensors (layer.py:86-112 machinery;
registration sites cited per model below).  Instead of a Python loop over
parameters per step (layer.py:96-112), we precompute a coefficient pytree
congruent with params once; the jitted loss computes
``sum(coef * sum(w**2))`` — fused by XLA, zero per-step host work.

Registered sets per model (all with 'weight' in name and 'bn' not in name):

- all models: embedding table (layer.py:31) + first-order linear weight
  (layer.py:32-33)
- deepfm: mlp (dfm.py:25-26)
- dcn: mlp, cn (dcn.py:32-35)
- dcnv2: dnn, dnn_linear.weight, crossnet U/V/C (dcnv2.py:53-58)
- autoint: dnn only (autoint.py:47-48)
- mmoe: experts, towers (mmoe.py:44-47); gates NOT registered
- ple: cgc layers (incl. gate weights), towers (ple.py:43-46)
- pepnet: epnet, ppnet (pepnet.py:64-71); epnet variant: epnet, towers
- star: domain_dnns, shared_dnn stack weights (star.py:58-61); the final
  domain/shared linears and PN are NOT registered
- adl: domain_mlps, shared_mlps (adl.py:58-62); shared_mlps is dead in the
  reference forward (adl.py:95-96) so only domain_mlps matters here
- hinet: specific/shared SEIs, san_gate, tower (hinet.py:52-62)
- adasparse: dnn linears + pruners (adasparse.py:92-93)
- attention aux heads: never registered in the reference
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

# weight-like leaf names (torch registers tensors whose *name* contains
# 'weight'; our equivalents below)
_WEIGHT_NAME = re.compile(
    r"^(weight|w_\d+|[uvc]_\d+|in_proj_weight|out_proj_weight"
    r"|domain_w_\d+|shared_w_\d+|linear_w_\d+|kernel|conv_w_\d+)$"
)
# paths that are never regularized (BN params)
_EXCLUDE = re.compile(r"(^|/)(bn_\d+|tower_bn_\d+|pn)(/|$)")

# model -> list of path-prefix regexes whose weight leaves get l2_reg_dnn
MODEL_REG_PREFIXES: Dict[str, List[str]] = {
    "deepfm": [r"^mlp/"],
    "dcn": [r"^mlp/", r"^cn/"],
    "dcnv2": [r"^dnn/", r"^dnn_linear/", r"^crossnet/"],
    "autoint": [r"^dnn/"],
    "mmoe": [r"^experts/", r"^towers/"],
    "ple": [r"^cgc_\d+/", r"^towers/"],
    "pepnet": [r"^epnet/", r"^ppnet/"],
    "pepnet-single": [r"^epnet/", r"^ppnet/"],
    "epnet": [r"^epnet/", r"^towers/"],
    "epnet-single": [r"^epnet/", r"^towers/"],
    "star": [r"^domain_w_\d+$", r"^shared_w_\d+$"],
    "adl": [r"^domain_mlps/"],
    "adl-split": [r"^domain_mlps/"],
    "hinet": [
        r"^specific_experts/", r"^specific_gates/", r"^shared_experts/",
        r"^shared_gate/", r"^san_gate/", r"^tower/",
    ],
    "adasparse": [r"^linear_w_\d+$", r"^pruner_\d+/"],
    # zoo extensions (models/extensions.py)
    "xdeepfm": [r"^mlp/", r"^cin/"],
    "ipnn": [r"^mlp/", r"^product/"],
    "opnn": [r"^mlp/", r"^product/"],
    "afm": [r"^afm/"],
}


def reg_coef_tree(params, model_name: str, l2_emb: float, l2_lin: float, l2_dnn: float):
    """Coefficient pytree congruent with ``params``; 0 where unregularized."""
    prefixes = [re.compile(p) for p in MODEL_REG_PREFIXES.get(model_name, [])]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def coef_for(path: Tuple) -> float:
        keys = [getattr(k, "key", str(k)) for k in path]
        full = "/".join(keys)
        leaf = keys[-1]
        if full == "embedding/table":
            return l2_emb
        if full in ("linear/weight", "aux/linear/weight"):
            return l2_lin
        if _EXCLUDE.search("/".join(keys[:-1])):
            return 0.0
        if not _WEIGHT_NAME.match(leaf):
            return 0.0
        # STAR raw weights live at the top level; for module-style params the
        # prefix check runs on the full path
        for pref in prefixes:
            if pref.search(full):
                return l2_dnn
        return 0.0

    treedef = jax.tree_util.tree_structure(params)
    coefs = [coef_for(path) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, coefs)


def regularization_loss(params, coef_tree, l1_coef_tree=None):
    """sum(l2 * w^2) [+ sum(l1*|w|)] — layer.py:96-112 computed as one fused
    reduction inside jit."""
    sq = jax.tree_util.tree_map(
        lambda w, c: (c * jnp.sum(jnp.square(w))) if c else 0.0, params, coef_tree
    )
    total = jax.tree_util.tree_reduce(lambda a, b: a + b, sq, 0.0)
    if l1_coef_tree is not None:
        ab = jax.tree_util.tree_map(
            lambda w, c: (c * jnp.sum(jnp.abs(w))) if c else 0.0, params, l1_coef_tree
        )
        total = total + jax.tree_util.tree_reduce(lambda a, b: a + b, ab, 0.0)
    return total
