"""tpurec — a TPU-native multi-domain CTR ranking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
"Causal Domain Clustering for Multi-Domain Recommendation" (CDC, WWW'25)
reference codebase: an 11-model multi-domain CTR model zoo (DeepFM, DCN,
DCNv2, AutoInt, MMoE, PLE, PEPNet/EPNet, STAR, ADL, HiNet, AdaSparse)
plus the CDC counterfactual domain-affinity clustering training procedure,
rebuilt TPU-first:

- one fused, row-shardable embedding table (``tpurec.nn.FusedEmbedding``)
- batched tower/expert banks as single einsums instead of Python loops
- dense masked routing instead of gather/scatter row routing
- jitted, donated train steps; ``jax.sharding.Mesh`` + NamedSharding SPMD
- Pallas kernels for the hot feature-interaction ops (``tpurec.ops``)

Reference behaviors are cited by ``file:line`` into ``/root/reference``
throughout the docstrings (for parity checking only; the implementation is
an independent TPU-first design, not a translation).
"""

__version__ = "0.1.0"

from tpurec import config  # noqa: F401
