"""Feature hashing for categorical ids (the "hash trick").

The reference label-encodes every categorical column offline
(preprocess.py:180-184,469-473), which breaks on ids unseen at training
time and requires the full vocabulary up front.  Production CTR pipelines
instead hash raw ids into fixed-size buckets; this module provides that as
an opt-in transform in front of :class:`tpurec.nn.FusedEmbedding`:

- deterministic 32-bit avalanche hash (murmur3 finalizer) with a per-field
  salt, identical results from the numpy and jax paths (so offline
  preprocessing and on-device serving agree bit-for-bit);
- ``apply_hash_trick`` rewrites selected columns of an [N, F] id matrix
  into bucket ids and returns the updated ``field_dims`` — downstream
  (Trainer / Predictor / sharding) needs no changes, and unseen ids at
  serving time map into the same fixed table instead of indexing out of
  range.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence, Tuple

import numpy as np


def _fmix32_np(x: np.ndarray) -> np.ndarray:
    """murmur3 32-bit finalizer (public domain), vectorized numpy."""
    h = x.astype(np.uint32)
    h ^= h >> np.uint32(16)
    h = (h * np.uint32(0x85EBCA6B)).astype(np.uint32)
    h ^= h >> np.uint32(13)
    h = (h * np.uint32(0xC2B2AE35)).astype(np.uint32)
    h ^= h >> np.uint32(16)
    return h


def hash_ids(ids, n_buckets: int, salt: int = 0):
    """ids (any integer array) -> bucket ids in [0, n_buckets).

    Works on numpy arrays (returns int64) and jax arrays (returns int32,
    same values) — the two paths are bit-identical so hashing can run
    either offline or inside a jitted serving path.
    """
    import jax.numpy as jnp

    if isinstance(ids, np.ndarray) or np.isscalar(ids):
        h = _fmix32_np(np.asarray(ids).astype(np.uint32)
                       ^ np.uint32(salt & 0xFFFFFFFF))
        return (h % np.uint32(n_buckets)).astype(np.int64)
    h = ids.astype(jnp.uint32) ^ jnp.uint32(salt & 0xFFFFFFFF)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return (h % jnp.uint32(n_buckets)).astype(jnp.int32)


def apply_hash_trick(
    X: np.ndarray,
    field_dims: Sequence[int],
    hash_buckets: Mapping[int, int],
    salts: Optional[Mapping[int, int]] = None,
) -> Tuple[np.ndarray, Tuple[int, ...]]:
    """Hash selected columns of an [N, F] id matrix into fixed buckets.

    ``hash_buckets``: {field index -> n_buckets}.  Returns (X', field_dims')
    where hashed columns hold bucket ids and their field dim is the bucket
    count.  Typically applied to the huge-vocabulary id fields (user/item)
    so the embedding table size is a deployment choice instead of a
    function of the training vocabulary, and serving never sees an
    out-of-range id.
    """
    X = np.asarray(X)
    out = X.astype(np.int64, copy=True)
    dims = list(int(d) for d in field_dims)
    for f, nb in hash_buckets.items():
        f, nb = int(f), int(nb)
        if not 0 <= f < X.shape[1]:
            raise ValueError(f"hash field {f} out of range for {X.shape[1]} columns")
        if nb <= 0:
            raise ValueError(f"n_buckets must be positive, got {nb} for field {f}")
        salt = int(salts[f]) if salts and f in salts else f
        out[:, f] = hash_ids(X[:, f], nb, salt=salt)
        dims[f] = nb
    return out, tuple(dims)
