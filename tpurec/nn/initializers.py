"""Initializers matching torch defaults.

The reference relies on PyTorch default inits (no explicit init except
AdaSparse's normal(std=1e-4), adasparse.py:39-41, and CrossNetMix's
xavier_normal, layer.py:359-366).  Matching them keeps optimization
dynamics comparable for AUC-parity runs:

- ``nn.Linear``: weight, bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))
  (kaiming_uniform(a=sqrt(5)) reduces to exactly this bound)
- ``nn.Embedding``: N(0, 1)  (layer.py:140; the xavier init at
  layer.py:145 is commented out in the reference)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def linear_weight_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear weight default."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def linear_bias_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear bias default."""
    return linear_weight_init(fan_in)


def embedding_init(key, shape, dtype=jnp.float32):
    """N(0,1) — torch nn.Embedding default."""
    return jax.random.normal(key, shape, dtype)


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def xavier_normal_init(fan_in_axis: int = -2, fan_out_axis: int = -1):
    """Xavier/Glorot normal over the last two axes (leading axes are batch/expert
    axes, matching torch's ``nn.init.xavier_normal_`` on [E, in, out] tensors
    which uses fan_in=in, fan_out=out per expert slice, layer.py:359-366)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[fan_in_axis]
        fan_out = shape[fan_out_axis]
        std = math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


def zeros_init(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones_init(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
