"""Mixed-precision compute policy (TPU MXU bf16 path).

The v5e MXU runs bf16xbf16->f32 matmuls at ~4x the f32 rate; the policy
here casts ONLY the operands of dense contractions (Linear/StackedLinear,
field attention, cross networks) to the compute dtype while every
contraction still accumulates and emits float32
(``preferred_element_type=jnp.float32``).  Parameters, optimizer state,
BatchNorm statistics, softmax, and all elementwise math stay float32, so
rounding is confined to the matmul inputs — the standard conservative
mixed-precision recipe.

The policy is a trace-time ContextVar: builders (tpurec.train.*,
tpurec.cdc) wrap their ``model.apply`` calls in
``compute_dtype(cfg.train.compute_dtype)`` so the cast is baked into each
compiled program at trace time.  A ContextVar (not a module global) keeps
concurrent traces independent — CDCTrainer.warm_compile lowers programs
on background threads while the main thread traces the warmup step, and
each thread/context sees only its own scope.  It deliberately is not a
flax module attribute — threading a dtype through every one of the zoo's
~60 Linear construction sites buys nothing over one policy lookup at
trace time.

This is opt-in (TrainConfig.compute_dtype, default 'float32' = off) and a
DOCUMENTED DIVERGENCE from the reference's all-f32 torch math when on.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax.numpy as jnp

_COMPUTE_DTYPE: contextvars.ContextVar[Optional[jnp.dtype]] = \
    contextvars.ContextVar("tpurec_compute_dtype", default=None)

_ALIASES = {
    None: None,
    "": None,
    "float32": None,
    "f32": None,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
}


def _resolve(dtype):
    if isinstance(dtype, str) or dtype is None:
        if dtype not in _ALIASES:
            raise ValueError(f"unsupported compute_dtype {dtype!r}")
        return _ALIASES[dtype]
    return jnp.dtype(dtype)


def set_compute_dtype(dtype) -> None:
    """Set the matmul-operand dtype ('float32'/'bfloat16'/None) for the
    CURRENT context/thread.  Must be active while tracing; compiled
    functions keep the policy they were traced under."""
    _COMPUTE_DTYPE.set(_resolve(dtype))


def get_compute_dtype():
    return _COMPUTE_DTYPE.get()


@contextlib.contextmanager
def compute_dtype(dtype):
    tok = _COMPUTE_DTYPE.set(_resolve(dtype))
    try:
        yield
    finally:
        _COMPUTE_DTYPE.reset(tok)


def cast_operands(*xs):
    """Cast contraction operands to the policy dtype (no-op when off).

    On backends without a native mixed bf16xbf16->f32 dot (CPU), operands
    are rounded to bf16 and cast back to f32: the product of two bf16
    values is exact in f32, so with f32 accumulation this computes the
    same function the TPU MXU does.
    """
    dt = _COMPUTE_DTYPE.get()
    if dt is None:
        return xs if len(xs) > 1 else xs[0]
    import jax

    if jax.default_backend() == "cpu":
        out = tuple(x.astype(dt).astype(jnp.float32) for x in xs)
    else:
        out = tuple(x.astype(dt) for x in xs)
    return out if len(out) > 1 else out[0]
