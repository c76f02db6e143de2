"""Jitted train/eval steps.

The hot loop (reference run.py:476-492) as a single donated jit:
forward -> tower select -> masked BCE + precomputed-reg L2 -> Adam update.

Optimizer matches run.py:720-723: Adam(lr, betas=(0.9,0.99), eps=1e-8,
weight_decay=wd) — torch applies weight decay to the gradient *before* the
moment update, i.e. optax.add_decayed_weights placed before scale_by_adam.
Loss matches BCELoss on sigmoid outputs, computed stably from logits.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from tpurec.config import TrainConfig
from tpurec.nn.precision import compute_dtype as _precision_scope
from tpurec.train.reg import regularization_loss


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_state: Any
    model_state: Any          # batch_stats / adl_state collections
    step: jnp.ndarray

    def replace_params(self, params):
        return self.replace(params=params)


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(tcfg.wd),
        optax.scale_by_adam(b1=tcfg.adam_b1, b2=tcfg.adam_b2, eps=tcfg.adam_eps),
        optax.scale(-tcfg.lr),
    )


def bce_with_logits(logits, targets, weights=None):
    """mean BCE; == BCELoss(sigmoid(logits)) (run.py:723) but stable."""
    losses = optax.sigmoid_binary_cross_entropy(logits, targets)
    if weights is None:
        return jnp.mean(losses)
    w = weights.astype(losses.dtype)
    return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)


def bce_on_probs(probs, targets, weights=None, eps: float = 1e-7):
    """BCE on probabilities (needed by CDC warmup's tower-prob mean,
    cdc.py:99-102 + run.py:617)."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    losses = -(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))
    if weights is None:
        return jnp.mean(losses)
    w = weights.astype(losses.dtype)
    return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)


def select_tower(logits, group):
    """[B, T] logits + [B] group -> [B] (run.py:484 pred.gather(1, group))."""
    if logits.ndim == 1:
        return logits
    return jnp.take_along_axis(logits, group[:, None].astype(jnp.int32), axis=1)[:, 0]


def make_train_step(
    model,
    tcfg: TrainConfig,
    reg_coefs,
    multi_tower: bool,
    mutable_keys,
    optimizer: Optional[optax.GradientTransformation] = None,
):
    """Build the jitted train step for a zoo model.

    batch: dict(x=[B,F] int32, y=[B] f32, group=[B] int32, mask=[B] f32).
    Masked rows (padding) are excluded from the loss and from BN statistics.
    """
    tx = optimizer if optimizer is not None else make_optimizer(tcfg)
    mutable_keys = tuple(mutable_keys)

    def loss_fn(params, model_state, batch, rng):
        with _precision_scope(tcfg.compute_dtype):
            out, new_state = model.apply(
                {"params": params, **model_state},
                batch["x"],
                group=batch.get("group"),
                train=True,
                row_mask=batch.get("mask"),
                mutable=list(mutable_keys),
                rngs={"dropout": rng},
            )
        logit = select_tower(out, batch["group"]) if multi_tower else out
        loss = bce_with_logits(logit, batch["y"], batch.get("mask"))
        loss = loss + regularization_loss(params, reg_coefs)
        return loss, new_state

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(ts: TrainState, batch, rng):
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, ts.model_state, batch, rng
        )
        updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        return (
            ts.replace(
                params=new_params,
                opt_state=new_opt,
                model_state=new_state,
                step=ts.step + 1,
            ),
            loss,
        )

    return train_step, tx


def make_scan_train_steps(
    model,
    tcfg: TrainConfig,
    reg_coefs,
    multi_tower: bool,
    mutable_keys,
    optimizer: Optional[optax.GradientTransformation] = None,
):
    """K train steps per dispatch via lax.scan over stacked batches.

    Per-step dispatch latency dominates sub-millisecond CTR steps (measured
    ~0.4ms fixed overhead per dispatch on TPU v5e through the runtime); a
    scanned mega-step amortizes it.  batches: dict of [K, bs, ...] arrays,
    rngs: [K] PRNG keys.  Returns (new_state, losses[K]).
    """
    tx = optimizer if optimizer is not None else make_optimizer(tcfg)
    mutable_keys = tuple(mutable_keys)

    def loss_fn(params, model_state, batch, rng):
        with _precision_scope(tcfg.compute_dtype):
            out, new_state = model.apply(
                {"params": params, **model_state},
                batch["x"],
                group=batch.get("group"),
                train=True,
                row_mask=batch.get("mask"),
                mutable=list(mutable_keys),
                rngs={"dropout": rng},
            )
        logit = select_tower(out, batch["group"]) if multi_tower else out
        loss = bce_with_logits(logit, batch["y"], batch.get("mask"))
        return loss + regularization_loss(params, reg_coefs), new_state

    def one_step(ts, xs):
        batch, rng = xs
        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, ts.model_state, batch, rng
        )
        updates, new_opt = tx.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        return (
            ts.replace(params=new_params, opt_state=new_opt,
                       model_state=new_state, step=ts.step + 1),
            loss,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scan_steps(ts: TrainState, batches, rngs):
        return jax.lax.scan(one_step, ts, (batches, rngs))

    return scan_steps, tx


def make_indexed_eval_scan(model, multi_tower: bool, domain_idx: int,
                           compute_dtype: str = "float32"):
    """Device-resident-dataset eval: predict [K, bs] batches gathered by
    row index in ONE dispatch (per-batch host fetches cost ~25ms tunnel
    latency each on the remote-TPU runtime)."""

    @jax.jit
    def eval_scan(params, model_state, Xdev, d2g, idxs):
        def body(c, idx):
            x = jnp.take(Xdev, idx, axis=0)
            group = jnp.take(d2g, x[:, domain_idx], axis=0)
            with _precision_scope(compute_dtype):
                out = model.apply(
                    {"params": params, **model_state}, x, group=group,
                    train=False,
                )
            logit = select_tower(out, group) if multi_tower else out
            return c, jax.nn.sigmoid(logit)

        _, ps = jax.lax.scan(body, 0, idxs)
        return ps  # [K, bs]

    return eval_scan


def hist_init(n_domain: int, n_bins: int):
    """Zeroed streaming-eval accumulators: per-(domain, bin) pos/neg score
    histograms (flattened) + per-domain log-loss sums and row counts."""
    return (
        jnp.zeros((n_domain * n_bins,), jnp.float32),
        jnp.zeros((n_domain * n_bins,), jnp.float32),
        jnp.zeros((n_domain,), jnp.float32),
        jnp.zeros((n_domain,), jnp.float32),
    )


def hist_update(carry, dom, logit, y, mask, n_bins: int):
    """One masked batch into the streaming-eval accumulators.

    - AUC histograms: predictions binned at floor(clip(p, 0, 1-1e-7)*n_bins).
    - LogLoss in LOGIT space: y*softplus(-l) + (1-y)*softplus(l) — finite for
      every finite logit (a p-space clip at 1-1e-15 is a no-op in f32, and
      log(1-p) then yields inf / 0*inf=NaN on saturated predictions); capped
      at -log(1e-15) to keep metrics.log_loss_score's per-sample bound.

    f32 accumulators are exact while they hold < 2^24; callers bound that by
    flushing to host-side f64 totals periodically (HostHistAccumulator).
    """
    pos, neg, lsum, lcnt = carry
    p = jax.nn.sigmoid(logit)
    flat = dom * n_bins + (
        jnp.clip(p, 0.0, 1.0 - 1e-7) * n_bins).astype(jnp.int32)
    pos = pos.at[flat].add(mask * y)
    neg = neg.at[flat].add(mask * (1.0 - y))
    ll = y * jax.nn.softplus(-logit) + (1.0 - y) * jax.nn.softplus(logit)
    ll = jnp.minimum(ll, -math.log(1e-15))
    lsum = lsum.at[dom].add(mask * ll)
    lcnt = lcnt.at[dom].add(mask)
    return (pos, neg, lsum, lcnt)


class HostHistAccumulator:
    """Exact streaming-eval totals: f32 accumulators on device, f64 on host.

    The device carry is donated through every eval dispatch; after
    ``flush_every`` dispatches (default: 128 dispatches x <=128 batches x bs
    rows — well under the 2^24 f32-exactness bound even if every row of a
    flush lands in ONE (domain, bin) cell) the carry is fetched, added into
    float64 host totals, and reset, so counts never saturate regardless of
    eval-split size."""

    def __init__(self, init_fn, flush_every: int = 128, placement=None):
        self._init = init_fn
        self._flush_every = flush_every
        self._placement = placement
        self._since_flush = 0
        self._totals = None
        self.carry = self._fresh()

    def _fresh(self):
        c = self._init()
        if self._placement is not None:
            c = jax.device_put(c, self._placement)
        return c

    def update(self, carry):
        self.carry = carry
        self._since_flush += 1
        if self._since_flush >= self._flush_every:
            self._flush()

    def _flush(self):
        import numpy as np

        parts = tuple(np.asarray(c, dtype=np.float64) for c in self.carry)
        if self._totals is None:
            self._totals = list(parts)
        else:
            for t, p in zip(self._totals, parts):
                t += p
        self.carry = self._fresh()
        self._since_flush = 0

    def totals(self):
        self._flush()
        return tuple(self._totals)


def make_streaming_eval_scan(model, multi_tower: bool, domain_idx: int,
                             n_domain: int, n_bins: int = 8192,
                             compute_dtype: str = "float32"):
    """Device-resident eval that never hauls predictions to host
    (SURVEY.md §7 hard part 5).

    Accumulates the :func:`hist_update` statistics ON DEVICE across [K, bs]
    index batches; the host only ever fetches [n_domain, n_bins] x 2 +
    [n_domain] x 2 per accumulator flush (streaming_auc_from_bins turns the
    histograms into AUC with O(1/n_bins) error — the reference hauls every
    prediction to host and runs sklearn, run.py:659-688).  Carries are
    donated so chunked eval accumulates in place across dispatches.
    """

    @functools.partial(jax.jit, donate_argnums=(6, 7, 8, 9))
    def eval_scan_hist(params, model_state, Xdev, ydev, d2g, idx_mask,
                       pos, neg, lsum, lcnt):
        idxs, masks = idx_mask

        def body(carry, xm):
            idx, mask = xm
            x = jnp.take(Xdev, idx, axis=0)
            y = jnp.take(ydev, idx, axis=0).astype(jnp.float32)
            dom = x[:, domain_idx].astype(jnp.int32)
            group = jnp.take(d2g, dom, axis=0)
            with _precision_scope(compute_dtype):
                out = model.apply(
                    {"params": params, **model_state}, x, group=group,
                    train=False,
                )
            logit = select_tower(out, group) if multi_tower else out
            return hist_update(carry, dom, logit, y, mask, n_bins), None

        carry, _ = jax.lax.scan(body, (pos, neg, lsum, lcnt), (idxs, masks))
        return carry

    return eval_scan_hist, functools.partial(hist_init, n_domain, n_bins)


def make_streaming_eval_batch_scan(model, multi_tower: bool, domain_idx: int,
                                   n_domain: int, n_bins: int = 8192,
                                   compute_dtype: str = "float32"):
    """Batch-mode variant of :func:`make_streaming_eval_scan` for inputs that
    arrive as stacked global batches rather than device-resident row indices
    — the multi-host eval path (each process contributes its dataset shard
    via GlobalBatchFeed; the histogram accumulators are replicated, so the
    scatter-adds all-reduce across the mesh and every process ends with the
    full histograms)."""

    @functools.partial(jax.jit, donate_argnums=(2, 3, 4, 5))
    def hist_scan(params, model_state, pos, neg, lsum, lcnt, batches):
        def body(carry, b):
            x = b["x"].astype(jnp.int32)
            y = b["y"].astype(jnp.float32)
            dom = x[:, domain_idx].astype(jnp.int32)
            with _precision_scope(compute_dtype):
                out = model.apply(
                    {"params": params, **model_state}, x,
                    group=b.get("group"), train=False,
                )
            logit = select_tower(out, b["group"]) if multi_tower else out
            return hist_update(carry, dom, logit, y, b["mask"], n_bins), None

        carry, _ = jax.lax.scan(body, (pos, neg, lsum, lcnt), batches)
        return carry

    return hist_scan, functools.partial(hist_init, n_domain, n_bins)


def make_eval_step(model, multi_tower: bool, compute_dtype: str = "float32"):
    """Jitted eval: probabilities per row (group tower selected)."""

    @jax.jit
    def eval_step(params, model_state, batch):
        with _precision_scope(compute_dtype):
            out = model.apply(
                {"params": params, **model_state},
                batch["x"],
                group=batch.get("group"),
                train=False,
            )
        logit = select_tower(out, batch["group"]) if multi_tower else out
        return jax.nn.sigmoid(logit)

    return eval_step
