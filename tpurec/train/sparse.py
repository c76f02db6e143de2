"""Row-sparse embedding updates (lazy Adam for the fused table).

On CTR models the embedding table dominates the parameter count (26.7M of
27.3M params at Ali-CCP scale), so a dense Adam step moves ~0.75GB of
moments/params per step and the training step is HBM-bound on optimizer
traffic, not compute.  But each batch touches at most B*F table rows —
the TPU-native fix is to differentiate w.r.t. the GATHERED ROWS and update
only the touched rows:

  1. rows = table[x + offsets]                (forward gather, [B*F, D])
  2. model.apply(..., embed_rows=rows)        (grads flow to ``rows``)
  3. sort ids + segment-sum duplicate rows' grads (static shapes)
  4. lazy Adam on the unique rows: gather m/v rows, torch-Adam math with
     the global step's bias correction, scatter rows + moments back

Semantics vs the reference (torch dense Adam + dense L2):
  - untouched rows' Adam moments do NOT decay between touches, and the
    embedding L2 (layer.py:31) applies only to touched rows — the standard
    lazy/sparse-Adam trade (cf. torch.optim.SparseAdam).  Enable with
    ``TrainConfig.embedding_update='sparse'``; the default 'dense' path
    keeps exact reference semantics.

When it pays off: TPU scatters serialize per index, so the sparse path
costs ~constant extra scatter/gather time per step (~2.5ms at B*F=11.8k
rows) while dense Adam traffic grows with the vocab (measured ~1.0ms at
1.6M x 16).  Breakeven is roughly a 5M-row table at embed_dim=16; below
that, prefer 'dense' (it is also the exact-semantics path).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpurec.config import TrainConfig
from tpurec.nn.core import EmbeddingLayout, mixed_table_lookup
from tpurec.nn.precision import compute_dtype as _precision_scope
from tpurec.train.reg import regularization_loss
from tpurec.train.step import TrainState, bce_with_logits, make_optimizer, select_tower

EMBED_PATH = ("embedding", "table")


def split_embedding(params) -> Tuple[Any, Any]:
    """-> (table, params_without_table_gradient_path)."""
    table = params["embedding"]["table"]
    rest = dict(params)
    rest.pop("embedding")
    return table, rest


def combine_duplicate_rows(ids, g_rows, vocab_size: int):
    """Sort ids, segment-sum duplicates (static shapes).

    -> (seg_ids [N] with out-of-range sentinel for padding segments,
        g_unique [N, D] where row j is segment j's summed gradient)."""
    N = ids.shape[0]
    order = jnp.argsort(ids)
    sid = jnp.take(ids, order)
    sg = jnp.take(g_rows, order, axis=0)
    head = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1  # [N]
    g_u = jax.ops.segment_sum(sg, seg, num_segments=N)
    id_u = jax.ops.segment_max(sid, seg, num_segments=N)
    n_seg = seg[-1] + 1
    valid = jnp.arange(N) < n_seg
    id_u = jnp.where(valid, id_u, vocab_size)  # sentinel -> dropped scatter
    return id_u, g_u, valid


class SparseEmbedState(flax.struct.PyTreeNode):
    m: Any
    v: Any


SORT_DEDUP_VOCAB = 4_000_000  # above this, the O(vocab) scatter loses


def make_sparse_train_step(
    model,
    tcfg: TrainConfig,
    reg_coefs,
    multi_tower: bool,
    mutable_keys,
    l2_reg_embedding: float,
    optimizer: Optional[optax.GradientTransformation] = None,
    scan_k: Optional[int] = None,
    dedup: Optional[str] = None,
):
    """Train step (or K-step scan when ``scan_k``) with row-sparse embedding
    updates.  ``reg_coefs`` is the usual full coefficient tree; the table's
    entry is stripped here (its L2 applies sparsely to the touched rows via
    ``l2_reg_embedding``).

    ``dedup`` picks how duplicate touched ids are combined:
    - ``'scatter'``: one dense table-sized scatter-add + re-gather.  Fast
      at small/mid vocabs but costs O(vocab) per step (it materializes a
      zeros_like(table)) — measured 7.0ms/step at a 13.9M-row table.
    - ``'sort'``: argsort + segment-sum over the B*F touched rows
      (:func:`combine_duplicate_rows`) — O(B*F log B*F), vocab-
      independent; the only truly row-sparse form.
    - None (default): 'sort' when the fused vocab exceeds
      ``SORT_DEDUP_VOCAB``, else 'scatter' — each measured faster in its
      regime on v5e (scripts/bench_sparse.py).

    TrainState.opt_state is (optax_state_for_rest_params, SparseEmbedState).
    """
    tx = optimizer if optimizer is not None else make_optimizer(tcfg)
    mutable_keys = tuple(mutable_keys)
    reg_coefs_rest = {k: v for k, v in reg_coefs.items() if k != "embedding"}
    layout = EmbeddingLayout(model.field_dims)
    offsets = layout.offsets
    vocab = layout.vocab
    if dedup is None:
        dedup = "sort" if vocab > SORT_DEDUP_VOCAB else "scatter"
    if dedup not in ("sort", "scatter"):
        raise ValueError(f"unknown dedup {dedup!r}")
    b1, b2, eps, lr, wd = tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps, tcfg.lr, tcfg.wd

    def loss_fn(rest_params, rows, model_state, batch, rng):
        # with embed_rows given, the FusedEmbedding submodule is never
        # constructed, so params need not contain the table at all
        with _precision_scope(tcfg.compute_dtype):
            out, new_state = model.apply(
                {"params": rest_params, **model_state},
                batch["x"],
                group=batch.get("group"),
                train=True,
                row_mask=batch.get("mask"),
                mutable=list(mutable_keys),
                rngs={"dropout": rng},
                embed_rows=rows,
            )
        logit = select_tower(out, batch["group"]) if multi_tower else out
        loss = bce_with_logits(logit, batch["y"], batch.get("mask"))
        loss = loss + regularization_loss(rest_params, reg_coefs_rest)
        return loss, new_state

    def one_step(carry, batch_rng):
        ts = carry
        batch, rng = batch_rng
        table = ts.params["embedding"]["table"]
        rest = {k: v for k, v in ts.params.items() if k != "embedding"}
        opt_rest, emb_opt = ts.opt_state

        flat_ids = (batch["x"].astype(jnp.int32) + offsets[None, :]).reshape(-1)
        rows = mixed_table_lookup(
            table, batch["x"].astype(jnp.int32), layout
        ).reshape(-1, table.shape[1])

        (loss, new_state), (g_rest, g_rows) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(rest, rows, ts.model_state, batch, rng)

        # dense-net update via optax over the REST tree only — the table is
        # excluded entirely (even zero-grad optax traffic would be dense)
        updates, new_opt_rest = tx.update(g_rest, opt_rest, rest)
        new_rest = optax.apply_updates(rest, updates)
        new_params = {**new_rest, "embedding": {"table": table}}

        # lazy Adam on the touched table rows, duplicates combined first.
        if dedup == "scatter":
            # ONE dense scatter-add + re-gather: every per-occurrence
            # update below is idempotent (.at[].set with identical
            # values), so duplicates are harmless.  O(vocab)/step — only
            # used below SORT_DEDUP_VOCAB.
            g_dense = jnp.zeros_like(table).at[flat_ids].add(g_rows)
            g_u = jnp.take(g_dense, flat_ids, axis=0)  # combined, per occurrence
            upd_ids, upd_rows = flat_ids, rows
        else:
            # vocab-independent: sort ids, segment-sum duplicate grads;
            # padding segments get the out-of-range sentinel id and their
            # scatter updates are DROPPED (jax default OOB-scatter mode)
            seg_ids, g_seg, _valid = combine_duplicate_rows(
                flat_ids, g_rows, vocab)
            safe = jnp.minimum(seg_ids, vocab - 1)
            upd_ids, g_u = seg_ids, g_seg
            upd_rows = jnp.take(table, safe, axis=0)
        # reference-style L2 (layer.py:31) + torch weight_decay, touched rows
        g_u = g_u + (2.0 * l2_reg_embedding + wd) * upd_rows
        safe_ids = (upd_ids if dedup == "scatter"
                    else jnp.minimum(upd_ids, vocab - 1))
        m_u = (b1 * jnp.take(emb_opt.m, safe_ids, axis=0).astype(jnp.float32)
               + (1 - b1) * g_u)
        v_u = (b2 * jnp.take(emb_opt.v, safe_ids, axis=0).astype(jnp.float32)
               + (1 - b2) * jnp.square(g_u))
        t = (ts.step + 1).astype(jnp.float32)
        m_hat = m_u / (1 - b1 ** t)
        v_hat = v_u / (1 - b2 ** t)
        upd = lr * m_hat / (jnp.sqrt(v_hat) + eps)

        new_table = new_params["embedding"]["table"].at[upd_ids].set(
            upd_rows - upd)
        new_m = emb_opt.m.at[upd_ids].set(m_u.astype(emb_opt.m.dtype))
        new_v = emb_opt.v.at[upd_ids].set(v_u.astype(emb_opt.v.dtype))
        new_params["embedding"]["table"] = new_table

        new_ts = ts.replace(
            params=new_params,
            opt_state=(new_opt_rest, SparseEmbedState(m=new_m, v=new_v)),
            model_state=new_state,
            step=ts.step + 1,
        )
        return new_ts, loss

    if scan_k:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def scan_steps(ts: TrainState, batches, rngs):
            return jax.lax.scan(one_step, ts, (batches, rngs))

        return scan_steps, tx

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(ts: TrainState, batch, rng):
        return one_step(ts, (batch, rng))

    return train_step, tx


def init_sparse_opt_state(params, tx, moments_dtype="float32"):
    table = params["embedding"]["table"]
    rest = {k: v for k, v in params.items() if k != "embedding"}
    dt = jnp.dtype(moments_dtype)
    # two distinct buffers — donation forbids aliased pytree leaves
    return (tx.init(rest), SparseEmbedState(
        m=jnp.zeros(table.shape, dt), v=jnp.zeros(table.shape, dt)))
