"""Hybrid small/big-field embedding update — exact dense-Adam semantics at
~55% of the dense path's step cost.

The dense default differentiates through the fused table lookup, so XLA
materializes a [V, D] gradient (scatter of B*F rows into zeros) and then
runs the Adam chain — two full HBM sweeps plus a serialized row scatter
(~2.0ms at Ali-CCP scale).  This path reduces the table update to its HBM
roofline (read p/m/v + write p'/m'/v' once, nothing else):

  1. **decay sweep** — one elementwise fusion computing the zero-gradient
     Adam step u = coef*p over the whole table (coef = 2*l2 + wd; the
     reference applies dense L2 + weight decay to every row every step,
     layer.py:96-112 + run.py:720-723).  The real gradients are NOT folded
     in here: adding them forces XLA to materialize the u operand (+2 full
     HBM passes, measured +0.35ms at 1.6M x 16); instead the rows that have
     gradients get exact row-region corrections on the sweep OUTPUTS,
     in-place on the donated buffers:
  2. **small-field prefix correction** — fields with tiny vocabularies
     (all but the user/item ids on CTR schemas, run.py:54-58) have
     gradients that are dense over their vocab: one [v_f, B] x [B, D]
     matmul per field (the transpose of its one-hot lookup), no scatter.
     EmbeddingLayout places those fields in ONE contiguous prefix
     [0, small_rows), so the fix is a [S, D] recompute + a single
     dynamic-update-slice.
  3. **big-field row correction** — the few big-vocab fields contribute
     truly sparse rows (B ids each): recompute those rows from their
     pre-step values with the full gradient (duplicates segment-summed
     first) and scatter-overwrite — bitwise-equal semantics to dense
     Adam, per step.

Reported loss includes the reference's embedding L2 term
(layer.py:31,96-112) via an explicit sum(table**2) that fuses into the
same table sweep.  The moment tensors live in a SparseEmbedState beside
the optax state for the rest of the parameters (same container the
'sparse' lazy path uses, so checkpointing is shared).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpurec.config import TrainConfig
from tpurec.nn.core import EmbeddingLayout, mixed_table_lookup
from tpurec.nn.precision import compute_dtype as _precision_scope
from tpurec.train.reg import regularization_loss
from tpurec.train.sparse import SparseEmbedState, combine_duplicate_rows
from tpurec.train.step import TrainState, bce_with_logits, make_optimizer, select_tower

BIG_VOCAB_THRESHOLD = 8192


class EmbeddingUpdater:
    """Reusable exact-dense-Adam embedding update (the hybrid scheme above).

    Shared by the standard hybrid train step and the CDC engine's burst
    steps (which otherwise pay a full dense-grad scatter per treatment
    step).  ``update(table, emb_opt, x, g_rows, step)`` applies one exact
    dense-Adam step to the table given the batch's ids ``x`` [B, F] and the
    gathered-row gradients ``g_rows`` [B, F, D]; returns
    (table', SparseEmbedState', sumsq) with sumsq = sum(table**2)
    pre-update (the reference's embedding L2 loss term).
    """

    def __init__(self, field_dims, tcfg: TrainConfig, l2_reg_embedding: float,
                 big_vocab_threshold: int = BIG_VOCAB_THRESHOLD):
        # moment storage dtype (TrainConfig.embedding_moments_dtype): Adam
        # math always runs in f32; bf16 storage halves the sweep's m/v HBM
        # traffic (documented divergence from the reference's f32 state)
        self.moments_dtype = jnp.dtype(tcfg.embedding_moments_dtype)
        field_dims = tuple(int(d) for d in field_dims)
        self.field_dims = field_dims
        # the layout is the MODEL's (FusedEmbedding's default threshold):
        # small fields form the [0, small_rows) prefix.
        # ``big_vocab_threshold`` can only DEMOTE a layout-small field to
        # the two-phase correction path (its prefix grad segment is then
        # zero); a layout-big field can never be promoted — its rows aren't
        # contiguous prefix rows.  Any split is exact; the threshold is
        # purely a performance knob.
        self.layout = EmbeddingLayout(field_dims)
        self.offsets = self.layout.offsets
        self.vocab = self.layout.vocab
        self.small = [f for f in self.layout.small_fields
                      if field_dims[f] <= big_vocab_threshold]
        self.small_set = set(self.small)
        self.big = [f for f in range(len(field_dims))
                    if f not in self.small_set]
        self.tcfg = tcfg
        self.l2_reg_embedding = l2_reg_embedding
        self.coef = 2.0 * l2_reg_embedding + tcfg.wd

    def gather_rows(self, table, x):
        """x [B, F] int -> gathered table rows [B*F, D].

        Called OUTSIDE the loss gradient (grads are taken w.r.t. the
        returned rows), so the small-prefix/big split inside
        mixed_table_lookup is purely a forward-speed choice."""
        rows = mixed_table_lookup(table, x.astype(jnp.int32), self.layout)
        return rows.reshape(-1, table.shape[1])

    def update(self, table, emb_opt: SparseEmbedState, x, g_rows, step):
        tcfg = self.tcfg
        b1, b2 = tcfg.adam_b1, tcfg.adam_b2
        x = x.astype(jnp.int32)
        B, F = x.shape
        D = table.shape[1]
        g_rows = g_rows.reshape(B, F, D)
        t = jnp.asarray(step, jnp.float32)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t
        dt = self.moments_dtype

        p2, new_opt, sumsq = self._sweep_only(
            table, emb_opt.m, emb_opt.v, x, g_rows, bc1, bc2)
        m2, v2 = new_opt.m, new_opt.v

        # ---- exact correction of the big-field touched rows
        if self.big:
            id_u, pb, mb, vb = self._row_correction_vals(
                table, emb_opt, x, g_rows, bc1, bc2)
            kw = self._scatter_kw(B * len(self.big))
            p2 = p2.at[id_u].set(pb, **kw)
            m2 = m2.at[id_u].set(mb.astype(dt), **kw)
            v2 = v2.at[id_u].set(vb.astype(dt), **kw)

        return p2, SparseEmbedState(m=m2, v=v2), sumsq

    @staticmethod
    def _scatter_kw(n_big: int):
        """Scatter kwargs matching _row_correction_vals' id form: the
        small-N equality-matmul path writes idempotent duplicates (no
        hints usable); the sort path yields sorted-unique ids with
        out-of-range sentinels."""
        if n_big <= 2048:
            return {}
        return dict(mode="drop", unique_indices=True,
                    indices_are_sorted=True)

    def _small_field_grads(self, x, g_rows):
        """[S, D] dense gradient of the small-field prefix region (or None
        when the layout has no update-small fields).  x [B, F] int32,
        g_rows [B, F, D]."""
        layout, field_dims = self.layout, self.field_dims
        D = g_rows.shape[-1]
        n_keep = 0
        for i, f in enumerate(layout.small_fields):
            if f in self.small_set:
                n_keep = i + 1
        g_segs = []
        for f in layout.small_fields[:n_keep]:
            v_f = field_dims[f]
            if f in self.small_set:
                oh = (x[:, f][:, None]
                      == jnp.arange(v_f, dtype=jnp.int32)[None, :])
                g_segs.append(jax.lax.dot_general(
                    oh.astype(g_rows.dtype), g_rows[:, f, :],
                    (((0,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                ))  # [v_f, D]
            else:
                g_segs.append(jnp.zeros((v_f, D), g_rows.dtype))
        return jnp.concatenate(g_segs, axis=0) if g_segs else None

    def _sweep_only(self, table, m, v, x, g_rows, bc1, bc2):
        """Small-field grads + the roofline dense Adam sweep for ONE table
        ([V, D] operands; x [B, F] int32, g_rows [B, F, D]) — everything in
        :meth:`update` except the big-field row correction."""
        tcfg, coef = self.tcfg, self.coef
        b1, b2, eps, lr = tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps, tcfg.lr
        D = table.shape[1]

        # ---- small-vocab fields' dense grads: one [v_f, B] x [B, D] matmul
        # per field (the transpose of its one-hot lookup), concatenated into
        # the compact [small_rows, D] prefix region (EmbeddingLayout orders
        # small fields first).  Demoted fields contribute zero segments —
        # their rows go through the big-field correction below.
        g_small = self._small_field_grads(x, g_rows)
        if g_small is None:
            g_small = jnp.zeros((0, D), g_rows.dtype)

        # ---- dense sweep: exact Adam with u = coef*p + pad(g_small), ONE
        # elementwise fusion reading (p, m, v) and writing (p2, m2, v2) —
        # 6 HBM passes, the roofline for exact per-step dense-Adam
        # semantics.  The small-field grads ride in via lax.pad of the
        # contiguous [0, S) prefix (EmbeddingLayout): pad is an element
        # GENERATOR that XLA fuses into the chain, unlike concat /
        # dynamic-update-slice / scatter forms, all of which materialize an
        # extra [V, D] operand (+0.3-0.9ms at 1.6M x 16, measured).
        # sum(p**2) — the reference's embedding L2 loss term
        # (layer.py:31,96-112) — fuses into the same sweep for free.
        sumsq = jnp.sum(table * table)
        S = g_small.shape[0]
        u = coef * table
        if S:
            u = u + jax.lax.pad(
                g_small, jnp.asarray(0, g_small.dtype),
                ((0, self.vocab - S, 0), (0, 0, 0)))
        dt = self.moments_dtype
        m2f = b1 * m.astype(jnp.float32) + (1.0 - b1) * u
        v2f = b2 * v.astype(jnp.float32) + (1.0 - b2) * (u * u)
        p2 = table - lr * (m2f / bc1) / (jnp.sqrt(v2f / bc2) + eps)
        return p2, SparseEmbedState(m=m2f.astype(dt), v=v2f.astype(dt)), sumsq

    def _combine_big(self, x, g_rows):
        """(id_u, g_u) of the big-field rows for ONE lane: duplicate ids
        combined either by the small-N equality matmul (idempotent dup
        writes) or the sorted-unique dedup (sentinel ids >= vocab)."""
        D = g_rows.shape[-1]
        big = self.big
        big_ids = (x[:, big] + self.offsets[None, big]).reshape(-1)
        g_big = g_rows[:, big, :].reshape(-1, D)
        N = big_ids.shape[0]
        if N <= 2048:
            # sort-free duplicate combining: the [N, N] equality matmul
            # hands every occurrence its id's TOTAL gradient, so the
            # .set scatters below write identical values for duplicate
            # ids — idempotent, hence exact without a bitonic sort.
            # O(N^2) though: the materialized [N, N] f32 dot operand
            # beats the sort only for small N (N=1024: +46us over sort;
            # N=7168: 205MB operand, measured ~2x SLOWER per CDC burst)
            eqf = (big_ids[:, None] == big_ids[None, :]).astype(g_big.dtype)
            # non-finite guard: 0 * inf = nan would poison EVERY row of
            # the matmul, not just the overflowed id's.  Combine the
            # finite values, then mark every occurrence of an id that
            # had ANY non-finite contribution as nan — identical across
            # duplicates (keeping the .set writes idempotent) and
            # matching the dense scatter-add's "that id's row is
            # poisoned" semantics.
            g_fin = jnp.where(jnp.isfinite(g_big), g_big, 0.0)
            dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
                a, b, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            g_u = dot(eqf, g_fin)
            bad = dot(eqf, jnp.any(~jnp.isfinite(g_big), axis=-1,
                                   keepdims=True).astype(g_big.dtype))
            g_u = jnp.where(bad > 0, jnp.nan, g_u)
            id_u = big_ids
        else:
            # sentinel (out-of-range) ids from dedup padding are dropped by
            # the scatter; ids are sorted+unique by construction
            id_u, g_u, _ = combine_duplicate_rows(big_ids, g_big, self.vocab)
        return id_u, g_u

    def _row_correction_vals(self, table, emb_opt, x, g_rows, bc1, bc2):
        """Big-field row-correction values for ONE table: the combined ids
        plus their exact post-step (p, m, v) rows (scatter kwargs come from
        :meth:`_scatter_kw`)."""
        tcfg, coef = self.tcfg, self.coef
        b1, b2, eps, lr = tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps, tcfg.lr
        id_u, g_u = self._combine_big(x, g_rows)
        p_old = jnp.take(table, id_u, axis=0, mode="clip")
        m_old = jnp.take(emb_opt.m, id_u, axis=0, mode="clip").astype(jnp.float32)
        v_old = jnp.take(emb_opt.v, id_u, axis=0, mode="clip").astype(jnp.float32)
        ub = g_u + coef * p_old
        mb = b1 * m_old + (1.0 - b1) * ub
        vb = b2 * v_old + (1.0 - b2) * (ub * ub)
        pb = p_old - lr * (mb / bc1) / (jnp.sqrt(vb / bc2) + eps)
        return id_u, pb, mb, vb

    def update_stacked(self, table, emb_opt: SparseEmbedState, x, g_rows,
                       step, *, lanes: int):
        """``lanes`` independent lanes of :meth:`update` on LANE-FLAT
        operands — table/moments [N*V, D] (lane l's table is rows
        [l*V, (l+1)*V)), x [N, B, F], g_rows [N, B*F, D], step [N].
        Returns the updated flat (table', SparseEmbedState', sumsq [N]).

        Why flat and not a vmapped [N, V, D] stack: XLA picks a
        TRANSPOSED layout for large [N, V, D] scan carries ([D, N, V]
        tiling), and any reshape toward the row-indexed form then lowers
        as a 64-slice transpose loop per tensor per step (~5.7ms x3 at
        4 x 1.6M x 16) plus megabytes of async staging copies — measured
        via scripts/profile_populate_trace.py, round-5 notes.  A flat
        [N*V, D] carry keeps the serial table's {1,0} layout: the sweep is
        elementwise, lookups/corrections use lane-offset absolute row ids,
        and the big-field scatter is ONE flat sorted-per-lane scatter.
        Math per lane is identical to :meth:`update` (tested)."""
        N = lanes
        NV, D = table.shape
        V = NV // N
        B = x.shape[1]
        dt = self.moments_dtype
        t = jnp.asarray(step, jnp.float32)  # [N]
        bc1 = 1.0 - self.tcfg.adam_b1 ** t  # [N]
        bc2 = 1.0 - self.tcfg.adam_b2 ** t
        coef = self.coef
        b1, b2 = self.tcfg.adam_b1, self.tcfg.adam_b2
        eps, lr = self.tcfg.adam_eps, self.tcfg.lr

        # per-lane small-field prefix grads -> [N, S, D], injected into the
        # flat u via ONE sorted contiguous scatter-add (lane l's prefix is
        # rows [l*V, l*V+S)).  NOT the serial path's lax.pad trick: a 3-D
        # pad + reshape-to-flat pins a row-major layout on the [N*V, D]
        # chain while XLA lays the big flat tensors out D-major for the
        # gathers, and the conflict materializes per-step transpose loops
        # (~30ms/step at 4 x 1.6M x 16 — profile_populate_trace.py).
        g_small_b = jax.vmap(
            lambda x_l, g_l: self._small_field_grads(
                x_l, g_l.reshape(B, -1, D)))(x, g_rows)
        sumsq = jnp.sum(
            (table * table).reshape(N, V * D), axis=1)  # [N]
        u = coef * table
        if g_small_b is not None:
            S = g_small_b.shape[1]
            small_ids = ((jnp.arange(N, dtype=jnp.int32) * V)[:, None]
                         + jnp.arange(S, dtype=jnp.int32)[None, :])
            u = u.at[small_ids.reshape(-1)].add(
                g_small_b.reshape(N * S, D), mode="drop",
                unique_indices=True, indices_are_sorted=True)
        # per-lane bias corrections broadcast to rows: lane l owns the
        # contiguous row block [l*V, (l+1)*V)
        bc1_rows = jnp.repeat(bc1, V)[:, None]  # [NV, 1]
        bc2_rows = jnp.repeat(bc2, V)[:, None]
        m2f = b1 * emb_opt.m.astype(jnp.float32) + (1.0 - b1) * u
        v2f = b2 * emb_opt.v.astype(jnp.float32) + (1.0 - b2) * (u * u)
        p2 = table - lr * (m2f / bc1_rows) / (
            jnp.sqrt(v2f / bc2_rows) + eps)
        m2 = m2f.astype(dt)
        v2 = v2f.astype(dt)

        if self.big:
            # per-lane duplicate combining (lane-local ids, sentinel >= V)
            id_u, g_u = jax.vmap(
                lambda x_l, g_l: self._combine_big(
                    x_l, g_l.reshape(B, -1, D)))(x, g_rows)
            # flat lane-offset ids; sentinels must NOT land in the next
            # lane's block -> remapped past the whole flat table (dropped)
            lane_off = (jnp.arange(N, dtype=id_u.dtype) * V)[:, None]
            flat_ids = jnp.where(id_u < V, id_u + lane_off, NV)  # [N, NB]
            p_old = jnp.take(table, flat_ids.reshape(-1), axis=0,
                             mode="clip").reshape(*flat_ids.shape, D)
            m_old = jnp.take(emb_opt.m, flat_ids.reshape(-1), axis=0,
                             mode="clip").astype(jnp.float32).reshape(
                                 *flat_ids.shape, D)
            v_old = jnp.take(emb_opt.v, flat_ids.reshape(-1), axis=0,
                             mode="clip").astype(jnp.float32).reshape(
                                 *flat_ids.shape, D)
            ub = g_u + coef * p_old
            mb = b1 * m_old + (1.0 - b1) * ub
            vb = b2 * v_old + (1.0 - b2) * (ub * ub)
            pb = p_old - lr * (mb / bc1[:, None, None]) / (
                jnp.sqrt(vb / bc2[:, None, None]) + eps)
            # sorted-hint dropped: sentinel remapping breaks global order
            # across lane boundaries; measured free on the flat scatter
            kw = self._scatter_kw(B * len(self.big))
            fkw = dict(mode="drop",
                       unique_indices=kw.get("unique_indices", False))
            fids = flat_ids.reshape(-1)
            p2 = p2.at[fids].set(pb.reshape(-1, D), **fkw)
            m2 = m2.at[fids].set(mb.reshape(-1, D).astype(dt), **fkw)
            v2 = v2.at[fids].set(vb.reshape(-1, D).astype(dt), **fkw)
        return p2, SparseEmbedState(m=m2, v=v2), sumsq


def make_hybrid_train_step(
    model,
    tcfg: TrainConfig,
    reg_coefs,
    multi_tower: bool,
    mutable_keys,
    l2_reg_embedding: float,
    optimizer: Optional[optax.GradientTransformation] = None,
    scan_k: Optional[int] = None,
    big_vocab_threshold: int = BIG_VOCAB_THRESHOLD,
    indexed: bool = False,
):
    """Train step (or K-step scan when ``scan_k``) with the hybrid update.

    ``indexed``: return a device-resident-dataset scan
    (ts, Xdev, ydev, domain2group, idxs, masks, rngs) -> (ts, losses) that
    gathers each batch from on-device arrays by row index — the epoch path
    when the dataset fits in HBM (host batching shipped whole batches
    through the host->device tunnel and capped end-to-end throughput at
    ~90k ex/s vs the ~230k step ceiling).

    TrainState.opt_state is (optax_state_for_rest_params, SparseEmbedState),
    identical to the 'sparse' mode's layout."""
    tx = optimizer if optimizer is not None else make_optimizer(tcfg)
    mutable_keys = tuple(mutable_keys)
    reg_coefs_rest = {k: v for k, v in reg_coefs.items() if k != "embedding"}
    upd = EmbeddingUpdater(model.field_dims, tcfg, l2_reg_embedding,
                           big_vocab_threshold)

    def loss_fn(rest_params, rows, model_state, batch, rng):
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
        x = batch["x"].astype(jnp.int32)

        rows = upd.gather_rows(table, x)
        (loss, new_state), (g_rest, g_rows) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(rest, rows, ts.model_state, batch, rng)

        # dense-net update via optax over the REST tree
        updates, new_opt_rest = tx.update(g_rest, opt_rest, rest)
        new_rest = optax.apply_updates(rest, updates)

        p2, emb_opt2, sumsq = upd.update(table, emb_opt, x, g_rows, ts.step + 1)

        new_params = {**new_rest, "embedding": {"table": p2}}
        new_ts = ts.replace(
            params=new_params,
            opt_state=(new_opt_rest, emb_opt2),
            model_state=new_state,
            step=ts.step + 1,
        )
        return new_ts, loss + l2_reg_embedding * sumsq

    if indexed:
        domain_idx = model.domain_idx

        @functools.partial(jax.jit, donate_argnums=(0,))
        def scan_steps_idx(ts: TrainState, Xdev, ydev, d2g, idxs, masks, rngs):
            """Device-resident-dataset scan: the dataset lives on device and
            only [K, bs] int32 row indices cross the host->device boundary
            per dispatch (the reference also keeps its whole dataset
            device-side, run.py:239)."""

            def body(ts, xs):
                idx, mask, rng = xs
                x = jnp.take(Xdev, idx, axis=0)
                batch = {
                    "x": x,
                    "y": jnp.take(ydev, idx, axis=0),
                    "group": jnp.take(d2g, x[:, domain_idx], axis=0),
                    "mask": mask,
                }
                return one_step(ts, (batch, rng))

            return jax.lax.scan(body, ts, (idxs, masks, rngs))

        return scan_steps_idx, tx

    if scan_k:
        @functools.partial(jax.jit, donate_argnums=(0,))
        def scan_steps(ts: TrainState, batches, rngs):
            return jax.lax.scan(one_step, ts, (batches, rngs))

        return scan_steps, tx

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(ts: TrainState, batch, rng):
        return one_step(ts, (batch, rng))

    return train_step, tx
