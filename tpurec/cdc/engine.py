"""CDC training engine: counterfactual matrix population + clustered training.

The device-heavy half of CDC (reference run.py:528-645), re-designed for
TPU:

- **Snapshot/rollback**: the reference deep-copies the base model's
  state_dict and restores it after each treatment burst (cdc.py:343-354);
  here the snapshot is a device-side copy of (params, model_state).  The
  optimizer's Adam moments are intentionally NOT rolled back, preserving the
  reference's asymmetry (save_model_state filters to base_model_instance
  only — SURVEY.md §7 hard part 1).
- **Fixed shapes**: single-domain steps run on [bs] batches; multi-domain
  treatment steps on [chunk*bs] super-batches padded+masked
  (run.py:519-526 concatenates up to 7 domain batches per step); the
  eval-on-all-domains pass stacks one batch per domain into ONE
  [n_domain*bs] jitted call (the reference loops n_domain separate
  evaluations, run.py:550-558).
- **Warmup mode**: loss on the MEAN OF TOWER PROBABILITIES
  (cdc.py:99-102 — sigmoid before averaging), split mode: per-row tower
  selected by domain2group[domain] (cdc.py:103-111), with domain2group as a
  device argument so regrouping never recompiles.
"""

from __future__ import annotations

import functools
import os
import time
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

import flax.serialization

from tpurec.config import Config
from tpurec.cdc.algorithm import CDCClusterState, update_group
from tpurec.data.loader import DomainBatcher
from tpurec.metrics import (auc_score, evaluate_multi_domain,
                            log_loss_score, streaming_eval_result)
from tpurec.models import CDC_BASE_MODELS, MULTI_TOWER_OUTPUT, build_model
from tpurec.nn.precision import compute_dtype as _precision_scope
from tpurec.train.hybrid import EmbeddingUpdater
from tpurec.train.loop import EarlyStopper, use_streaming_eval
from tpurec.train.reg import reg_coef_tree, regularization_loss
from tpurec.train.sparse import init_sparse_opt_state
from tpurec.train.step import TrainState, bce_on_probs, bce_with_logits, make_optimizer


class _DaemonBuild:
    """Future-lite running ``fn(*args)`` on a DAEMON thread.

    warm_compile's builds take minutes on the remote TPU compiler;
    ThreadPoolExecutor threads are non-daemon and joined at interpreter
    exit, so an orphaned build (early stop, exception, fresh setup_data)
    would block process exit until the useless compile finished."""

    def __init__(self, fn, *args):
        import threading

        self._done = threading.Event()
        self._res = self._exc = None

        def run():
            try:
                self._res = fn(*args)
            except BaseException as e:  # surfaced via result()
                self._exc = e
            finally:
                self._done.set()

        threading.Thread(target=run, daemon=True).start()

    def result(self):
        self._done.wait()
        if self._exc is not None:
            raise self._exc
        return self._res


class CDCTrainer:
    """CDC harness (reference Run.train_cdc/update_matrix_cdc + CDC module)."""

    def __init__(self, cfg: Config, field_dims, n_domain: int, domain_idx: int,
                 mesh=None, shardings=None):
        """``mesh``/``shardings`` (tpurec.parallel): run CDC data-parallel
        over the mesh's ``data`` axis with the embedding table row-sharded
        over ``model`` — every burst/eval batch is sharded by rows and
        GSPMD inserts the gradient psum, identical math to single-chip."""
        assert cfg.cdc.base_model in CDC_BASE_MODELS, cfg.cdc.base_model
        self.cfg = cfg
        self.n_domain = n_domain
        self.domain_idx = domain_idx
        self.mesh = mesh
        self.shardings = shardings
        self.n_cluster = cfg.cdc.n_cluster

        # base model with n_tower = n_cluster (run.py:43).  CDC passes
        # expert_dims=mlp_dims and tower_dims=cdc_tower_dims into the base
        # (run.py:424-425); for PLE the reference would feed flat mlp_dims
        # into PLE's nested expert_dims and crash (cdc.py:38 + ple.py:36) —
        # we keep PLE's own nested expert dims (documented divergence).
        import dataclasses

        base_cfg = dataclasses.replace(
            cfg.model,
            mmoe_expert_dims=cfg.model.mlp_dims,
            mmoe_tower_dims=cfg.cdc.cdc_tower_dims,
            ple_tower_dims=cfg.cdc.cdc_tower_dims,
            tower_dims=cfg.cdc.cdc_tower_dims,
        )
        self.model = build_model(
            cfg.cdc.base_model, field_dims, self.n_cluster, domain_idx, base_cfg
        )

        rng = jax.random.PRNGKey(cfg.train.seed)
        dummy = jnp.zeros((2, len(field_dims)), jnp.int32)
        variables = jax.jit(self.model.init)(rng, dummy)
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        self.mutable_keys = tuple(model_state.keys())
        self.reg_coefs = reg_coef_tree(
            params, cfg.cdc.base_model,
            cfg.model.l2_reg_embedding, cfg.model.l2_reg_linear, cfg.model.l2_reg_dnn,
        )
        self.tx = make_optimizer(cfg.train)
        # burst steps ALWAYS use the hybrid embedding update: it is
        # bit-equivalent to the reference's dense Adam (so 'dense' would
        # change nothing) and the lazy 'sparse' variant would alter the
        # counterfactual matrices CDC clusters on — refuse rather than
        # silently ignore the knob
        if cfg.train.embedding_update == "sparse":
            raise ValueError(
                "CDCTrainer does not support embedding_update='sparse': "
                "lazy Adam changes the treatment-burst dynamics the "
                "affinity matrices are built from.  Use 'hybrid' (default; "
                "bit-equivalent to 'dense')."
            )
        self.emb_upd = EmbeddingUpdater(
            field_dims, cfg.train, cfg.model.l2_reg_embedding)
        self.state = TrainState(
            params=params, opt_state=init_sparse_opt_state(
                params, self.tx, cfg.train.embedding_moments_dtype),
            model_state=model_state, step=jnp.zeros((), jnp.int32),
        )
        if mesh is not None and shardings is not None:
            # table rows -> model axis, everything else replicated
            self.state = jax.device_put(
                self.state, shardings.state_sharding(self.state))
        self.dropout_rng = jax.random.PRNGKey(cfg.train.seed + 1)
        self.np_rng = np.random.default_rng(cfg.train.seed)
        self.stopper = EarlyStopper(cfg.train.early_stop)
        self._best_bytes = None
        self._snapshot = None

        self._build_steps()

    # ------------------------------------------------------------------
    def _build_steps(self):
        """All hot-path functions take the device-resident training arrays
        (Xdev [N,F], ydev [N]) plus int32 row-index batches, so host->device
        traffic per step is a few KB of indices instead of the batch data
        (the reference keeps its whole dataset on-device too, run.py:273).

        Bursts run as lax.scan mega-steps: per-dispatch latency (~0.4ms)
        would otherwise dominate the sub-millisecond CDC treatment steps.
        """
        model, cfg = self.model, self.cfg
        reg_coefs, tx, upd = self.reg_coefs, self.tx, self.emb_upd
        reg_coefs_rest = {k: v for k, v in reg_coefs.items() if k != "embedding"}
        l2_emb = cfg.model.l2_reg_embedding
        mutable = list(self.mutable_keys)
        domain_idx = self.domain_idx
        mesh = self.mesh

        def shard_rows(a):
            """Constrain a [rows, ...] batch array onto the data axis; GSPMD
            then shards the whole fwd/bwd and inserts the gradient psum."""
            if mesh is None:
                return a
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P("data", *([None] * (a.ndim - 1)))
            return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

        def replicated(a):
            """Constrain a host-bound jit OUTPUT to full replication.  On a
            multi-PROCESS mesh GSPMD otherwise may shard small outputs
            (e.g. the [R, D] populate rows) across processes, making them
            non-addressable and unfetchable (np.asarray raises).  Tiny
            arrays only — the all-gather is noise."""
            if mesh is None:
                return a
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P(*([None] * jnp.ndim(a))))
            return jax.lax.with_sharding_constraint(a, rep)

        import optax

        def forward_train(rest_params, rows, model_state, x, y, mask, rng,
                          mode, domain2group):
            with _precision_scope(cfg.train.compute_dtype):
                out, new_state = model.apply(
                    {"params": rest_params, **model_state},
                    x,
                    train=True,
                    row_mask=mask,
                    mutable=mutable,
                    rngs={"dropout": rng},
                    embed_rows=rows,
                )
            if mode == "warmup":
                # mean of tower probabilities (cdc.py:99-102)
                probs = jnp.mean(jax.nn.sigmoid(out), axis=1)
                loss = bce_on_probs(probs, y, mask)
            else:
                groups = domain2group[x[:, domain_idx]]
                logit = jnp.take_along_axis(out, groups[:, None], axis=1)[:, 0]
                loss = bce_with_logits(logit, y, mask)
            loss = loss + regularization_loss(rest_params, reg_coefs_rest)
            return loss, new_state

        def one_step(mode, ts, Xdev, ydev, idx, mask, rng, domain2group):
            x = shard_rows(jnp.take(Xdev, idx, axis=0))
            y = shard_rows(jnp.take(ydev, idx, axis=0))
            mask = shard_rows(mask)
            table = ts.params["embedding"]["table"]
            rest = {k: v for k, v in ts.params.items() if k != "embedding"}
            opt_rest, emb_opt = ts.opt_state
            rows = upd.gather_rows(table, x)
            (loss, new_state), (g_rest, g_rows) = jax.value_and_grad(
                forward_train, argnums=(0, 1), has_aux=True
            )(rest, rows, ts.model_state, x, y, mask, rng, mode, domain2group)
            updates, new_opt_rest = tx.update(g_rest, opt_rest, rest)
            new_rest = optax.apply_updates(rest, updates)
            p2, emb_opt2, sumsq = upd.update(table, emb_opt, x, g_rows,
                                             ts.step + 1)
            return ts.replace(
                params={**new_rest, "embedding": {"table": p2}},
                opt_state=(new_opt_rest, emb_opt2),
                model_state=new_state, step=ts.step + 1,
            ), replicated(loss + l2_emb * sumsq)

        def scan_steps(mode, ts, Xdev, ydev, idxs, masks, rngs, domain2group):
            def body(ts, xs):
                idx, mask, rng = xs
                return one_step(mode, ts, Xdev, ydev, idx, mask, rng, domain2group)

            return jax.lax.scan(body, ts, (idxs, masks, rngs))

        def gated_scan_steps(mode, ts, Xdev, ydev, idxs, masks, valids, rngs,
                             domain2group):
            """Fixed-length scan where steps with valid=0 are skipped.  Lets
            variable-length treatment bursts share ONE compiled shape instead
            of one per length.  lax.cond executes only the taken branch on
            TPU, so padded steps cost ~nothing."""

            def body(ts, xs):
                idx, mask, valid, rng = xs
                return jax.lax.cond(
                    valid > 0,
                    lambda t: one_step(mode, t, Xdev, ydev, idx, mask, rng,
                                       domain2group),
                    lambda t: (t, jnp.zeros((), jnp.float32)),
                    ts,
                )

            return jax.lax.scan(body, ts, (idxs, masks, valids, rngs))

        # after functools.partial binds ``mode``, the wrapped signature is
        # (ts, Xdev, ydev, ...) — donate ts (arg 0), never the data arrays
        self._split_step = jax.jit(partial(one_step, "split"), donate_argnums=(0,))
        self._warmup_scan = jax.jit(partial(scan_steps, "warmup"), donate_argnums=(0,))
        self._split_scan = jax.jit(partial(scan_steps, "split"), donate_argnums=(0,))
        self._split_scan_gated = jax.jit(
            partial(gated_scan_steps, "split"), donate_argnums=(0,)
        )

        use_auc = cfg.cdc.use_metric == "auc"

        def eval_row_from(params, model_state, Xdev, ydev, idx, masks, d2g):
            """[D, bs] -> [D] metric (loss default; exact pairwise AUC for
            use_metric='auc', cdc.py:113-119)."""
            D, bs = idx.shape
            flat_idx = idx.reshape(D * bs)
            x = shard_rows(jnp.take(Xdev, flat_idx, axis=0))
            ys = jnp.take(ydev, flat_idx, axis=0).reshape(D, bs)
            with _precision_scope(cfg.train.compute_dtype):
                out = model.apply(
                    {"params": params, **model_state}, x, train=False)
            groups = d2g[x[:, domain_idx]]
            logit = jnp.take_along_axis(out, groups[:, None], axis=1)[:, 0]
            vals = logit.reshape(D, bs)
            if use_auc:
                def one_auc(pd, yd, md):
                    pos = yd * md
                    neg = (1 - yd) * md
                    gt = (pd[:, None] > pd[None, :]).astype(jnp.float32)
                    eq = (pd[:, None] == pd[None, :]).astype(jnp.float32)
                    wins = jnp.sum(pos[:, None] * neg[None, :] * (gt + 0.5 * eq))
                    return wins / jnp.maximum(jnp.sum(pos) * jnp.sum(neg), 1.0)

                return jax.vmap(one_auc)(vals, ys, masks)
            p = jnp.clip(jax.nn.sigmoid(vals), 1e-7, 1 - 1e-7)
            losses = -(ys * jnp.log(p) + (1 - ys) * jnp.log1p(-p))
            return jnp.sum(losses * masks, axis=1) / jnp.maximum(
                jnp.sum(masks, axis=1), 1.0
            )

        def populate_rows(ts, Xdev, ydev, bidx, bmask, bvalid, rngs, eidx,
                          emask, domain2group):
            """All matrix rows of one block in ONE dispatch.

            Per row r (outer scan): run the gated treatment burst
            (bidx[r] [K, W]), evaluate the metric on every domain
            (eidx[r] [D, bs]), then roll back params + model buffers to the
            block snapshot while KEEPING optimizer moments — exactly the
            reference's asymmetry (cdc.py:343-351 restores the base model's
            state_dict but never the Adam state; run.py:528-592 rolls back
            after every row).  Returns (state_after, rows [R, D]).
            """
            snap_params = ts.params
            snap_mstate = ts.model_state

            def one_row(ts, xs):
                ridx, rmask, rvalid, rrng, reidx, remask = xs

                def body(ts, step_xs):
                    idx, mask, valid, rng = step_xs
                    # lax.cond executes only the taken branch: padded steps
                    # (valid=0) of the fixed-length burst cost ~nothing
                    return jax.lax.cond(
                        valid > 0,
                        lambda t: one_step("split", t, Xdev, ydev, idx, mask,
                                           rng, domain2group),
                        lambda t: (t, jnp.zeros((), jnp.float32)),
                        ts,
                    )

                step_rngs = jax.vmap(
                    lambda i: jax.random.fold_in(rrng, i)
                )(jnp.arange(ridx.shape[0]))
                ts, _ = jax.lax.scan(body, ts, (ridx, rmask, rvalid, step_rngs))
                row = eval_row_from(
                    ts.params, ts.model_state, Xdev, ydev, reidx, remask,
                    domain2group,
                )
                ts = ts.replace(params=snap_params, model_state=snap_mstate)
                return ts, row

            ts, rows = jax.lax.scan(
                one_row, ts, (bidx, bmask, bvalid, rngs, eidx, emask)
            )
            return ts, replicated(rows)

        self._populate_rows = jax.jit(populate_rows, donate_argnums=(0,))

        def shard_rows_lanes(a):
            """Lane-stacked [N, rows, ...] batch arrays: shard the ROW axis
            (axis 1) over data, lanes replicated."""
            if mesh is None:
                return a
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P(None, "data", *([None] * (a.ndim - 2)))
            return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

        lane_offsets = jnp.asarray(self.emb_upd.offsets, jnp.int32)
        vocab = int(self.emb_upd.vocab)

        def one_step_stacked(mode, ts_b, Xdev, ydev, idx_b, mask_b, rng_b,
                             domain2group):
            """one_step over N stacked lanes.  The dense-net params /
            optax state / BatchNorm buffers carry a leading [N] axis (tiny
            tensors — vmap is free); the embedding table and its moments
            carry LANE-FLAT [N*V, D] (lane l = rows [l*V, (l+1)*V)): a
            stacked [N, V, D] scan carry gets a transposed XLA layout and
            every row-indexed use then pays per-step transpose loops
            (profile_populate_trace.py, round-5 notes).  Lookups use
            lane-offset absolute row ids (plain gather — bit-identical to
            mixed_table_lookup's value contract); the update goes through
            EmbeddingUpdater.update_stacked's flat path."""
            N = idx_b.shape[0]
            x = shard_rows_lanes(jnp.take(Xdev, idx_b, axis=0))   # [N, W, F]
            y = shard_rows_lanes(jnp.take(ydev, idx_b, axis=0))   # [N, W]
            mask_b = shard_rows_lanes(mask_b)
            table_f = ts_b.params["embedding"]["table"]           # [N*V, D]
            rest_b = {k: v for k, v in ts_b.params.items() if k != "embedding"}
            opt_rest_b, emb_opt_b = ts_b.opt_state
            lane = (jnp.arange(N, dtype=jnp.int32) * vocab)[:, None, None]
            abs_ids = x + lane_offsets[None, None, :] + lane      # [N, W, F]
            rows_b = jnp.take(
                table_f, abs_ids.reshape(N, -1), axis=0)          # [N, W*F, D]
            grad_fn = jax.value_and_grad(forward_train, argnums=(0, 1),
                                         has_aux=True)
            (loss, new_state), (g_rest, g_rows) = jax.vmap(
                lambda rest, rows, mstate, xx, yy, mm, rr: grad_fn(
                    rest, rows, mstate, xx, yy, mm, rr, mode, domain2group)
            )(rest_b, rows_b, ts_b.model_state, x, y, mask_b, rng_b)
            updates, new_opt_rest = jax.vmap(tx.update)(
                g_rest, opt_rest_b, rest_b)
            new_rest = jax.vmap(optax.apply_updates)(rest_b, updates)
            p2, emb_opt2, _ = upd.update_stacked(
                table_f, emb_opt_b, x, g_rows, ts_b.step + 1, lanes=N)
            return ts_b.replace(
                params={**new_rest, "embedding": {"table": p2}},
                opt_state=(new_opt_rest, emb_opt2),
                model_state=new_state, step=ts_b.step + 1,
            ), loss

        def populate_rows_parallel(ts, Xdev, ydev, bidx, bmask, bvalid, rngs,
                                   eidx, emask, domain2group):
            """Opt-in lane-parallel populate (CDCConfig.parallel_rows): all
            N rows of the chunk burst INDEPENDENTLY from the chunk-entry
            snapshot as stacked lanes, so the per-row sub-ms matmuls batch
            into N-wide MXU ops and the serial row scan (>50% of CDC wall
            at 50 domains, docs/RESULTS.md round-3) collapses into
            ceil(R/N) dispatches.

            DOCUMENTED DIVERGENCE from the reference (cdc.py:343-351): each
            row uses its OWN copy of the update-entry Adam moments instead
            of the cross-row moment carry (which is itself an accident —
            save/load_model_state snapshots only the base model, never the
            optimizer).  Row results become order-independent; the trainer
            state is returned to the caller UNCHANGED (no moment advance
            during the matrix update).  Row 0 of the first chunk sees the
            same RNG schedule and entry moments as serial row 0, so it
            matches up to batched-matmul reduction order (~1e-5) — tested.
            Lane-gating note: stacked lanes can't lax.cond-skip padded
            steps (the predicate is per-lane), so invalid steps compute
            and are discarded via where-select — schedules should pack
            rows of similar burst length per chunk where possible."""
            N, K = bvalid.shape

            def stack(a):
                b = jnp.broadcast_to(a[None], (N,) + jnp.shape(a))
                # table + moments go LANE-FLAT (layout note above)
                if jnp.ndim(a) == 2 and a.shape[0] == vocab:
                    return b.reshape(N * vocab, a.shape[1])
                return b

            ts_b = jax.tree_util.tree_map(stack, ts)
            step_rngs = jax.vmap(lambda r: jax.vmap(
                lambda i: jax.random.fold_in(r, i))(jnp.arange(K)))(rngs)

            def body(ts_b, xs):
                idx_b, mask_b, valid_b, rng_b = xs
                new_ts_b, _ = one_step_stacked(
                    "split", ts_b, Xdev, ydev, idx_b, mask_b, rng_b,
                    domain2group)

                def sel(nl, ol):
                    if nl.ndim >= 1 and nl.shape[0] == N * vocab:
                        v = jnp.repeat(valid_b, vocab).reshape(
                            (N * vocab,) + (1,) * (nl.ndim - 1))
                    else:
                        v = valid_b.reshape((N,) + (1,) * (nl.ndim - 1))
                    return jnp.where(v > 0, nl, ol)

                return jax.tree_util.tree_map(sel, new_ts_b, ts_b), None

            ts_b, _ = jax.lax.scan(
                body, ts_b,
                (bidx.swapaxes(0, 1), bmask.swapaxes(0, 1),
                 bvalid.swapaxes(0, 1), jnp.swapaxes(step_rngs, 0, 1)))
            # one unflatten at chunk end for the eval forwards (the per-step
            # scan carry never leaves the flat layout)
            params_eval = dict(ts_b.params)
            params_eval["embedding"] = {
                "table": ts_b.params["embedding"]["table"].reshape(
                    N, vocab, -1)}
            rows = jax.vmap(
                lambda p, ms, ei, em: eval_row_from(
                    p, ms, Xdev, ydev, ei, em, domain2group)
            )(params_eval, ts_b.model_state, eidx, emask)
            return replicated(rows)

        self._populate_rows_par = jax.jit(populate_rows_parallel)

        @jax.jit
        def eval_all_domains(params, model_state, Xdev, ydev, idx, masks, domain2group):
            """One [n_domain*bs] forward; per-domain BCE on probabilities
            (cdc_test_all_domain, run.py:550-558 + cdc.py:113-116).

            idx/masks: [D, bs] -> [D] loss vector."""
            D, bs = idx.shape
            flat_idx = idx.reshape(D * bs)
            x = shard_rows(jnp.take(Xdev, flat_idx, axis=0))
            ys = jnp.take(ydev, flat_idx, axis=0).reshape(D, bs)
            with _precision_scope(cfg.train.compute_dtype):
                out = model.apply(
                    {"params": params, **model_state}, x, train=False)
            groups = domain2group[x[:, domain_idx]]
            logit = jnp.take_along_axis(out, groups[:, None], axis=1)[:, 0]
            probs = jax.nn.sigmoid(logit).reshape(D, bs)
            p = jnp.clip(probs, 1e-7, 1 - 1e-7)
            losses = -(ys * jnp.log(p) + (1 - ys) * jnp.log1p(-p))
            return replicated(jnp.sum(losses * masks, axis=1) / jnp.maximum(
                jnp.sum(masks, axis=1), 1.0
            ))

        self._eval_all_domains = eval_all_domains

        @jax.jit
        def eval_all_domains_auc(params, model_state, Xdev, ydev, idx, masks,
                                 domain2group):
            """Per-domain exact (tie-aware) AUC on one batch each, on device
            (the use_metric='auc' variant, cdc.py:117-119)."""
            D, bs = idx.shape
            flat_idx = idx.reshape(D * bs)
            x = shard_rows(jnp.take(Xdev, flat_idx, axis=0))
            ys = jnp.take(ydev, flat_idx, axis=0).reshape(D, bs)
            with _precision_scope(cfg.train.compute_dtype):
                out = model.apply(
                    {"params": params, **model_state}, x, train=False)
            groups = domain2group[x[:, domain_idx]]
            logit = jnp.take_along_axis(out, groups[:, None], axis=1)[:, 0]
            p = logit.reshape(D, bs)  # AUC is rank-based: logits suffice

            def one_auc(pd, yd, md):
                pos = yd * md
                neg = (1 - yd) * md
                gt = (pd[:, None] > pd[None, :]).astype(jnp.float32)
                eq = (pd[:, None] == pd[None, :]).astype(jnp.float32)
                wins = jnp.sum(pos[:, None] * neg[None, :] * (gt + 0.5 * eq))
                denom = jnp.sum(pos) * jnp.sum(neg)
                return wins / jnp.maximum(denom, 1.0)

            return replicated(jax.vmap(one_auc)(p, ys, masks))

        self._eval_all_domains_auc = eval_all_domains_auc

        @jax.jit
        def predict_split_scan(params, model_state, xs, domain2group):
            """[C, bs, F] batches in ONE dispatch (per-batch dispatches pay
            ~25ms remote-runtime latency each — minutes over a full
            Ali-CCP eval split).  Padding rows' predictions are discarded
            host-side."""

            def body(c, x):
                x = shard_rows(x)
                with _precision_scope(cfg.train.compute_dtype):
                    out = model.apply(
                        {"params": params, **model_state}, x, train=False)
                groups = domain2group[x[:, domain_idx]]
                return c, jax.nn.sigmoid(
                    jnp.take_along_axis(out, groups[:, None], axis=1)[:, 0])

            _, ps = jax.lax.scan(body, 0, xs)
            return replicated(ps)

        self._predict_split_scan = predict_split_scan

        n_bins = self._HIST_BINS

        @functools.partial(jax.jit, donate_argnums=(6, 7, 8, 9))
        def predict_split_hist_scan(params, model_state, xs, ys, masks,
                                    domain2group, pos, neg, lsum, lcnt):
            """Split-mode eval accumulating per-(domain, bin) AUC
            histograms + capped logit-space BCE sums on device — the
            streaming counterpart of predict_split_scan (no prediction
            ever crosses to host; see train.step.make_streaming_eval_scan
            for the formulation notes)."""

            from tpurec.train.step import hist_update

            def body(carry, xym):
                x, y, mask = xym
                x = shard_rows(x)
                with _precision_scope(cfg.train.compute_dtype):
                    out = model.apply(
                        {"params": params, **model_state}, x, train=False)
                dom = x[:, domain_idx].astype(jnp.int32)
                groups = domain2group[dom]
                logit = jnp.take_along_axis(out, groups[:, None], axis=1)[:, 0]
                return hist_update(carry, dom, logit, y, mask, n_bins), None

            carry, _ = jax.lax.scan(
                body, (pos, neg, lsum, lcnt), (xs, ys, masks))
            return jax.tree_util.tree_map(replicated, carry)

        self._predict_split_hist_scan = predict_split_hist_scan

    # ------------------------------------------------------------------
    # snapshot / rollback (cdc.py:343-354): params + model buffers, NOT opt
    def save_model_state(self):
        self._snapshot = (
            jax.tree_util.tree_map(jnp.copy, self.state.params),
            jax.tree_util.tree_map(jnp.copy, self.state.model_state),
        )

    def load_model_state(self):
        p, s = self._snapshot
        self.state = self.state.replace(
            params=jax.tree_util.tree_map(jnp.copy, p),
            model_state=jax.tree_util.tree_map(jnp.copy, s),
        )

    # ------------------------------------------------------------------
    # dataset-placement budgets (CDCConfig.data_placement='auto'): a v5e
    # has 16GB HBM — leave room for params/moments/populate activations;
    # on a mesh a resident dataset is REPLICATED per chip, so the budget
    # drops sharply before streaming takes over
    RESIDENT_BUDGET = 4 << 30
    MESH_RESIDENT_BUDGET = 256 << 20

    def _decide_placement(self, nbytes: int) -> bool:
        """True = device-resident, False = host-stream windows."""
        mode = self.cfg.cdc.data_placement
        if mode == "resident":
            return True
        if mode == "stream":
            return False
        if mode != "auto":
            raise ValueError(f"unknown data_placement {mode!r}")
        budget = (self.MESH_RESIDENT_BUDGET if self.mesh is not None
                  else self.RESIDENT_BUDGET)
        return nbytes <= budget

    def setup_data(self, train, valid=None, test=None):
        Xtr, ytr = train
        self.train_batcher = DomainBatcher(
            Xtr, ytr, self.domain_idx, self.n_domain, self.cfg.train.bs,
            rng=np.random.default_rng(self.cfg.train.seed + 10),
        )
        self.domain_cnt_weight = self.train_batcher.domain_cnt_weight
        self.valid_batcher = (
            DomainBatcher(
                valid[0], valid[1], self.domain_idx, self.n_domain,
                self.cfg.train.bs, rng=np.random.default_rng(self.cfg.train.seed + 11),
            )
            if valid is not None else None
        )
        self.test_batcher = (
            DomainBatcher(
                test[0], test[1], self.domain_idx, self.n_domain,
                self.cfg.train.bs, rng=np.random.default_rng(self.cfg.train.seed + 12),
            )
            if test is not None else None
        )
        if getattr(self, "cluster", None) is None:
            self.cluster = CDCClusterState.create(
                self.n_domain, self.n_cluster, self.cfg.cdc
            )
        Xh = np.ascontiguousarray(Xtr, dtype=np.int32)
        yh = np.ascontiguousarray(ytr, dtype=np.float32).reshape(-1)
        self._resident = self._decide_placement(Xh.nbytes + yh.nbytes)
        if self._resident:
            # device-resident training arrays; the hot loop ships indices
            # (on a mesh the dataset is replicated on every chip; batches
            # are index-gathered then sharded by rows inside the steps)
            self.Xhost = self.yhost = None
            self.Xdev = self._dev(Xh, replicate=True)
            self.ydev = self._dev(yh, replicate=True)
        else:
            # host-stream: the dataset NEVER lives in HBM.  Every dispatch
            # gathers its scheduled rows into one fixed-shape window
            # host-side (_feed) — same jitted executables, the "dataset"
            # argument is just the window and the indices are positions in
            # it.  This is how CDC scales past the HBM budget (the
            # reference requires the whole split on-device, run.py:239).
            self.Xhost, self.yhost = Xh, yh
            self.Xdev = self.ydev = None

    def _dev(self, a, replicate: bool = False):
        """Host array -> device array usable by the jitted steps.

        Single-process (incl. the one-chip image and virtual CPU meshes):
        plain ``jnp.asarray`` — or an explicitly replicated ``device_put``
        when ``replicate`` is set and a mesh is present (datasets and
        stream windows, which the steps index-gather from).

        On a MULTI-PROCESS mesh every jit argument must be a global
        ``jax.Array``; assemble a replicated one from the per-process
        value, which is identical on every process by construction — the
        entire CDC schedule (domain sampling, batch indices, masks, RNG
        keys) derives from host RNGs seeded by ``cfg.train.seed``, and
        every process keeps the full train split host-side.  Same
        single-process degradation contract as
        :class:`tpurec.parallel.feed.GlobalBatchFeed`.
        """
        if self.mesh is None:
            return jnp.asarray(a)
        if jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            a = np.asarray(a)
            sh = NamedSharding(self.mesh, P(*([None] * a.ndim)))
            return jax.make_array_from_process_local_data(sh, a)
        if replicate and self.shardings is not None:
            return jax.device_put(jnp.asarray(a), self.shardings.replicated())
        return jnp.asarray(a)

    def _feed(self, *idx_arrays):
        """(index schedules) -> (Xsrc, ysrc, *idx_dev) for the jitted steps.

        resident: the device-resident dataset and the indices unchanged.
        stream:   host-gathers the scheduled rows into ONE window
                  [sum(sizes), F] and re-points the indices at window
                  positions; window shape is fixed per call site, so each
                  site still compiles exactly once.
        """
        if self._resident:
            return (self.Xdev, self.ydev) + tuple(
                self._dev(a) for a in idx_arrays)
        flat = np.concatenate(
            [np.asarray(a, np.int64).ravel() for a in idx_arrays])
        Xw = self._dev(self.Xhost[flat], replicate=True)
        yw = self._dev(self.yhost[flat], replicate=True)
        outs, off = [], 0
        for a in idx_arrays:
            outs.append(self._dev(
                np.arange(off, off + a.size, dtype=np.int32).reshape(a.shape)))
            off += a.size
        return (Xw, yw) + tuple(outs)

    @property
    def domain2group_dev(self):
        return self._dev(np.asarray(self.cluster.domain2group, np.int32))

    # ------------------------------------------------------------------
    def _next_idx_padded(self, d: int, width: int):
        """Next batch of domain d as (idx[width], mask[width])."""
        idx = self.train_batcher.next_idx(d)
        mask = np.zeros(width, np.float32)
        mask[: len(idx)] = 1.0
        out = np.zeros(width, np.int32)
        out[: len(idx)] = idx
        return out, mask

    def _multi_idx_padded(self, domains, width: int):
        """One batch from each domain concatenated (run.py:519-526),
        shuffled order, padded to ``width`` rows."""
        ds = list(domains)
        self.train_batcher.rng.shuffle(ds)
        idxs = [self.train_batcher.next_idx(d) for d in ds]
        flat = np.concatenate(idxs)[:width]
        out = np.zeros(width, np.int32)
        mask = np.zeros(width, np.float32)
        out[: len(flat)] = flat
        mask[: len(flat)] = 1.0
        return out, mask

    def _train_one(self, d: int):
        """One split-mode step on one domain batch (run.py:635-640)."""
        idx, mask = self._next_idx_padded(d, self.cfg.train.bs)
        self.dropout_rng, rng = jax.random.split(self.dropout_rng)
        Xsrc, ysrc, idx_d = self._feed(idx)
        self.state, loss = self._split_step(
            self.state, Xsrc, ysrc,
            idx_d, self._dev(mask), self._dev(rng), self.domain2group_dev,
        )
        return loss

    def _split_scan_run(self, idxs: np.ndarray, masks: np.ndarray):
        self.dropout_rng, rng = jax.random.split(self.dropout_rng)
        rngs = jax.random.split(rng, idxs.shape[0])
        Xsrc, ysrc, idxs_d = self._feed(idxs)
        self.state, losses = self._split_scan(
            self.state, Xsrc, ysrc,
            idxs_d, self._dev(masks), self._dev(rngs), self.domain2group_dev,
        )
        return losses

    def _train_burst(self, domains, k: int):
        """k repetitions over a domain (or domain set) with rollbackable
        weights (cdc_train_update_with_domain, run.py:529-548): an int
        domain trains k single-domain steps; a list trains on chunks of
        ``group_chunk_size`` domains concatenated per step.  All steps of a
        burst run as ONE scanned dispatch; variable-length multi-domain
        bursts pad to a fixed scan length with gated (discarded) steps so
        there are exactly two compiled burst shapes."""
        bs = self.cfg.train.bs
        chunk = self.cfg.cdc.group_chunk_size
        if isinstance(domains, (int, np.integer)):
            pairs = [self._next_idx_padded(int(domains), bs) for _ in range(k)]
            idxs = np.stack([p[0] for p in pairs])
            masks = np.stack([p[1] for p in pairs])
            self._split_scan_run(idxs, masks)
            return
        tmp = list(domains) * k
        pairs = [
            self._multi_idx_padded(tmp[i : i + chunk], chunk * bs)
            for i in range(0, len(tmp), chunk)
        ]
        K = len(pairs)
        K_max = self._burst_k_max(k)
        width = chunk * bs
        idxs = np.zeros((K_max, width), np.int32)
        masks = np.zeros((K_max, width), np.float32)
        valids = np.zeros((K_max,), np.float32)
        for i, (ii, mm) in enumerate(pairs[:K_max]):
            idxs[i], masks[i], valids[i] = ii, mm, 1.0
        self.dropout_rng, rng = jax.random.split(self.dropout_rng)
        rngs = jax.random.split(rng, K_max)
        Xsrc, ysrc, idxs_d = self._feed(idxs)
        self.state, _ = self._split_scan_gated(
            self.state, Xsrc, ysrc,
            idxs_d, self._dev(masks), self._dev(valids), self._dev(rngs),
            self.domain2group_dev,
        )

    def _burst_k_max(self, k: int) -> int:
        """Fixed gated-scan length covering the largest possible burst:
        n_domain domains repeated k times in chunks of group_chunk_size."""
        chunk = self.cfg.cdc.group_chunk_size
        return max(1, -(-(self.n_domain * max(k, 1)) // chunk))

    # ------------------------------------------------------------------
    @property
    def _ebs(self) -> int:
        """Probe-eval width per domain: bs * cdc.probe_eval_batches
        (reference = one bs batch; widening cuts probe eval noise)."""
        return self.cfg.train.bs * max(1, self.cfg.cdc.probe_eval_batches)

    def _eval_sched(self):
        """Probe-eval schedule: (idx [D, ebs], mask [D, ebs]) — one
        train-stream batch per domain at reference defaults,
        probe_eval_batches consecutive batches concatenated otherwise."""
        bs, ebs = self.cfg.train.bs, self._ebs
        D = self.n_domain
        idx = np.zeros((D, ebs), np.int32)
        mask = np.zeros((D, ebs), np.float32)
        for d in range(D):
            flat = np.concatenate(
                [self.train_batcher.next_idx(d) for _ in range(ebs // bs)])
            idx[d, : len(flat)] = flat
            mask[d, : len(flat)] = 1.0
        return idx, mask

    def _multi_burst_sched(self, domains, k: int, K_max: int):
        """Index schedule of a multi-domain treatment burst: list repeated k
        times, chunks of group_chunk_size concatenated per step
        (run.py:529-548), padded to K_max gated steps."""
        bs = self.cfg.train.bs
        chunk = self.cfg.cdc.group_chunk_size
        W = chunk * bs
        idxs = np.zeros((K_max, W), np.int32)
        masks = np.zeros((K_max, W), np.float32)
        valids = np.zeros((K_max,), np.float32)
        if domains:
            tmp = list(domains) * k
            for s, i in enumerate(range(0, len(tmp), chunk)):
                if s >= K_max:
                    break
                idxs[s], masks[s] = self._multi_idx_padded(tmp[i : i + chunk], W)
                valids[s] = 1.0
        return idxs, masks, valids

    def _data_avals(self, R: int, K: int, W: int):
        """(Xsrc, ysrc) avals of one populate call: the resident dataset,
        or the stream window [R*K*W + R*D*ebs, F]."""
        sds = jax.ShapeDtypeStruct
        if self._resident:
            return (sds(self.Xdev.shape, self.Xdev.dtype),
                    sds(self.ydev.shape, self.ydev.dtype))
        T = R * K * W + R * self.n_domain * self._ebs
        return (sds((T, self.Xhost.shape[1]), jnp.int32),
                sds((T,), jnp.float32))

    def _populate_avals(self, R: int, K: int, W: int):
        """Abstract arg signature of one _populate_rows shape."""
        D, bs = self.n_domain, self._ebs
        sds = jax.ShapeDtypeStruct
        aval = lambda a: sds(a.shape, a.dtype)  # noqa: E731
        rngs_aval = jax.eval_shape(
            lambda k: jax.random.split(k, R), self.dropout_rng)
        return (
            jax.tree_util.tree_map(aval, self.state),
            *self._data_avals(R, K, W),
            sds((R, K, W), jnp.int32), sds((R, K, W), jnp.float32),
            sds((R, K), jnp.float32), rngs_aval,
            sds((R, D, bs), jnp.int32), sds((R, D, bs), jnp.float32),
            sds((D,), jnp.int32),
        )

    def _populate_shapes(self, update_matrix_step: int):
        """Dispatch shapes one matrix update exercises.  Serial mode: one
        shape per block (all R rows in one scan).  parallel_rows=N mode:
        every block chunks into N-lane vmapped dispatches, so the shapes
        are (N, K, W) keyed with a 'par' tag (distinct executable)."""
        k = update_matrix_step
        bs, D = self.cfg.train.bs, self.n_domain
        K_max = self._burst_k_max(k)
        W = self.cfg.cdc.group_chunk_size * bs
        N = self.cfg.cdc.parallel_rows
        if N > 0:
            return {("par", N, K_max, W), ("par", N, k, bs)}
        return {
            (self.cfg.cdc.n_causal_mask, K_max, W),
            (D, k, bs),
            (D + self.n_cluster, K_max, W),
        }

    def warm_compile(self, update_matrix_step: int):
        """Warm the three populate shapes CONCURRENTLY — the first matrix
        update otherwise pays ~3 serial multi-minute compiles.  fit()
        calls this before the warmup phase so the compiles also overlap
        warmup training.  ``update_matrix_step`` must be the SCALED value
        actually passed to update_matrix_cdc (train_cdc_epoch's
        ``*1024//bs`` reference scaling, run.py:601-604) or the warmed
        shapes miss the cache.

        Single device: AOT-lower + compile (the remote compiler
        parallelizes; measured ~2x for 2 threads).  On a mesh, AOT avals
        carry no shardings, so instead each thread makes a SHADOW call to
        the jitted populate on a copy of the state with an all-gated
        (valid=0) schedule: it compiles the identical executable into the
        jit cache, and the gated steps execute ~nothing."""
        self._sync_populate_cache()
        shapes = [s for s in self._populate_shapes(update_matrix_step)
                  if s not in self._populate_exec
                  and s not in self._warm_inflight]
        if not shapes:
            return

        def split_shape(shape):
            """('par', N, K, W) -> (par_fn, (N, K, W)); (R, K, W) -> serial."""
            if shape[0] == "par":
                return self._populate_rows_par, shape[1:]
            return self._populate_rows, shape

        if self.mesh is None:
            def build(shape, _state_copy=None):
                fn, dims = split_shape(shape)
                return shape, fn.lower(
                    *self._populate_avals(*dims)).compile()

            state_copies = {s: None for s in shapes}
        else:
            def build(shape, state_copy):
                fn, (R, K, W) = split_shape(shape)
                D, bs = self.n_domain, self._ebs
                davals = self._data_avals(R, K, W)
                # args must carry the REAL call's shardings or the shadow
                # compiles a different executable: dataset/window arrays
                # replicated, schedules via the same _dev path as _feed
                Xsrc = (self.Xdev if self._resident else self._dev(
                    np.zeros(davals[0].shape, np.int32), replicate=True))
                ysrc = (self.ydev if self._resident else self._dev(
                    np.zeros(davals[1].shape, np.float32), replicate=True))
                out = fn(
                    state_copy, Xsrc, ysrc,
                    self._dev(np.zeros((R, K, W), np.int32)),
                    self._dev(np.zeros((R, K, W), np.float32)),
                    self._dev(np.zeros((R, K), np.float32)),
                    self._dev(jax.random.split(jax.random.PRNGKey(0), R)),
                    self._dev(np.zeros((R, D, bs), np.int32)),
                    self._dev(np.zeros((R, D, bs), np.float32)),
                    self._dev(np.zeros((D,), np.int32)),
                )
                # serial returns (state, rows); parallel returns rows only
                jax.block_until_ready(out[1] if isinstance(out, tuple) else out)
                # executable lives in the jit cache; mark the shape warm
                return shape, fn

            # Copy the state on the MAIN thread, one copy per shape (the
            # shadow call donates its state arg): the training loop's
            # donating steps delete self.state's buffers, so a background
            # tree_map over self.state would race them ("Array deleted").
            state_copies = {
                s: jax.tree_util.tree_map(jnp.copy, self.state)
                for s in shapes
            }
            if jax.process_count() > 1:
                # Multi-process meshes must launch collective programs in
                # the same order on every process; background shadow
                # executions interleaved with training steps would order
                # differently per process and can deadlock.  Run the
                # shadow calls synchronously instead (still before warmup,
                # so the first matrix update doesn't pay them).
                for s in shapes:
                    try:
                        self._populate_exec[s] = build(s, state_copies[s])[1]
                    except Exception as e:
                        import warnings

                        warnings.warn(f"CDC warm_compile failed ({e!r})")
                return

        for s in shapes:
            self._warm_inflight.add(s)
            self._warm_futures.append(_DaemonBuild(build, s, state_copies[s]))

    def _sync_populate_cache(self):
        """Drop warm populate executables compiled against a DIFFERENT
        dataset: resident-mode signatures bake in the Xdev/ydev shapes, so
        after a setup_data with different-size arrays they would fail with
        'Argument types differ' (stream-mode windows depend only on the
        schedule shapes + field count).  Called on every cache touch point
        (warm_compile AND _run_populate — update_matrix_cdc may run
        without a fresh warm_compile)."""
        data_sig = ((self.Xdev.shape, self.ydev.shape) if self._resident
                    else ("stream", self.Xhost.shape[1]))
        if getattr(self, "_populate_data_sig", None) != data_sig:
            self._populate_exec = {}
            self._warm_inflight = set()
            self._warm_futures = []      # orphan any stale builds
            self._populate_data_sig = data_sig

    def _collect_warm(self):
        for f in getattr(self, "_warm_futures", []):
            try:
                shape, exe = f.result()
                self._populate_exec[shape] = exe
                self._warm_inflight.discard(shape)
            except Exception as e:  # jitted fallback, but say why
                import warnings

                warnings.warn(
                    f"CDC warm_compile failed ({e!r}); falling back to the "
                    "jitted populate path (first matrix update will stall "
                    "on serial compiles)")
        self._warm_futures = []
        self._warm_inflight = set()

    def _run_populate_async(self, bidx, bmask, bvalid, eidx, emask):
        """Dispatch one populate block; returns the [R, D] rows as an
        in-flight device array.  Callers that dispatch several blocks
        fetch them all at the end (update_matrix_cdc): the blocks chain
        through the donated state on device, so deferring the fetch
        overlaps the NEXT block's host work (schedule build; in stream
        placement the whole window gather + upload) with this block's
        device compute."""
        if self.cfg.cdc.parallel_rows > 0:
            return self._run_populate_parallel(bidx, bmask, bvalid, eidx, emask)
        R = bidx.shape[0]
        self.dropout_rng, rng = jax.random.split(self.dropout_rng)
        rngs = jax.random.split(rng, R)
        self._sync_populate_cache()
        self._collect_warm()
        fn = self._populate_exec.get(bidx.shape, self._populate_rows)
        Xsrc, ysrc, bidx_d, eidx_d = self._feed(bidx, eidx)
        self.state, rows = fn(
            self.state, Xsrc, ysrc,
            bidx_d, self._dev(bmask), self._dev(bvalid), self._dev(rngs),
            eidx_d, self._dev(emask), self.domain2group_dev,
        )
        return rows

    def _run_populate_parallel(self, bidx, bmask, bvalid, eidx, emask):
        """Chunked vmapped populate (CDCConfig.parallel_rows=N): rows run in
        ceil(R/N) dispatches of exactly N vmapped lanes (the last chunk
        padded with all-gated lanes so every block shares ONE compiled
        shape per (K, W)).  The state is NOT consumed — every chunk starts
        from the same update-entry snapshot + moments.  Returns the
        concatenated [R, D] rows, still on device (async)."""
        N = self.cfg.cdc.parallel_rows
        R = bidx.shape[0]
        self._sync_populate_cache()
        self._collect_warm()
        chunks = []
        for lo in range(0, R, N):
            hi = min(lo + N, R)
            pad = N - (hi - lo)

            def padded(a):
                if not pad:
                    return a[lo:hi]
                return np.concatenate(
                    [a[lo:hi], np.zeros((pad,) + a.shape[1:], a.dtype)])

            bi, bm, bv = padded(bidx), padded(bmask), padded(bvalid)
            ei, em = padded(eidx), padded(emask)
            self.dropout_rng, rng = jax.random.split(self.dropout_rng)
            rngs = jax.random.split(rng, N)
            fn = self._populate_exec.get(("par",) + bi.shape,
                                         self._populate_rows_par)
            Xsrc, ysrc, bi_d, ei_d = self._feed(bi, ei)
            rows = fn(
                self.state, Xsrc, ysrc,
                bi_d, self._dev(bm), self._dev(bv), self._dev(rngs),
                ei_d, self._dev(em), self.domain2group_dev,
            )
            chunks.append(rows[: hi - lo])
        return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 0)

    def _run_populate(self, bidx, bmask, bvalid, eidx, emask):
        return np.asarray(
            self._run_populate_async(bidx, bmask, bvalid, eidx, emask),
            np.float64)

    def update_matrix_cdc(self, update_matrix_step: int):
        """Populate matrix_mask/A/B (run.py:528-594) then re-cluster.

        All rows of a block run in ONE jitted dispatch (_populate_rows):
        the rollback after each row is the functional params/buffers reset
        inside the scan, with Adam moments carried across rows — the
        reference's exact snapshot asymmetry without any host round trips.
        Three dispatches total instead of the reference's ~(3*155 bursts +
        155*n_domain eval batches) of device<->host traffic.
        """
        st = self.cluster
        cfg = self.cfg.cdc
        k = update_matrix_step
        bs = self.cfg.train.bs
        D = self.n_domain
        K_max = self._burst_k_max(k)

        # ---- treatment (causal-mask) rows (run.py:563-569)
        R = cfg.n_causal_mask
        W = cfg.group_chunk_size * bs
        ebs = self._ebs
        bidx = np.zeros((R, K_max, W), np.int32)
        bmask = np.zeros((R, K_max, W), np.float32)
        bvalid = np.zeros((R, K_max), np.float32)
        eidx = np.zeros((R, D, ebs), np.int32)
        emask = np.zeros((R, D, ebs), np.float32)
        for r in range(R):
            size = int(self.np_rng.integers(5, max(D, 6)))
            treat = self.np_rng.choice(D, p=self.domain_cnt_weight, size=size)
            bidx[r], bmask[r], bvalid[r] = self._multi_burst_sched(
                list(treat), k, K_max
            )
            eidx[r], emask[r] = self._eval_sched()
        # dispatch now, fetch after ALL blocks are queued (see
        # _run_populate_async): block N+1's host scheduling/window work
        # overlaps block N's device compute
        mask_rows = self._run_populate_async(bidx, bmask, bvalid, eidx, emask)

        # ---- matrix A: warm baseline (eval-only) + train-on-one rows
        # (run.py:571-577); single-domain bursts are k steps of [bs].
        # The baseline eval uses rolled-back params (identical to the
        # pre-update params — the mask block restores them on device), so
        # queuing it after the mask block preserves exact semantics.
        ei, em = self._eval_sched()
        base_fn = (self._eval_all_domains_auc if cfg.use_metric == "auc"
                   else self._eval_all_domains)
        Xsrc, ysrc, ei_d = self._feed(ei)
        warm_row = base_fn(
            self.state.params, self.state.model_state, Xsrc, ysrc,
            ei_d, self._dev(em), self.domain2group_dev,
        )
        bidx = np.zeros((D, k, bs), np.int32)
        bmask = np.zeros((D, k, bs), np.float32)
        bvalid = np.ones((D, k), np.float32)
        eidx = np.zeros((D, D, ebs), np.int32)
        emask = np.zeros((D, D, ebs), np.float32)
        for d in range(D):
            for s in range(k):
                bidx[d, s], bmask[d, s] = self._next_idx_padded(d, bs)
            eidx[d], emask[d] = self._eval_sched()
        a_rows = self._run_populate_async(bidx, bmask, bvalid, eidx, emask)

        # ---- matrix B: leave-one-out rows + per-cluster rows
        # (run.py:579-592).  Cluster rows train on ALL domains of cluster c —
        # the intended semantics (cdc.py:80 comment); run.py:587's
        # domain2group_list[c] indexing is a reference bug not reproduced.
        # Before the first clustering only row D (the single all-domain
        # cluster) is meaningful; extra rows are eval-only and unused.
        d2g = st.domain2group_list
        R_B = D + self.n_cluster
        bidx = np.zeros((R_B, K_max, W), np.int32)
        bmask = np.zeros((R_B, K_max, W), np.float32)
        bvalid = np.zeros((R_B, K_max), np.float32)
        eidx = np.zeros((R_B, D, ebs), np.int32)
        emask = np.zeros((R_B, D, ebs), np.float32)
        for r in range(R_B):
            if r >= D:
                c = r - D
                if max(d2g) > 0:
                    train_domains = list(st.t_group2domain_list[c])
                else:
                    train_domains = list(range(D)) if c == 0 else []
            else:
                train_domains = [
                    d for d in st.s_group2domain_list[d2g[r]] if d != r
                ]
            bidx[r], bmask[r], bvalid[r] = self._multi_burst_sched(
                train_domains, k, K_max
            )
            eidx[r], emask[r] = self._eval_sched()
        b_rows = self._run_populate_async(bidx, bmask, bvalid, eidx, emask)

        # fetch everything once the full update is queued
        st.matrix_mask[:] = np.asarray(mask_rows, np.float64)
        st.matrix_A[D] = np.asarray(warm_row, np.float64)
        st.matrix_A[:D] = np.asarray(a_rows, np.float64)
        st.matrix_B[:] = np.asarray(b_rows, np.float64)

        update_group(
            st, cfg, self.domain_cnt_weight,
            kmeans_seed=int(self.np_rng.integers(2**31)),
        )
        if cfg.save_matrix_artifacts:
            self._dump_matrices()

    def _dump_matrices(self, out_dir: Optional[str] = None):
        """Persist A/B/mask/causal matrices (cdc.py:395-426's dump): csv +
        .xlsx (dependency-free writer, to_excel(index=False) layout) +
        per-cell-annotated imshow PNG — the reference's full artifact set."""
        from tpurec.utils.xlsx import write_matrix_xlsx

        st = self.cluster
        out_dir = out_dir or os.path.join(
            self.cfg.train.save_path, "cdc_matrices"
        )
        os.makedirs(out_dir, exist_ok=True)
        k = st.call_update_group
        for name, m in (
            ("matrix_A", st.matrix_A), ("matrix_B", st.matrix_B),
            ("matrix_mask", st.matrix_mask), ("causal_matrix", st.matrix_causal),
        ):
            np.savetxt(os.path.join(out_dir, f"{name}_step{k}.csv"), m, delimiter=",")
            write_matrix_xlsx(os.path.join(out_dir, f"{name}_step{k}.xlsx"), m)
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                # illustration trims A/B's extra baseline/group rows to the
                # domain block, like the reference (cdc.py:404-405)
                mm = m[: self.n_domain] if name in ("matrix_A", "matrix_B") else m
                vmax = max(abs(float(mm.min())), abs(float(mm.max())), 1e-12)
                fig, ax = plt.subplots(figsize=(10, 8))
                im = ax.imshow(mm, cmap="RdBu", interpolation="nearest",
                               vmin=-vmax, vmax=vmax)
                ax.set_title(f"{name} step-{k}")
                ax.set_xlabel("Domain Index")
                ax.set_ylabel("Treatment Index")
                # per-cell value annotations (cdc.py:421-423)
                for i in range(mm.shape[0]):
                    for j in range(mm.shape[1]):
                        ax.text(j, i, f"{mm[i, j]:.1e}", ha="center",
                                va="center", color="black", fontsize=4)
                fig.colorbar(im)
                fig.savefig(os.path.join(out_dir, f"{name}_step{k}.png"))
                plt.close(fig)
            except ImportError:
                pass

    # ------------------------------------------------------------------
    def _scaled_update_matrix_step(self) -> int:
        """The reference's batch-size normalization of the burst length
        (run.py:601-604): cfg values are calibrated for bs=1024."""
        ccfg = self.cfg.cdc
        if ccfg.update_matrix_step == 0:
            return 0
        return max(1, (ccfg.update_matrix_step * 1024) // self.cfg.train.bs)

    def train_cdc_epoch(self, epoch_i: int, log_fn=None) -> float:
        """One CDC epoch (run.py:596-645)."""
        tcfg, ccfg = self.cfg.train, self.cfg.cdc
        warmup_step = max(5, (ccfg.warmup_step * 1024) // tcfg.bs)
        update_matrix_step = self._scaled_update_matrix_step()
        update_interval = (ccfg.update_interval * 1024) // tcfg.bs

        if epoch_i == 0:
            # entire warmup (run.py:609-627) as ONE scanned dispatch
            pairs = []
            for _ in range(warmup_step):
                d = int(self.np_rng.choice(self.n_domain, p=self.domain_cnt_weight))
                pairs.append(self._next_idx_padded(d, tcfg.bs))
            idxs = np.stack([p[0] for p in pairs])
            masks = np.stack([p[1] for p in pairs])
            self.dropout_rng, rng = jax.random.split(self.dropout_rng)
            rngs = jax.random.split(rng, warmup_step)
            Xsrc, ysrc, idxs_d = self._feed(idxs)
            self.state, _ = self._warmup_scan(
                self.state, Xsrc, ysrc,
                idxs_d, self._dev(masks), self._dev(rngs),
                self.domain2group_dev,
            )

        loss_sum, n_steps = 0.0, 0
        seq = self.train_batcher.epoch_seq()
        interval = max(update_interval, 1)

        def run_update():
            t0 = time.time()
            self.update_matrix_cdc(update_matrix_step)
            if log_fn:
                log_fn({
                    "cdc_update_seconds": time.time() - t0,
                    "domain2group": self.cluster.domain2group_list,
                })

        # reference semantics (run.py:630-645): before training step i, run
        # the matrix update iff (epoch 0 and i==0) or (i+1) % interval == 0.
        # Between boundaries, steps train as scanned dispatches.
        # cdc-plus freeze_after_updates: once the clustering has been
        # updated that many times, skip further updates entirely — the
        # remaining budget trains the frozen grouping (0 = reference
        # behavior, re-cluster at every boundary forever).
        def frozen():
            return (ccfg.freeze_after_updates > 0
                    and self.cluster.call_update_group
                    >= ccfg.freeze_after_updates)

        i = 0
        while i < len(seq):
            if (not frozen()) and (
                    (epoch_i == 0 and i == 0) or ((i + 1) % interval == 0)):
                run_update()
                loss_sum += self._train_span(seq, i, i + 1)
                n_steps += 1
                i += 1
                continue
            # frozen: no more boundaries will fire, run to epoch end (also
            # avoids a zero-length span when i itself sits on a boundary)
            next_boundary = (len(seq) if frozen()
                             else (i // interval + 1) * interval - 1)  # > i
            seg_end = min(len(seq), next_boundary)
            loss_sum += self._train_span(seq, i, seg_end)
            n_steps += seg_end - i
            i = seg_end
        return loss_sum / max(n_steps, 1)

    # split-mode steps per scanned dispatch.  Round-5 A/B at 5M rows /
    # 50 domains (scripts/profile_stream_span.py): resident spans 259.4k
    # ex/s at 64 -> 268.0k at 256 (+3.3%, same dispatch-amortization
    # knee as TrainConfig.steps_per_dispatch); stream spans are
    # feed-bound and unchanged (234k/231k).  Short tails pad to gated
    # steps, which lax.cond skips.
    _SPAN_SCAN = 256
    _HIST_BINS = 8192  # streaming-eval score bins (AUC error O(1/bins))

    def _train_span(self, seq, lo: int, hi: int) -> float:
        """Train split-mode steps lo..hi-1 of the domain sequence via
        fixed-shape scans (full 64-step scans plus one gated tail).

        Loss sums stay ON DEVICE until the span ends: a host sync per
        chunk would serialize the next chunk's host-side work (index
        prep; in stream placement the whole window gather + upload) with
        the device compute, instead of overlapping them through the
        async dispatch queue."""
        bs = self.cfg.train.bs
        chunk_losses = []
        j = lo
        while j < hi:
            span = min(self._SPAN_SCAN, hi - j)
            pairs = [self._next_idx_padded(int(seq[t]), bs)
                     for t in range(j, j + span)]
            idxs = np.stack([p[0] for p in pairs])
            masks = np.stack([p[1] for p in pairs])
            if span == self._SPAN_SCAN:
                losses = self._split_scan_run(idxs, masks)
            elif span == 1:
                self.dropout_rng, rng = jax.random.split(self.dropout_rng)
                Xsrc, ysrc, idx_d = self._feed(idxs[0])
                self.state, losses = self._split_step(
                    self.state, Xsrc, ysrc,
                    idx_d, self._dev(masks[0]), self._dev(rng),
                    self.domain2group_dev,
                )
            else:
                pad = self._SPAN_SCAN - span
                idxs = np.concatenate([idxs, np.zeros((pad, bs), np.int32)])
                masks = np.concatenate([masks, np.zeros((pad, bs), np.float32)])
                valids = np.concatenate(
                    [np.ones(span, np.float32), np.zeros(pad, np.float32)]
                )
                self.dropout_rng, rng = jax.random.split(self.dropout_rng)
                rngs = jax.random.split(rng, self._SPAN_SCAN)
                Xsrc, ysrc, idxs_d = self._feed(idxs)
                self.state, losses = self._split_scan_gated(
                    self.state, Xsrc, ysrc,
                    idxs_d, self._dev(masks),
                    self._dev(valids), self._dev(rngs), self.domain2group_dev,
                )
                losses = losses[:span]
            chunk_losses.append(jnp.sum(losses))  # async; no host sync yet
            j += span
        return float(np.sum([np.asarray(l) for l in chunk_losses])) \
            if chunk_losses else 0.0

    # ------------------------------------------------------------------
    def _padded_split(self, batcher: DomainBatcher):
        """Concatenated eval split, zero-padded to a chunk-aligned batch
        count (shared staging of evaluate / evaluate_streaming: padding
        rows are discarded or masked out, and a ragged tail would force a
        second scan compile.  The chunk adapts down for small splits so
        padding waste stays <2x).  Returns (X, y, Xp, yp, mp, n, nb, CH)."""
        bs = self.cfg.train.bs
        X = np.concatenate(batcher.dom_X, axis=0)
        y = np.concatenate(batcher.dom_y, axis=0).astype(np.float32)
        n = len(y)
        nb = -(-n // bs)
        CH = min(128, nb)
        nb = -(-nb // CH) * CH
        Xp = np.zeros((nb * bs, X.shape[1]), X.dtype)
        Xp[:n] = X
        yp = np.zeros(nb * bs, np.float32)
        yp[:n] = y
        mp = np.zeros(nb * bs, np.float32)
        mp[:n] = 1.0
        return X, y, Xp, yp, mp, n, nb, CH

    @property
    def _use_streaming_eval(self) -> bool:
        return use_streaming_eval(self.cfg, self.mesh)

    def evaluate(self, batcher: DomainBatcher) -> Dict:
        """Split-mode eval (run.py:653-661).  Rows are routed per-row by
        domain2group inside predict, so flat [bs] batches over the whole
        split suffice; per-domain grouping happens host-side in metrics."""
        bs = self.cfg.train.bs
        X, y, Xp, _, _, n, nb, CH = self._padded_split(batcher)
        doms = X[:, self.domain_idx]
        preds = []
        for b0 in range(0, nb, CH):
            k = CH
            xs = jnp.asarray(
                Xp[b0 * bs:(b0 + k) * bs].reshape(k, bs, -1), jnp.int32)
            ps = self._predict_split_scan(
                self.state.params, self.state.model_state, xs,
                self.domain2group_dev)
            preds.append(ps)  # stay on device: fetch would serialize the
            # next chunk's host-side staging with this chunk's compute
        preds = [np.asarray(p).reshape(-1) for p in preds]
        targets, predicts, domains = y, np.concatenate(preds)[:n], doms
        result = {
            "total_auc": auc_score(targets, predicts),
            "total_loss": log_loss_score(targets, predicts),
        }
        result.update(
            evaluate_multi_domain(targets, predicts, domains, self.domain_cnt_weight)
        )
        return result

    def evaluate_streaming(self, batcher: DomainBatcher) -> Dict:
        """Split-mode eval with NO host prediction gather: per-(domain, bin)
        AUC histograms + capped BCE sums accumulate on device (see
        Trainer.evaluate_streaming); same result keys as :meth:`evaluate`,
        AUC within O(1/_HIST_BINS) of it."""
        from tpurec.train.step import HostHistAccumulator, hist_init

        bs = self.cfg.train.bs
        n_bins = self._HIST_BINS
        _, _, Xp, yp, mp, n, nb, CH = self._padded_split(batcher)
        acc = HostHistAccumulator(
            partial(hist_init, self.n_domain, n_bins))
        for b0 in range(0, nb, CH):
            s = slice(b0 * bs, (b0 + CH) * bs)
            acc.update(self._predict_split_hist_scan(
                self.state.params, self.state.model_state,
                self._dev(Xp[s].reshape(CH, bs, -1).astype(np.int32)),
                self._dev(yp[s].reshape(CH, bs)),
                self._dev(mp[s].reshape(CH, bs)),
                self.domain2group_dev, *acc.carry))
        pos, neg, lsum, lcnt = acc.totals()
        return streaming_eval_result(
            pos.reshape(self.n_domain, n_bins),
            neg.reshape(self.n_domain, n_bins), lsum, lcnt,
            self.domain_cnt_weight)

    # ------------------------------------------------------------------
    def snapshot_bytes(self) -> bytes:
        return flax.serialization.to_bytes(self.state)

    def restore_bytes(self, blob: bytes):
        self.state = flax.serialization.from_bytes(self.state, blob)

    def _cluster_payload(self) -> Dict:
        """Clustering state as a json-able dict — the cluster assignment is
        part of CDC's checkpoint semantics (run.py:455-457 saves
        domain2group_list and s_group2domain_list alongside the model)."""
        return {
            "domain2group_list": list(self.cluster.domain2group_list),
            "s_group2domain_list": [list(g) for g in self.cluster.s_group2domain_list],
            "t_group2domain_list": [list(g) for g in self.cluster.t_group2domain_list],
            "initial_s_group2domain_list": (
                [list(g) for g in self.cluster.initial_s_group2domain_list]
                if self.cluster.initial_s_group2domain_list is not None else None
            ),
            "call_update_group": self.cluster.call_update_group,
            "p_weight": self.cluster.p_weight,
            "matrices": {
                "A": self.cluster.matrix_A, "B": self.cluster.matrix_B,
                "mask": self.cluster.matrix_mask,
                "causal": self.cluster.matrix_causal,
            },
        }

    def _restore_cluster(self, payload: Dict):
        if getattr(self, "cluster", None) is None:
            self.cluster = CDCClusterState.create(
                self.n_domain, self.n_cluster, self.cfg.cdc
            )
        st = self.cluster
        st.domain2group = np.asarray(payload["domain2group_list"], np.int64)
        st.s_group2domain_list = [list(g) for g in payload["s_group2domain_list"]]
        st.t_group2domain_list = [list(g) for g in payload["t_group2domain_list"]]
        init = payload["initial_s_group2domain_list"]
        st.initial_s_group2domain_list = (
            [list(g) for g in init] if init is not None else None)
        st.call_update_group = int(payload["call_update_group"])
        st.p_weight = float(payload["p_weight"])
        m = payload["matrices"]
        # orbax's Json round trip returns nested lists; pickle, ndarrays
        st.matrix_A = np.asarray(m["A"], np.float64)
        st.matrix_B = np.asarray(m["B"], np.float64)
        st.matrix_mask = np.asarray(m["mask"], np.float64)
        st.matrix_causal = (np.asarray(m["causal"], np.float64)
                            if m["causal"] is not None else None)

    def save_checkpoint(self, path: str, extra: Optional[Dict] = None):
        """Persist train state + the clustering state (single-file pickle;
        for versioned/async checkpoints see :meth:`make_checkpointer`)."""
        import pickle

        from tpurec.train.checkpoint import EMBED_LAYOUT_VERSION

        from tpurec.config import config_to_dict

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "state": self.snapshot_bytes(),
            # self-describing (see Trainer.save_checkpoint): serving needs
            # nothing but this file
            "config": config_to_dict(self.cfg),
            "field_dims": list(self.model.field_dims),
            "n_domain": int(self.n_domain),
            "domain_idx": int(self.domain_idx),
            **self._cluster_payload(),
            "best_result": self.stopper.best_result,
            "extra": extra or {},
            "embed_layout": EMBED_LAYOUT_VERSION,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load_checkpoint(self, path: str) -> Dict:
        import pickle

        from tpurec.train.checkpoint import check_embed_layout_version

        with open(path, "rb") as f:
            payload = pickle.load(f)
        check_embed_layout_version(payload.get("embed_layout"), path)
        self.restore_bytes(payload["state"])
        self._restore_cluster(payload)
        return payload

    # ------------------------------------------------------------------
    # versioned / async checkpointing — parity with Trainer.make_checkpointer
    # (VERDICT round-1 item 7).  With checkpoint_backend='orbax' the array
    # flush is ASYNC: the CDC train loop (whose matrix updates already
    # stall it) never waits on checkpoint IO.
    def make_checkpointer(self, directory: str, max_to_keep: int = 3):
        """Versioned checkpoint manager (tpurec.train.checkpoint): backend
        chosen by TrainConfig.checkpoint_backend ('pickle' | 'orbax')."""
        from tpurec.train.checkpoint import make_backend

        return make_backend(
            self.cfg.train.checkpoint_backend, directory, max_to_keep
        )

    def save_versioned(self, backend, step: int, extra: Optional[Dict] = None):
        """Queue a (possibly async) save of train state + cluster state."""
        meta = {"cluster": self._cluster_payload(),
                "best_result": self.stopper.best_result}
        if extra:
            meta["extra"] = extra
        backend.save(step, self.state, meta)

    def load_versioned(self, backend, step: Optional[int] = None) -> Dict:
        state, meta = backend.restore(self.state, step)
        self.state = state
        self._restore_cluster(meta["cluster"])
        return meta

    def fit(self, train, valid, test=None, log_fn=None) -> Dict:
        self.setup_data(train, valid, test)
        # kick the populate-shape compiles off in the background: they
        # overlap the warmup phase and each other (remote compiler is
        # parallel), so the first matrix update doesn't stall on them.
        # MUST be the scaled step count or the warmed shapes miss.
        self.warm_compile(self._scaled_update_matrix_step())
        eval_fn = (self.evaluate_streaming if self._use_streaming_eval
                   else self.evaluate)
        best_cluster = None
        for epoch_i in range(self.cfg.train.epoch):
            t0 = time.time()
            train_loss = self.train_cdc_epoch(epoch_i, log_fn=log_fn)
            result = eval_fn(self.valid_batcher)
            result.update(
                epoch=epoch_i, train_loss=train_loss,
                epoch_seconds=time.time() - t0,
            )
            if log_fn:
                log_fn(result)
            cont = self.stopper.is_continuable(result)
            if self.stopper.improved:
                self._best_bytes = self.snapshot_bytes()
                # cluster assignment is part of checkpoint semantics
                # (run.py:455-457)
                best_cluster = (
                    list(self.cluster.domain2group_list),
                    [list(g) for g in self.cluster.s_group2domain_list],
                )
            if not cont:
                break
        if self._best_bytes is not None:
            self.restore_bytes(self._best_bytes)
            if best_cluster is not None:
                self.cluster.domain2group = np.asarray(best_cluster[0], np.int64)
                self.cluster.s_group2domain_list = best_cluster[1]
        out = {"valid": self.stopper.best_result,
               "domain2group_list": self.cluster.domain2group_list,
               "s_group2domain_list": self.cluster.s_group2domain_list}
        if test is not None:
            out["test"] = eval_fn(self.test_batcher)
        return out
