"""Training/eval harness.

The reference's ``Run`` class (run.py:30-765) split into a reusable Trainer:
epoch loop, weighted-mean-AUC early stopping with patience (run.py:440-468),
best-checkpoint save/reload (run.py:447-459,758-760), and global +
per-domain evaluation (run.py:647-711).
"""

from __future__ import annotations

import os
import pickle

def _jsonable(obj):
    import numpy as _np

    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, _np.ndarray):
        return obj.tolist()
    if isinstance(obj, (_np.integer, _np.floating)):
        return obj.item()
    return obj

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import flax.serialization

from tpurec.config import Config
from tpurec.data.loader import ArrayBatcher, prefetch_iter
from tpurec.metrics import auc_score, evaluate_multi_domain, log_loss_score
from tpurec.models import MULTI_TOWER_OUTPUT, NEEDS_GROUP, build_model
from tpurec.train.reg import reg_coef_tree
from tpurec.train.step import (
    TrainState,
    make_eval_step,
    make_indexed_eval_scan,
    make_optimizer,
    make_scan_train_steps,
    make_train_step,
)


def use_streaming_eval(cfg, mesh) -> bool:
    """eval_streaming=None means auto: histogram (no-host-gather) eval
    whenever running on a mesh — the exact eval's full prediction gather
    is the wrong default for a sharded run.  Single rule shared by
    Trainer and CDCTrainer."""
    es = cfg.train.eval_streaming
    return (mesh is not None) if es is None else bool(es)


class EarlyStopper:
    """mean_auc-keyed early stopping with patience (run.py:440-468)."""

    def __init__(self, patience: int):
        self.patience = patience
        self.trial_counter = 0
        self.best_mean_auc = 0.0
        self.best_result: Optional[Dict] = None

    def is_continuable(self, result: Dict) -> bool:
        key = "mean_auc" if result.get("mean_auc") is not None else "total_auc"
        if result[key] > self.best_mean_auc:
            self.trial_counter = 0
            self.best_mean_auc = result[key]
            self.best_result = result
            return True
        elif self.trial_counter + 1 < self.patience:
            self.trial_counter += 1
            return True
        return False

    @property
    def improved(self) -> bool:
        return self.trial_counter == 0


class Trainer:
    """Standard (non-CDC) training harness for the model zoo."""

    def __init__(self, cfg: Config, field_dims, n_domain: int, domain_idx: int,
                 domain2group=None, mesh=None, shardings=None):
        self.cfg = cfg
        self.n_domain = n_domain
        self.domain_idx = domain_idx
        name = cfg.model.model
        if domain2group is None:
            domain2group = np.zeros(n_domain, np.int32)
        self.domain2group = np.asarray(domain2group, np.int32)
        if name in ("cdc",):
            raise ValueError("use tpurec.cdc.CDCTrainer for CDC")
        if name in ("adl", "adl-split"):
            # run.py:43: adl's n_tower = n_cluster; adl-split uses the grouping
            n_tower = cfg.cdc.n_cluster if name == "adl" else int(self.domain2group.max()) + 1
        else:
            n_tower = int(self.domain2group.max()) + 1
        self.n_tower = n_tower
        self.model = build_model(name, field_dims, n_tower, domain_idx, cfg.model)
        self.multi_tower = name in MULTI_TOWER_OUTPUT and not name.endswith("-single")
        self.mesh = mesh
        self.shardings = shardings

        rng = jax.random.PRNGKey(cfg.train.seed)
        dummy = jnp.zeros((2, len(field_dims)), jnp.int32)
        dummy_group = jnp.zeros((2,), jnp.int32)
        # jit the init: one fused compile instead of hundreds of eager op
        # dispatches (critical on remote-compile TPU backends)
        variables = jax.jit(self.model.init)(rng, dummy, group=dummy_group)
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        self.mutable_keys = tuple(model_state.keys())

        self.reg_coefs = reg_coef_tree(
            params, name,
            cfg.model.l2_reg_embedding, cfg.model.l2_reg_linear, cfg.model.l2_reg_dnn,
        )
        tx = make_optimizer(cfg.train)
        self.embedding_update = cfg.train.embedding_update
        self.sparse_embedding = self.embedding_update in ("sparse", "hybrid")
        if self.sparse_embedding:
            from tpurec.train.sparse import init_sparse_opt_state

            opt_state = init_sparse_opt_state(
                params, tx, cfg.train.embedding_moments_dtype)
        else:
            opt_state = tx.init(params)
        self.state = TrainState(
            params=params,
            opt_state=opt_state,
            model_state=model_state,
            step=jnp.zeros((), jnp.int32),
        )
        if mesh is not None and shardings is not None:
            self.state = jax.device_put(self.state, shardings.state_sharding(self.state))
        if self.sparse_embedding:
            if self.embedding_update == "hybrid":
                from tpurec.train.hybrid import make_hybrid_train_step as mk
            else:
                from tpurec.train.sparse import make_sparse_train_step as mk
            self.train_step, self.tx = mk(
                self.model, cfg.train, self.reg_coefs, self.multi_tower,
                self.mutable_keys, l2_reg_embedding=cfg.model.l2_reg_embedding,
                optimizer=tx,
            )
            self.scan_steps, _ = mk(
                self.model, cfg.train, self.reg_coefs, self.multi_tower,
                self.mutable_keys, l2_reg_embedding=cfg.model.l2_reg_embedding,
                optimizer=tx, scan_k=cfg.train.steps_per_dispatch,
            )
            if self.embedding_update == "hybrid":
                self.scan_steps_idx, _ = mk(
                    self.model, cfg.train, self.reg_coefs, self.multi_tower,
                    self.mutable_keys,
                    l2_reg_embedding=cfg.model.l2_reg_embedding,
                    optimizer=tx, scan_k=cfg.train.steps_per_dispatch,
                    indexed=True,
                )
            else:
                self.scan_steps_idx = None
        else:
            self.train_step, self.tx = make_train_step(
                self.model, cfg.train, self.reg_coefs, self.multi_tower,
                self.mutable_keys, optimizer=tx,
            )
            self.scan_steps, _ = make_scan_train_steps(
                self.model, cfg.train, self.reg_coefs, self.multi_tower,
                self.mutable_keys, optimizer=tx,
            )
            self.scan_steps_idx = None
        self.eval_step = make_eval_step(
            self.model, self.multi_tower,
            compute_dtype=cfg.train.compute_dtype)
        self.eval_scan = make_indexed_eval_scan(
            self.model, self.multi_tower, self.domain_idx,
            compute_dtype=cfg.train.compute_dtype)
        self.dropout_rng = jax.random.PRNGKey(cfg.train.seed + 1)
        self.stopper = EarlyStopper(cfg.train.early_stop)
        self._best_bytes: Optional[bytes] = None

    # ------------------------------------------------------------------
    def _group_of(self, X: np.ndarray) -> np.ndarray:
        return self.domain2group[X[:, self.domain_idx]]

    # datasets up to this size train device-resident (v5e has 16GB HBM;
    # leave room for params/moments/activations)
    DEVICE_RESIDENT_BYTES = 4 << 30

    def _device_dataset(self, X: np.ndarray, y: np.ndarray):
        # small cache so alternating train/valid/test epochs don't re-upload.
        # Holds references to the HOST arrays too: the key uses id(), which
        # CPython reuses after GC — a dead X would let a new same-shape
        # array silently hit the stale device copy.  Aggregate device bytes
        # are capped (16GB HBM on v5e); oldest entries evict first.
        cache = getattr(self, "_dev_data_cache", None)
        if cache is None:
            cache = self._dev_data_cache = {}
        key = (id(X), X.shape, id(y))
        if key not in cache:
            budget = int(1.5 * self.DEVICE_RESIDENT_BYTES)  # aggregate cap
            while cache and (
                sum(e[0].nbytes + e[1].nbytes for e in cache.values())
                + X.nbytes + y.nbytes > budget
                or len(cache) >= 4
            ):
                cache.pop(next(iter(cache)))
            cache[key] = (
                X, y,
                jnp.asarray(X, jnp.int32),
                jnp.asarray(y.astype(np.float32).reshape(-1)),
                jnp.asarray(self.domain2group, jnp.int32),
            )
        return cache[key][2:]

    def _train_epoch_device_resident(self, X, y, epoch_i, log_fn) -> float:
        """Epoch with the dataset on device: only [K, bs] int32 indices
        cross the host->device tunnel per dispatch.  Identical batch
        schedule to the host path (same shuffle rng, same tail padding) —
        host batching measured 90k ex/s end-to-end vs ~230k here."""
        bs = self.cfg.train.bs
        K = max(1, self.cfg.train.steps_per_dispatch)
        Xdev, ydev, d2g = self._device_dataset(X, y)
        n = X.shape[0]
        idx = np.arange(n)
        np.random.default_rng(self.cfg.train.seed + epoch_i).shuffle(idx)
        nb = -(-n // bs)
        pad = nb * bs - n
        mask = np.ones(nb * bs, np.float32)
        if pad:
            idx = np.concatenate([idx, np.zeros(pad, np.int64)])
            mask[n:] = 0.0
        idx = idx.reshape(nb, bs).astype(np.int32)
        mask = mask.reshape(nb, bs)
        # ONE upload for the whole epoch's schedule (per-chunk uploads pay
        # the remote-runtime's ~25ms host->device latency each and
        # serialize the dispatch loop — measured 3x slower)
        idx_dev = jnp.asarray(idx)
        mask_dev = jnp.asarray(mask)

        loss_sum, n_batches, device_losses = 0.0, 0, []

        def synced_loss():
            nonlocal loss_sum, device_losses
            for l in device_losses:
                loss_sum += float(jnp.sum(l))
            device_losses = []
            return loss_sum / max(n_batches, 1)

        # chunk size: every dispatch through the remote runtime costs
        # ~25ms of submission latency, so the whole epoch runs as a few
        # LONG scans (a scan compiles its body once regardless of length);
        # log_interval bounds the chunk so log_fn still fires
        CH = max(K, min(2048, self.cfg.train.log_interval_rows // bs
                        if log_fn is not None else 2048))
        for b0 in range(0, nb, CH):
            k = min(CH, nb - b0)
            self.dropout_rng, r = jax.random.split(self.dropout_rng)
            self.state, losses = self.scan_steps_idx(
                self.state, Xdev, ydev, d2g,
                jax.lax.dynamic_slice_in_dim(idx_dev, b0, k, 0),
                jax.lax.dynamic_slice_in_dim(mask_dev, b0, k, 0),
                jax.random.split(r, k))
            device_losses.append(losses)
            n_batches += k
            if log_fn is not None:
                log_fn({"train_loss": synced_loss(), "epoch": epoch_i,
                        "it": n_batches})
        return synced_loss()

    def train_epoch(self, X: np.ndarray, y: np.ndarray, epoch_i: int,
                    log_fn=None) -> float:
        if (self.scan_steps_idx is not None
                and X.nbytes + y.nbytes <= self.DEVICE_RESIDENT_BYTES):
            return self._train_epoch_device_resident(X, y, epoch_i, log_fn)
        bs = self.cfg.train.bs
        batcher = ArrayBatcher(
            X, y, bs, group=self._group_of(X), shuffle=True,
            rng=np.random.default_rng(self.cfg.train.seed + epoch_i),
        )
        loss_sum, n_batches = 0.0, 0
        log_interval = max(1, self.cfg.train.log_interval_rows // bs)
        K = max(1, self.cfg.train.steps_per_dispatch)
        def chunked():
            """Host side: stack K batches and start their device transfer.
            Runs on the prefetch thread so stacking/H2D overlaps compute."""
            pending = []

            def emit():
                if not pending:
                    return None
                if len(pending) == 1 or K == 1:
                    out = [({k: jnp.asarray(v) for k, v in b.items()}, 1, False)
                           for b in pending]
                else:
                    stacked = {
                        k: jnp.asarray(np.stack([b[k] for b in pending]))
                        for k in pending[0]
                    }
                    out = [(stacked, len(pending), True)]
                pending.clear()
                return out

            for i, batch in enumerate(batcher):
                pending.append(batch)
                if len(pending) == K:
                    yield from emit()
            e = emit()
            if e:
                yield from e

        device_losses = []

        def synced_loss():
            nonlocal loss_sum, device_losses
            for l in device_losses:
                loss_sum += float(jnp.sum(l))
            device_losses = []
            return loss_sum / max(n_batches, 1)

        rows_since_log = 0
        for stacked, count, is_scan in prefetch_iter(chunked(), depth=2):
            self.dropout_rng, r = jax.random.split(self.dropout_rng)
            if is_scan:
                rngs = jax.random.split(r, count)
                self.state, losses = self.scan_steps(self.state, stacked, rngs)
            else:
                self.state, losses = self.train_step(self.state, stacked, r)
            # keep losses on device; host-sync only at log points / epoch end
            device_losses.append(losses)
            n_batches += count
            rows_since_log += count
            if log_fn is not None and rows_since_log >= log_interval:
                log_fn({"train_loss": synced_loss(), "epoch": epoch_i,
                        "it": n_batches})
                rows_since_log = 0
        return synced_loss()

    def train_epoch_multihost(self, X_local: np.ndarray, y_local: np.ndarray,
                              n_global_rows: int, epoch_i: int,
                              log_fn=None) -> float:
        """One epoch where each process feeds only ITS dataset shard of a
        global (data, model) mesh.  Load ``X_local`` with
        ``GlobalBatchFeed(mesh).dataset_range(n_global_rows)`` — it derives
        the range from the data blocks this process's devices actually own
        (consistent with the per-step batch split even when block
        ownership is non-uniform; the plain even split
        ``feed.process_shard`` matches it only in the uniform case).
        Every process runs the same n_batches collective steps
        (feed.epoch_plan); short local streams are padded with
        fully-masked filler batches — the global batch still carries the
        other hosts' real rows, and masked rows contribute nothing to the
        loss, gradients, or BatchNorm statistics.

        On a single-process mesh this degrades to the host-batching epoch
        with explicitly data-sharded inputs (tests cover that path; the
        multi-process assembly is the same code via
        jax.make_array_from_process_local_data).
        """
        if self.mesh is None:
            raise ValueError("train_epoch_multihost requires a mesh")
        from tpurec.parallel.feed import GlobalBatchFeed, epoch_plan

        bs = self.cfg.train.bs
        feed = GlobalBatchFeed(self.mesh, self.cfg.mesh.data_axis)
        nb, bs_local = epoch_plan(n_global_rows, bs, feed)
        K = max(1, self.cfg.train.steps_per_dispatch)
        batcher = ArrayBatcher(
            X_local, y_local, bs_local, group=self._group_of(X_local),
            shuffle=True,
            rng=np.random.default_rng(
                self.cfg.train.seed + epoch_i + 7919 * jax.process_index()),
        ) if len(X_local) else None
        n_fields = X_local.shape[1] if X_local.ndim == 2 else len(
            self.model.field_dims)
        filler = {
            "x": np.zeros((bs_local, n_fields), np.int32),
            "y": np.zeros(bs_local, np.float32),
            "group": np.zeros(bs_local, np.int32),
            "mask": np.zeros(bs_local, np.float32),
        }

        def local_stream():
            # NOTE on the epoch loss: every one of the nb steps carries at
            # least one real row GLOBALLY (nb = ceil(n_global/bs) and real
            # rows precede filler in every process's stream), and the
            # per-step loss is the mask-weighted mean over the GLOBAL
            # batch — identical on every process.  Averaging the nb
            # per-step means matches the host path's per-batch averaging.
            produced = 0
            if batcher is not None:
                for b in batcher:
                    if produced == nb:
                        # only reachable when this process's shard exceeds
                        # its data-axis share (see feed.dataset_range);
                        # the surplus rows wait for the next epoch's
                        # reshuffle rather than deadlocking the collective
                        break
                    produced += 1
                    yield b
            while produced < nb:
                produced += 1
                yield filler

        n_batches = 0
        pending = []
        device_losses = []  # per-dispatch sums; fetched once at epoch end
        fetched_sum, rows_since_log = 0.0, 0
        log_interval = max(1, self.cfg.train.log_interval_rows // bs)
        for batch in local_stream():
            pending.append(batch)
            if len(pending) < K and n_batches + len(pending) < nb:
                continue
            stacked = {k: np.stack([b[k] for b in pending])
                       for k in pending[0]}
            gb = feed.global_stacked_batch(stacked, bs)
            self.dropout_rng, r = jax.random.split(self.dropout_rng)
            if len(pending) == 1:
                gb1 = {k: v[0] for k, v in gb.items()}
                self.state, losses = self.train_step(self.state, gb1, r)
            else:
                self.state, losses = self.scan_steps(
                    self.state, gb, jax.random.split(r, len(pending)))
            # keep the sum on device: a per-dispatch host sync would
            # serialize the next dispatch's batch staging + cross-process
            # assembly with this dispatch's compute
            device_losses.append(jnp.sum(losses))
            n_batches += len(pending)
            rows_since_log += len(pending)
            pending = []
            if log_fn is not None and rows_since_log >= log_interval:
                # drain the pending device sums into a running host total
                # (one O(1) fetch per log tick, not an O(n) reconversion of
                # every prior dispatch — that silently re-serialized the
                # epoch whenever logging was on)
                fetched_sum += float(np.sum(
                    [np.asarray(l) for l in device_losses]))
                device_losses.clear()
                rows_since_log = 0
                log_fn({"train_loss": fetched_sum / n_batches,
                        "epoch": epoch_i, "it": n_batches})
        loss_sum = fetched_sum + (
            float(np.sum([np.asarray(l) for l in device_losses]))
            if device_losses else 0.0)
        return loss_sum / max(n_batches, 1)

    EVAL_CHUNK = 128  # batches per eval dispatch (device-resident path)

    @staticmethod
    def _padded_index_batches(n: int, bs: int, chunk: int):
        """[nb, bs] row-index batches padded to a CHUNK-aligned batch count
        (a ragged tail would force a second scan compile — the trip count is
        baked into the executable).  Pad entries index row 0 with mask 0.
        Returns (idx int32, mask f32, chunk_used)."""
        nb = -(-n // bs)
        ch = min(chunk, nb)
        nb = -(-nb // ch) * ch
        idx = np.zeros(nb * bs, dtype=np.int32)
        idx[:n] = np.arange(n, dtype=np.int32)
        mask = np.zeros(nb * bs, dtype=np.float32)
        mask[:n] = 1.0
        return idx.reshape(nb, bs), mask.reshape(nb, bs), ch

    @property
    def _use_streaming_eval(self) -> bool:
        return use_streaming_eval(self.cfg, self.mesh)

    def evaluate(self, X: np.ndarray, y: np.ndarray,
                 domain_cnt_weight: Optional[np.ndarray] = None) -> Dict:
        if X.shape[0] == 0:
            raise ValueError("evaluate: empty eval split")
        predicts = self.predict(X, _y_for_cache=y)
        targets = y.reshape(-1)
        result = {
            "total_auc": auc_score(targets, predicts),
            "total_loss": log_loss_score(targets, predicts),
        }
        if self.cfg.train.is_evaluate_multi_domain and domain_cnt_weight is not None:
            result.update(
                evaluate_multi_domain(
                    targets, predicts, X[:, self.domain_idx], domain_cnt_weight
                )
            )
        return result

    def predict(self, X: np.ndarray,
                _y_for_cache: Optional[np.ndarray] = None) -> np.ndarray:
        """Probabilities [N] for raw id rows (each row's tower selected by
        its domain's group) — the library-level scoring call.  For
        serving-grade scoring (AOT warmup, table quantization, hash spec)
        use tpurec.serve.Predictor."""
        if X.shape[0] == 0:
            return np.zeros(0, np.float32)
        zero_y_nbytes = X.shape[0] * 4
        resident = X.nbytes + zero_y_nbytes <= self.DEVICE_RESIDENT_BYTES
        if _y_for_cache is not None:
            y = _y_for_cache
        elif resident:
            # reuse ONE zero-label array per X so the device-dataset cache
            # key (id(X), shape, id(y)) repeats across predict(X) calls —
            # a fresh zeros() every call would re-upload X each time.
            # Values hold a reference to X: id() keys are only valid while
            # the keyed object is alive.  Host-batching (oversized) inputs
            # skip the cache: it would pin X for nothing.
            zc = getattr(self, "_zero_y_cache", None)
            if zc is None:
                zc = self._zero_y_cache = {}
            key = (id(X), X.shape[0])
            ent = zc.get(key)
            if ent is None or ent[0] is not X:
                while len(zc) >= 4:
                    zc.pop(next(iter(zc)))
                ent = zc[key] = (X, np.zeros(X.shape[0], np.float32))
            y = ent[1]
        else:
            y = np.zeros(X.shape[0], np.float32)
        bs = self.cfg.train.bs
        if resident:
            # device-resident: gather batches by index on device, predict
            # EVAL_CHUNK batches per dispatch, one host fetch per chunk
            Xdev, _, d2g = self._device_dataset(X, y)
            n = X.shape[0]
            # predictions past n are discarded by the final slice; the
            # chunk adapts down for small splits so padding waste stays <2x
            idx, _, ch = self._padded_index_batches(n, bs, self.EVAL_CHUNK)
            nb = idx.shape[0]
            preds = []
            for b0 in range(0, nb, ch):
                chunk = jnp.asarray(idx[b0:b0 + ch])
                ps = self.eval_scan(
                    self.state.params, self.state.model_state, Xdev, d2g, chunk)
                preds.append(ps)  # device-side; deferred fetch below keeps
                # the next chunk's staging overlapped with this compute
            predicts = np.concatenate(
                [np.asarray(p).reshape(-1) for p in preds])[:n]
        else:
            batcher = ArrayBatcher(X, y, bs, group=self._group_of(X), shuffle=False)
            preds = []
            for batch in batcher:
                p = self.eval_step(
                    self.state.params, self.state.model_state,
                    {k: jnp.asarray(v) for k, v in batch.items()},
                )
                preds.append((p, batch["mask"]))  # deferred fetch
            predicts = np.concatenate(
                [np.asarray(p)[mask > 0] for p, mask in preds])
        return predicts

    def evaluate_streaming(self, X: np.ndarray, y: np.ndarray,
                           domain_cnt_weight: Optional[np.ndarray] = None,
                           n_bins: int = 8192) -> Dict:
        """Eval without hauling predictions to host (SURVEY.md §7 hard
        part 5): per-(domain, bin) AUC histograms + per-domain loss sums
        accumulate on device; the host fetches only
        2x[n_domain, n_bins] + 2x[n_domain] at the end.

        AUC error is O(1/n_bins) (<1e-4 at the default 8192 bins, bounded
        vs the exact AUC in tests); LogLoss is exact up to f32 accumulation.
        Same result keys as :meth:`evaluate`.  This is the eval to use on a
        multi-chip mesh or when the prediction set is too large to gather.
        """
        from tpurec.metrics import streaming_eval_result
        from tpurec.train.step import make_streaming_eval_scan

        bs = self.cfg.train.bs
        cache = getattr(self, "_stream_eval_cache", None)
        if cache is None:
            cache = self._stream_eval_cache = {}
        key = n_bins
        if key not in cache:
            cache[key] = make_streaming_eval_scan(
                self.model, self.multi_tower, self.domain_idx,
                self.n_domain, n_bins, self.cfg.train.compute_dtype)
        scan_hist, init_carry = cache[key]

        from tpurec.train.step import HostHistAccumulator

        n = X.shape[0]
        if n == 0:
            raise ValueError("evaluate_streaming: empty eval split")
        # device-side f32 carries flush into f64 host totals periodically so
        # counts stay exact at any eval-split size (f32 alone saturates at
        # 2^24 rows per accumulator cell)
        acc = HostHistAccumulator(init_carry)

        def run_window(Xdev, ydev, d2g, n_rows):
            idx, mask, ch = self._padded_index_batches(n_rows, bs, self.EVAL_CHUNK)
            for b0 in range(0, idx.shape[0], ch):
                acc.update(scan_hist(
                    self.state.params, self.state.model_state, Xdev, ydev,
                    d2g,
                    (jnp.asarray(idx[b0:b0 + ch]),
                     jnp.asarray(mask[b0:b0 + ch])),
                    *acc.carry))

        if X.nbytes + y.nbytes <= self.DEVICE_RESIDENT_BYTES:
            Xdev, ydev, d2g = self._device_dataset(X, y)
            run_window(Xdev, ydev, d2g, n)
        else:
            # dataset exceeds the HBM budget: stream it through fixed-size
            # row windows (constant [W, F] device shapes -> one compile;
            # the tail window is zero-padded and masked out).  The
            # histogram carry keeps accumulating across windows — this is
            # the path for eval splits too large to hold on device.
            row_bytes = 4 * X.shape[1] + 4  # int32 ids + f32 label on device
            W = max(bs, (self.DEVICE_RESIDENT_BYTES // row_bytes) // bs * bs)
            d2g = jnp.asarray(self.domain2group, jnp.int32)
            yf = y.astype(np.float32).reshape(-1)
            for w0 in range(0, n, W):
                Xw = np.asarray(X[w0:w0 + W], dtype=np.int32)
                yw = yf[w0:w0 + W]
                nw = Xw.shape[0]
                if nw < W:
                    Xw = np.concatenate(
                        [Xw, np.zeros((W - nw, X.shape[1]), np.int32)])
                    yw = np.concatenate([yw, np.zeros(W - nw, np.float32)])
                run_window(jnp.asarray(Xw), jnp.asarray(yw), d2g, nw)
        pos, neg, lsum, lcnt = acc.totals()
        return streaming_eval_result(
            pos.reshape(self.n_domain, n_bins),
            neg.reshape(self.n_domain, n_bins), lsum, lcnt,
            domain_cnt_weight
            if self.cfg.train.is_evaluate_multi_domain else None)

    def evaluate_streaming_multihost(self, X_local: np.ndarray,
                                     y_local: np.ndarray,
                                     n_global_rows: int,
                                     domain_cnt_weight: Optional[np.ndarray] = None,
                                     n_bins: int = 8192) -> Dict:
        """Multi-host streaming eval: each process feeds only ITS dataset
        shard of the global mesh (same contract as train_epoch_multihost);
        histograms are replicated accumulators, so the sharded scatter-adds
        all-reduce over the mesh and every process returns the identical
        full-eval result.  No prediction is ever gathered to host."""
        if self.mesh is None:
            raise ValueError("evaluate_streaming_multihost requires a mesh")
        from tpurec.metrics import streaming_eval_result
        from tpurec.parallel.feed import GlobalBatchFeed, epoch_plan
        from tpurec.train.step import make_streaming_eval_batch_scan

        bs = self.cfg.train.bs
        cache = getattr(self, "_stream_eval_mh_cache", None)
        if cache is None:
            cache = self._stream_eval_mh_cache = {}
        if n_bins not in cache:
            cache[n_bins] = make_streaming_eval_batch_scan(
                self.model, self.multi_tower, self.domain_idx,
                self.n_domain, n_bins, self.cfg.train.compute_dtype)
        hist_scan, init_carry = cache[n_bins]

        from tpurec.train.step import HostHistAccumulator

        feed = GlobalBatchFeed(self.mesh, self.cfg.mesh.data_axis)
        nb, bs_local = epoch_plan(n_global_rows, bs, feed)
        K = self.EVAL_CHUNK
        # pad the GLOBAL batch count to a chunk multiple with masked filler
        # (a ragged final chunk would force a second scan compile; nb is
        # globally agreed so every process pads identically)
        nb_pad = -(-nb // min(K, nb)) * min(K, nb)
        batcher = ArrayBatcher(
            X_local, y_local, bs_local, group=self._group_of(X_local),
            shuffle=False,
        ) if len(X_local) else None
        n_fields = (X_local.shape[1] if X_local.ndim == 2
                    else len(self.model.field_dims))
        filler = {
            "x": np.zeros((bs_local, n_fields), np.int32),
            "y": np.zeros(bs_local, np.float32),
            "group": np.zeros(bs_local, np.int32),
            "mask": np.zeros(bs_local, np.float32),
        }

        def local_stream():
            produced = 0
            if batcher is not None:
                for b in batcher:
                    if produced == nb:
                        # unlike the TRAIN epoch (where surplus rows wait for
                        # the next reshuffle), eval has no next pass — rows
                        # silently dropped here would skew every process's
                        # result, so refuse instead
                        raise ValueError(
                            f"X_local has more rows than this process's "
                            f"share of the {n_global_rows}-row global eval "
                            f"({nb} global batches x {bs_local} local rows)")
                    produced += 1
                    yield b
            while produced < nb_pad:
                produced += 1
                yield filler

        acc = HostHistAccumulator(
            init_carry,
            placement=(self.shardings.replicated()
                       if self.shardings is not None else None))
        pending = []
        for batch in local_stream():
            pending.append(batch)
            if len(pending) < min(K, nb_pad):
                continue
            stacked = {k: np.stack([b[k] for b in pending])
                       for k in pending[0]}
            gb = feed.global_stacked_batch(stacked, bs)
            acc.update(hist_scan(
                self.state.params, self.state.model_state, *acc.carry, gb))
            pending = []
        assert not pending, "nb_pad must be a chunk multiple"
        pos, neg, lsum, lcnt = acc.totals()
        return streaming_eval_result(
            pos.reshape(self.n_domain, n_bins),
            neg.reshape(self.n_domain, n_bins), lsum, lcnt,
            domain_cnt_weight
            if self.cfg.train.is_evaluate_multi_domain else None)

    # ------------------------------------------------------------------
    def snapshot(self) -> bytes:
        return flax.serialization.to_bytes(self.state)

    def restore(self, blob: bytes):
        self.state = flax.serialization.from_bytes(self.state, blob)

    def save_checkpoint(self, path: str, extra: Optional[Dict] = None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        from tpurec.train.checkpoint import EMBED_LAYOUT_VERSION

        from tpurec.config import config_to_dict

        payload = {
            "state": self.snapshot(),
            "best_result": self.stopper.best_result,
            "config_model": self.cfg.model.model,
            # self-describing checkpoint: full config + dataset schema, so
            # serving (tpurec.serve.Predictor.from_checkpoint_file) needs
            # nothing but this file
            "config": config_to_dict(self.cfg),
            "field_dims": list(self.model.field_dims),
            "n_domain": int(self.n_domain),
            "domain_idx": int(self.domain_idx),
            "domain2group": [int(g) for g in self.domain2group],
            "extra": extra or {},
            "embed_layout": EMBED_LAYOUT_VERSION,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load_checkpoint(self, path: str) -> Dict:
        from tpurec.train.checkpoint import check_embed_layout_version

        with open(path, "rb") as f:
            payload = pickle.load(f)
        check_embed_layout_version(payload.get("embed_layout"), path)
        self.restore(payload["state"])
        return payload

    # -- backend-based (versioned / async-orbax) checkpoints -----------
    def make_checkpointer(self, directory: str, max_to_keep: int = 3):
        """Versioned checkpoint manager (tpurec.train.checkpoint): backend
        chosen by TrainConfig.checkpoint_backend ('pickle' | 'orbax'; orbax
        writes asynchronously so training overlaps the flush)."""
        from tpurec.train.checkpoint import make_backend

        return make_backend(
            self.cfg.train.checkpoint_backend, directory, max_to_keep
        )

    def save_versioned(self, backend, step: int, extra: Optional[Dict] = None):
        meta = {
            "best_result": _jsonable(self.stopper.best_result),
            "config_model": self.cfg.model.model,
        }
        if extra:
            meta["extra"] = extra
        backend.save(step, self.state, meta)

    def load_versioned(self, backend, step: Optional[int] = None) -> Dict:
        state, meta = backend.restore(self.state, step)
        self.state = state
        return meta

    # ------------------------------------------------------------------
    def fit(self, train, valid, test=None, domain_cnt_weight=None, log_fn=None) -> Dict:
        """Epoch loop with early stop + best-state reload (run.py:746-764)."""
        Xtr, ytr = train
        Xva, yva = valid
        if domain_cnt_weight is None:
            cnt = np.bincount(Xtr[:, self.domain_idx], minlength=self.n_domain)
            domain_cnt_weight = cnt / cnt.sum()
        eval_fn = (self.evaluate_streaming if self._use_streaming_eval
                   else self.evaluate)
        for epoch_i in range(self.cfg.train.epoch):
            t0 = time.time()
            train_loss = self.train_epoch(Xtr, ytr, epoch_i, log_fn=log_fn)
            result = eval_fn(Xva, yva, domain_cnt_weight)
            result["epoch"] = epoch_i
            result["train_loss"] = train_loss
            result["epoch_seconds"] = time.time() - t0
            if log_fn is not None:
                log_fn(result)
            cont = self.stopper.is_continuable(result)
            if self.stopper.improved:
                self._best_bytes = self.snapshot()
            if not cont:
                break
        if self._best_bytes is not None:
            self.restore(self._best_bytes)
        out = {"valid": self.stopper.best_result}
        if test is not None:
            out["test"] = eval_fn(test[0], test[1], domain_cnt_weight)
        return out
