"""Low-latency serving for trained zoo / CDC models.

The reference has no serving path at all — inference there is the
evaluation loop (run.py:647-688).  Production CTR ranking needs one, so
this module is a new-build framework surface:

- :class:`Predictor` — AOT-warmed jitted forward for a fixed set of batch
  sizes; arbitrary request sizes are chunked/padded to compiled shapes
  (static shapes: zero recompiles at serve time).
- Embedding-table quantization (``table_dtype``): the table dominates both
  model bytes (26M of 26.7M params at Ali-CCP scale) and the serve-time
  gather traffic, so shrinking IT is the classic recsys serving lever:
  * ``"bfloat16"`` — 2x smaller rows, values round-tripped through bf16.
  * ``"int8"``     — 4x smaller rows: symmetric per-row quantization
    (scale = max|row| / 127, stored as a [V] f32 side array); dequant is
    one multiply fused into the gather consumer.
  Dense (non-embedding) params stay f32 — they are ~0.7M params and the
  MXU work on them is not the serve bottleneck.
- Group routing matches training: multi-tower models select the
  ``domain2group[domain]`` tower (run.py:481-484 semantics); CDC
  checkpoints serve their persisted clustering (run.py:455-457).

Usage::

    pred = Predictor(cfg, field_dims, n_domain, domain_idx,
                     domain2group=groups, table_dtype="int8")
    pred.load_checkpoint("ckpt.pkl")      # Trainer or CDCTrainer payload
    probs = pred(X)                        # np.ndarray [N] probabilities
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpurec.config import Config
from tpurec.models import MULTI_TOWER_OUTPUT, build_model
from tpurec.nn.core import EmbeddingLayout, mixed_table_lookup
from tpurec.nn.precision import compute_dtype as _precision_scope
from tpurec.train.step import select_tower

_TABLE_DTYPES = ("float32", "bfloat16", "int8")


def quantize_table(table: np.ndarray, dtype: str):
    """-> (qtable, scales|None).

    int8: symmetric per-row, scale = max|row|/127 (scale 1.0 for all-zero
    rows so dequant stays exact).  bfloat16: plain cast.  float32: no-op.
    """
    if dtype == "float32":
        return np.asarray(table, np.float32), None
    if dtype == "bfloat16":
        return np.asarray(jnp.asarray(table).astype(jnp.bfloat16)), None
    if dtype == "int8":
        t = np.asarray(table, np.float32)
        amax = np.max(np.abs(t), axis=1)
        scales = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.rint(t / scales[:, None]), -127, 127).astype(np.int8)
        return q, scales
    raise ValueError(f"table_dtype must be one of {_TABLE_DTYPES}, got {dtype!r}")


class Predictor:
    """AOT-compiled batch predictor for any zoo model or a CDC checkpoint.

    ``cfg`` must be the TRAINING config (same model hyperparameters); for
    ``cfg.model.model == "cdc"`` the served network is the CDC base model
    with ``n_tower = n_cluster`` and the checkpoint's persisted clustering
    as the routing table (engine.py builds it the same way).
    """

    def __init__(self, cfg: Config, field_dims, n_domain: int,
                 domain_idx: int, domain2group=None,
                 batch_sizes: Sequence[int] = (512,),
                 table_dtype: str = "float32"):
        if table_dtype not in _TABLE_DTYPES:
            raise ValueError(
                f"table_dtype must be one of {_TABLE_DTYPES}, got {table_dtype!r}")
        self.cfg = cfg
        self.field_dims = tuple(int(d) for d in field_dims)
        self.n_domain = int(n_domain)
        self.domain_idx = int(domain_idx)
        self.table_dtype = table_dtype
        self.batch_sizes = tuple(sorted(set(int(b) for b in batch_sizes)))
        if not self.batch_sizes:
            raise ValueError("need at least one batch size")

        name = cfg.model.model
        if name == "cdc":
            # CDC serves its base model at n_tower=n_cluster (engine.py
            # mirrors run.py:43/424-425, incl. the expert/tower dim remap)
            base_cfg = dataclasses.replace(
                cfg.model,
                model=cfg.cdc.base_model,
                mmoe_expert_dims=cfg.model.mlp_dims,
                mmoe_tower_dims=cfg.cdc.cdc_tower_dims,
                ple_tower_dims=cfg.cdc.cdc_tower_dims,
                tower_dims=cfg.cdc.cdc_tower_dims,
            )
            name = cfg.cdc.base_model
            n_tower = cfg.cdc.n_cluster
            mcfg = base_cfg
            if domain2group is None:
                domain2group = np.zeros(n_domain, np.int32)
        else:
            mcfg = cfg.model
            if domain2group is None:
                domain2group = np.zeros(n_domain, np.int32)
            if name in ("adl",):
                n_tower = cfg.cdc.n_cluster  # run.py:43
            else:
                n_tower = int(np.max(domain2group)) + 1
        self.model_name = name
        self.domain2group = np.asarray(domain2group, np.int32)
        # feature-hashing spec from the training config: raw request ids on
        # hashed fields are bucketed exactly like the training load path
        # (tpurec.data.hashing, salt = field index)
        self.hash_buckets = dict(cfg.data.hash_buckets or ())
        self.model = build_model(name, self.field_dims, n_tower,
                                 domain_idx, mcfg)
        self.multi_tower = (name in MULTI_TOWER_OUTPUT
                            and not name.endswith("-single"))
        self.layout = EmbeddingLayout(self.field_dims)
        self._fns: Dict[int, callable] = {}
        # device-side state, set by load_*
        self._qtable = None
        self._scales = None
        self._rest = None
        self._model_state = None
        self._d2g_dev = None

    # -- loading -------------------------------------------------------
    def load_variables(self, params, model_state: Optional[Dict] = None):
        """Install trained variables (quantizing the embedding table)."""
        table = np.asarray(params["embedding"]["table"])
        q, s = quantize_table(table, self.table_dtype)
        self._qtable = jnp.asarray(q)
        self._scales = None if s is None else jnp.asarray(s)
        self._rest = jax.device_put(
            {k: v for k, v in params.items() if k != "embedding"})
        self._model_state = jax.device_put(dict(model_state or {}))
        self._d2g_dev = jnp.asarray(self.domain2group, jnp.int32)
        return self

    def load_from_trainer(self, trainer):
        """Pull the current state out of a live Trainer / CDCTrainer."""
        st = trainer.state
        return self.load_variables(
            jax.tree.map(np.asarray, st.params),
            jax.tree.map(np.asarray, st.model_state),
        )

    def load_checkpoint(self, path: str, payload: Optional[Dict] = None):
        """Load a Trainer or CDCTrainer ``save_checkpoint`` file.

        Both payload kinds persist the routing table (CDC its clustering,
        run.py:455-457; Trainer its ``domain2group``) — when present it
        REPLACES the constructor's grouping, so serving always routes the
        way training did.  State bytes are msgpack-decoded directly
        (flax.serialization.msgpack_restore): only params + model
        collections are pulled out — no throwaway trainer, no optimizer
        moments, no extra model-init compile.
        """
        import flax.serialization as fser

        from tpurec.train.checkpoint import check_embed_layout_version

        if payload is None:
            payload = _load_payload(path)
        check_embed_layout_version(payload.get("embed_layout"), path)
        d2g = payload.get("domain2group_list", payload.get("domain2group"))
        if d2g is not None:
            d2g = np.asarray(d2g, np.int32)
            n_tower = int(self.model.n_tower)
            if d2g.size and int(d2g.max()) >= n_tower:
                raise ValueError(
                    f"checkpoint grouping routes to tower {int(d2g.max())} "
                    f"but the model was built with n_tower={n_tower}; "
                    "construct the Predictor with the matching "
                    "domain2group/config")
            self.domain2group = d2g
        raw = fser.msgpack_restore(payload["state"])
        model_state = raw.get("model_state") or {}
        return self.load_variables(raw["params"], model_state)

    # -- compiled forward ----------------------------------------------
    def _build_fn(self, bs: int):
        model, layout = self.model, self.layout
        D = self.cfg.model.embed_dim
        multi_tower, domain_idx = self.multi_tower, self.domain_idx
        offsets = jnp.asarray(self.layout.offsets)
        compute_dtype = self.cfg.train.compute_dtype

        @jax.jit
        def run(qtable, scales, rest, model_state, d2g, x):
            rows = mixed_table_lookup(qtable, x, layout)  # [B, F, D] (q)
            rows = rows.astype(jnp.float32)
            if scales is not None:
                s = jnp.take(scales, x + offsets[None, :], axis=0)  # [B, F]
                rows = rows * s[:, :, None]
            group = jnp.take(d2g, x[:, domain_idx], axis=0)
            # same precision policy as the training-time eval forward
            # (train/step.py make_eval_step): a bf16-compute-trained model
            # serves the math its validation AUC was measured with
            with _precision_scope(compute_dtype):
                out = model.apply(
                    {"params": rest, **model_state},
                    x, group=group, train=False,
                    embed_rows=rows.reshape(-1, D),
                )
            logit = select_tower(out, group) if multi_tower else out
            return jax.nn.sigmoid(logit)

        return run

    def _fn(self, bs: int):
        if bs not in self._fns:
            self._fns[bs] = self._build_fn(bs)
        return self._fns[bs]

    def warm(self):
        """AOT-compile every configured batch size (serve-time = 0 compiles).

        Batch sizes compile CONCURRENTLY: the remote-TPU compiler is
        parallel and a cold compile runs 20-40s per shape, so warming
        N shapes costs ~one compile instead of N (same trick as
        CDCTrainer.warm_compile)."""
        if self._qtable is None:
            raise RuntimeError("load_variables/load_checkpoint first")

        def one(bs):
            x = jnp.zeros((bs, len(self.field_dims)), jnp.int32)
            self._fn(bs)(self._qtable, self._scales, self._rest,
                         self._model_state, self._d2g_dev, x)

        if len(self.batch_sizes) == 1:
            one(self.batch_sizes[0])
            return self
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(len(self.batch_sizes)) as ex:
            list(ex.map(one, self.batch_sizes))
        return self

    def predict_async(self, X: np.ndarray):
        """Submit the scoring dispatches for X [N, F] WITHOUT blocking on
        device results; returns a zero-arg callable yielding the [N]
        probabilities.

        JAX dispatch is asynchronous — the device (and the dispatch
        round-trip to it) proceeds between submit and fetch.  A serving
        host that serializes only the SUBMISSION (and fetches outside
        its lock) therefore pipelines concurrent requests across the
        dispatch latency instead of holding every other request for a
        full round-trip (scripts/bench_serve_latency.py measures the
        difference; it is large on RTT-bound links).
        """
        if self._qtable is None:
            raise RuntimeError("load_variables/load_checkpoint first")
        X = np.asarray(X)
        if self.hash_buckets:
            from tpurec.data.hashing import hash_ids

            X = X.astype(np.int64, copy=True)
            for f, nb in self.hash_buckets.items():
                X[:, f] = hash_ids(X[:, f], nb, salt=f)
        # normalize AFTER hashing: bucket ids and in-vocab ids both fit
        # int32, and one dtype means one compiled executable
        X = X.astype(np.int32)
        n = X.shape[0]
        bs = self.batch_sizes[-1]
        fn = self._fn(bs)
        parts = []  # (in-flight device array, rows to keep)
        for lo in range(0, n, bs):
            hi = min(lo + bs, n)
            xb = X[lo:hi]
            if hi - lo < bs:
                # smallest configured size that fits the tail (pad rows
                # use id 0 per field — always in-vocab)
                bs_t = next(b for b in self.batch_sizes if b >= hi - lo) \
                    if (hi - lo) <= self.batch_sizes[-1] else bs
                fn_t = self._fn(bs_t)
                pad = np.zeros((bs_t - (hi - lo), X.shape[1]), X.dtype)
                p = fn_t(self._qtable, self._scales, self._rest,
                         self._model_state, self._d2g_dev,
                         jnp.asarray(np.concatenate([xb, pad])))
            else:
                p = fn(self._qtable, self._scales, self._rest,
                       self._model_state, self._d2g_dev, jnp.asarray(xb))
            parts.append((p, hi - lo))

        def result() -> np.ndarray:
            out = np.empty((n,), np.float32)
            lo = 0
            for p, take in parts:
                out[lo:lo + take] = np.asarray(p)[:take]
                lo += take
            return out

        return result

    def __call__(self, X: np.ndarray) -> np.ndarray:
        """X [N, F] int -> probabilities [N] (np.float32).

        Requests are served in chunks of the largest configured batch
        size; the ragged tail is padded and sliced off.  Blocking form of
        :meth:`predict_async`.
        """
        return self.predict_async(X)()

    # -- memory accounting --------------------------------------------
    def table_bytes(self) -> Tuple[int, int]:
        """(quantized bytes incl. scales, float32-equivalent bytes)."""
        if self._qtable is None:
            raise RuntimeError("load_variables/load_checkpoint first")
        q = self._qtable.size * self._qtable.dtype.itemsize
        if self._scales is not None:
            q += self._scales.size * 4
        return int(q), int(self._qtable.size * 4)


def _load_payload(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def predictor_from_checkpoint(path: str,
                              batch_sizes: Sequence[int] = (512,),
                              table_dtype: str = "float32",
                              cfg: Optional[Config] = None) -> Predictor:
    """Build + load a Predictor from a SELF-DESCRIBING checkpoint.

    Trainer/CDCTrainer checkpoints embed the full training config and the
    dataset schema (field_dims/n_domain/domain_idx/grouping), so this
    needs nothing but the file.  ``cfg`` overrides the embedded config
    (e.g. for older checkpoints that predate the embedding).

    TRUST BOUNDARY: the checkpoint envelope is a pickle (only the inner
    state bytes are msgpack), and unpickling executes arbitrary code —
    load checkpoints ONLY from paths you produced or trust, exactly as
    with ``torch.load`` on the reference's checkpoints (run.py:447-459).
    """
    payload = _load_payload(path)
    if cfg is None:
        if "config" not in payload:
            raise ValueError(
                f"{path} predates self-describing checkpoints; pass cfg=")
        from tpurec.config import config_from_dict

        cfg = config_from_dict(payload["config"])
    field_dims = payload.get("field_dims")
    if field_dims is None:
        raise ValueError(f"{path} has no field_dims; re-save the checkpoint")
    d2g = payload.get("domain2group_list", payload.get("domain2group"))
    pred = Predictor(
        cfg, field_dims, payload["n_domain"], payload["domain_idx"],
        domain2group=None if d2g is None else np.asarray(d2g, np.int32),
        batch_sizes=batch_sizes, table_dtype=table_dtype,
    )
    return pred.load_checkpoint(path, payload=payload)


def main(argv=None):
    """Score a table of categorical ids with a trained checkpoint.

        python -m tpurec.serve --ckpt ckpt.pkl --input X.npy \
            --output probs.npy --table_dtype int8 --bs 4096

    ``--input``: .npy int array [N, F] (field-local ids, same schema as
    training) or a headerless CSV of ints.  Output: .npy float32 [N]
    probabilities (or CSV if --output ends in .csv).
    """
    import argparse

    p = argparse.ArgumentParser(description="tpurec serving CLI")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--bs", type=int, default=4096)
    p.add_argument("--table_dtype", default="float32",
                   choices=list(_TABLE_DTYPES))
    args = p.parse_args(argv)

    if args.input.endswith(".npy"):
        X = np.load(args.input)
    else:
        X = np.loadtxt(args.input, delimiter=",", dtype=np.int64)
    # keep int64: hash-trained checkpoints accept RAW ids wider than int32
    # (the Predictor hashes, then narrows)
    X = np.atleast_2d(np.asarray(X, np.int64))

    pred = predictor_from_checkpoint(
        args.ckpt, batch_sizes=(args.bs,), table_dtype=args.table_dtype)
    probs = pred(X)
    if args.output.endswith(".csv"):
        np.savetxt(args.output, probs, fmt="%.6f")
    else:
        np.save(args.output, probs)
    print(f"scored {len(probs)} rows -> {args.output} "
          f"(mean prob {probs.mean():.4f})")


if __name__ == "__main__":
    main()
