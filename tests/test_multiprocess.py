"""REAL 2-process ``jax.distributed`` tests (VERDICT round-2 item 1).

Every ``jax.process_count() > 1`` branch in the repo — the
``make_array_from_process_local_data`` feed assembly, the multihost
epoch/eval, CDC's replicated ``_dev`` arrays and synchronous ordered
``warm_compile`` — is executed here for real: two subprocesses
(tests/mp_worker.py) form a 2-process x 4-CPU-device cluster over a
localhost coordinator with Gloo collectives, and their results are
compared against single-process oracles computed in THIS process on the
virtual 8-device mesh.

The reference has no multi-process code at all (run.py:32-33, SURVEY.md
§2.7) — this locks in the new-build multihost surface.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import mp_worker

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def _run_workers(task: str, tmp_path, timeout: int = 900):
    """Launch both workers, wait, and return their two result paths."""
    port = _free_port()
    procs, outs, logs = [], [], []
    for pid in range(2):
        out = str(tmp_path / f"{task}_{pid}.npz")
        log = open(str(tmp_path / f"{task}_{pid}.log"), "w")
        outs.append(out)
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, task, str(pid), str(port), out],
            cwd=REPO, stdout=log, stderr=subprocess.STDOUT))
    rcs = []
    try:
        for p in procs:
            rcs.append(p.wait(timeout=timeout))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()   # exact PIDs we started, never by pattern
                p.wait()
        for log in logs:
            log.close()
    if any(rc != 0 for rc in rcs):
        tails = []
        for pid in range(2):
            with open(str(tmp_path / f"{task}_{pid}.log")) as f:
                tails.append(f"--- worker {pid} (rc={rcs[pid]}) ---\n"
                             + "".join(f.readlines()[-30:]))
        raise AssertionError(
            f"mp_worker {task} failed (rcs={rcs})\n" + "\n".join(tails))
    return outs


@pytest.mark.slow
def test_two_process_feed_assembly(tmp_path):
    """GlobalBatchFeed assembles correct global batches from per-process
    rows (assertions run inside the workers against known content)."""
    outs = _run_workers("feed", tmp_path)
    for out in outs:
        with open(out) as f:
            rec = json.load(f)
        assert rec["ok"]


@pytest.mark.slow
def test_two_process_epoch_matches_single_process_oracle(tmp_path):
    """train_epoch_multihost across 2 real processes reproduces the same
    global batch schedule executed single-process: identical loss (up to
    collective reduction order) and matching parameters."""
    outs = _run_workers("epoch", tmp_path)
    w0 = np.load(outs[0])
    w1 = np.load(outs[1])

    # the replicated outputs must agree across the two processes exactly
    assert float(w0["loss"]) == float(w1["loss"])
    assert float(w0["total_auc"]) == float(w1["total_auc"])
    for k in w0.files:
        np.testing.assert_array_equal(w0[k], w1[k], err_msg=k)

    oracle = _epoch_oracle()
    # train loss is the sharpest schedule check: a single mismatched batch
    # would move it at the 1e-3 level; measured cross-process diff ~7e-8
    assert abs(float(w0["loss"]) - oracle["loss"]) < 1e-5
    # eval runs on ~1e-3-perturbed params (see below), so AUC can move a
    # histogram-bin edge: measured ~9e-5
    assert abs(float(w0["total_auc"]) - oracle["total_auc"]) < 5e-4
    assert abs(float(w0["mean_auc"]) - oracle["mean_auc"]) < 5e-4
    assert abs(float(w0["total_loss"]) - oracle["total_loss"]) < 1e-4

    for k, v in oracle["params"].items():
        # biases (and first-layer weights) feeding BatchNorm have ~zero
        # true gradient; their Adam updates amplify the Gloo-vs-local
        # psum reduction-order noise to the 1e-3 level (same effect as in
        # test_multihost_feed.py, larger here because the collectives
        # really cross processes) — loose there, tighter elsewhere
        tol = 5e-3 if "bias" in k else 5e-4
        np.testing.assert_allclose(w0[k], v, rtol=2e-5, atol=tol,
                                   err_msg=k)


def _epoch_oracle():
    """Single-process execution of the EXACT global batch schedule the
    2-process run assembles: per-process local streams (same shard
    ranges, same per-process batcher RNG) concatenated in data-block
    order into full global batches."""
    import jax

    from tpurec.data.loader import ArrayBatcher
    from tpurec.parallel import Shardings, make_mesh
    from tpurec.parallel.feed import GlobalBatchFeed, epoch_plan
    from tpurec.train import Trainer

    cfg, data = mp_worker.epoch_config(), mp_worker.epoch_data()
    mesh = make_mesh(4, 2)
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                 domain2group=np.arange(data.n_domain),
                 mesh=mesh, shardings=Shardings(mesh))
    feed = GlobalBatchFeed(mesh)
    Xtr, ytr = data.train
    n = len(Xtr)
    bs = cfg.train.bs
    nb = -(-n // bs)
    # 2-process block ownership on a (4,2) mesh: process p owns data
    # blocks [2p, 2p+2) -> dataset rows [p*n//2, (p+1)*n//2) and supplies
    # 2 of the 4 data-block slices of each global batch
    # (mp_worker.task_epoch asserts dataset_range returns exactly this)
    bs_local = (bs // feed.n_data) * 2
    shards = [(0, n // 2), (n // 2, n)]
    n_fields = Xtr.shape[1]
    filler = {
        "x": np.zeros((bs_local, n_fields), np.int32),
        "y": np.zeros(bs_local, np.float32),
        "group": np.zeros(bs_local, np.int32),
        "mask": np.zeros(bs_local, np.float32),
    }

    def stream(pi):
        lo, hi = shards[pi]
        Xl, yl = Xtr[lo:hi], ytr[lo:hi]
        batcher = ArrayBatcher(
            Xl, yl, bs_local, group=tr._group_of(Xl), shuffle=True,
            rng=np.random.default_rng(cfg.train.seed + 0 + 7919 * pi))
        produced = 0
        for b in batcher:
            if produced == nb:
                break
            produced += 1
            yield b
        while produced < nb:
            produced += 1
            yield filler

    import jax.numpy as jnp

    K = max(1, cfg.train.steps_per_dispatch)
    loss_sum, n_batches, pending = 0.0, 0, []
    with mesh:
        for b0, b1 in zip(stream(0), stream(1)):
            # global batch = block-order concat of the two local batches
            gb = {k: np.concatenate([b0[k], b1[k]], axis=0) for k in b0}
            pending.append(gb)
            if len(pending) < K and n_batches + len(pending) < nb:
                continue
            stacked = {k: np.stack([p[k] for p in pending])
                       for k in pending[0]}
            gsb = feed.global_stacked_batch(stacked, bs)
            tr.dropout_rng, r = jax.random.split(tr.dropout_rng)
            if len(pending) == 1:
                gb1 = {k: v[0] for k, v in gsb.items()}
                tr.state, losses = tr.train_step(tr.state, gb1, r)
            else:
                tr.state, losses = tr.scan_steps(
                    tr.state, gsb, jax.random.split(r, len(pending)))
            loss_sum += float(jnp.sum(losses))
            n_batches += len(pending)
            pending = []
        Xv, yv = data.valid
        ev = tr.evaluate_streaming(
            Xv, yv, domain_cnt_weight=data.domain_cnt_weight())
    return {
        "loss": loss_sum / max(n_batches, 1),
        "total_auc": ev["total_auc"], "mean_auc": ev["mean_auc"],
        "total_loss": ev["total_loss"],
        "params": mp_worker.flat_params(jax, tr.state.params),
    }


@pytest.mark.slow
def test_two_process_cdc_matches_single_process(tmp_path):
    """update_matrix_cdc on the 2-process mesh (replicated _dev arrays via
    make_array_from_process_local_data, ordered synchronous warm_compile)
    reproduces single-device matrices and clustering."""
    outs = _run_workers("cdc", tmp_path)
    w0 = np.load(outs[0])
    w1 = np.load(outs[1])
    for k in w0.files:
        np.testing.assert_array_equal(w0[k], w1[k], err_msg=k)

    from tpurec.cdc import CDCTrainer

    cfg, data = mp_worker.cdc_config(), mp_worker.cdc_data()
    single = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    single.setup_data(data.train, data.valid)
    single.update_matrix_cdc(cfg.cdc.update_matrix_step)
    st = single.cluster

    # same host RNG schedule + same global math -> same affinity matrices
    # (5e-5 absorbs cross-process collective reduction-order noise, as in
    # test_cdc_sharded_matches_single)
    np.testing.assert_allclose(st.matrix_mask, w0["matrix_mask"],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(st.matrix_A, w0["matrix_A"],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(st.matrix_B, w0["matrix_B"],
                               rtol=0, atol=5e-5)
    assert list(st.domain2group_list) == list(w0["d2g"])
    # post-update embedding table agrees too
    tbl = mp_worker.flat_params(
        __import__("jax"), single.state.params)["['embedding']['table']"]
    np.testing.assert_allclose(tbl, w0["table"], rtol=2e-5, atol=1e-5)


@pytest.mark.slow
def test_two_process_cdc_full_fit(tmp_path):
    """The whole CDCTrainer.fit (warmup scan, interval-cadence matrix
    updates, split train spans, streaming eval, early stop) runs
    cross-process without deadlock, learns, clusters, and both processes
    reach bit-identical results."""
    outs = _run_workers("cdcfit", tmp_path, timeout=1500)
    w0 = np.load(outs[0])
    w1 = np.load(outs[1])
    for k in w0.files:
        np.testing.assert_array_equal(w0[k], w1[k], err_msg=k)
    assert int(w0["n_updates"]) >= 1
    labels = list(w0["d2g"])
    assert len(labels) == 6 and set(labels) <= {0, 1}
    assert float(w0["valid_auc"]) > 0.55
    assert np.isfinite(float(w0["valid_mean_auc"]))
    assert np.abs(w0["matrix_A"]).sum() > 0
