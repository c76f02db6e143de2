"""Subprocess worker for the REAL 2-process ``jax.distributed`` tests.

Launched by tests/test_multiprocess.py: two copies of this script join a
localhost coordinator to form a 2-process x 4-CPU-device cluster
(8 global devices, cross-process collectives over Gloo) and exercise the
code paths that only run when ``jax.process_count() > 1``:

- ``GlobalBatchFeed``'s ``jax.make_array_from_process_local_data``
  assembly + the multi-process mesh-layout validation
  (tpurec/parallel/feed.py),
- ``Trainer.train_epoch_multihost`` / ``evaluate_streaming_multihost``
  (tpurec/train/loop.py),
- ``CDCTrainer``'s replicated ``_dev`` arrays (engine.py _dev
  multi-process branch) and the synchronous-ordered ``warm_compile``
  (engine.py multi-process branch).

The single-process degradations of all of these are covered by the
regular suite; this worker is the evidence the cross-process branches
themselves execute and reproduce single-process results (VERDICT round-2
item 1).  Reference: SURVEY.md §2.7 — the reference is single-process
(run.py:32-33); multihost execution is a new-build obligation.

Usage: python tests/mp_worker.py <task> <process_id> <port> <out.npz>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init_distributed(pid: int, port: str):
    # this worker wants 2 processes x 4 devices; strip the pytest
    # conftest's inherited 8-device XLA flag
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    import jax

    # the image's sitecustomize forces jax_platforms='axon,cpu' (remote
    # TPU); this test cluster must stay on local CPU devices
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    # match the parent pytest process's oracle math (tests/conftest.py)
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert jax.device_count() == 8, jax.devices()
    assert jax.local_device_count() == 4
    return jax


# ---------------------------------------------------------------- configs
# Shared between worker and parent test (the test imports this module to
# build its single-process oracles with identical hyperparameters).

def epoch_config():
    from tpurec.config import Config, ModelConfig, TrainConfig

    return Config(
        model=ModelConfig(model="mmoe", embed_dim=8, mmoe_expert_dims=(16,),
                          mmoe_tower_dims=(8,), use_atten=False, dropout=0.0),
        train=TrainConfig(bs=256, epoch=1, seed=0, steps_per_dispatch=4),
    )


def epoch_data():
    from tpurec.data import make_synthetic

    return make_synthetic(n_rows=3000, n_fields=6, n_domain=4, domain_idx=3,
                          seed=5)


def cdc_config():
    from tpurec.config import CDCConfig, Config, ModelConfig, TrainConfig

    return Config(
        model=ModelConfig(
            model="cdc", embed_dim=8, mlp_dims=(32, 16), mmoe_n_expert=2,
            tower_dims=(16, 8), atten_embed_dim=8, att_layer_num=1,
            gate_hidden_dim=8),
        cdc=CDCConfig(
            base_model="mmoe", n_cluster=2, n_causal_mask=4,
            warmup_step=5, update_matrix_step=1, update_interval=30,
            cdc_tower_dims=(16, 8)),
        train=TrainConfig(bs=128, epoch=1, seed=0),
    )


def cdc_data():
    from tpurec.data import make_synthetic

    return make_synthetic(n_rows=4000, n_fields=6, n_domain=6, domain_idx=3,
                          seed=3)


def flat_params(jax, params):
    import numpy as np

    return {
        jax.tree_util.keystr(p): np.asarray(jax.device_get(v))
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    }


# ---------------------------------------------------------------- tasks

def task_feed(jax, out):
    """Cross-process GlobalBatchFeed assembly with known row content."""
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpurec.parallel import make_mesh
    from tpurec.parallel.feed import GlobalBatchFeed, epoch_plan

    mesh = make_mesh(4, 2)
    feed = GlobalBatchFeed(mesh)  # multi-process layout validation runs here
    pid = jax.process_index()
    n_rows, bs = 1000, 32

    lo, hi = feed.dataset_range(n_rows)
    assert (lo, hi) == ((0, 500), (500, 1000))[pid], (pid, lo, hi)
    assert feed.local_rows_per_step(bs) == 16
    nb, bs_local = epoch_plan(n_rows, bs, feed)
    assert (nb, bs_local) == (32, 16), (nb, bs_local)

    # global dataset row r carries value r in every column; process p's
    # local batch is rows [p*16, p*16+16) of the first global batch
    X = (np.arange(n_rows, dtype=np.float32)[:, None]
         * np.ones((1, 3), np.float32))
    local_rows = np.concatenate([X[lo:lo + 16]])
    g = feed.global_array(local_rows, bs)
    assert g.shape == (bs, 3)
    # expected global batch: rows 0..15 then 500..515
    expected = np.concatenate([X[0:16], X[500:516]])
    w = np.arange(bs, dtype=np.float32)

    rep = NamedSharding(mesh, P())
    checksum = jax.jit(
        lambda a: jnp.sum(a * w[:, None]), out_shardings=rep)(g)
    assert float(checksum) == float((expected * w[:, None]).sum()), checksum

    # stacked [K, rows, ...] scan feed, rows sharded on axis 1
    K = 2
    local_st = np.stack([X[lo:lo + 16], X[lo + 16:lo + 32]])
    gst = feed.global_stacked(local_st, bs)
    assert gst.shape == (K, bs, 3)
    exp_st = np.stack([np.concatenate([X[0:16], X[500:516]]),
                       np.concatenate([X[16:32], X[516:532]])])
    checksum2 = jax.jit(
        lambda a: jnp.sum(a * w[None, :, None]), out_shardings=rep)(gst)
    assert float(checksum2) == float((exp_st * w[None, :, None]).sum())

    import json

    with open(out, "w") as f:
        json.dump({"ok": True, "pid": pid,
                   "checksum": float(checksum)}, f)


def task_epoch(jax, out):
    """Trainer.train_epoch_multihost + evaluate_streaming_multihost with
    each process feeding only ITS dataset shard."""
    import numpy as np

    from tpurec.parallel import Shardings, make_mesh
    from tpurec.parallel.feed import GlobalBatchFeed
    from tpurec.train import Trainer

    cfg, data = epoch_config(), epoch_data()
    mesh = make_mesh(4, 2)
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                 domain2group=np.arange(data.n_domain),
                 mesh=mesh, shardings=Shardings(mesh))
    feed = GlobalBatchFeed(mesh)
    Xtr, ytr = data.train
    lo, hi = feed.dataset_range(len(Xtr))
    # the parent's oracle assumes exactly this block ownership
    n = len(Xtr)
    assert (lo, hi) == ((0, n // 2), (n // 2, n))[jax.process_index()]
    with mesh:
        loss = tr.train_epoch_multihost(Xtr[lo:hi], ytr[lo:hi], len(Xtr),
                                        epoch_i=0)
        Xv, yv = data.valid
        vlo, vhi = feed.dataset_range(len(Xv))
        ev = tr.evaluate_streaming_multihost(
            Xv[vlo:vhi], yv[vlo:vhi], len(Xv),
            domain_cnt_weight=data.domain_cnt_weight())
    np.savez(out, loss=loss, total_auc=ev["total_auc"],
             mean_auc=ev["mean_auc"], total_loss=ev["total_loss"],
             **flat_params(jax, tr.state.params))


def task_cdc(jax, out):
    """One full CDC matrix update on the 2-process mesh: replicated _dev
    arrays, ordered synchronous warm_compile, populate + clustering."""
    import numpy as np

    from tpurec.cdc import CDCTrainer
    from tpurec.parallel import Shardings, make_mesh

    cfg, data = cdc_config(), cdc_data()
    mesh = make_mesh(4, 2)
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                    mesh=mesh, shardings=Shardings(mesh))
    tr.setup_data(data.train, data.valid)
    tr.warm_compile(cfg.cdc.update_matrix_step)  # sync multi-process branch
    tr.update_matrix_cdc(cfg.cdc.update_matrix_step)
    st = tr.cluster
    np.savez(out,
             matrix_A=st.matrix_A, matrix_B=st.matrix_B,
             matrix_mask=st.matrix_mask,
             d2g=np.asarray(st.domain2group_list, np.int32),
             table=flat_params(jax, tr.state.params)["['embedding']['table']"])


def task_cdcfit(jax, out):
    """FULL CDC fit on the 2-process mesh: warmup scan, split-mode train
    spans, interval-cadence matrix updates, streaming eval, early stop —
    the whole train_cdc_epoch surface executing cross-process without
    deadlock, with both processes reaching identical results."""
    import numpy as np

    from tpurec.cdc import CDCTrainer
    from tpurec.parallel import Shardings, make_mesh

    cfg, data = cdc_config(), cdc_data()
    mesh = make_mesh(4, 2)
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                    mesh=mesh, shardings=Shardings(mesh))
    res = tr.fit(data.train, data.valid, test=data.test)
    np.savez(out,
             d2g=np.asarray(res["domain2group_list"], np.int32),
             valid_auc=res["valid"]["total_auc"],
             valid_mean_auc=res["valid"]["mean_auc"],
             test_auc=res["test"]["total_auc"],
             matrix_A=tr.cluster.matrix_A,
             n_updates=tr.cluster.call_update_group)


TASKS = {"feed": task_feed, "epoch": task_epoch, "cdc": task_cdc,
         "cdcfit": task_cdcfit}


def main():
    task, pid, port, out = (
        sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4])
    jax = _init_distributed(pid, port)
    TASKS[task](jax, out)
    print(f"mp_worker {task} pid={pid}: OK", flush=True)


if __name__ == "__main__":
    main()
