"""Multi-host feed tests on the virtual 8-device CPU mesh.

Single-process here, so the cross-process assembly path of
``jax.make_array_from_process_local_data`` can't literally run; what IS
locked in: the shard math every host runs (process_shard coverage /
disjointness), the per-host row accounting, and that the single-process
degradation produces a correctly row-sharded global batch that a jitted
psum-style reduction consumes with the expected per-device shard shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpurec.parallel import make_mesh
from tpurec.parallel.feed import GlobalBatchFeed, process_shard


def test_process_shard_partitions_exactly():
    for n_rows in (0, 1, 7, 100, 103):
        for pc in (1, 2, 3, 8):
            ranges = [process_shard(n_rows, pi, pc) for pi in range(pc)]
            # contiguous, disjoint, covering
            assert ranges[0][0] == 0
            assert ranges[-1][1] == n_rows
            for (s0, e0), (s1, e1) in zip(ranges, ranges[1:]):
                assert e0 == s1
            sizes = [e - s for s, e in ranges]
            assert max(sizes) - min(sizes) <= 1


def test_process_shard_validates():
    with pytest.raises(ValueError):
        process_shard(10, process_index=3, process_count=2)


def test_feed_requires_data_axis():
    mesh = make_mesh(4, 2)
    with pytest.raises(ValueError):
        GlobalBatchFeed(mesh, data_axis="nope")


def test_global_batch_shards_rows_over_data_axis():
    mesh = make_mesh(4, 2)
    feed = GlobalBatchFeed(mesh)
    assert feed.n_data == 4
    bs = 32
    assert feed.local_rows_per_step(bs) == bs  # single process owns all
    X = np.arange(bs * 3, dtype=np.int32).reshape(bs, 3)
    y = np.arange(bs, dtype=np.float32)
    gb = feed.global_batch({"x": X, "y": y}, bs)
    assert gb["x"].sharding.spec == P("data", None)
    assert gb["y"].sharding.spec == P("data")
    # each device holds bs/4 rows (replicated over the 2-wide model axis)
    shard_rows = {s.data.shape[0] for s in gb["x"].addressable_shards}
    assert shard_rows == {bs // 4}
    np.testing.assert_array_equal(np.asarray(gb["x"]), X)

    # a jitted global-batch reduction sees the full batch
    total = jax.jit(lambda b: jnp.sum(b["y"]))(gb)
    assert float(total) == float(y.sum())


def test_global_batch_validates_divisibility_and_size():
    mesh = make_mesh(8, 1)
    feed = GlobalBatchFeed(mesh)
    with pytest.raises(ValueError):
        feed.local_rows_per_step(12)  # not divisible by 8
    with pytest.raises(ValueError):
        feed.global_array(np.zeros((8, 2)), 16)  # partial local batch


@pytest.mark.slow
def test_multihost_epoch_matches_host_epoch_single_process():
    """On a 1-process mesh the multihost epoch runs the exact host-path
    batch schedule (same rng) through explicitly data-sharded global
    batches; parameters after one epoch must match the unsharded host
    path (up to reduction order)."""
    from tpurec.config import Config, ModelConfig, TrainConfig
    from tpurec.data import make_synthetic
    from tpurec.parallel import Shardings
    from tpurec.train import Trainer

    data = make_synthetic(n_rows=3000, n_fields=6, n_domain=4, domain_idx=3,
                          seed=5)
    cfg = Config(
        # dropout off for determinism across paths
        model=ModelConfig(model="mmoe", embed_dim=8, mmoe_expert_dims=(16,),
                          mmoe_tower_dims=(8,), use_atten=False, dropout=0.0),
        train=TrainConfig(bs=256, epoch=1, seed=0, steps_per_dispatch=4),
    )
    Xtr, ytr = data.train

    host = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                   domain2group=np.arange(data.n_domain))
    host.DEVICE_RESIDENT_BYTES = 0  # force the host-batching path
    host_loss = host.train_epoch(Xtr, ytr, epoch_i=0)

    mesh = make_mesh(4, 2)
    sh = Shardings(mesh)
    mh = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                 domain2group=np.arange(data.n_domain),
                 mesh=mesh, shardings=sh)
    with mesh:
        mh_loss = mh.train_epoch_multihost(Xtr, ytr, len(Xtr), epoch_i=0)

    assert abs(host_loss - mh_loss) < 1e-5
    # biases feeding a BatchNorm have mathematically ZERO gradient (the
    # mean subtraction cancels them); their Adam updates amplify pure
    # reduction-order noise (m/sqrt(v) of noise is O(1)), so they random-
    # walk at lr scale on ANY two backends.  Compare them loosely and
    # everything else tightly.
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(host.state.params),
            jax.tree_util.tree_leaves_with_path(mh.state.params)):
        tol = 5e-3 if "bias" in jax.tree_util.keystr(pa) else 3e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=tol,
                                   err_msg=jax.tree_util.keystr(pa))
    # functional equivalence: predictions agree
    Xv, yv = data.valid
    group = np.arange(data.n_domain)[Xv[:256, data.domain_idx]]
    batch = {"x": jnp.asarray(Xv[:256]), "group": jnp.asarray(group)}
    p_host = host.eval_step(host.state.params, host.state.model_state, batch)
    p_mh = mh.eval_step(
        jax.device_get(mh.state.params), jax.device_get(mh.state.model_state),
        batch)
    np.testing.assert_allclose(np.asarray(p_host), np.asarray(p_mh),
                               atol=5e-4)


def test_dataset_range_single_process_covers_all():
    """dataset_range derives the load range from actual block ownership;
    with one process it must cover the whole dataset and agree with
    process_shard's uniform split."""
    feed = GlobalBatchFeed(make_mesh(4, 2), "data")
    assert feed.dataset_range(1000) == (0, 1000)
    assert feed.dataset_range(1000) == process_shard(1000, 0, 1)
    # consistent with the per-step sharding: each data block owns an
    # equal contiguous slice of any [n] array
    sh = feed.row_sharding(1)
    blocks = sorted(
        {(idx[0].start or 0) for _, idx in
         sh.devices_indices_map((feed.n_data,)).items()})
    # model-axis replicas share each block; the distinct blocks tile [0, n_data)
    assert blocks == list(range(feed.n_data))


@pytest.mark.slow
def test_multihost_streaming_eval_matches_local():
    """evaluate_streaming_multihost on a 1-process mesh must reproduce the
    local evaluate_streaming result exactly (same histograms, assembled
    from explicitly data-sharded global batches)."""
    from tpurec.config import Config, ModelConfig, TrainConfig
    from tpurec.data import make_synthetic
    from tpurec.parallel import Shardings
    from tpurec.train import Trainer

    data = make_synthetic(n_rows=3000, n_fields=6, n_domain=4, domain_idx=3,
                          seed=5)
    cfg = Config(
        model=ModelConfig(model="mmoe", embed_dim=8, mmoe_expert_dims=(16,),
                          mmoe_tower_dims=(8,), use_atten=False, dropout=0.0),
        train=TrainConfig(bs=256, epoch=1, seed=0),
    )
    mesh = make_mesh(4, 2)
    sh = Shardings(mesh)
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                 domain2group=np.arange(data.n_domain),
                 mesh=mesh, shardings=sh)
    Xtr, ytr = data.train
    with mesh:
        tr.train_epoch_multihost(Xtr, ytr, len(Xtr), epoch_i=0)
        Xv, yv = data.valid
        w = data.domain_cnt_weight()
        local = tr.evaluate_streaming(Xv, yv, domain_cnt_weight=w)
        mh = tr.evaluate_streaming_multihost(
            Xv, yv, len(Xv), domain_cnt_weight=w)
    assert abs(mh["total_auc"] - local["total_auc"]) < 1e-9
    assert abs(mh["total_loss"] - local["total_loss"]) < 1e-6
    assert mh["domain_auc"].keys() == local["domain_auc"].keys()
    for d in local["domain_auc"]:
        assert abs(mh["domain_auc"][d] - local["domain_auc"][d]) < 1e-9


def test_multihost_streaming_eval_refuses_surplus_rows():
    """Eval has no next-epoch reshuffle, so local rows beyond the process's
    global share must raise instead of being silently dropped."""
    from tpurec.config import Config, ModelConfig, TrainConfig
    from tpurec.data import make_synthetic
    from tpurec.parallel import Shardings
    from tpurec.train import Trainer

    data = make_synthetic(n_rows=2000, n_fields=6, n_domain=4, domain_idx=3,
                          seed=5)
    cfg = Config(
        model=ModelConfig(model="mmoe", embed_dim=8, mmoe_expert_dims=(16,),
                          mmoe_tower_dims=(8,), use_atten=False, dropout=0.0),
        train=TrainConfig(bs=256, epoch=1, seed=0),
    )
    mesh = make_mesh(4, 2)
    tr = Trainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                 domain2group=np.arange(data.n_domain),
                 mesh=mesh, shardings=Shardings(mesh))
    Xtr, ytr = data.train  # big enough for several local batches
    with mesh:
        with pytest.raises(ValueError, match="more rows"):
            # claim ONE global batch while the local shard holds several
            tr.evaluate_streaming_multihost(Xtr, ytr, 256)
