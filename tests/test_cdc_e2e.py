"""CDC end-to-end on a tiny synthetic multi-domain dataset (SURVEY.md §4:
'CDC end-to-end with n_domain≈6 checking group stability')."""

import numpy as np
import pytest

from tpurec.config import CDCConfig, Config, ModelConfig, TrainConfig
from tpurec.data import make_synthetic
from tpurec.cdc import CDCTrainer


@pytest.fixture(scope="module")
def data():
    return make_synthetic(n_rows=9000, n_fields=6, n_domain=6, domain_idx=3, seed=3)


def _cfg(base_model="mmoe", lr=1e-3, **cdc_kw):
    return Config(
        model=ModelConfig(
            model="cdc", embed_dim=8,
            mlp_dims=(32, 16),
            mmoe_n_expert=2,
            tower_dims=(16, 8),
            ple_expert_dims=((32,), (16,)),
            atten_embed_dim=8, att_layer_num=1, gate_hidden_dim=8,
        ),
        cdc=CDCConfig(
            base_model=base_model, n_cluster=2, n_causal_mask=6,
            warmup_step=5, update_matrix_step=1, update_interval=30,
            cdc_tower_dims=(16, 8), **cdc_kw,
        ),
        train=TrainConfig(bs=128, epoch=1, seed=0, lr=lr),
    )


@pytest.mark.slow
def test_cdc_mmoe_end_to_end(data):
    cfg = _cfg("mmoe")
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    out = tr.fit(data.train, data.valid, test=data.test)
    # clustering happened: a real partition into <=2 groups covering all domains
    labels = out["domain2group_list"]
    assert len(labels) == data.n_domain
    assert set(labels) <= {0, 1}
    assert len(set(labels)) == 2  # not stuck in one group
    assert len(out["s_group2domain_list"]) == 2
    # training learned something
    assert out["valid"]["total_auc"] > 0.55
    assert np.isfinite(out["valid"]["mean_auc"])
    # matrices were populated (non-zero rows)
    assert np.abs(tr.cluster.old_matrix_mask).sum() > 0
    assert np.abs(tr.cluster.old_matrix_A).sum() > 0


@pytest.mark.slow
def test_cdc_streaming_eval_matches_exact(data):
    """CDC's on-device histogram eval matches the exact split-mode eval."""
    cfg = _cfg("mmoe")
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    tr.fit(data.train, data.valid)
    exact = tr.evaluate(tr.valid_batcher)
    stream = tr.evaluate_streaming(tr.valid_batcher)
    assert abs(stream["total_auc"] - exact["total_auc"]) < 5e-4
    assert abs(stream["total_loss"] - exact["total_loss"]) < 1e-5
    assert abs(stream["mean_auc"] - exact["mean_auc"]) < 1e-3
    assert set(stream["domain_auc"]) == set(exact["domain_auc"])
    for d in exact["domain_auc"]:
        assert abs(stream["domain_auc"][d] - exact["domain_auc"][d]) < 2e-3


@pytest.mark.slow
def test_cdc_snapshot_rollback_restores_params(data):
    cfg = _cfg("mmoe")
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    tr.setup_data(data.train, data.valid)
    import jax

    p0 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    tr.save_model_state()
    tr._train_burst([0, 1, 2], 2)  # perturb
    p1 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    assert not np.allclose(p0["embedding"]["table"], p1["embedding"]["table"])
    opt_after_burst = jax.tree_util.tree_map(np.asarray, tr.state.opt_state)
    tr.load_model_state()
    p2 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    np.testing.assert_allclose(p0["embedding"]["table"], p2["embedding"]["table"])
    # optimizer moments are deliberately NOT rolled back (cdc.py:344-350
    # snapshots only base_model_instance)
    opt_now = jax.tree_util.tree_map(np.asarray, tr.state.opt_state)
    leaves_a = jax.tree_util.tree_leaves(opt_after_burst)
    leaves_b = jax.tree_util.tree_leaves(opt_now)
    assert all(np.allclose(a, b) for a, b in zip(leaves_a, leaves_b))


@pytest.mark.slow
def test_cdc_checkpoint_roundtrip(tmp_path, data):
    cfg = _cfg("mmoe")
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    tr.setup_data(data.train, data.valid)
    tr.cluster.domain2group = np.array([0, 1, 0, 1, 0, 1])
    tr.cluster.t_group2domain_list = [[0, 2, 4], [1, 3, 5]]
    tr.cluster.s_group2domain_list = [[0, 2], [1, 3, 5]]
    tr.cluster.call_update_group = 3
    path = str(tmp_path / "cdc.pkl")
    tr.save_checkpoint(path, extra={"note": 1})

    tr2 = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    payload = tr2.load_checkpoint(path)
    assert payload["extra"]["note"] == 1
    assert tr2.cluster.domain2group_list == [0, 1, 0, 1, 0, 1]
    assert tr2.cluster.s_group2domain_list == [[0, 2], [1, 3, 5]]
    assert tr2.cluster.call_update_group == 3
    import jax

    a = jax.tree_util.tree_leaves(tr.state.params)[0]
    b = jax.tree_util.tree_leaves(tr2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # setup_data after restore must NOT clobber the restored cluster
    tr2.setup_data(data.train, data.valid)
    assert tr2.cluster.call_update_group == 3


@pytest.mark.slow
def test_cdc_sharded_matches_single(data):
    """CDC on a (4,2) mesh (data-parallel bursts, row-sharded table) must
    produce the same matrices and clustering as single-device — GSPMD
    inserts collectives, the math is identical."""
    import jax

    from tpurec.parallel import Shardings, make_mesh

    cfg = _cfg("mmoe")
    single = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    single.setup_data(data.train, data.valid)
    single.update_matrix_cdc(cfg.cdc.update_matrix_step)

    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    sh = Shardings(mesh)
    sharded = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                         mesh=mesh, shardings=sh)
    sharded.setup_data(data.train, data.valid)
    sharded.update_matrix_cdc(cfg.cdc.update_matrix_step)

    # same host RNG schedule + same device math -> same affinity matrices
    np.testing.assert_allclose(
        single.cluster.matrix_mask, sharded.cluster.matrix_mask,
        rtol=0, atol=5e-5)
    np.testing.assert_allclose(
        single.cluster.matrix_A, sharded.cluster.matrix_A, rtol=0, atol=5e-5)
    assert list(single.cluster.domain2group_list) == \
        list(sharded.cluster.domain2group_list)
    # table AND its Adam moments stayed row-sharded over the model axis
    tbl_sh = sharded.state.params["embedding"]["table"].sharding
    assert "model" in str(tbl_sh.spec)
    m_sh = sharded.state.opt_state[1].m.sharding
    assert "model" in str(m_sh.spec), m_sh


def _with_placement(cfg, placement):
    import dataclasses

    return dataclasses.replace(
        cfg, cdc=dataclasses.replace(cfg.cdc, data_placement=placement))


@pytest.mark.slow
def test_cdc_stream_placement_matches_resident(data):
    """data_placement='stream' (dataset in HOST memory, per-dispatch row
    windows) must reproduce the resident path bit-for-bit: same host RNG
    schedule, same row values, same jitted math — only the feeding
    differs (VERDICT round-1 item 2: CDC must not require the whole train
    split in HBM)."""
    res = CDCTrainer(_with_placement(_cfg("mmoe"), "resident"),
                     data.field_dims, data.n_domain, data.domain_idx)
    res.setup_data(data.train, data.valid)
    assert res._resident
    res.update_matrix_cdc(1)

    srm = CDCTrainer(_with_placement(_cfg("mmoe"), "stream"),
                     data.field_dims, data.n_domain, data.domain_idx)
    srm.setup_data(data.train, data.valid)
    assert not srm._resident and srm.Xdev is None
    srm.update_matrix_cdc(1)

    np.testing.assert_array_equal(res.cluster.matrix_mask,
                                  srm.cluster.matrix_mask)
    np.testing.assert_array_equal(res.cluster.matrix_A, srm.cluster.matrix_A)
    np.testing.assert_array_equal(res.cluster.matrix_B, srm.cluster.matrix_B)
    assert list(res.cluster.domain2group_list) == \
        list(srm.cluster.domain2group_list)
    # and the post-update train state is identical too
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(res.state.params),
                    jax.tree_util.tree_leaves(srm.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_cdc_stream_full_fit(data):
    """End-to-end CDC fit in stream placement: warmup scan, matrix
    updates, split training spans and eval all run off host windows."""
    cfg = _with_placement(_cfg("mmoe"), "stream")
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    out = tr.fit(data.train, data.valid, test=data.test)
    assert not tr._resident
    labels = out["domain2group_list"]
    assert len(labels) == data.n_domain and set(labels) <= {0, 1}
    assert out["valid"]["total_auc"] > 0.55


@pytest.mark.slow
def test_cdc_mesh_stream_matches_single(data):
    """CDC with BOTH a (4,2) mesh and stream placement (the pod-scale
    configuration: dataset in host RAM, windows replicated, bursts
    data-parallel, table row-sharded) reproduces single-device resident
    matrices and clustering (VERDICT round-1 items 2+3)."""
    import jax

    from tpurec.parallel import Shardings, make_mesh

    cfg = _with_placement(_cfg("mmoe"), "resident")
    single = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    single.setup_data(data.train, data.valid)
    single.update_matrix_cdc(cfg.cdc.update_matrix_step)

    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    cfg_s = _with_placement(cfg, "stream")
    sh = Shardings(mesh)
    sharded = CDCTrainer(cfg_s, data.field_dims, data.n_domain,
                         data.domain_idx, mesh=mesh, shardings=sh)
    sharded.setup_data(data.train, data.valid)
    assert not sharded._resident
    sharded.update_matrix_cdc(cfg.cdc.update_matrix_step)

    np.testing.assert_allclose(
        single.cluster.matrix_mask, sharded.cluster.matrix_mask,
        rtol=0, atol=5e-5)
    np.testing.assert_allclose(
        single.cluster.matrix_A, sharded.cluster.matrix_A, rtol=0, atol=5e-5)
    np.testing.assert_allclose(
        single.cluster.matrix_B, sharded.cluster.matrix_B, rtol=0, atol=5e-5)
    assert list(single.cluster.domain2group_list) == \
        list(sharded.cluster.domain2group_list)
    assert "model" in str(
        sharded.state.params["embedding"]["table"].sharding.spec)


@pytest.mark.slow
def test_cdc_placement_auto_rules(data):
    cfg = _cfg("mmoe")
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    # auto: resident under the single-chip budget
    assert tr._decide_placement(1 << 20)
    assert not tr._decide_placement(tr.RESIDENT_BUDGET + 1)
    import jax

    from tpurec.parallel import Shardings, make_mesh

    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    trm = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                     mesh=mesh, shardings=Shardings(mesh))
    # on a mesh a resident dataset replicates per chip: budget is smaller
    assert not trm._decide_placement(trm.MESH_RESIDENT_BUDGET + 1)
    assert trm._decide_placement(1 << 20)


@pytest.mark.slow
def test_cdc_auc_metric_mode(data):
    """use_metric='auc' (config.py:52 / cdc.py:113-119): matrices are
    populated with per-domain AUC (higher=better) and clustering still
    produces a valid partition."""
    import dataclasses

    cfg = _cfg("mmoe")
    cfg = dataclasses.replace(cfg, cdc=dataclasses.replace(
        cfg.cdc, use_metric="auc"))
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    tr.setup_data(data.train, data.valid)
    tr.update_matrix_cdc(cfg.cdc.update_matrix_step)
    st = tr.cluster
    assert np.all(np.isfinite(st.old_matrix_mask))
    assert np.all((st.old_matrix_mask >= 0) & (st.old_matrix_mask <= 1))
    labels = st.domain2group_list
    assert len(labels) == data.n_domain and set(labels) <= {0, 1}


@pytest.mark.slow
def test_fit_warms_the_scaled_populate_shapes(data):
    """fit() must warm-compile with the SAME batch-size-scaled burst
    length train_cdc_epoch later passes to update_matrix_cdc
    (run.py:601-604 scaling) — a raw cfg value warms the wrong shapes
    and the first matrix update pays the serial compiles anyway."""
    cfg = _cfg("mmoe")  # bs=128 -> scaled step = 1*1024//128 = 8 != cfg 1
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    seen = []
    tr.warm_compile = lambda k: seen.append(k)
    tr.update_matrix_cdc = lambda k: seen.append(("update", k))
    tr.fit(data.train, data.valid)
    scaled = tr._scaled_update_matrix_step()
    assert scaled == 8
    assert seen[0] == scaled
    assert all(k == scaled for (_, k) in seen[1:])


@pytest.mark.slow
def test_warm_compile_cache_invalidated_on_new_dataset(data):
    """The AOT populate executables bake in the DATASET shapes; a second
    setup_data with different-size arrays must not reuse them (regression:
    jax raises 'Argument types differ' otherwise)."""
    cfg = _cfg("mmoe")
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    tr.setup_data(data.train, data.valid)
    tr.warm_compile(cfg.cdc.update_matrix_step)
    tr.update_matrix_cdc(cfg.cdc.update_matrix_step)
    execs_a = dict(getattr(tr, "_populate_exec", {}))
    assert execs_a  # warm path actually used

    # repeated warm_compile with the SAME dataset must not resubmit
    tr.warm_compile(cfg.cdc.update_matrix_step)
    assert not tr._warm_futures

    data2 = make_synthetic(n_rows=5000, n_fields=6, n_domain=6,
                           domain_idx=3, seed=4)
    tr.setup_data(data2.train, data2.valid)
    # NO warm_compile here: _run_populate itself must drop the stale
    # executables (update_matrix_cdc is public and warm_compile optional)
    tr.update_matrix_cdc(cfg.cdc.update_matrix_step)  # must not crash
    assert tr._populate_data_sig[0] == tr.Xdev.shape
    assert not tr._populate_exec  # stale AOT cache was dropped


NON_MMOE_BASES = ["ple", "pepnet", "epnet", "star"]


@pytest.mark.slow
@pytest.mark.parametrize("base", NON_MMOE_BASES)
def test_cdc_base_model_end_to_end(data, base):
    """CDC over every supported base model (cdc.py:32-54 accepts
    mmoe/ple/pepnet/epnet/star; run.py:424-425): full fit with warmup,
    matrix updates, split training and clustering.  STAR-base drives the
    group=None partitioned-norm path (models/star.py:77-83) under
    warmup+split+rollback; PLE-base exercises the documented divergence at
    engine.py:100-104 (the reference crashes feeding flat mlp_dims into
    PLE's nested expert dims).  lr=5e-3: STAR's fused domain*shared weight
    products learn too slowly at 1e-3 to clear chance on 9k rows in one
    epoch (measured AUC 0.48 at 1e-3 vs 0.73 at 5e-3)."""
    cfg = _cfg(base, lr=5e-3)
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    out = tr.fit(data.train, data.valid, test=data.test)
    labels = out["domain2group_list"]
    assert len(labels) == data.n_domain
    assert set(labels) <= {0, 1}
    assert out["valid"]["total_auc"] > 0.55
    assert np.isfinite(out["valid"]["mean_auc"])
    assert np.abs(tr.cluster.old_matrix_mask).sum() > 0
    assert np.abs(tr.cluster.old_matrix_A).sum() > 0


@pytest.mark.slow
@pytest.mark.parametrize("base", NON_MMOE_BASES)
def test_cdc_base_model_checkpoint_roundtrip(tmp_path, data, base):
    """Checkpoint roundtrip for every base: the dataclasses.replace base
    config surgery (engine.py:107-113) must rebuild an identical model on
    restore (tower dims differ per base: cdc_tower_dims feeds
    mmoe_tower_dims/ple_tower_dims/tower_dims)."""
    cfg = _cfg(base)
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    tr.setup_data(data.train, data.valid)
    tr.cluster.domain2group = np.array([0, 1, 1, 0, 1, 0])
    tr.cluster.call_update_group = 2
    path = str(tmp_path / f"cdc_{base}.pkl")
    tr.save_checkpoint(path)

    tr2 = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    tr2.load_checkpoint(path)
    assert tr2.cluster.domain2group_list == [0, 1, 1, 0, 1, 0]
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
@pytest.mark.parametrize("base", NON_MMOE_BASES)
def test_cdc_base_model_sharded_matches_single(data, base):
    """Matrix population on a (4,2) mesh matches single-device for every
    base model (GSPMD collectives, identical math)."""
    import jax

    from tpurec.parallel import Shardings, make_mesh

    cfg = _cfg(base)
    single = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    single.setup_data(data.train, data.valid)
    single.update_matrix_cdc(cfg.cdc.update_matrix_step)

    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    sharded = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                         mesh=mesh, shardings=Shardings(mesh))
    sharded.setup_data(data.train, data.valid)
    sharded.update_matrix_cdc(cfg.cdc.update_matrix_step)

    np.testing.assert_allclose(
        single.cluster.matrix_mask, sharded.cluster.matrix_mask,
        rtol=0, atol=2e-4)
    np.testing.assert_allclose(
        single.cluster.matrix_A, sharded.cluster.matrix_A, rtol=0, atol=2e-4)
    assert list(single.cluster.domain2group_list) == \
        list(sharded.cluster.domain2group_list)


@pytest.mark.slow
def test_cdc_divide_affinity_greedy_mode_fit(data):
    """affinity_func='divide' + cluster_mode='greedy' through a full
    engine fit (cdc.py:141-144 divide transform; cdc.py:212-225 greedy
    re-assignment) — closes the last e2e config gap (VERDICT round-4
    missing #3)."""
    import dataclasses

    cfg = _cfg("mmoe")
    cfg = dataclasses.replace(cfg, cdc=dataclasses.replace(
        cfg.cdc, affinity_func="divide", cluster_mode="greedy",
        old_matrix_weight=0.3))
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    out = tr.fit(data.train, data.valid)
    labels = out["domain2group_list"]
    assert len(labels) == data.n_domain and set(labels) <= {0, 1}
    assert np.all(np.isfinite(tr.cluster.old_matrix_A))
    assert out["valid"]["total_auc"] > 0.52


@pytest.mark.slow
def test_cdc_parallel_rows_matches_serial(data):
    """parallel_rows=N (vmapped per-row-moment populate, VERDICT round-4
    weak #1): row 0 shares the serial path's RNG schedule and entry
    moments, so it matches serial row 0 up to batched-matmul reduction
    order; later rows diverge only through the documented per-row-moments
    semantics, which at one update from init is a tiny perturbation —
    matrices stay strongly correlated and the trainer state is NOT
    consumed by the update."""
    import jax

    ser = CDCTrainer(_cfg("mmoe"), data.field_dims, data.n_domain,
                     data.domain_idx)
    ser.setup_data(data.train, data.valid)
    ser.update_matrix_cdc(1)

    par = CDCTrainer(_cfg("mmoe", parallel_rows=4), data.field_dims,
                     data.n_domain, data.domain_idx)
    par.setup_data(data.train, data.valid)
    table_before = np.asarray(par.state.params["embedding"]["table"])
    par.update_matrix_cdc(1)

    np.testing.assert_allclose(ser.cluster.matrix_mask[0],
                               par.cluster.matrix_mask[0],
                               rtol=0, atol=1e-3)
    for a, b in ((ser.cluster.matrix_mask, par.cluster.matrix_mask),
                 (ser.cluster.matrix_A, par.cluster.matrix_A),
                 (ser.cluster.matrix_B, par.cluster.matrix_B)):
        assert np.all(np.isfinite(b))
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99
    # parallel populate must NOT advance the trainer state (per-row moment
    # copies; params rolled back inside every lane)
    np.testing.assert_array_equal(
        table_before, np.asarray(par.state.params["embedding"]["table"]))
    assert len(set(par.cluster.domain2group_list)) == 2


@pytest.mark.slow
def test_cdc_parallel_rows_full_fit_and_stream(data):
    """Full CDC fit with parallel_rows on, in stream placement (the
    pod-scale configuration): host windows feed the vmapped chunks, the
    model still learns, and the clustering is a real partition."""
    cfg = _with_placement(_cfg("mmoe", parallel_rows=4), "stream")
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    out = tr.fit(data.train, data.valid)
    assert not tr._resident
    labels = out["domain2group_list"]
    assert len(labels) == data.n_domain and set(labels) <= {0, 1}
    assert out["valid"]["total_auc"] > 0.55


@pytest.mark.slow
def test_cdc_parallel_rows_stream_matches_resident(data):
    """resident and stream placements must be bit-identical under
    parallel_rows too (same host RNG schedule, same jitted math — only
    the feeding differs)."""
    res = CDCTrainer(_with_placement(_cfg("mmoe", parallel_rows=4),
                                     "resident"),
                     data.field_dims, data.n_domain, data.domain_idx)
    res.setup_data(data.train, data.valid)
    res.update_matrix_cdc(1)

    srm = CDCTrainer(_with_placement(_cfg("mmoe", parallel_rows=4),
                                     "stream"),
                     data.field_dims, data.n_domain, data.domain_idx)
    srm.setup_data(data.train, data.valid)
    srm.update_matrix_cdc(1)

    np.testing.assert_array_equal(res.cluster.matrix_mask,
                                  srm.cluster.matrix_mask)
    np.testing.assert_array_equal(res.cluster.matrix_A, srm.cluster.matrix_A)
    np.testing.assert_array_equal(res.cluster.matrix_B, srm.cluster.matrix_B)


@pytest.mark.slow
def test_cdc_parallel_rows_sharded_matches_single(data):
    """parallel_rows on a (4,2) mesh reproduces the single-device parallel
    matrices (GSPMD shards the vmapped lanes' row-batches; math identical)."""
    import jax

    from tpurec.parallel import Shardings, make_mesh

    cfg = _cfg("mmoe", parallel_rows=4)
    single = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    single.setup_data(data.train, data.valid)
    single.update_matrix_cdc(1)

    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    sharded = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx,
                         mesh=mesh, shardings=Shardings(mesh))
    sharded.setup_data(data.train, data.valid)
    sharded.update_matrix_cdc(1)

    np.testing.assert_allclose(
        single.cluster.matrix_mask, sharded.cluster.matrix_mask,
        rtol=0, atol=2e-4)
    np.testing.assert_allclose(
        single.cluster.matrix_A, sharded.cluster.matrix_A, rtol=0, atol=2e-4)
    assert list(single.cluster.domain2group_list) == \
        list(sharded.cluster.domain2group_list)


@pytest.mark.slow
def test_cdc_bf16_compute_end_to_end(data):
    """CDC under compute_dtype='bfloat16' (the opt-in MXU-rate mode that
    cuts the fwd/bwd-dominated counterfactual bursts): full fit still
    learns and produces a valid partition, and the matrices stay close
    to the f32 run's (operand rounding only — sweep math, moments and
    params remain f32)."""
    import dataclasses

    cfg = _cfg("mmoe")
    f32 = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    f32.setup_data(data.train, data.valid)
    f32.update_matrix_cdc(1)

    bcfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, compute_dtype="bfloat16"))
    b16 = CDCTrainer(bcfg, data.field_dims, data.n_domain, data.domain_idx)
    b16.setup_data(data.train, data.valid)
    b16.update_matrix_cdc(1)
    assert np.all(np.isfinite(b16.cluster.matrix_mask))
    assert np.corrcoef(f32.cluster.matrix_A.ravel(),
                       b16.cluster.matrix_A.ravel())[0, 1] > 0.98

    out = b16.fit(data.train, data.valid)
    labels = out["domain2group_list"]
    assert len(labels) == data.n_domain and set(labels) <= {0, 1}
    assert out["valid"]["total_auc"] > 0.55


def test_dump_matrices_writes_full_artifact_set(tmp_path, data):
    """csv + xlsx + per-cell annotated png per matrix (cdc.py:395-426)."""
    cfg = _cfg("mmoe")
    tr = CDCTrainer(cfg, data.field_dims, data.n_domain, data.domain_idx)
    tr.setup_data(data.train, data.valid)  # allocates the cluster state
    st = tr.cluster
    rng = np.random.default_rng(0)
    st.matrix_A[:] = rng.standard_normal(st.matrix_A.shape)
    st.matrix_B[:] = rng.standard_normal(st.matrix_B.shape)
    st.matrix_mask[:] = rng.standard_normal(st.matrix_mask.shape)
    st.matrix_causal = rng.standard_normal((data.n_domain, data.n_domain))
    st.call_update_group = 2
    out = str(tmp_path / "m")
    tr._dump_matrices(out)
    from tpurec.utils.xlsx import read_matrix_xlsx

    import os

    for name, m in (("matrix_A", st.matrix_A), ("matrix_B", st.matrix_B),
                    ("matrix_mask", st.matrix_mask),
                    ("causal_matrix", st.matrix_causal)):
        csv = os.path.join(out, f"{name}_step2.csv")
        xlsx = os.path.join(out, f"{name}_step2.xlsx")
        png = os.path.join(out, f"{name}_step2.png")
        assert os.path.exists(csv) and os.path.exists(xlsx)
        np.testing.assert_allclose(read_matrix_xlsx(xlsx), m)
        assert os.path.exists(png)  # matplotlib present on this image
