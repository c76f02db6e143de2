"""CLI surface tests."""

import json

import numpy as np
import pytest

from tpurec.cli import build_config, load_dataset, main, parse_args


def test_parse_args_seed_hash_default():
    a1 = parse_args(["--model", "dcn"])
    assert a1.is_set_seed == 1
    assert 0 <= a1.seed < 10000
    a2 = parse_args(["--model", "dcn", "--seed", "7", "--is_set_seed", "1"])
    assert a2.seed == 7


def test_build_config_roundtrip():
    args = parse_args([
        "--model", "cdc", "--base_model", "ple", "--n_cluster", "3",
        "--affinity_func", "divide", "--lr", "0.01",
        "--probe_eval_batches", "4", "--mask_ema", "0.5",
        "--freeze_after_updates", "2", "--parallel_rows", "6",
    ])
    cfg = build_config(args)
    assert cfg.model.model == "cdc"
    assert cfg.cdc.base_model == "ple"
    assert cfg.cdc.n_cluster == 3
    assert cfg.cdc.affinity_func == "divide"
    assert cfg.train.lr == 0.01
    assert cfg.cdc.probe_eval_batches == 4
    assert cfg.cdc.mask_ema == 0.5
    assert cfg.cdc.freeze_after_updates == 2
    assert cfg.cdc.parallel_rows == 6


def test_cdc_plus_flags_default_to_reference_behavior():
    cfg = build_config(parse_args(["--model", "cdc"]))
    assert cfg.cdc.probe_eval_batches == 1
    assert cfg.cdc.mask_ema == 0.0
    assert cfg.cdc.freeze_after_updates == 0
    assert cfg.cdc.parallel_rows == 0


@pytest.mark.slow
def test_cli_end_to_end_with_domain_filter(capsys, tmp_path):
    out = main([
        "--model", "deepfm", "--dataset_name", "synthetic",
        "--n_rows", "4000", "--n_domain", "5", "--epoch", "1",
        "--bs", "256", "--is_set_seed", "1", "--seed", "3",
        "--embed_dim", "8", "--domain_filter", "[0,2,4]",
        "--save_path", str(tmp_path / "ck"),
    ])
    assert "valid" in out and "test" in out
    assert np.isfinite(out["valid"]["total_auc"])
    # only the 3 kept (re-encoded) domains appear in per-domain metrics
    assert set(out["valid"]["domain_auc"].keys()) <= {0, 1, 2}
    # the best model was persisted as a servable self-describing checkpoint
    import os

    from tpurec.serve import predictor_from_checkpoint

    assert os.path.exists(out["checkpoint"])
    pred = predictor_from_checkpoint(out["checkpoint"], batch_sizes=(64,))
    import pickle

    fd = pickle.load(open(out["checkpoint"], "rb"))["field_dims"]
    rng = np.random.default_rng(0)
    X = np.stack([rng.integers(0, d, 30) for d in fd], 1).astype(np.int32)
    p = pred(X)
    assert p.shape == (30,) and np.all((p >= 0) & (p <= 1))
