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
    ])
    cfg = build_config(args)
    assert cfg.model.model == "cdc"
    assert cfg.cdc.base_model == "ple"
    assert cfg.cdc.n_cluster == 3
    assert cfg.cdc.affinity_func == "divide"
    assert cfg.train.lr == 0.01


def test_cli_end_to_end_with_domain_filter(capsys):
    out = main([
        "--model", "deepfm", "--dataset_name", "synthetic",
        "--n_rows", "4000", "--n_domain", "5", "--epoch", "1",
        "--bs", "256", "--is_set_seed", "1", "--seed", "3",
        "--embed_dim", "8", "--domain_filter", "[0,2,4]",
    ])
    assert "valid" in out and "test" in out
    assert np.isfinite(out["valid"]["total_auc"])
    # only the 3 kept (re-encoded) domains appear in per-domain metrics
    assert set(out["valid"]["domain_auc"].keys()) <= {0, 1, 2}
