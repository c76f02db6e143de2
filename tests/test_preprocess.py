"""Offline preprocessing tests on tiny synthetic fixtures."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from tpurec.data.preprocess import (
    ALICCP_CATEGORICAL,
    ALICCP_DENSE,
    AliCCPPreprocessor,
    AmazonPreprocessor,
    convert_raw_aliccp,
    k_core_filter,
    process_price,
    process_rank,
    reduce_mem,
)


def test_process_price():
    assert process_price("$12.49") == 13.0
    assert process_price("$10.00 - $20.00") == 15.0
    assert process_price("") is None
    assert process_price(None) is None
    assert process_price("call for price") is None


def test_process_rank():
    assert process_rank("#1,234 in Books (See Top 100)") == (1234, "Books")
    assert process_rank("12 in Toys & Games") == (12, "Toys & Games")
    # reference quirk preserved: a second ' in ' breaks the 2-way unpack
    assert process_rank("#1 in Books (See Top 100 in Books)") == (None, None)
    assert process_rank(None) == (None, None)
    assert process_rank("garbage") == (None, None)


def test_reduce_mem_downcasts():
    df = pd.DataFrame({
        "a": np.array([1, 2, 3], np.int64),
        "b": np.array([1e3, 2e3, 3e3], np.float64),
        "c": ["x", "y", "z"],
    })
    out = reduce_mem(df)
    assert out["a"].dtype == np.int8
    assert out["b"].dtype == np.float32
    assert not pd.api.types.is_numeric_dtype(out["c"].dtype)  # untouched
    pd.testing.assert_series_equal(
        out["a"].astype(np.int64), pd.Series([1, 2, 3], name="a")
    )


def test_k_core_filter():
    df = pd.DataFrame({
        "userid": ["u1"] * 3 + ["u2"] * 3 + ["u3"],
        "itemid": ["i1", "i2", "i1", "i2", "i1", "i2", "i3"],
    })
    out = k_core_filter(df, k=3)
    assert "u3" not in set(out["userid"])
    assert "i3" not in set(out["itemid"])
    assert set(out["userid"]) == {"u1", "u2"}


@pytest.fixture
def amazon_fixture(tmp_path, rng):
    n = 600
    items = [f"A{i:03d}" for i in range(40)]
    users = [f"U{i:03d}" for i in range(50)]
    end = 1534291200  # 2018-08-15
    df = pd.DataFrame({
        "itemid": rng.choice(items, n),
        "userid": rng.choice(users, n),
        "rating": rng.integers(1, 6, n).astype(float),
        "timestamp": end - rng.integers(0, 200 * 86400, n),
    })
    ratings_csv = tmp_path / "all_csv_files.csv"
    df.to_csv(ratings_csv, index=False, header=False)

    domains = list(
        ["Books", "Electronics", "Home & Kitchen", "Pet Supplies"]
    )
    meta_lines = []
    for it in items:
        meta_lines.append(json.dumps({
            "asin": it,
            "price": f"${rng.integers(1, 500)}.99",
            "rank": f"#{rng.integers(1, 99999):,} in {rng.choice(domains)}",
            "brand": f"Brand{rng.integers(0, 5)}",
            "category": [str(rng.choice(domains)), "Sub"],
        }))
    meta_path = tmp_path / "All_Amazon_Meta.json"
    meta_path.write_text("\n".join(meta_lines))
    return tmp_path, str(ratings_csv), str(meta_path)


def test_amazon_pipeline(amazon_fixture):
    tmp_path, ratings_csv, meta_path = amazon_fixture
    pre = AmazonPreprocessor(str(tmp_path), prepare2train_month=12, k_cores=2)
    out = pre.main(ratings_csv, meta_path)
    assert set(pre.FEATURES + ["label", "timestamp"]) == set(out.columns)
    assert out["label"].isin([0, 1]).all()
    assert out["domain"].between(0, 24).all()
    # binned dense features are small ints
    assert out["price"].max() <= 12
    assert out["sales_rank"].max() <= 11
    # ids are contiguous encodings
    assert out["itemid"].min() >= 0
    assert os.path.exists(pre.preprocess_path)
    # idempotent: second call reads the cache
    out2 = pre.main(ratings_csv, meta_path)
    assert len(out2) == len(out)


@pytest.fixture
def aliccp_raw_fixture(tmp_path, rng):
    # raw-ish skeleton + common features
    n_common = 20
    common_lines = []
    for i in range(n_common):
        feats = [f"101:{rng.integers(1, 30)}:1.0", f"121:{rng.integers(1, 5)}:1.0",
                 f"109_14:{rng.integers(1, 9)}:{rng.random():.3f}"]
        common_lines.append(f"c{i},{len(feats)}," + "\x01".join(feats))
    common_path = tmp_path / "common_features_train.csv"
    common_path.write_text("\n".join(common_lines))

    skeleton_lines = []
    for s in range(300):
        feats = [f"205:{rng.integers(1, 60)}:1.0", f"206:{rng.integers(1, 8)}:1.0",
                 f"508:{rng.integers(1, 9)}:{rng.random():.3f}"]
        click = int(rng.random() < 0.3)
        conv = int(click and rng.random() < 0.2)
        skeleton_lines.append(
            f"{s},{click},{conv},c{rng.integers(0, n_common)},{len(feats)},"
            + "\x01".join(feats)
        )
    skel_path = tmp_path / "sample_skeleton_train.csv"
    skel_path.write_text("\n".join(skeleton_lines))
    return tmp_path, str(skel_path), str(common_path)


def test_convert_raw_aliccp(aliccp_raw_fixture):
    tmp_path, skel, common = aliccp_raw_fixture
    out_csv = str(tmp_path / "ali_ccp_train.csv")
    val_csv = str(tmp_path / "ali_ccp_val.csv")
    convert_raw_aliccp(skel, common, out_csv, val_fraction=0.3,
                       val_out_csv=val_csv)
    tr = pd.read_csv(out_csv)
    va = pd.read_csv(val_csv)
    assert len(tr) + len(va) == 300
    for c in ["click", "purchase", "101", "205", "206", "D109_14", "D508"]:
        assert c in tr.columns
    assert tr["click"].isin([0, 1]).all()
    # dense value carried from the paired field
    assert (tr["D508"] > 0).any()


def test_aliccp_filter_and_sample(tmp_path, rng):
    n = 4000
    n_users, n_items, n_dom = 40, 60, 12

    def mk(tag, rows):
        return pd.DataFrame({
            "userid": rng.integers(0, n_users, rows),
            "itemid": rng.integers(0, n_items, rows),
            "domain": rng.choice(n_dom, rows, p=_skew(n_dom)),
            "click": rng.integers(0, 2, rows),
            **{c: rng.integers(0, 5, rows) for c in ["121", "301"]},
            **{d: rng.random(rows) * 10 for d in ALICCP_DENSE},
        })

    def _skew(k):
        w = 1.0 / np.arange(1, k + 1)
        return w / w.sum()

    dfs = [mk(0, n), mk(1, n // 10), mk(2, n // 10)]
    pre = AliCCPPreprocessor(str(tmp_path), downsample_freq_thresh=1,
                             sample_n_domain=5, sample_mode="nlargest")
    dfs = pre.discretize(dfs)
    # discretized dense cols are ordinal ints in [0, 10)
    for d in ALICCP_DENSE:
        assert dfs[0][d].between(0, 9).all()
    out = pre.filter_and_sample(dfs)
    assert out["domain"].nunique() <= 5
    # contiguous domain ids ordered by size
    vc = out["domain"].value_counts().sort_index()
    assert (vc.values == sorted(vc.values, reverse=True)).all()
    assert set(out["train_tag"].unique()) <= {0, 1, 2}
    # ids re-encoded contiguously
    assert out["userid"].max() == out["userid"].nunique() - 1


@pytest.mark.parametrize("mode", [
    "nlargest", "random", "interval", "weighted", "interval_random",
    "mix_interval_random",
])
def test_aliccp_all_sampling_modes(tmp_path, rng, mode):
    n_dom = 30
    w = 1.0 / np.arange(1, n_dom + 1)
    df = pd.DataFrame({
        "userid": rng.integers(0, 30, 6000),
        "itemid": rng.integers(0, 40, 6000),
        "domain": rng.choice(n_dom, 6000, p=w / w.sum()),
        "click": rng.integers(0, 2, 6000),
        **{d: rng.random(6000) for d in ALICCP_DENSE},
    })
    pre = AliCCPPreprocessor(str(tmp_path), downsample_freq_thresh=1,
                             sample_n_domain=8, sample_mode=mode)
    out = pre.filter_and_sample([df.copy()])
    assert 1 <= out["domain"].nunique() <= 8
    assert out["domain"].max() == out["domain"].nunique() - 1


def test_summarize_splits(rng):
    from tpurec.data import make_synthetic
    from tpurec.data.stats import summarize_splits

    data = make_synthetic(n_rows=5000, n_fields=6, n_domain=4, domain_idx=3, seed=9)
    stats = summarize_splits(data.train, data.valid, data.test, data.domain_idx)
    assert stats["n_domain"] == 4
    assert sum(stats["n_rows"].values()) == 5000
    assert abs(sum(stats["split_fractions"].values()) - 1.0) < 1e-9
    assert len(stats["domain_counts"]) == 4
    assert 0 <= stats["user_overlap"]["valid_in_train"]["frac"] <= 1


def test_hash_trick_deterministic_and_uniform():
    """Feature hashing: numpy/jax bit-identical, in-range, roughly uniform,
    and stable across runs; apply_hash_trick rewrites dims."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpurec.data.hashing import apply_hash_trick, hash_ids

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 2**31 - 1, size=20000)
    nb = 1024
    h_np = hash_ids(ids, nb, salt=7)
    h_jx = np.asarray(jax.jit(
        lambda x: hash_ids(x, nb, salt=7))(jnp.asarray(ids, jnp.int32)))
    np.testing.assert_array_equal(h_np, h_jx.astype(np.int64))
    assert h_np.min() >= 0 and h_np.max() < nb
    counts = np.bincount(h_np, minlength=nb)
    # uniformity: no bucket wildly over/under-represented (exp ~19.5)
    assert counts.max() < 60 and (counts == 0).sum() < nb // 10
    # different salts decorrelate
    assert (hash_ids(ids, nb, salt=8) != h_np).mean() > 0.9

    X = np.stack([ids % 50, ids, ids % 7], axis=1)
    X2, dims2 = apply_hash_trick(X, (50, 2**31 - 1, 7), {1: nb})
    assert dims2 == (50, nb, 7)
    np.testing.assert_array_equal(X2[:, 0], X[:, 0])
    np.testing.assert_array_equal(X2[:, 1], hash_ids(ids, nb, salt=1))
    # unseen/out-of-vocabulary ids still land in range (serving safety)
    huge = np.array([[3, 2**31 - 5, 2]])
    Xh, _ = apply_hash_trick(huge, (50, 2**31 - 1, 7), {1: nb})
    assert 0 <= Xh[0, 1] < nb


def _raw_aliccp_trio(tmp_path, rng, n_train=20000, n_eval=2500, n_dom=30):
    """Raw-format split CSVs (convert_raw_aliccp output schema)."""
    w = 1.0 / np.arange(1, n_dom + 1)
    w /= w.sum()

    def mk(rows):
        df = pd.DataFrame({"click": rng.integers(0, 2, rows),
                           "purchase": rng.integers(0, 2, rows)})
        for c in ALICCP_CATEGORICAL:
            if c == "101":
                df[c] = rng.integers(0, 400, rows)
            elif c == "205":
                df[c] = rng.integers(0, 900, rows)
            elif c == "206":
                df[c] = rng.choice(n_dom, rows, p=w)
            else:
                df[c] = rng.integers(0, 20, rows)
        for d in ALICCP_DENSE:
            df[d] = np.round(rng.random(rows) * 7, 6)
        return df

    paths = []
    for name, rows in (("train", n_train), ("val", n_eval), ("test", n_eval)):
        p = str(tmp_path / f"ali_ccp_{name}.csv")
        mk(rows).to_csv(p, index=False)
        paths.append(p)
    return paths


@pytest.mark.parametrize("mode", ["mix_interval_random", "nlargest",
                                  "interval_random"])
def test_aliccp_streaming_bit_identical(tmp_path, rng, mode):
    """The chunked low-memory path must reproduce the in-memory path's
    output CSV byte-for-byte (VERDICT r3 item 4), including value_counts
    tie ordering, rng-dependent domain sampling, and the reduce_mem
    float32 round-trip feeding the KBins fit."""
    train, val, test = _raw_aliccp_trio(tmp_path, rng)
    d_mem = tmp_path / "mem"
    d_str = tmp_path / "stream"
    d_mem.mkdir()
    d_str.mkdir()
    kw = dict(downsample_freq_thresh=2, sample_n_domain=8,
              sample_mode=mode, seed=2000)
    p_mem = AliCCPPreprocessor(str(d_mem), **kw)
    out_mem = p_mem.main(train, val, test, streaming=False)
    p_str = AliCCPPreprocessor(str(d_str), **kw)
    # odd chunksize so chunk boundaries cut through every split
    out_str = p_str.main(train, val, test, streaming=True, chunksize=1777)

    with open(p_mem.preprocess_path, "rb") as a, \
            open(p_str.preprocess_path, "rb") as b:
        assert a.read() == b.read()
    assert p_mem.domain2encoder_dict == p_str.domain2encoder_dict
    pd.testing.assert_frame_equal(out_mem.reset_index(drop=True),
                                  out_str, check_dtype=False)


def test_aliccp_streaming_rejects_quantile(tmp_path):
    pre = AliCCPPreprocessor(str(tmp_path), discrete_method="quantile")
    with pytest.raises(ValueError, match="uniform"):
        pre.main("a.csv", "b.csv", "c.csv", streaming=True)
