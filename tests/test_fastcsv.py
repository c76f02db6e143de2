"""Native CSV loader (tpurec/native/csv_loader.cpp) vs pandas."""

import os

import numpy as np
import pandas as pd
import pytest

from tpurec.data.fastcsv import load_table_cached, read_int_csv
from tpurec.native import native_available


@pytest.fixture
def csv_file(tmp_path, rng):
    df = pd.DataFrame({
        "userid": rng.integers(-500, 10_000, 5000),
        "itemid": rng.integers(0, 2**31 - 1, 5000),
        "domain": rng.integers(0, 50, 5000),
    })
    p = tmp_path / "table.csv"
    df.to_csv(p, index=False)
    return str(p), df


def test_read_matches_pandas(csv_file):
    path, df = csv_file
    names, arr = read_int_csv(path)
    assert names == list(df.columns)
    np.testing.assert_array_equal(arr, df.values.astype(np.int32))


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_path_is_used(csv_file):
    path, df = csv_file
    names, arr = read_int_csv(path, n_threads=3)
    np.testing.assert_array_equal(arr, df.values.astype(np.int32))


def test_strict_rejects_non_integer(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\n3,x\n")
    if native_available():
        with pytest.raises(ValueError):
            read_int_csv(str(p))
        names, arr = read_int_csv(str(p), strict=False)
        np.testing.assert_array_equal(arr, [[1, 2], [3, 0]])


def test_crlf_and_no_trailing_newline(tmp_path):
    p = tmp_path / "crlf.csv"
    with open(p, "wb") as f:
        f.write(b"a,b\r\n1,2\r\n-3,44")
    names, arr = read_int_csv(str(p))
    assert names == ["a", "b"]
    np.testing.assert_array_equal(arr, [[1, 2], [-3, 44]])


def test_cache_roundtrip(csv_file, tmp_path):
    path, df = csv_file
    n1, a1 = load_table_cached(path, cache_dir=str(tmp_path))
    n2, a2 = load_table_cached(path, cache_dir=str(tmp_path))  # cached load
    assert n1 == n2 == list(df.columns)
    np.testing.assert_array_equal(np.asarray(a2), df.values.astype(np.int32))
    assert os.path.exists(os.path.join(
        str(tmp_path), os.path.basename(path) + ".trc.npy"))


def test_cache_invalidation_on_rewrite(csv_file, tmp_path):
    path, df = csv_file
    load_table_cached(path, cache_dir=str(tmp_path))
    df2 = df.copy()
    df2["domain"] = 0
    os.utime(path)  # ensure mtime tick even on coarse filesystems
    df2.to_csv(path, index=False)
    os.utime(path, (os.path.getmtime(path) + 2, os.path.getmtime(path) + 2))
    _, arr = load_table_cached(path, cache_dir=str(tmp_path))
    assert (np.asarray(arr)[:, 2] == 0).all()
