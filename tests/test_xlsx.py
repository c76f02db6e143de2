"""The dependency-free .xlsx matrix writer (reference cdc.py:398-400 parity)."""

import zipfile

import numpy as np

from tpurec.utils.xlsx import _col_name, read_matrix_xlsx, write_matrix_xlsx


def test_col_names():
    assert [_col_name(j) for j in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA"]


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    m = rng.standard_normal((7, 5))
    m[0, 0] = 0.0
    m[1, 1] = -1e-30
    path = str(tmp_path / "m.xlsx")
    write_matrix_xlsx(path, m)
    # valid zip with the OPC parts Excel/LibreOffice require
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        assert zf.testzip() is None
    assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
            "xl/worksheets/sheet1.xml"} <= names
    back = read_matrix_xlsx(path)
    np.testing.assert_array_equal(back, m)  # repr() round-trips floats exactly


def test_rejects_non_2d(tmp_path):
    import pytest

    with pytest.raises(ValueError):
        write_matrix_xlsx(str(tmp_path / "x.xlsx"), np.zeros(3))
