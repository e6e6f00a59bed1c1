"""Native runtime: fast table reader parity vs pandas, sweep executor."""

import os
import textwrap

import numpy as np
import pytest

pytest.importorskip("ctypes")

from ggp_tpu.runtime import build


@pytest.fixture(scope="module")
def built():
    try:
        return build.build()
    except Exception as e:            # no toolchain -> skip module
        pytest.skip(f"native build unavailable: {e}")


def test_fast_table_whitespace(built, tmp_path):
    from ggp_tpu.runtime import fast_csv
    p = tmp_path / "t.data"
    p.write_text("1.0  2.5 3\n4 5.5\t6\n\n7 8 9\n")
    arr = fast_csv.read(str(p), sep=r"\s+")
    np.testing.assert_allclose(arr, [[1, 2.5, 3], [4, 5.5, 6], [7, 8, 9]])


def test_fast_table_semicolon_header(built, tmp_path):
    from ggp_tpu.runtime import fast_csv
    p = tmp_path / "wine.csv"
    p.write_text('"a";"b";"c"\n1;2;3\n4;5;6\n')
    arr = fast_csv.read(str(p), sep=";", header=0)
    np.testing.assert_allclose(arr, [[1, 2, 3], [4, 5, 6]])


def test_fast_table_matches_pandas_large(built, tmp_path):
    import pandas as pd
    from ggp_tpu.runtime import fast_csv
    rng = np.random.default_rng(0)
    data = rng.normal(size=(5000, 12))
    p = tmp_path / "big.csv"
    np.savetxt(p, data, delimiter=",")
    ours = fast_csv.read(str(p), sep=",")
    ref = pd.read_csv(p, header=None).values
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_fast_table_ragged_rows_pad_nan(built, tmp_path):
    from ggp_tpu.runtime import fast_csv
    p = tmp_path / "ragged.csv"
    p.write_text("1,2,3\n4,5\n")
    arr = fast_csv.read(str(p), sep=",")
    assert arr.shape == (2, 3)
    assert np.isnan(arr[1, 2])


def test_sweep_executor(built, tmp_path):
    from ggp_tpu.runtime import run_sweep
    out = tmp_path / "o"
    cmds = [f"echo {i} >> {out}_{i}" for i in range(6)] + ["false"]
    failed, results = run_sweep(cmds, jobs=3, retries=1)
    assert failed == 1
    assert sum(1 for s, _ in results if s == 0) == 6
    for i in range(6):
        assert (tmp_path / f"o_{i}").exists()
    # the failing task was retried
    assert all(t >= 0 for _, t in results)


def test_sweep_binary_exists(built):
    assert os.path.exists(built["ggp-sweep"])
    assert os.access(built["ggp-sweep"], os.X_OK)


def test_fast_table_empty_fields_nan(built, tmp_path):
    """Missing values keep column alignment (pandas semantics)."""
    from ggp_tpu.runtime import fast_csv
    p = tmp_path / "m.csv"
    p.write_text("1,,3\n,5,6\n7,8,\n")
    arr = fast_csv.read(str(p), sep=",", header=None)
    assert arr.shape == (3, 3)
    assert np.isnan(arr[0, 1]) and arr[0, 2] == 3
    assert np.isnan(arr[1, 0]) and arr[1, 1] == 5
    assert np.isnan(arr[2, 2]) and arr[2, 0] == 7


def test_fast_table_tab_delimiter(built, tmp_path):
    from ggp_tpu.runtime import fast_csv
    p = tmp_path / "t.tsv"
    p.write_text("1\t\t3\n4\t5\t6\n")
    arr = fast_csv.read(str(p), sep="\t", header=None)
    assert arr.shape == (2, 3)
    assert np.isnan(arr[0, 1])


def test_fast_table_no_trailing_newline(built, tmp_path):
    from ggp_tpu.runtime import fast_csv
    p = tmp_path / "n.csv"
    p.write_bytes(b"1,2\n3,4")          # no trailing newline
    arr = fast_csv.read(str(p), sep=",", header=None)
    np.testing.assert_allclose(arr, [[1, 2], [3, 4]])


def test_fast_table_multichar_sep_rejected(built, tmp_path):
    from ggp_tpu.runtime import fast_csv
    p = tmp_path / "x.csv"
    p.write_text("1,2\n")
    with pytest.raises(ValueError, match="single-char"):
        fast_csv.read(str(p), sep=r"\s*,\s*")


def test_fast_table_single_header_row_only(built, tmp_path):
    """Header inference drops at most ONE leading non-numeric row."""
    from ggp_tpu.runtime import fast_csv
    p = tmp_path / "h.csv"
    p.write_text("a,b\n?,?\n1,2\n")
    arr = fast_csv.read(str(p), sep=",")
    assert arr.shape == (2, 2)           # the '?,?' row is DATA (all-NaN)
    assert np.isnan(arr[0]).all()
