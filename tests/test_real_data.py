"""Real-data loading + NLPD-parity golden tests (skipped until files exist).

Drop the files listed in DATA.md and these activate: shape/semantics
checks against the reference loaders (utils/dataset.py:128-272) and SGPR NLPD
parity against the published benchmarks (benchmarks_nlpd_main.csv:1-6).
Also exercises the pandas-free fast_table path on the REAL file formats —
including Boston's fixed-width housing.data (the reference parses it with
``read_fwf``, utils/dataset.py:131; whitespace-run splitting is equivalent
because no field in the file abuts its neighbour).
"""

import os

import numpy as np
import pytest

from ggp_tpu.config import DATASET_DIR
from ggp_tpu.utils.datasets import (get_regression_data,
                                    regression_datasets)

# (name, expected N, expected D after drops) — reference utils/dataset.py
_SHAPES = {
    "boston": (506, 13),
    "concrete": (1030, 8),
    "energy": (768, 8),
    "winered": (1599, 11),
    "yacht": (308, 6),
    "kin8nm": (8192, 8),
    "power": (9568, 4),
    "protein": (45730, 9),
    "naval": (11934, 14),
    "winewhite": (4898, 11),
}

# SGPR ML-II test NLPD, mean ± stderr over 10 splits
# (/root/reference/benchmarks_nlpd_main.csv:1-6)
_GOLDEN_SGPR_NLPD = {
    "boston": (2.539, 0.040),
    "concrete": (3.097, 0.014),
    "energy": (0.670, 0.014),
    "winered": (0.961, 0.014),
    "yacht": (0.494, 0.150),
}


def _have(name):
    cls = regression_datasets.get(name)
    if cls is None:
        return False
    path = os.path.join(DATASET_DIR, name, getattr(cls, "filename", ""))
    return os.path.exists(path)


@pytest.mark.parametrize("name", sorted(_SHAPES))
def test_real_dataset_shapes_and_split_semantics(name):
    if not _have(name):
        pytest.skip(f"{name}: drop the file per DATA.md to enable")
    d0 = get_regression_data(name, split=0, prop=0.8)
    N, D = _SHAPES[name]
    assert d0.N == N and d0.D == D, (d0.N, d0.D)
    n_train = int(0.8 * N)
    assert d0.X_train.shape == (n_train, D)
    assert d0.X_test.shape[0] == N - n_train
    # normalization: X z-scored over the full data before splitting
    # (reference utils/dataset.py:38-41,122-125)
    Xall = np.concatenate([d0.X_train, d0.X_test])
    assert np.allclose(Xall.mean(0), 0.0, atol=1e-5)
    assert np.allclose(Xall.std(0), 1.0, atol=1e-3)
    # split seeding: BASE_SEED+split shuffles reproducibly and differs by split
    d0b = get_regression_data(name, split=0, prop=0.8)
    assert np.allclose(d0.X_train, d0b.X_train)
    d1 = get_regression_data(name, split=1, prop=0.8)
    assert not np.allclose(d0.Y_train, d1.Y_train)


def test_boston_whitespace_parse_matches_pandas(tmp_path):
    """fast_table's whitespace mode parses the real housing.data fixed-width
    layout identically to pandas (and to the reference's read_fwf values).
    Runs against a format-exact snippet so it works without the real file."""
    snippet = (
        " 0.00632  18.00   2.310  0  0.5380  6.5750  65.20  4.0900   1"
        "  296.0  15.30 396.90   4.98  24.00\n"
        " 0.02731   0.00   7.070  0  0.4690  6.4210  78.90  4.9671   2"
        "  242.0  17.80 396.90   9.14  21.60\n"
        " 9.14136 100.00  18.100  1  0.7000  6.2000 100.00  1.1742  24"
        "  666.0  20.20  27.74  10.63  50.00\n")
    p = tmp_path / "housing.data"
    p.write_text(snippet)
    import pandas as pd

    from ggp_tpu.runtime import fast_csv
    a = fast_csv.read(str(p), header=None, sep=r"\s+")
    b = pd.read_csv(str(p), header=None, sep=r"\s+").values
    assert a.shape == (3, 14) == b.shape
    np.testing.assert_allclose(a, b)
    assert a[0, -1] == 24.00 and a[2, 8] == 24


@pytest.mark.parametrize("name", sorted(_GOLDEN_SGPR_NLPD))
def test_sgpr_nlpd_parity(name):
    """Golden NLPD parity vs benchmarks_nlpd_main.csv (SGPR column): 3-split
    mean within 4 combined standard errors of the published 10-split mean."""
    if not _have(name):
        pytest.skip(f"{name}: drop the file per DATA.md to enable")
    import jax
    import jax.numpy as jnp

    from ggp_tpu.models import SparseGPR
    from ggp_tpu.utils.metrics import nlpd

    golden_mean, golden_se = _GOLDEN_SGPR_NLPD[name]
    vals = []
    for split in range(3):
        data = get_regression_data(name, split=split, prop=0.8)
        X = jnp.asarray(data.X_train, jnp.float32)
        y = jnp.asarray(data.Y_train, jnp.float32)
        rng = np.random.RandomState(45)
        Z = X[rng.randint(0, X.shape[0], min(100, X.shape[0]))]
        m = SparseGPR(X, y, Z_init=Z)
        m.train_model(max_steps=2000, verbose=False)
        mean, var = m.posterior_predictive(jnp.asarray(data.X_test, jnp.float32),
                                           full_cov=False)
        vals.append(float(nlpd(mean, var, jnp.asarray(data.Y_test, jnp.float32),
                               data.Y_std)))
    ours = float(np.mean(vals))
    se = float(np.hypot(golden_se, np.std(vals) / np.sqrt(len(vals)) + 1e-9))
    assert abs(ours - golden_mean) < 4.0 * se + 0.05, \
        f"{name}: ours {ours:.3f} vs golden {golden_mean:.3f}±{golden_se:.3f}"


# ---------------------------------------------------------------------------
# Byte-format fixtures (VERDICT r2 item 6): synthetic files written in each
# benchmark dataset's EXACT container format, parsed through the production
# loader pipeline, asserted equal to the known values. Proves loader
# format-fidelity without egress for all five formats: .xls (OLE2+BIFF8),
# .xlsx (zip+XML), ;-CSV, whitespace-run, and header-skipped openml CSV.
# ---------------------------------------------------------------------------

def _write_xlsx(path, rows):
    """Minimal SpreadsheetML writer: same zip layout/namespaces as real
    files (ENB2012_data.xlsx, Folds5x2_pp.xlsx)."""
    import zipfile

    def cell(r, c, v):
        ref = chr(ord("A") + c) + str(r + 1)
        if isinstance(v, str):
            return (f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>')
        return f'<c r="{ref}"><v>{float(v)!r}</v></c>'

    body = "".join(
        f'<row r="{i + 1}">' +
        "".join(cell(i, j, v) for j, v in enumerate(row)) + "</row>"
        for i, row in enumerate(rows))
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = ('xmlns:r="http://schemas.openxmlformats.org/officeDocument/'
           '2006/relationships"')
    pk = "http://schemas.openxmlformats.org/package/2006"
    od = "http://schemas.openxmlformats.org/officeDocument/2006"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml",
                   f'<?xml version="1.0"?><Types xmlns="{pk}/content-types">'
                   '<Default Extension="rels" ContentType="application/vnd.'
                   'openxmlformats-package.relationships+xml"/>'
                   '<Default Extension="xml" ContentType="application/xml"/>'
                   '<Override PartName="/xl/workbook.xml" ContentType='
                   '"application/vnd.openxmlformats-officedocument.'
                   'spreadsheetml.sheet.main+xml"/>'
                   '<Override PartName="/xl/worksheets/sheet1.xml" '
                   'ContentType="application/vnd.openxmlformats-'
                   'officedocument.spreadsheetml.worksheet+xml"/></Types>')
        z.writestr("_rels/.rels",
                   f'<?xml version="1.0"?><Relationships xmlns="{pk}/'
                   'relationships"><Relationship Id="rId1" Type='
                   f'"{od}/relationships/officeDocument" '
                   'Target="xl/workbook.xml"/></Relationships>')
        z.writestr("xl/workbook.xml",
                   f'<?xml version="1.0"?><workbook {ns} {rns}><sheets>'
                   '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
                   '</workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
                   f'<?xml version="1.0"?><Relationships xmlns="{pk}/'
                   'relationships"><Relationship Id="rId1" Type='
                   f'"{od}/relationships/worksheet" '
                   'Target="worksheets/sheet1.xml"/></Relationships>')
        z.writestr("xl/worksheets/sheet1.xml",
                   f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
                   f'{body}</sheetData></worksheet>')


def _write_xls(path, rows):
    """Minimal legacy .xls writer: BIFF8 stream (BOF/SST/LABELSST/NUMBER/
    EOF records) inside an OLE2 compound file — the same container layout
    as the real Concrete_Data.xls."""
    import struct

    recs = []

    def rec(op, bodyb):
        recs.append(struct.pack("<HH", op, len(bodyb)) + bodyb)

    rec(0x0809, struct.pack("<HHHH", 0x0600, 0x0005, 0, 0))   # BOF globals
    strings = [v for row in rows for v in row if isinstance(v, str)]
    sst = struct.pack("<II", len(strings), len(strings))
    for s_ in strings:
        b = s_.encode("latin-1")
        sst += struct.pack("<HB", len(s_), 0) + b             # narrow
    rec(0x00FC, sst)
    rec(0x000A, b"")                                          # EOF globals
    rec(0x0809, struct.pack("<HHHH", 0x0600, 0x0010, 0, 0))   # BOF sheet
    si = 0
    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            if isinstance(v, str):
                rec(0x00FD, struct.pack("<HHHI", r, c, 0, si))
                si += 1
            elif v is not None:
                rec(0x0203, struct.pack("<HHH", r, c, 0)
                    + struct.pack("<d", float(v)))
    rec(0x000A, b"")                                          # EOF sheet
    stream = b"".join(recs)
    size = max(len(stream), 4097)       # past the mini-stream cutoff
    stream += b"\0" * (size - len(stream))
    nsec = -(-size // 512)
    stream += b"\0" * (nsec * 512 - size)

    E, F, FS = 0xFFFFFFFE, 0xFFFFFFFF, 0xFFFFFFFD
    fat = [FS, E] + list(range(3, 2 + nsec)) + [E]
    assert len(fat) <= 128, "fixture stream too large for one FAT sector"
    fat += [F] * (128 - len(fat))

    def dirent(name, typ, start, dsize, child=0xFFFFFFFF):
        nm = name.encode("utf-16-le") + b"\0\0"
        ent = nm + b"\0" * (64 - len(nm))
        ent += struct.pack("<HBB", len(nm), typ, 1)
        ent += struct.pack("<III", F, F, child)
        ent += b"\0" * 16 + b"\0" * 4 + b"\0" * 16
        ent += struct.pack("<iI", start, dsize) + b"\0" * 4
        assert len(ent) == 128
        return ent

    directory = (dirent("Root Entry", 5, -2, 0, child=1)
                 + dirent("Workbook", 2, 2, size)
                 + b"\0" * 256)
    header = (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\0" * 16
              + struct.pack("<HHHHH", 0x003E, 0x0003, 0xFFFE, 9, 6)
              + b"\0" * 6
              + struct.pack("<IIIIIiIiI", 0, 1, 1, 0, 4096,
                            -2, 0, -2, 0)
              + struct.pack("<i", 0) + struct.pack("<108i", *([-1] * 108)))
    assert len(header) == 512, len(header)
    with open(path, "wb") as f:
        f.write(header + struct.pack("<128I", *fat) + directory + stream)


def _install(monkeypatch, tmp_path, name, filename, writer):
    import ggp_tpu.utils.datasets as ds
    monkeypatch.setattr(ds, "DATASET_DIR", str(tmp_path))
    p = tmp_path / name
    p.mkdir(parents=True, exist_ok=True)
    writer(str(p / filename))
    return p / filename


def _fixture_matrix(n, cols, seed):
    rng = np.random.default_rng(seed)
    return np.round(rng.uniform(-5, 100, size=(n, cols)), 4)


def test_concrete_xls_format(monkeypatch, tmp_path):
    """.xls (OLE2 + BIFF8) — reference parses with pd.read_excel
    (utils/dataset.py:137-145); our loader must produce the identical
    array from the raw bytes."""
    vals = _fixture_matrix(12, 9, 1)
    rows = [[f"col{j}" for j in range(9)]] + vals.tolist()
    _install(monkeypatch, tmp_path, "concrete", "Concrete_Data.xls",
             lambda p: _write_xls(p, rows))
    from ggp_tpu.utils.datasets import Concrete
    X, y = Concrete.__new__(Concrete).read_data()
    np.testing.assert_allclose(X, vals[:, :-1])
    np.testing.assert_allclose(y, vals[:, -1])


def test_energy_xlsx_format(monkeypatch, tmp_path):
    """.xlsx (zip + SpreadsheetML) with the ENB2012 column structure
    (8 features + 2 targets, first target kept — utils/dataset.py:147-155)."""
    vals = _fixture_matrix(10, 10, 2)
    rows = [[f"X{j}" for j in range(1, 9)] + ["Y1", "Y2"]] + vals.tolist()
    _install(monkeypatch, tmp_path, "energy", "ENB2012_data.xlsx",
             lambda p: _write_xlsx(p, rows))
    from ggp_tpu.utils.datasets import Energy
    X, y = Energy.__new__(Energy).read_data()
    np.testing.assert_allclose(X, vals[:, :8])
    np.testing.assert_allclose(y, vals[:, 8])       # Y1, not Y2


def test_winered_semicolon_csv_format(monkeypatch, tmp_path):
    """;-separated CSV with quoted header (utils/dataset.py:211-219)."""
    vals = _fixture_matrix(9, 12, 3)
    header = ";".join(f'"f{j}"' for j in range(12))
    body = "\n".join(";".join(str(v) for v in row) for row in vals.tolist())

    def writer(p):
        with open(p, "w") as f:
            f.write(header + "\n" + body + "\n")

    _install(monkeypatch, tmp_path, "winered", "winequality-red.csv", writer)
    from ggp_tpu.utils.datasets import WineRed
    X, y = WineRed.__new__(WineRed).read_data()
    np.testing.assert_allclose(X, vals[:, :-1])
    np.testing.assert_allclose(y, vals[:, -1])


def test_yacht_space_run_format(monkeypatch, tmp_path):
    """whitespace-run separated, no header, trailing spaces — the real
    yacht_hydrodynamics.data quirks (utils/dataset.py:227-233)."""
    vals = _fixture_matrix(8, 7, 4)
    body = "\n".join("  ".join(str(v) for v in row) + " "
                     for row in vals.tolist())

    def writer(p):
        with open(p, "w") as f:
            f.write(body + "\n")

    _install(monkeypatch, tmp_path, "yacht", "yacht_hydrodynamics.data",
             writer)
    from ggp_tpu.utils.datasets import Yacht
    X, y = Yacht.__new__(Yacht).read_data()
    np.testing.assert_allclose(X, vals[:, :-1])
    np.testing.assert_allclose(y, vals[:, -1])


def test_kin8nm_openml_csv_format(monkeypatch, tmp_path):
    """openml get_csv 'arff' = one header line then plain CSV; reference
    skips the header with skiprows=1 (utils/dataset.py:157-163)."""
    vals = _fixture_matrix(11, 9, 5)
    header = ",".join([f"theta{j}" for j in range(1, 9)] + ["y"])
    body = "\n".join(",".join(str(v) for v in row) for row in vals.tolist())

    def writer(p):
        with open(p, "w") as f:
            f.write(header + "\n" + body + "\n")

    _install(monkeypatch, tmp_path, "kin8nm", "dataset_2175_kin8nm.arff",
             writer)
    from ggp_tpu.utils.datasets import Kin8mn
    X, y = Kin8mn.__new__(Kin8mn).read_data()
    np.testing.assert_allclose(X, vals[:, :-1])
    np.testing.assert_allclose(y, vals[:, -1])


def test_xls_rk_and_mulrk_records(tmp_path):
    """RK/MULRK numeric encodings (real .xls writers emit these for compact
    numbers) decode exactly: integer, /100, and truncated-f64 variants."""
    import struct

    from ggp_tpu.utils.xlsx import read_xls

    recs = []

    def rec(op, bodyb):
        recs.append(struct.pack("<HH", op, len(bodyb)) + bodyb)

    def rk_int(v):
        return ((v << 2) | 0x02) & 0xFFFFFFFF

    def rk_f64(v):
        return struct.unpack("<Q", struct.pack("<d", v))[0] >> 32 & 0xFFFFFFFC

    rec(0x0809, struct.pack("<HHHH", 0x0600, 0x0005, 0, 0))
    rec(0x000A, b"")
    rec(0x0809, struct.pack("<HHHH", 0x0600, 0x0010, 0, 0))
    rec(0x027E, struct.pack("<HHHI", 0, 0, 0, rk_int(42)))
    rec(0x027E, struct.pack("<HHHI", 0, 1, 0, rk_int(1234) | 0x01))  # /100
    rec(0x027E, struct.pack("<HHHI", 0, 2, 0, rk_f64(2.5)))
    # MULRK: row 1, cols 0-2
    mul = struct.pack("<HH", 1, 0)
    for v in (7, 8, 9):
        mul += struct.pack("<HI", 0, rk_int(v))
    mul += struct.pack("<H", 2)
    rec(0x00BD, mul)
    rec(0x000A, b"")
    stream = b"".join(recs)

    # wrap in the same OLE2 container as _write_xls
    import ggp_tpu.utils.xlsx as xlsx_mod
    path = str(tmp_path / "rk.xls")
    rows_placeholder = [[1.0]]
    _write_xls(path, rows_placeholder)          # container template
    # splice our stream: rewrite via the writer's framing by re-packing
    with open(path, "rb") as f:
        blob = bytearray(f.read())
    size = max(len(stream), 4097)
    stream_p = stream + b"\0" * (size - len(stream))
    nsec = -(-size // 512)
    stream_p += b"\0" * (nsec * 512 - size)
    # fixture container from _write_xls always spans >= these sectors
    start = 512 + 2 * 512
    assert len(blob) - start >= len(stream_p)
    blob[start:start + len(stream_p)] = stream_p
    with open(path, "wb") as f:
        f.write(blob)
    rows = read_xls(path)
    assert rows[0][0] == 42.0
    assert abs(rows[0][1] - 12.34) < 1e-12
    assert rows[0][2] == 2.5
    assert rows[1][:3] == [7.0, 8.0, 9.0]
