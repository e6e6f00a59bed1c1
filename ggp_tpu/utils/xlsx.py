"""Stdlib-only Excel readers: .xlsx (zip+XML) and legacy .xls (OLE2+BIFF8).

Why: the reference loads Concrete/Energy/Power via ``pd.read_excel``
(/root/reference/utils/dataset.py:137-223), which needs openpyxl/xlrd —
neither ships in this environment. These readers cover exactly what the UCI
benchmark files need (numeric cells + string headers, first worksheet) so
the dataset layer works from a bare Python install; pandas' read_excel is
still preferred when its engines are importable (utils/datasets.py).

Fidelity is proven without egress by byte-format fixture tests
(tests/test_real_data.py): minimal writers produce files in the same binary
layouts (zip container XML / OLE2 compound file with BIFF8 NUMBER/RK/
LABELSST records) and the parsed arrays must round-trip exactly.
"""

from __future__ import annotations

import re
import struct
import zipfile
from typing import List, Optional
from xml.etree import ElementTree

__all__ = ["read_xlsx", "read_xls", "excel_values"]

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB12' -> 27."""
    col = 0
    for ch in cell_ref:
        if ch.isalpha():
            col = col * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return col - 1


def read_xlsx(path: str) -> List[List[object]]:
    """Rows of the FIRST worksheet. Numeric cells -> float; shared/inline
    strings -> str; empty cells -> None (ragged rows padded by caller)."""
    with zipfile.ZipFile(path) as z:
        shared: List[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or ""
                                      for t in si.iter(f"{_NS}t")))
        # first worksheet by the conventional path (sheet1.xml); fall back
        # to the lexicographically first xl/worksheets/*.xml member
        sheets = sorted(n for n in z.namelist()
                        if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n))
        if not sheets:
            raise ValueError(f"{path}: no worksheets found")
        sheet = ("xl/worksheets/sheet1.xml"
                 if "xl/worksheets/sheet1.xml" in sheets else sheets[0])
        root = ElementTree.fromstring(z.read(sheet))
        rows: List[List[object]] = []
        for row_el in root.iter(f"{_NS}row"):
            row: List[object] = []
            for c in row_el.findall(f"{_NS}c"):
                ref = c.get("r")
                idx = _col_index(ref) if ref else len(row)
                while len(row) <= idx:
                    row.append(None)
                ctype = c.get("t", "n")
                v = c.find(f"{_NS}v")
                if ctype == "s" and v is not None and v.text is not None:
                    row[idx] = shared[int(v.text)]
                elif ctype == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    row[idx] = "".join(t.text or "" for t in
                                       is_el.iter(f"{_NS}t")) \
                        if is_el is not None else None
                elif v is not None and v.text is not None:
                    try:
                        row[idx] = float(v.text)
                    except ValueError:
                        row[idx] = v.text
            rows.append(row)
    return rows


# ---------------------------------------------------------------------------
# Legacy .xls: OLE2 compound file + BIFF8 worksheet records
# ---------------------------------------------------------------------------

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD


def _ole2_stream(data: bytes, names=("Workbook", "Book")) -> bytes:
    """Extract a named stream from an OLE2 compound file (FAT chains only;
    the Workbook stream of any real .xls exceeds the 4096-byte mini-stream
    cutoff, so miniFAT is not needed)."""
    if data[:8] != b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        raise ValueError("not an OLE2 compound file")
    ssz = struct.unpack_from("<H", data, 30)[0]
    sec = 1 << ssz
    first_dir = struct.unpack_from("<i", data, 48)[0]
    num_fat = struct.unpack_from("<I", data, 44)[0]
    difat = struct.unpack_from("<109i", data, 76)
    fat_sectors = [s for s in difat[:num_fat] if s >= 0]
    if len(fat_sectors) < num_fat:
        raise ValueError("DIFAT overflow sectors not supported "
                         "(file larger than ~6.8 MB)")

    def sector(i: int) -> bytes:
        off = 512 + i * sec
        return data[off:off + sec]

    fat = []
    for s in fat_sectors:
        fat.extend(struct.unpack(f"<{sec // 4}i", sector(s)))

    def chain(start: int) -> bytes:
        out = []
        s = start
        while s >= 0:          # ENDOFCHAIN/FREESECT/FATSECT are negative
            out.append(sector(s))
            s = fat[s]
        return b"".join(out)

    directory = chain(first_dir)
    for off in range(0, len(directory), 128):
        ent = directory[off:off + 128]
        if len(ent) < 128:
            break
        nlen = struct.unpack_from("<H", ent, 64)[0]
        name = ent[:max(nlen - 2, 0)].decode("utf-16-le", "ignore")
        if name in names:
            start = struct.unpack_from("<i", ent, 116)[0]
            size = struct.unpack_from("<I", ent, 120)[0]
            if size < 4096:
                raise ValueError("mini-stream Workbook not supported")
            return chain(start)[:size]
    raise ValueError(f"no {names} stream in OLE2 file")


def _rk_value(rk: int) -> float:
    cent = rk & 0x01
    if rk & 0x02:                              # 30-bit signed integer
        v = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFC))[0]
                  >> 2)
    else:                                      # top 30 bits of an f64
        v = struct.unpack("<d", struct.pack("<Q",
                                            (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100.0 if cent else v


def read_xls(path: str) -> List[List[object]]:
    """Rows of the FIRST worksheet of a BIFF8 .xls: NUMBER (0x0203),
    RK (0x027E), MULRK (0x00BD) numeric cells and LABELSST (0x00FD) strings
    against the shared-string table (SST 0x00FC + CONTINUE)."""
    with open(path, "rb") as f:
        stream = _ole2_stream(f.read())

    # pass 1 (workbook globals): shared-string table
    sst: List[str] = []
    pos, depth = 0, 0
    records = []
    while pos + 4 <= len(stream):
        op, ln = struct.unpack_from("<HH", stream, pos)
        body = stream[pos + 4:pos + 4 + ln]
        records.append((op, body))
        pos += 4 + ln
        if op == 0x000A and len(records) > 1:   # EOF record
            depth += 1
            if depth >= 2:                      # globals + first sheet
                break
        if op == 0:
            break

    def _parse_sst(chunks):
        # SST body + CONTINUE bodies: [total, unique] then unicode strings.
        # Limitation: a single string SPLIT across a CONTINUE boundary
        # restates its option-flags byte at the continuation start, which
        # this reader does not re-read — the UCI files' SSTs hold only
        # short column headers, far below the 8 KB record limit, so no
        # string ever spans (and numeric parsing is unaffected either way).
        out = []
        buf, it = chunks[0], 1
        n_unique = struct.unpack_from("<I", buf, 4)[0]
        p = 8
        while len(out) < n_unique:
            if p + 3 > len(buf):
                if it >= len(chunks):
                    break
                buf, p, it = chunks[it], 0, it + 1
                continue
            clen, flags = struct.unpack_from("<HB", buf, p)
            p += 3
            wide = flags & 0x01
            # rich/ext not produced for plain headers; skip counts if present
            if flags & 0x08:
                p += 2
            if flags & 0x04:
                p += 4
            nbytes = clen * (2 if wide else 1)
            raw = buf[p:p + nbytes]
            p += nbytes
            out.append(raw.decode("utf-16-le" if wide else "latin-1"))
        return out

    for i, (op, body) in enumerate(records):
        if op == 0x00FC:                        # SST
            chunks = [body]
            for op2, b2 in records[i + 1:]:
                if op2 == 0x003C:               # CONTINUE
                    chunks.append(b2)
                else:
                    break
            sst = _parse_sst(chunks)
            break

    # pass 2: first sheet's cell records (after the second BOF)
    cells = {}
    bofs = 0
    for op, body in records:
        if op == 0x0809:                        # BOF
            bofs += 1
            continue
        if bofs < 2:
            continue
        if op == 0x0203:                        # NUMBER
            r, c = struct.unpack_from("<HH", body, 0)
            cells[(r, c)] = struct.unpack_from("<d", body, 6)[0]
        elif op == 0x027E:                      # RK
            r, c = struct.unpack_from("<HH", body, 0)
            cells[(r, c)] = _rk_value(struct.unpack_from("<I", body, 6)[0])
        elif op == 0x00BD:                      # MULRK
            r, c0 = struct.unpack_from("<HH", body, 0)
            ncell = (len(body) - 6) // 6
            for k in range(ncell):
                rk = struct.unpack_from("<I", body, 4 + 6 * k + 2)[0]
                cells[(r, c0 + k)] = _rk_value(rk)
        elif op == 0x00FD:                      # LABELSST
            r, c = struct.unpack_from("<HH", body, 0)
            idx = struct.unpack_from("<I", body, 6)[0]
            cells[(r, c)] = sst[idx] if idx < len(sst) else ""
    if not cells:
        return []
    nrow = max(r for r, _ in cells) + 1
    ncol = max(c for _, c in cells) + 1
    return [[cells.get((r, c)) for c in range(ncol)] for r in range(nrow)]


def excel_values(path: str, usecols: Optional[int] = None):
    """pandas-free ``pd.read_excel(path).values`` equivalent: parse by
    extension, drop the header row (pandas' ``header=0`` default), return a
    float ndarray of the leading ``usecols`` columns (all if None)."""
    import numpy as np

    rows = read_xls(path) if path.lower().endswith(".xls") else \
        read_xlsx(path)
    data = rows[1:]                             # header row, as pandas does
    width = max(len(r) for r in data)
    if usecols is not None:
        width = min(width, usecols)
    out = np.full((len(data), width), np.nan)
    for i, r in enumerate(data):
        for j in range(min(len(r), width)):
            v = r[j]
            if isinstance(v, (int, float)) and v is not None:
                out[i, j] = float(v)
    return out
