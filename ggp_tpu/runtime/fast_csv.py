"""ctypes binding for the native table reader (csrc/fast_table.cc)."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from .build import lib_path

_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(lib_path("libggp_fast_table.so"))
        lib.ggp_read_table.argtypes = [
            ctypes.c_char_p, ctypes.c_char, ctypes.c_long,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ]
        lib.ggp_read_table.restype = ctypes.c_int
        lib.ggp_table_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    return _lib


_INFER = object()


def read(path: str, sep: Optional[str] = ",", skiprows: int = 0,
         header=_INFER, **_ignored) -> np.ndarray:
    """Read a numeric table as (rows, cols) float64 with pandas-compatible
    call semantics (the dataset layer passes ``pd.read_csv`` kwargs through):

    * ``sep`` defaults to "," like pandas; a whitespace regex (r"\\s+") or
      " " selects whitespace mode,
    * ``header`` defaults to pandas-style inference: non-numeric leading
      rows (which the C parser yields as all-NaN) are dropped;
      ``header=None`` means "no header, keep all rows";
      ``header=<int>`` consumes that many leading rows explicitly.
    """
    lib = _get_lib()
    if sep is None or sep in (" ", "\\s+", r"\s+"):
        delim = b" "                      # whitespace-run mode
    elif len(sep) == 1:
        delim = sep.encode()              # incl. "\t" as a real delimiter
    else:
        raise ValueError(f"fast_csv supports single-char or whitespace "
                         f"separators, got {sep!r} - use the pandas path")
    if header is not _INFER and header is not None:
        skiprows = skiprows + int(header) + 1
    data_p = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_long()
    cols = ctypes.c_long()
    rc = lib.ggp_read_table(path.encode(), ctypes.c_char(delim),
                            skiprows, ctypes.byref(data_p),
                            ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"ggp_read_table({path!r}) failed with code {rc}")
    arr = np.ctypeslib.as_array(data_p, shape=(rows.value, cols.value)).copy()
    lib.ggp_table_free(data_p)
    if header is _INFER and arr.shape[0] and np.isnan(arr[0]).all():
        # pandas-like inference: at most ONE leading all-non-numeric row is
        # a header (further all-NaN rows are genuine missing-data rows)
        arr = arr[1:]
    return arr
