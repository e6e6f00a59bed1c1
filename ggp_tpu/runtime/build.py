"""Build the native runtime pieces with g++ (no pybind11 in this image;
bindings are plain ctypes). Idempotent: rebuilds only when sources are newer
than the artifacts."""

from __future__ import annotations

import os
import subprocess
import sysconfig

HERE = os.path.dirname(__file__)
CSRC = os.path.join(HERE, "csrc")
LIBDIR = os.path.join(HERE, "lib")

TARGETS = [
    # (source, output, extra flags)
    ("fast_table.cc", "libggp_fast_table.so",
     ["-shared", "-fPIC", "-pthread"]),
    ("sweep.cc", "libggp_sweep.so",
     ["-shared", "-fPIC", "-pthread", "-DGGP_SWEEP_LIB"]),
    ("sweep.cc", "ggp-sweep", ["-pthread"]),
]


def _needs_build(src: str, out: str) -> bool:
    if not os.path.exists(out):
        return True
    return os.path.getmtime(src) > os.path.getmtime(out)


def build(verbose: bool = False) -> dict:
    os.makedirs(LIBDIR, exist_ok=True)
    built = {}
    for src_name, out_name, flags in TARGETS:
        src = os.path.join(CSRC, src_name)
        out = os.path.join(LIBDIR, out_name)
        if _needs_build(src, out):
            cmd = ["g++", "-O3", "-std=c++17"] + flags + [src, "-o", out]
            if verbose:
                print(" ".join(cmd))
            subprocess.run(cmd, check=True, capture_output=not verbose)
        built[out_name] = out
    return built


def lib_path(name: str) -> str:
    path = os.path.join(LIBDIR, name)
    if not os.path.exists(path):
        build()
    return path


if __name__ == "__main__":
    print(build(verbose=True))
