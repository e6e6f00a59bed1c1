"""Native (C++) runtime: fast table IO and the sweep executor.

Artifacts build lazily on first use via g++ (ggp_tpu/runtime/build.py);
everything has a pure-Python fallback at the call sites, so the package
works without a toolchain too.
"""

from . import build, fast_csv, sweep
from .sweep import run_sweep
