"""Fused Pallas TPU kernels for the collapsed-bound sufficient statistics.

This is the performance-critical "native layer" (SURVEY §2.4): the reference
outsources its Gram/solve pipeline to GPyTorch+Theano; here the hot big-N
computation — build the N x M cross-covariance and reduce it to

    S_kk = Kmn Knm   (M x M),   S_ky = Kmn y   (M,)

— is a single streaming Pallas kernel over row blocks: each (BN x M) RBF-ARD
block is built in VMEM (squared-distance via one MXU matmul + VPU exp) and
immediately reduced into VMEM accumulators, so Knm never touches HBM.
HBM traffic drops from O(N*M) to O(N*D + M^2): for N=1M, M=512, D=8 that is
~250x less than materialising Knm.

The backward pass (custom VJP) re-streams the same blocks
(flash-attention-style recompute) and accumulates dZ (M x D), d log_ls (D,),
d log_os — the full hyper/inducing gradient of any function of the stats.

Supports Scale(RBF(ard)) — the reference's default model kernel
(models/sgpr.py:35-37). Other kernels fall back to the XLA path
(``ggp_tpu.models.sgpr.vfe_stats``), which XLA also fuses reasonably well.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rbf_vfe_stats", "stationary_vfe_stats", "pallas_available",
           "set_bf16_reduce", "BLOCK_N", "FAMILIES"]

# stationary families sharing the streamed distance pipeline; each entry is
# (k(d2, os), dk/d(d2)(d2, os)) — Matern gradients written in d2 so the
# r->0 singularity only appears for Matern-1/2 (guarded like the XLA path's
# grad-safe sqrt, kernels/base.py:dist)
FAMILIES = ("rbf", "matern12", "matern32", "matern52")

BLOCK_N = 512

# module-level switch (affects compile): bf16 single-pass MXU for the S_kk
# reduction vs multi-pass f32 emulation. Tri-state: None = unset (callers
# like models.sgpr.vfe_stats may then auto-pick per-size); an explicit
# set_bf16_reduce()/GGP_PALLAS_BF16 always wins (ADVICE r2).
_BF16_REDUCE = [True if _os.environ.get("GGP_PALLAS_BF16") else None]


def set_bf16_reduce(on: bool) -> None:
    _BF16_REDUCE[0] = bool(on)


def pallas_available() -> bool:
    if _os.environ.get("GGP_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _k_of_d2(d2, os, fam):
    if fam == "rbf":
        return os * jnp.exp(-0.5 * d2)
    r = jnp.sqrt(d2)
    if fam == "matern12":
        return os * jnp.exp(-r)
    if fam == "matern32":
        s = jnp.sqrt(3.0) * r
        return os * (1.0 + s) * jnp.exp(-s)
    if fam == "matern52":
        s = jnp.sqrt(5.0) * r
        return os * (1.0 + s + (5.0 / 3.0) * d2) * jnp.exp(-s)
    raise ValueError(fam)


def _dk_dd2(d2, k, os, fam):
    if fam == "rbf":
        return -0.5 * k
    r = jnp.sqrt(d2)
    # Matern kernels are functions of r: match the XLA path's grad-safe
    # sqrt semantics (kernels/base.py:dist), which zeroes the gradient at
    # coincident points (d2 == 0) — Z initialised from training rows hits
    # this on purpose.
    pos = (d2 > 0.0).astype(d2.dtype)
    if fam == "matern12":
        return -os * jnp.exp(-r) / (2.0 * jnp.maximum(r, 1e-12)) * pos
    if fam == "matern32":
        return -1.5 * os * jnp.exp(-jnp.sqrt(3.0) * r) * pos
    if fam == "matern52":
        s = jnp.sqrt(5.0) * r
        return -(5.0 / 6.0) * os * (1.0 + s) * jnp.exp(-s) * pos
    raise ValueError(fam)


def _fwd_kernel(nvalid_ref, os_ref, xs_ref, y_ref, zs_ref,
                skk_ref, sky_ref, *, fam, bf16):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        skk_ref[:] = jnp.zeros_like(skk_ref)
        sky_ref[:] = jnp.zeros_like(sky_ref)

    xs = xs_ref[:]                       # (BN, D) already scaled by 1/ls
    zs = zs_ref[:]                       # (M, D)
    y = y_ref[:]                         # (BN, 1)
    bn = xs.shape[0]

    # row validity mask for the final partial block
    row0 = i * bn
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bn, 1), 0)
    valid = rows < nvalid_ref[0]

    xn = jnp.sum(xs * xs, axis=1, keepdims=True)             # (BN, 1)
    zn = jnp.sum(zs * zs, axis=1, keepdims=True).T           # (1, M)
    cross = jnp.dot(xs, zs.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(xn + zn - 2.0 * cross, 0.0)
    k = _k_of_d2(d2, os_ref[0], fam)                         # (BN, M)
    k = jnp.where(valid, k, 0.0)

    # bf16 inputs to the dominant M x M reduction (f32 accumulate): single
    # MXU pass instead of the multi-pass f32 emulation — the S_kk target is
    # regularised downstream (B = I + AA^T), so ~1e-3 relative error in the
    # Gram-of-Gram is tolerable when enabled.
    kr = k.astype(jnp.bfloat16) if bf16 else k
    skk_ref[:] += jnp.dot(kr.T, kr, preferred_element_type=jnp.float32)
    sky_ref[:] += jnp.dot(k.T, jnp.where(valid, y, 0.0),
                          preferred_element_type=jnp.float32)


def _fwd_call(Xs, y2, Zs, outputscale, n_valid, block_n, fam, bf16):
    Np, D = Xs.shape
    M = Zs.shape[0]
    grid = (Np // block_n,)
    skk, sky = pl.pallas_call(
        functools.partial(_fwd_kernel, fam=fam, bf16=bf16),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, M), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(jnp.asarray([n_valid], jnp.int32),
      jnp.asarray([outputscale], jnp.float32), Xs, y2, Zs)
    return skk, sky


# ---------------------------------------------------------------------------
# Backward kernel (streams the same blocks, accumulates param cotangents)
# ---------------------------------------------------------------------------

def _bwd_kernel(nvalid_ref, os_ref, xs_ref, y_ref, zs_ref, g_ref, dsky_ref,
                dz_ref, dls_ref, dos_ref, *, fam):
    """g_ref = dskk + dskk^T (precomputed host-side), dsky (M, 1).

    w := dL/d(d2) = -0.5 * k * dk, with dk = y dsky^T + k g.
    dzs  += -2 (w^T xs - zs * colsum_w)           [in scaled coords]
    dls_scaled_d accumulates sum_bm w_bm (xs_bd - zs_md)^2  (chain to log_ls
    applied host-side), dos += sum k*dk / os.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dz_ref[:] = jnp.zeros_like(dz_ref)
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dos_ref[:] = jnp.zeros_like(dos_ref)

    xs = xs_ref[:]
    zs = zs_ref[:]
    y = y_ref[:]
    bn = xs.shape[0]
    row0 = i * bn
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bn, 1), 0)
    valid = rows < nvalid_ref[0]

    xn = jnp.sum(xs * xs, axis=1, keepdims=True)
    zn = jnp.sum(zs * zs, axis=1, keepdims=True).T
    cross = jnp.dot(xs, zs.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(xn + zn - 2.0 * cross, 0.0)
    k = _k_of_d2(d2, os_ref[0], fam)
    k = jnp.where(valid, k, 0.0)

    dk = jnp.dot(jnp.where(valid, y, 0.0), dsky_ref[:].T,
                 preferred_element_type=jnp.float32) \
        + jnp.dot(k, g_ref[:], preferred_element_type=jnp.float32)
    # dL/dos = sum dk * (k/os): every family scales linearly in os
    dos_ref[:] += (jnp.sum(k * dk) / os_ref[0]).reshape(1, 1)
    w = jnp.where(valid, _dk_dd2(d2, k, os_ref[0], fam), 0.0) * dk  # (BN, M)

    colsum_w = jnp.sum(w, axis=0, keepdims=True)            # (1, M)
    wtx = jnp.dot(w.T, xs, preferred_element_type=jnp.float32)   # (M, D)
    dz_ref[:] += -2.0 * (wtx - zs * colsum_w.T)

    # sum_bm w (xs-zs)^2 per dim d
    rowsum_w = jnp.sum(w, axis=1, keepdims=True)            # (BN, 1)
    wz = jnp.dot(w, zs, preferred_element_type=jnp.float32)  # (BN, D)
    term = (jnp.sum(xs * xs * rowsum_w, axis=0)
            - 2.0 * jnp.sum(xs * wz, axis=0)
            + jnp.sum(zs * zs * colsum_w.T, axis=0))        # (D,)
    dls_ref[0, :] += term


def _bwd_call(Xs, y2, Zs, outputscale, n_valid, g_sym, dsky, block_n, fam):
    Np, D = Xs.shape
    M = Zs.shape[0]
    grid = (Np // block_n,)
    dz, dls, dos = pl.pallas_call(
        functools.partial(_bwd_kernel, fam=fam),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_n, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, M), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(jnp.asarray([n_valid], jnp.int32),
      jnp.asarray([outputscale], jnp.float32), Xs, y2, Zs, g_sym, dsky)
    return dz, dls, dos


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def stationary_vfe_stats(X, y, Z, log_ls, log_os, block_n=BLOCK_N,
                         fam="rbf", bf16=None):
    """Fused VFE statistics for Scale(<stationary>) kernels (RBF + the
    Matern family share the streamed distance pipeline; SURVEY §7.1).

    Returns the same dict as ``ggp_tpu.models.sgpr.vfe_stats``. Differentiable
    w.r.t. Z, log_ls, log_os (X and y are data).
    """
    return _stats_fwd_impl(X, y, Z, log_ls, log_os, block_n, fam, bf16)


def rbf_vfe_stats(X, y, Z, log_ls, log_os, block_n=BLOCK_N):
    """RBF alias of :func:`stationary_vfe_stats`."""
    return stationary_vfe_stats(X, y, Z, log_ls, log_os, block_n, "rbf")


def _prep(X, y, Z, log_ls, log_os, block_n):
    N, D = X.shape
    ls = jnp.exp(log_ls) * jnp.ones((D,), X.dtype)
    outputscale = jnp.exp(log_os)
    Xs = (X / ls).astype(jnp.float32)
    Zs = (Z / ls).astype(jnp.float32)
    Np = _round_up(max(N, block_n), block_n)
    Xs = jnp.pad(Xs, ((0, Np - N), (0, 0)))
    y2 = jnp.pad(y.astype(jnp.float32)[:, None], ((0, Np - N), (0, 0)))
    return Xs, y2, Zs, ls, outputscale


def _stats_fwd_impl(X, y, Z, log_ls, log_os, block_n, fam, bf16=None):
    if bf16 is None:
        bf16 = bool(_BF16_REDUCE[0])
    N = X.shape[0]
    Xs, y2, Zs, ls, outputscale = _prep(X, y, Z, log_ls, log_os, block_n)
    skk, sky = _fwd_call(Xs, y2, Zs, outputscale, N, block_n, fam, bf16)
    dtype = X.dtype
    return {
        "S_kk": skk.astype(dtype),
        "S_ky": sky[:, 0].astype(dtype),
        "s_kdiag": (outputscale * N).astype(dtype),
        "s_yy": jnp.sum(y * y),
    }


def _stats_fwd(X, y, Z, log_ls, log_os, block_n, fam, bf16):
    out = _stats_fwd_impl(X, y, Z, log_ls, log_os, block_n, fam, bf16)
    return out, (X, y, Z, log_ls, log_os)


def _stats_bwd(block_n, fam, bf16, res, ct):
    X, y, Z, log_ls, log_os = res
    N, D = X.shape
    Xs, y2, Zs, ls, outputscale = _prep(X, y, Z, log_ls, log_os, block_n)
    dskk = ct["S_kk"].astype(jnp.float32)
    g_sym = dskk + dskk.T
    dsky = ct["S_ky"].astype(jnp.float32)[:, None]
    dz_s, dls_term, dos = _bwd_call(Xs, y2, Zs, outputscale, N, g_sym, dsky,
                                    block_n, fam)
    # chain rules back to natural parameters
    dZ = (dz_s / ls[None, :]).astype(Z.dtype)               # zs = Z/ls
    # d(log ls): d2 depends on ls via xs,zs: d d2/d log_ls_d = -2*(xs-zs)_d^2
    # accumulated term = sum w*(xs-zs)^2 per dim; d/dlog_ls = -2*term
    dlog_ls_full = -2.0 * dls_term[0]
    # s_kdiag = os*N and k scale: dos total includes ct on s_kdiag
    dos_total = dos[0, 0] + jnp.asarray(ct["s_kdiag"], jnp.float32) * N
    dlog_os = (dos_total * outputscale).astype(jnp.asarray(log_os).dtype)
    # ct["s_yy"] only touches y (non-diff input) — dropped.
    if jnp.ndim(log_ls) == 0:
        dlog_ls = jnp.sum(dlog_ls_full).astype(jnp.asarray(log_ls).dtype)
    else:
        dlog_ls = dlog_ls_full.astype(log_ls.dtype)
    return (None, None, dZ, dlog_ls, dlog_os)


stationary_vfe_stats.defvjp(_stats_fwd, _stats_bwd)
