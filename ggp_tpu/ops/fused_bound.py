"""Custom-call-free collapsed VFE bound: value + analytic gradient in one pass.

Why this exists (PERF.md hot-loop profile): on the target TPU runtime every
sampler-loop iteration that contains a *custom call* — an XLA
Cholesky/triangular-solve, or even a trivial Pallas call — pays a ~80 us fixed
overhead plus ~20 us per extra call. The NUTS leapfrog evaluates the collapsed
bound's value+grad at every leaf, so that overhead is the measured floor
(139 us/eval at Boston size, of which ~90 us is overhead). Autodiff of the
direct bound emits ~6 custom calls per eval.

This module removes *all* custom calls from the potential:

* ``block_chol_u`` / ``block_ut_inv`` — blocked, MXU-friendly Cholesky and
  upper-triangular inverse written as pure jnp/lax HLO (dynamic slices +
  ``dot_general`` + ``fori_loop``); XLA compiles them into the sampler loop
  body with no custom-call boundary. Row-oriented (we build U = L^T) so all
  dynamic indexing lands on the cheap sublane axis.
* ``make_rbf_vfe_potential`` — the negative log posterior and its gradient
  for the flagship BayesianSGPR_HMC target (Scale(RBF-ARD) kernel, Gaussian
  likelihood, the reference's Gamma(2,1)/HalfCauchy(1) priors,
  /root/reference/models/bayesian_sgpr_hmc.py:62-68) with a hand-derived
  adjoint, numerically identical (same direct Cholesky formulation, same
  relative-jitter policy) to ``jax.value_and_grad`` of
  ``-(sgpr_elbo + log_prior)``.

The gradient uses the numerically-sound direct formulation (A = L^-1 Kmn —
condition number linear in cond(Kmn), unlike the stats formulation that made
``sgpr_elbo_fast`` f32-unsafe, PERF.md):

  dF/dKnm  = [A^T (I - B^-1) L^-1 + alpha w^T] / sigma
  dF/dKmm  = -w w^T/(2 s2) + L^-T (2I - B - B^-1) L^-1 / 2
  dF/ds2   = ||alpha||^2/2 - tr(W)/2 + t/(2 s2^2)
  with  B = I + A A^T,  u = A y,  v = B^-1 u,  w = L^-T v,
        alpha = (y - A^T v)/s2,  tr(W) = (n - M + tr B^-1)/s2,
        t = sum kdiag - s2 (tr B - M)

then chains through the RBF-ARD kernel in closed form. Verified against
``jax.grad`` to machine precision (tests/test_fused_bound.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["block_chol_u", "block_ut_inv", "chol_u_inplace", "ut_inv_inplace",
           "chol_u_inv_inplace", "ut_t_solve_vec", "ut_solve_vec",
           "make_rbf_vfe_potential", "make_gpr_potential",
           "fused_potential_is_eligible"]

_LANES = 128


def _dg(a, b, ca, cb):
    """dot_general contracting dim ca of a with cb of b, f32-accumulated."""
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((), ())),
        preferred_element_type=a.dtype if a.dtype == jnp.float64 else jnp.float32)


def _chol_panel(p, j0, block, pivot_floor=None):
    """Factor ``block`` pivot rows (lanes j0..j0+block-1) of a symmetric
    trailing panel p (block, Mp). Statically unrolled; dynamic indices appear
    only in lane masks. Returns the U (=L^T) panel. Non-PSD pivots propagate
    NaN (matching ``jnp.linalg.cholesky``) so sampler divergence detection
    keeps working — unless ``pivot_floor`` (traced scalar > 0) is given, in
    which case pivots are clamped to it (modified Cholesky of a nearby PSD
    matrix; used by the SVI training kernels, where a NaN factor would
    permanently poison Adam state instead of flagging a divergence)."""
    Mp = p.shape[1]
    dt = p.dtype
    colmj = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1) - j0
    rowb = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    rows = []
    for i in range(block):
        onehot = (colmj == i).astype(dt)                  # (1, Mp)
        ri = p[i:i + 1, :]                                # (1, Mp)
        d = jnp.sum(ri * onehot)
        ui, dis = _pivot_row(ri, d, onehot, (colmj >= i).astype(dt),
                             pivot_floor, dt)
        rows.append(ui)
        cu = jnp.sum(p * onehot, axis=1, keepdims=True) * dis   # (block,1)
        p = p - jnp.where(rowb > i, cu, jnp.asarray(0.0, dt)) * ui
    return jnp.concatenate(rows, axis=0)


def _inv_panel(S, R, i0, block):
    """Back-substitute the diagonal block of panel S (rows i0..i0+block-1 of
    U) against accumulated right-hand side R. Returns the V panel."""
    Mp = S.shape[1]
    dt = S.dtype
    colmj = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1) - i0
    rowb = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    rows: list = [None] * block
    for k in range(block - 1, -1, -1):
        onehot = (colmj == k).astype(dt)
        ukk = jnp.sum(S[k:k + 1, :] * onehot)
        vk = R[k:k + 1, :] / ukk                          # (1, Mp)
        rows[k] = vk
        c = jnp.sum(S * onehot, axis=1, keepdims=True)    # (block, 1)
        R = R - jnp.where(rowb < k, c, jnp.asarray(0.0, dt)) * vk
    return jnp.concatenate(rows, axis=0)


def block_chol_u(K: jnp.ndarray, block: int = 16,
                 pivot_floor=None) -> jnp.ndarray:
    """U = chol(K)^T (upper triangular), pure HLO — no lapack custom call.

    Right-looking blocked algorithm over ``block``-row panels: panel
    factorisation via :func:`_chol_panel`, trailing update via one MXU
    ``dot_general`` per panel.
    """
    Mp = K.shape[0]
    assert Mp % block == 0, (Mp, block)

    def block_step(bj, carry):
        K, U = carry
        j0 = bj * block
        p = jax.lax.dynamic_slice(K, (j0, 0), (block, Mp))
        Up = _chol_panel(p, j0, block, pivot_floor)
        U = jax.lax.dynamic_update_slice(U, Up, (j0, 0))
        K = K - _dg(Up, Up, 0, 0)                             # trailing update
        return K, U

    _, U = jax.lax.fori_loop(0, Mp // block, block_step,
                             (K, jnp.zeros_like(K)))
    return U


def block_ut_inv(U: jnp.ndarray, block: int = 16) -> jnp.ndarray:
    """V = U^-1 for upper-triangular U, pure HLO (no trsm custom call).

    Bottom-up blocked back-substitution; same masking strategy as
    :func:`block_chol_u`.
    """
    Mp = U.shape[0]
    assert Mp % block == 0, (Mp, block)
    dt = U.dtype
    nb = Mp // block
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    rowb = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)

    def block_step(t, V):
        i0 = (nb - 1 - t) * block
        S = jax.lax.dynamic_slice(U, (i0, 0), (block, Mp))    # (block, Mp)
        Smask = S * (col >= i0 + block).astype(dt)
        E = ((rowb + i0) == col).astype(dt)                   # identity rows
        R = E - _dg(Smask, V, 1, 0)
        Vp = _inv_panel(S, R, i0, block)
        return jax.lax.dynamic_update_slice(V, Vp, (i0, 0))

    # V starts at zero so masked products with not-yet-written rows vanish
    return jax.lax.fori_loop(0, nb, block_step, jnp.zeros_like(U))


# -- ref-based variants for use INSIDE Pallas kernels ------------------------
# (Mosaic does not lower dynamic_slice on values, so the in-kernel versions
# read/write panels through Refs with pl.ds; the panel math is shared.)

def chol_u_inplace(K_ref, U_ref, block: int = 16) -> None:
    """In-kernel U = chol(K)^T: consumes K_ref (destroyed), writes U_ref."""
    from jax.experimental import pallas as pl

    Mp = K_ref.shape[0]
    nb = Mp // block

    def step(bj, _):
        j0 = pl.multiple_of(bj * block, block)
        p = K_ref[pl.ds(j0, block), :]
        Up = _chol_panel(p, j0, block)
        U_ref[pl.ds(j0, block), :] = Up
        K_ref[:] = K_ref[:] - _dg(Up, Up, 0, 0)
        return 0

    jax.lax.fori_loop(0, nb, step, 0)


def _pivot_row(ri, d, onehot, ge_mask, pivot_floor, dt):
    """Shared pivot policy: NaN row on non-SPD (sampler divergence
    semantics), or — SVI modified-Cholesky semantics — a deficient pivot
    becomes a pure sqrt(floor) e_i row and elimination from it is skipped
    (flooring alone would amplify the negative direction through the
    trailing update). Returns (ui, dis)."""
    if pivot_floor is None:
        dis = jnp.where(
            d > 0,
            jax.lax.rsqrt(jnp.maximum(d, jnp.asarray(1e-38, dt))),
            jnp.asarray(jnp.nan, dt))
        return ri * dis * ge_mask, dis
    dis = jax.lax.rsqrt(jnp.maximum(d, pivot_floor))
    ui = jnp.where(d >= pivot_floor, ri * dis * ge_mask,
                   jnp.sqrt(pivot_floor) * onehot)
    return ui, dis


def _mini_chol_inv(Dblk, block, pivot_floor=None):
    """chol + inverse of a tiny (block, block) SPD block, fully unrolled on
    single-vreg tiles. Returns udinv with ud^T ud = Dblk, udinv = ud^-1.
    Non-SPD pivots propagate NaN (or clamp, see :func:`_pivot_row`)."""
    dt = Dblk.dtype
    colB = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
    rowB = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    P = Dblk
    rows = []
    for i in range(block):
        ri = P[i:i + 1, :]
        d = ri[0, i]
        ui, dis = _pivot_row(ri, d, (colB == i).astype(dt),
                             (colB >= i).astype(dt), pivot_floor, dt)
        rows.append(ui)
        c = P[:, i:i + 1] * dis
        P = P - jnp.where(rowB > i, c, jnp.asarray(0.0, dt)) * ui
    ud = jnp.concatenate(rows, axis=0)
    # back-substitute ud^-1
    vrows: list = [None] * block
    R = (rowB == colB).astype(dt)
    for k in range(block - 1, -1, -1):
        vk = R[k:k + 1, :] / ud[k, k]
        vrows[k] = vk
        c = ud[:, k:k + 1]
        R = R - jnp.where(rowB < k, c, jnp.asarray(0.0, dt)) * vk
    return ud, jnp.concatenate(vrows, axis=0)


def _mini_chol_inv_v2(Dblk, block, pivot_floor=None):
    """Scalar-free variant of :func:`_mini_chol_inv`: pivot values are kept
    as (1,1)/(B,1) tiles extracted by masked sums, so every op in the
    unrolled loops stays on the vector unit — no scalar-register round
    trips (the batched multichain kernels use the same style; A/B'd in
    PERF.md round 3)."""
    dt = Dblk.dtype
    colB = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
    rowB = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    # loop-invariant mask matrices: the per-pivot one-hot / cumulative
    # masks become FREE static row slices instead of an iota compare +
    # cast per unrolled iteration (~4 vector ops saved per pivot — these
    # unrolled loops are the op-issue-bound floor of every fused eval)
    eyeB = (rowB == colB).astype(dt)                          # (B,B)
    geB = (colB >= rowB).astype(dt)
    P = Dblk
    rows = []
    for i in range(block):
        onehot = eyeB[i:i + 1, :]
        ri = P[i:i + 1, :]
        d = jnp.sum(ri * onehot, axis=1, keepdims=True)       # (1,1)
        ui, dis = _pivot_row(ri, d, onehot, geB[i:i + 1, :],
                             pivot_floor, dt)
        rows.append(ui)
        cu = jnp.sum(P * onehot, axis=1, keepdims=True)       # (B,1)
        P = P - jnp.where(rowB > i, cu * dis, jnp.asarray(0.0, dt)) * ui
    ud = jnp.concatenate(rows, axis=0)

    vrows: list = [None] * block
    R = eyeB
    for k in range(block - 1, -1, -1):
        onehot = eyeB[k:k + 1, :]
        ukk = jnp.sum(ud[k:k + 1, :] * onehot, axis=1, keepdims=True)
        vk = R[k:k + 1, :] / ukk
        vrows[k] = vk
        ck = jnp.sum(ud * onehot, axis=1, keepdims=True)
        R = R - jnp.where(rowB < k, ck, jnp.asarray(0.0, dt)) * vk
    return ud, jnp.concatenate(vrows, axis=0)


def _mini_chol_inv_w(Dblk, block, pivot_floor=None):
    """Single-pass variant of :func:`_mini_chol_inv_v2`: builds
    W = ud^{-T} (the LOWER-triangular inverse ``chol(Dblk)^{-1}``) row by
    row with forward substitution, skipping the whole backward pass.

    Identities (round 4): with L = chol(Dblk) and W = L^{-1},
    ``W Dblk = L^T`` — so the subdiagonal column the recursion needs is
    ``u = (W a_col_i)`` (one MXU contraction against the UNMODIFIED input
    block), the pivot is ``d = A_ii - ||u||^2``, and
    ``w_i = (e_i - u^T W) * rsqrt(d)``. Per pivot: 3 tiny MXU
    contractions + ~8 vector ops, vs ~20 vector ops across v2's two
    passes — these unrolled loops are the op-issue floor of every fused
    potential eval (PERF.md).

    MEASURED SLOWER than v2 on TPU v5e despite the op count (0.62x on the
    flagship NUTS chunk kernel): the 3 MXU contractions are serially
    dependent within each pivot AND across pivots, so the loop pays ~3x128
    un-pipelined MXU latencies per factorisation where v2's longer VPU
    chains pipeline back-to-back. Kept as an opt-in ablation
    (``GGP_MINI=w``) and as the reference implementation of the
    single-pass identity (PERF.md round 4).

    pivot_floor semantics match v2 exactly: a deficient pivot's row
    becomes ``e_i / sqrt(floor)`` (i.e. ud row ``sqrt(floor) e_i``) and
    contributes nothing to later pivots — enforced by masking ``u`` to
    non-floored rows. Non-floored W rows provably carry zeros on floored
    coordinates, so the recursion against the ORIGINAL block stays exact.
    Without a floor, a non-positive pivot turns ``dis`` into NaN which
    propagates through W (sampler divergence semantics, as v1/v2).

    Returns W with ``W^T = udinv`` (callers consume it transpose-free:
    ``udinv^T p = W p`` and ``udinv R = contract(W, R, dim0, dim0)``).
    """
    dt = Dblk.dtype
    colB = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
    rowB = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    eyeB = (rowB == colB).astype(dt)
    AT = _dg(Dblk, eyeB, 0, 0)             # A^T: row i = A[:, i]^T
    W = jnp.zeros((block, block), dt)
    ok = jnp.zeros((1, block), dt) if pivot_floor is not None else None
    for i in range(block):
        onehot = eyeB[i:i + 1, :]
        arow = AT[i:i + 1, :]
        urow = _dg(arow, W, 1, 1)          # (1,B): u[j] = w_j . A[:, i]
        if ok is not None:
            urow = urow * ok               # floored rows contribute nothing
        aii = jnp.sum(arow * onehot, axis=1, keepdims=True)
        d = aii - _dg(urow, urow, 1, 1)    # (1,1)
        wtil = onehot - _dg(urow, W, 1, 0)
        if pivot_floor is None:
            dis = jnp.where(
                d > 0,
                jax.lax.rsqrt(jnp.maximum(d, jnp.asarray(1e-38, dt))),
                jnp.asarray(jnp.nan, dt))
            wi = wtil * dis
        else:
            # floored pivot: v2 emits ud row sqrt(floor) e_i and skips its
            # elimination. In W-form that is exactly: scale this row by
            # rsqrt(floor) (= dis via the max) and exclude it from future
            # u extractions (ok mask) — earlier non-floored ud rows keep
            # generic entries at column i, so wtil is still needed.
            good = (d >= pivot_floor).astype(dt)
            dis = jax.lax.rsqrt(jnp.maximum(d, pivot_floor))
            wi = wtil * dis
            ok = ok + good * onehot
        W = W + eyeB[:, i:i + 1] * wi      # write row i (rows >= i were 0)
    return W


def chol_u_inv_inplace(K_ref, U_ref, V_ref, Dinv_ref, block: int = 16,
                       pivot_floor=None) -> None:
    """Fused in-kernel U = chol(K)^T and V = U^-1 (MXU-dominant form).

    Pass 1 (Cholesky): per panel, the (block x block) diagonal block is
    extracted with one MXU contraction, mini-factored + mini-inverted on
    single-vreg tiles (:func:`_mini_chol_inv`), and the whole U panel is then
    ONE matmul ``ud^-T @ p`` (its own diagonal block comes out as ud for
    free: ud^-T (ud^T ud) = ud). The per-block ``ud^-1`` is cached in
    ``Dinv_ref``.

    Pass 2 (inverse): block back-substitution where each panel solve is one
    matmul with the cached ``ud^-1`` — no per-lane unrolled steps at all.

    ~3x fewer vector ops than chol_u_inplace + ut_inv_inplace (PERF.md).
    K_ref is destroyed; Dinv_ref must be (Mp, >=block).
    """
    from jax.experimental import pallas as pl

    Mp = K_ref.shape[0]
    dt = K_ref.dtype
    nb = Mp // block
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    rowb = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    dpad = Dinv_ref.shape[1] - block

    import os as _os
    # GGP_MINI picks the mini-factorisation layout: "v2" (scalar-free two
    # -pass, default), "w" (single-pass W = ud^-T — 2x fewer issue slots on
    # paper but 0.62x measured on TPU v5e: the 3 serially-dependent tiny
    # MXU contractions per pivot stall on MXU latency where v2's VPU chains
    # pipeline; 71.4 vs 116.4 us/leaf on the flagship NUTS chunk kernel,
    # PERF.md round 4), or "v1" (scalar-register variant).
    mini = _os.environ.get("GGP_MINI", "v2")
    if _os.environ.get("GGP_MINI_V1"):       # legacy ablation switch
        mini = "v1"

    def chol_step(bj, _):
        j0 = pl.multiple_of(bj * block, block)
        p = K_ref[pl.ds(j0, block), :]
        Ej = ((rowb + j0) == col).astype(dt)                  # (block, Mp)
        Dblk = _dg(p, Ej, 1, 1)                               # p[:, j0:j0+B]
        if mini == "w":
            # single-pass W = ud^-T: the Dinv cache holds W, consumed
            # transpose-free in both passes (see _mini_chol_inv_w)
            W = _mini_chol_inv_w(Dblk, block, pivot_floor)
            Up = _dg(W, p, 1, 0) * (col >= j0).astype(dt)
            dcache = W
        else:
            if mini == "v1":
                ud, udinv = _mini_chol_inv(Dblk, block, pivot_floor)
            else:
                ud, udinv = _mini_chol_inv_v2(Dblk, block, pivot_floor)
            # U panel = ud^-T p, masked to lanes >= j0
            Up = _dg(udinv, p, 0, 0) * (col >= j0).astype(dt)
            dcache = udinv
        U_ref[pl.ds(j0, block), :] = Up
        if dpad > 0:
            dcache = jnp.concatenate(
                [dcache, jnp.zeros((block, dpad), dt)], axis=1)
        Dinv_ref[pl.ds(j0, block), :] = dcache
        K_ref[:] = K_ref[:] - _dg(Up, Up, 0, 0)
        return 0

    jax.lax.fori_loop(0, nb, chol_step, 0)
    V_ref[:] = jnp.zeros((Mp, Mp), dt)

    def inv_step(t, _):
        i0 = pl.multiple_of((nb - 1 - t) * block, block)
        S = U_ref[pl.ds(i0, block), :]
        Smask = S * (col >= i0 + block).astype(dt)
        E = ((rowb + i0) == col).astype(dt)
        R = E - _dg(Smask, V_ref[:], 1, 0)
        dcache = Dinv_ref[pl.ds(i0, block), :][:, :block]
        if mini == "w":
            V_ref[pl.ds(i0, block), :] = _dg(dcache, R, 0, 0)
        else:
            V_ref[pl.ds(i0, block), :] = _dg(dcache, R, 1, 0)
        return 0

    jax.lax.fori_loop(0, nb, inv_step, 0)


def ut_inv_inplace(U_ref, V_ref, block: int = 16) -> None:
    """In-kernel V = U^-1 (upper triangular): reads U_ref, writes V_ref."""
    from jax.experimental import pallas as pl

    Mp = U_ref.shape[0]
    dt = U_ref.dtype
    nb = Mp // block
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    rowb = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    V_ref[:] = jnp.zeros((Mp, Mp), dt)

    def step(t, _):
        i0 = pl.multiple_of((nb - 1 - t) * block, block)
        S = U_ref[pl.ds(i0, block), :]
        Smask = S * (col >= i0 + block).astype(dt)
        E = ((rowb + i0) == col).astype(dt)
        R = E - _dg(Smask, V_ref[:], 1, 0)
        V_ref[pl.ds(i0, block), :] = _inv_panel(S, R, i0, block)
        return 0

    jax.lax.fori_loop(0, nb, step, 0)


_INV_LS_CAP_NUM = 1024.0


def capped_inv_ls(theta_row, ls_mask, *coords, data_scale=0.0):
    """exp(-theta) for the lengthscale lanes, capped data-aware.

    The cores compute squared distances by norm expansion
    (xn + zn - 2 x.z) on inputs scaled by exp(-log_ls); once
    max|coord| * exp(-log_ls) passes ~1e3 the f32 expansion loses ALL
    absolute accuracy (error ~ 6e-8 * norms^2 > O(1)) and the resulting
    garbage r2 turns exp(-r2/2) into random 0-or-sf2 entries — measured on
    TPU as O(10)-relative gradient errors at warmup-extreme hyper rows,
    whose spurious divergences destabilise dual averaging (eps adapts
    ~40% low, ~2x min-ESS/s loss in the chain-batched samplers). Below
    the cap the expansion is accurate; beyond it the TRUE kernel is
    already exactly diagonal in f32 for distinct points (r2 >= (0.01 *
    1024)^2 => K underflows), so capping replaces cancellation garbage
    with clean zeros and the lengthscale gradient smoothly hands over to
    the prior term. Capping = lengthscale floor scale/1024, orders of
    magnitude below any posterior-relevant value.

    ``data_scale``: static float folded into the cap for coordinates NOT
    resident in the caller (the streaming cores keep X in HBM, so they
    pass max|X| computed host-side at build time; ADVICE r4 — without it
    the cap admits inv_ls where the f32 norm expansion of the streamed
    Knm r2 still cancels whenever max|X| > max|Z|).
    """
    scale = jnp.asarray(max(1e-3, float(data_scale)), theta_row.dtype)
    for Cc in coords:
        scale = jnp.maximum(scale, jnp.max(jnp.abs(Cc)))
    cap = _INV_LS_CAP_NUM / scale
    return jnp.minimum(jnp.exp(-theta_row), cap) * ls_mask


# --------------------------------------------------------------------------
# Parameterised hyper-priors (VERDICT r4 item 7)
#
# The vfe/gpr cores used to hard-code the default prior tree (Gamma(2,1) on
# lengthscales, HalfCauchyOnStd(1) on outputscale/noise) — any user-changed
# prior silently dropped the model to the ~3x-slower XLA path. The prior is
# now a STATIC spec triple (ls, outputscale, noise), each leaf a
# ("family", *params) tuple with a closed-form in-kernel (logpdf, d/du)
# pair; family params are Python floats so normalisation constants needing
# lgamma (absent from Mosaic) fold at trace time via math.lgamma.
# --------------------------------------------------------------------------

_SPEC_RBF_DEFAULT = (("gamma", 2.0, 1.0), ("hc_std", 1.0), ("hc_std", 1.0))


def prior_spec_of_tree(prior_tree):
    """Static prior spec for the Scale(RBF-ARD) x Gaussian hyper tree
    ``{"kernel": {"log_outputscale": P, "base": {"log_lengthscale": P}},
    "log_noise": P}`` (priors.py:prior_tree_rbf structure), or None if the
    structure differs or a leaf family has no in-kernel closed form.

    Supported leaves (priors.py classes; Normal and LogNormal coincide in
    unconstrained space): Gamma, HalfCauchy, HalfCauchyOnStd, HalfNormal,
    LogNormal, Normal, Flat.
    """
    from ..priors import (Flat, Gamma, HalfCauchy, HalfCauchyOnStd,
                          HalfNormal, LogNormal, Normal)

    def leaf_spec(p):
        if isinstance(p, Gamma):
            return ("gamma", float(p.alpha), float(p.beta))
        if isinstance(p, HalfCauchyOnStd):
            return ("hc_std", float(p.scale))
        if isinstance(p, HalfCauchy):
            return ("hc", float(p.scale))
        if isinstance(p, HalfNormal):
            return ("half_normal", float(p.scale))
        if isinstance(p, (LogNormal, Normal)):
            return ("lognormal", float(p.mu), float(p.sigma))
        if isinstance(p, Flat):
            return ("flat",)
        return None

    try:
        ls = leaf_spec(prior_tree["kernel"]["base"]["log_lengthscale"])
        os_ = leaf_spec(prior_tree["kernel"]["log_outputscale"])
        noise = leaf_spec(prior_tree["log_noise"])
    except (KeyError, TypeError):
        return None
    if set(prior_tree) != {"kernel", "log_noise"} \
            or set(prior_tree["kernel"]) != {"log_outputscale", "base"} \
            or set(prior_tree["kernel"]["base"]) != {"log_lengthscale"}:
        return None
    if ls is None or os_ is None or noise is None:
        return None
    return (ls, os_, noise)


def _prior_lane_terms(spec_leaf, u):
    """Elementwise (logpdf, d logpdf/du) of one prior leaf at unconstrained
    ``u`` (any array shape) — exact closed forms of the matching
    priors.py ``logpdf_unconstrained`` (log-Jacobian included), so the
    fused and XLA targets stay bit-comparable. Mosaic-safe: exp/log1p/
    sigmoid only; constants are Python floats folded at trace time."""
    kind = spec_leaf[0]
    if kind == "gamma":
        a, b = spec_leaf[1], spec_leaf[2]
        const = a * math.log(b) - math.lgamma(a)
        eu = jnp.exp(u)
        return const + a * u - b * eu, a - b * eu
    if kind == "hc_std":
        # HalfCauchy(s) on the std when u = log(variance): priors.py:86-103
        s = spec_leaf[1]
        const = math.log(2.0 / (math.pi * s)) + math.log(0.5)
        t = u - 2.0 * math.log(s)
        sig = jax.nn.sigmoid(t)
        return const + 0.5 * u - jnp.log1p(jnp.exp(t)), 0.5 - sig
    if kind == "hc":
        # HalfCauchy(s) on x = exp(u): priors.py:45-56
        s = spec_leaf[1]
        const = math.log(2.0 / (math.pi * s))
        t = 2.0 * (u - math.log(s))
        return (const + u - jnp.log1p(jnp.exp(t)),
                1.0 - 2.0 * jax.nn.sigmoid(t))
    if kind == "half_normal":
        s = spec_leaf[1]
        const = 0.5 * math.log(2.0 / math.pi) - math.log(s)
        e2u = jnp.exp(2.0 * u) / (s * s)
        return const + u - 0.5 * e2u, 1.0 - e2u
    if kind == "lognormal":
        mu, sg = spec_leaf[1], spec_leaf[2]
        const = -math.log(sg) - 0.5 * math.log(2.0 * math.pi)
        z = (u - mu) / sg
        return const - 0.5 * z * z, -z / sg
    if kind == "flat":
        return jnp.zeros_like(u), jnp.zeros_like(u)
    raise ValueError(f"unknown prior family {kind!r}")


def _prior_terms(theta, log_os, log_noise, ls_mask, prior_spec):
    """(lp, g_ls_row, g_os, g_noise) for the hyper-prior under a static
    spec. ``theta`` is the (R,128) unconstrained row(s) (lengthscales in
    the masked lanes); ``log_os``/``log_noise`` scalars or (C,1) columns;
    shapes broadcast so the single-chain and chain-batched cores share
    this. ``prior_spec=None`` means the default tree (identical ops to
    the pre-round-5 hard-coded block)."""
    sp_ls, sp_os, sp_n = (prior_spec if prior_spec is not None
                          else _SPEC_RBF_DEFAULT)
    lp_e, g_ls = _prior_lane_terms(sp_ls, theta)
    lp_os, g_os = _prior_lane_terms(sp_os, log_os)
    lp_n, g_noise = _prior_lane_terms(sp_n, log_noise)
    if jnp.ndim(log_os) == 0:            # single-chain cores: scalar lp
        lp_ls = jnp.sum(lp_e * ls_mask)
    else:                                # chain-batched cores: (C,1) lp
        lp_ls = jnp.sum(lp_e * ls_mask, axis=-1, keepdims=True)
    return lp_ls + lp_os + lp_n, g_ls * ls_mask, g_os, g_noise


def ut_t_solve_vec(U, Uinv, b, block: int = 32):
    """Solve U^T c = b for one column b (Mp,1); U upper-triangular.

    Blocked forward substitution with the diagonal-block inverses taken from
    ``Uinv = U^-1`` (the inverse of a block-triangular matrix has exactly
    ``(U_jj)^-1`` on its block diagonal). Unlike ``Uinv^T @ b``, the
    substitution recurrence uses the FACTOR for all off-diagonal coupling,
    which is the numerically sound direction at large cond(U) — this is what
    cut the residual extreme-conditioning HMC divergences (PERF.md caveat;
    VERDICT r2 item 5). Mosaic-safe: static sublane slices, one-hot MXU
    contractions, no dynamic indexing on values.
    """
    Mp = U.shape[0]
    dt = U.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    rowb = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    c = jnp.zeros_like(b)
    for i0 in range(0, Mp, block):
        # t[r] = sum_k U[k, r] c[k]; c is zero at unsolved rows so only
        # k < i0 contributes — the already-solved prefix
        t = _dg(U, c, 0, 0)                                   # (Mp,1)
        rhs = (b - t)[i0:i0 + block]                          # (block,1)
        E = ((rowb + i0) == col).astype(dt)                   # (block,Mp)
        Dblk = _dg(Uinv[i0:i0 + block, :], E, 1, 1)           # (U_ii)^-1
        cb = _dg(Dblk, rhs, 0, 0)                             # (U_ii)^-T rhs
        c = c + _dg(E, cb, 0, 0)                              # scatter rows
    return c


def ut_solve_vec(U, Uinv, b, block: int = 32):
    """Solve U v = b for one column b (Mp,1); blocked back substitution
    (bottom-up companion of :func:`ut_t_solve_vec`)."""
    Mp = U.shape[0]
    dt = U.dtype
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    rowb = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    v = jnp.zeros_like(b)
    for i0 in range(Mp - block, -1, -block):
        t = _dg(U, v, 1, 0)                                   # U v (Mp,1)
        rhs = (b - t)[i0:i0 + block]
        E = ((rowb + i0) == col).astype(dt)
        Dblk = _dg(Uinv[i0:i0 + block, :], E, 1, 1)           # (U_ii)^-1
        vb = Dblk @ rhs
        v = v + _dg(E, vb, 0, 0)
    return v


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _default_chol_inv(K, pivot_floor=None):
    U = block_chol_u(K, pivot_floor=pivot_floor)
    return U, block_ut_inv(U)


def _rbf_vfe_neg_logpost_vg(theta_pad, Xp, yp, Zp, n, m, d, jitter,
                            chol_inv=_default_chol_inv, want_z_grad=False,
                            want_prior=True, pivot_floor=None,
                            prior_spec=None):
    """Potential U = -(collapsed ELBO + log prior) and dU/dtheta.

    Shapes: theta_pad (1,128) [lanes 0..d-1 log-lengthscale, d log-outputscale,
    d+1 log-noise], Xp (Np,128), yp (Np,1), Zp (Mp,128); n/m/d static actual
    sizes (padding rows/lanes are zero). Returns (U, g) with g (1,128), zero
    in padding lanes. Matches jax.value_and_grad of
    -(sgpr_elbo + log_prior(prior_tree_rbf())) bit-for-bit in structure:
    same sq_dist clamping, same relative jitter (ops/linalg.py:add_jitter),
    same prior parameterisation (priors.py:142-153).

    ``want_z_grad=True`` additionally returns dU/dZ (Mp,128) — the
    inducing-location chain through BOTH grams (fused SGPR training,
    ops/fused_sgpr.py; Z carries no prior, reference models/sgpr.py:110).
    ``want_prior=False`` drops the hyperprior (ML-II training objective,
    reference models/sgpr.py:121). ``pivot_floor`` forwards to the blocked
    Cholesky (training-only modified-Cholesky semantics; sampler callers
    leave it None to keep NaN divergence detection).
    """
    dt = Xp.dtype
    Np, Mp = Xp.shape[0], Zp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    ls_mask = (lane < d).astype(dt)
    log_os = theta_pad[0, d]
    log_noise = theta_pad[0, d + 1]
    inv_ls = capped_inv_ls(theta_pad, ls_mask, Xp, Zp)        # (1,128)
    sf2 = jnp.exp(log_os)
    s2 = jnp.exp(log_noise)
    sigma = jnp.sqrt(s2)

    rown = jax.lax.broadcasted_iota(jnp.int32, (Np, 1), 0)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    n_mask = (rown < n).astype(dt)                            # (Np,1)
    mrow_mask = (rowm < m).astype(dt)                         # (Mp,1)
    mcol_mask = (colm < m).astype(dt)                         # (1,Mp)
    eyeM = (rowm == colm).astype(dt)                          # (Mp,Mp)

    Xs = Xp * inv_ls
    Zs = Zp * inv_ls
    Xs2 = Xs * Xs                                             # reused below
    Zs2 = Zs * Zs
    xn = jnp.sum(Xs2, axis=1, keepdims=True)                  # (Np,1)
    zn = jnp.sum(Zs2, axis=1, keepdims=True)                  # (Mp,1)
    # (Mp,1) -> (1,Mp) via a K=1 dot_general: Mosaic cannot reshape across
    # the sublane/lane tiling, but the MXU transposes for free
    one11 = jnp.ones((1, 1), dt)
    znT = _dg(one11, zn, 1, 1)
    r2_nm = jnp.maximum(xn + znT - 2.0 * _dg(Xs, Zs, 1, 1), 0.0)
    Knm = sf2 * jnp.exp(-0.5 * r2_nm) * n_mask * mcol_mask    # (Np,Mp)
    r2_mm = jnp.maximum(zn + znT - 2.0 * _dg(Zs, Zs, 1, 1), 0.0)
    Kmm = sf2 * jnp.exp(-0.5 * r2_mm)
    Kmm = jnp.where((mrow_mask * mcol_mask) > 0, Kmm, eyeM)   # pad block = I
    jit_scale = jnp.maximum(sf2, 1.0)                         # mean diag = sf2
    Kmm_j = Kmm + (jitter * jit_scale) * eyeM

    if pivot_floor is None:
        U, V = chol_inv(Kmm_j)                                # U = L^T, V = L^-T
    else:
        U, V = chol_inv(Kmm_j, pivot_floor * jit_scale)
    An = _dg(Knm, V, 1, 0) / sigma                            # A^T = Knm L^-T / sigma
    B = _dg(An, An, 0, 0) + eyeM
    if pivot_floor is None:
        UB, VB = chol_inv(B)
    else:
        UB, VB = chol_inv(B, pivot_floor)                     # diag(B) >= 1
    Binv = _dg(VB, VB, 1, 1)                                  # VB VB^T = B^-1
    u = _dg(An, yp, 0, 0)                                     # (Mp,1) A y
    # value- and gradient-critical VECTORS go through triangular SOLVES
    # against the factors (blocked substitution, ut_t_solve_vec /
    # ut_solve_vec) rather than multiplies by the formed inverses:
    # c = UB^-T u, v = UB^-1 c, w = U^-1 v, u^T B^-1 u = ||c||^2 — a
    # nonnegative square, and substitution keeps the off-diagonal coupling
    # in the factor, which matters at small noise where cond(B) ~ 1/sigma^2
    # (PERF.md divergence caveat; VERDICT r2 item 5)
    sb = max(32, Mp // 2)        # 2 panels at M<=128: substitution keeps
    # the dominant off-diagonal coupling in the factor at half the op count
    c_u = ut_t_solve_vec(UB, VB, u, block=sb)                 # (Mp,1)
    v = ut_solve_vec(UB, VB, c_u, block=sb)
    w = ut_solve_vec(U, V, v, block=sb)                       # L^-T v
    alpha = (yp - An @ v) / s2                                # (Np,1)

    diagUB = jnp.sum(UB * eyeM, axis=1, keepdims=True)       # (Mp,1)
    logdetB = 2.0 * jnp.sum(jnp.log(diagUB))
    uv = jnp.sum(c_u * c_u)
    yy = jnp.sum(yp * yp)
    trB = jnp.sum(B * eyeM)
    trBinv = jnp.sum(Binv * eyeM)
    kdiag_sum = n * sf2
    t_term = kdiag_sum - s2 * (trB - Mp)
    F = (-0.5 * n * jnp.log(2.0 * jnp.asarray(jnp.pi, dt) * s2)
         - 0.5 * logdetB - 0.5 * (yy - uv) / s2 - 0.5 * t_term / s2)

    # ---- adjoints ----
    Y1 = _dg(eyeM - Binv, V, 1, 1)                            # (I-B^-1) L^-1
    wT = _dg(one11, w, 1, 1)                                  # (1,Mp)
    dKnm = (An @ Y1 + alpha * wT) / sigma                     # (Np,Mp)
    T0 = 2.0 * eyeM - B - Binv
    dKmm = (-(w * wT) / (2.0 * s2)
            + 0.5 * _dg(_dg(V, T0, 1, 0), V, 1, 1))           # L^-T T0 L^-1
    trW = (n - Mp + trBinv) / s2
    dF_ds2 = (0.5 * jnp.sum(alpha * alpha) - 0.5 * trW
              + t_term / (2.0 * s2 * s2))
    dlog_noise = dF_ds2 * s2
    dlog_os = (jnp.sum(dKmm * Kmm) + jnp.sum(dKnm * Knm)
               + jitter * sf2 * (sf2 > 1.0) * jnp.sum(dKmm * eyeM)
               - n * sf2 / (2.0 * s2))

    Pmm = dKmm * Kmm
    Pnm = dKnm * Knm
    rs_mm = jnp.sum(Pmm, axis=1, keepdims=True)               # (Mp,1)
    cs_mm = jnp.sum(Pmm, axis=0, keepdims=True)               # (1,Mp)
    rs_nm = jnp.sum(Pnm, axis=1, keepdims=True)               # (Np,1)
    cs_nm = jnp.sum(Pnm, axis=0, keepdims=True)               # (1,Mp)
    dls = (_dg(rs_mm, Zs2, 0, 0) + cs_mm @ Zs2
           - 2.0 * jnp.sum(Zs * (Pmm @ Zs), axis=0, keepdims=True)
           + _dg(rs_nm, Xs2, 0, 0) + cs_nm @ Zs2
           - 2.0 * jnp.sum(Xs * (Pnm @ Zs), axis=0, keepdims=True))  # (1,128)

    dZ = None
    if want_z_grad:
        # inducing-location chain (same pattern as the SVI kernel,
        # ops/fused_svi.py): Pmm is symmetric, so the mm gram contributes
        # -2(rowsum o Zs - Pmm Zs); the nm gram's column entity gives
        # -(colsum o Zs - Pnm^T Xs). dZ = dZs / ls (capped inv_ls, the
        # same smooth-region approximation dls makes).
        cs_nmT = _dg(cs_nm, one11, 0, 0)                      # (Mp,1)
        dZs = (-2.0 * (rs_mm * Zs - Pmm @ Zs)
               - (cs_nmT * Zs - _dg(Pnm, Xs, 0, 0)))
        dZ = dZs * inv_ls * mrow_mask * ls_mask

    if not want_prior:
        g = dls
        g = jnp.where(lane == d, dlog_os, g)
        g = jnp.where(lane == d + 1, dlog_noise, g)
        g = g * (lane < d + 2).astype(dt)
        if want_z_grad:
            return -F, -g, -dZ
        return -F, -g

    # ---- priors (static spec; default = Gamma(2,1) ls, HalfCauchyOnStd(1)
    # os/noise — priors.py:prior_tree_rbf; VERDICT r4 item 7)
    lp, g_ls, g_os, g_noise = _prior_terms(theta_pad, log_os, log_noise,
                                           ls_mask, prior_spec)

    g = dls + g_ls
    g = jnp.where(lane == d, dlog_os + g_os, g)
    g = jnp.where(lane == d + 1, dlog_noise + g_noise, g)
    g = g * (lane < d + 2).astype(dt)
    if want_z_grad:
        return -(F + lp), -g, -dZ
    return -(F + lp), -g


# --------------------------------------------------------------------------
# CO2 composite VFE core (VERDICT r4 item 6)
# --------------------------------------------------------------------------

_CO2_SPEC_DEFAULT = (("lognormal", 0.0, 3.0),) * 11


def _co2_vfe_neg_logpost_vg(theta_pad, Xp, yp, Zp, n, m, d, jitter,
                            chol_inv=_default_chol_inv, want_z_grad=False,
                            want_prior=True, pivot_floor=None,
                            prior_spec=None, noise_comp="m32"):
    """Potential U = -(collapsed ELBO + log prior) and dU/dtheta for the
    Mauna Loa CO2 composite target (reference
    experiments/co2_bayesian_sgpr_hmc.py:107-144): the 1-D Sum kernel

      K = s1 Periodic(p=1, lp) RBF(ld)            seasonal
        + s2 RBF(lt)                              long-term trend
        + s3 RQ(lm, alpha)                        medium-term
        + s4 Matern32(ln)  [or RBF(ln)]           short-scale noise comp

    over 11 unconstrained hypers in ravel_pytree order (lanes 0..10):
    [log lp, log ld, log s1, log lt, log s2, log alpha, log lm, log s3,
    log ln, log s4, log noise] (kernels/composite.py:co2_kernel — all
    si are log-VARIANCES like the rbf core's log_outputscale).

    The bound/factorisation machinery is the rbf core's verbatim (the VFE
    adjoint dKnm/dKmm is kernel-agnostic); only the gram synthesis and the
    hyper chain rules differ — every component derivative is elementwise
    in the pairwise difference delta = x - z, computed DIRECTLY (no
    norm-expansion, so no f32 cancellation and no inv_ls cap needed: huge
    inverse lengthscales just underflow exp to clean zeros).

    ``prior_spec``: 11-tuple of per-lane prior leaf specs
    (:func:`_prior_lane_terms` families); default = the experiment's
    LogNormal(0,3) on every hyper. ``d`` must be 1 (accepted for core
    signature uniformity).
    """
    del d
    dt = Xp.dtype
    Np, Mp = Xp.shape[0], Zp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    th = [theta_pad[0, i] for i in range(11)]
    ilp2 = jnp.exp(-2.0 * th[0])
    ild2 = jnp.exp(-2.0 * th[1])
    s1 = jnp.exp(th[2])
    ilt2 = jnp.exp(-2.0 * th[3])
    s2v = jnp.exp(th[4])
    al = jnp.exp(th[5])
    ilm2 = jnp.exp(-2.0 * th[6])
    s3 = jnp.exp(th[7])
    iln = jnp.exp(-th[8])
    s4 = jnp.exp(th[9])
    s2 = jnp.exp(th[10])                                      # noise var
    sigma = jnp.sqrt(s2)
    sqrt3 = jnp.sqrt(jnp.asarray(3.0, dt))

    rown = jax.lax.broadcasted_iota(jnp.int32, (Np, 1), 0)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    n_mask = (rown < n).astype(dt)
    mrow_mask = (rowm < m).astype(dt)
    mcol_mask = (colm < m).astype(dt)
    eyeM = (rowm == colm).astype(dt)
    one11 = jnp.ones((1, 1), dt)

    # 1-D coordinates: lane 0 of the padded inputs
    e0 = (lane == 0).astype(dt)
    xcol = jnp.sum(Xp * e0, axis=1, keepdims=True)            # (Np,1)
    zcol = jnp.sum(Zp * e0, axis=1, keepdims=True)            # (Mp,1)
    zrow = _dg(one11, zcol, 1, 1)                             # (1,Mp)

    def grams(acol, pair_mask):
        """Masked component grams + shared elementwise factors for one
        pair block (rows acol vs columns zrow)."""
        delta = acol - zrow                                   # (R,Mp)
        r2 = delta * delta
        s_ = jnp.sin(jnp.asarray(jnp.pi, dt) * delta)
        sin2 = s_ * s_
        K1 = s1 * jnp.exp(-2.0 * sin2 * ilp2 - 0.5 * r2 * ild2) * pair_mask
        K2 = s2v * jnp.exp(-0.5 * r2 * ilt2) * pair_mask
        q = r2 * ilm2 / (2.0 * al)
        lnB = jnp.log1p(q)
        K3 = s3 * jnp.exp(-al * lnB) * pair_mask
        if noise_comp == "m32":
            t = sqrt3 * jnp.abs(delta) * iln
            K4 = s4 * (1.0 + t) * jnp.exp(-t) * pair_mask
            d4 = s4 * t * t * jnp.exp(-t) * pair_mask         # dK4/dlog ln
        else:
            K4 = s4 * jnp.exp(-0.5 * r2 * iln * iln) * pair_mask
            d4 = K4 * r2 * iln * iln
        return K1, K2, K3, K4, r2, sin2, q, lnB, d4

    def hyper_contractions(Kbar, parts):
        """10 kernel-hyper gradient contributions sum(Kbar * dK/dtheta_i)
        for one pair block."""
        K1, K2, K3, K4, r2, sin2, q, lnB, d4 = parts
        Bq = 1.0 + q
        return (
            jnp.sum(Kbar * K1 * 4.0 * sin2 * ilp2),           # log lp
            jnp.sum(Kbar * K1 * r2 * ild2),                   # log ld
            jnp.sum(Kbar * K1),                               # log s1
            jnp.sum(Kbar * K2 * r2 * ilt2),                   # log lt
            jnp.sum(Kbar * K2),                               # log s2v
            jnp.sum(Kbar * K3 * (-al * lnB + al * q / Bq)),   # log alpha
            jnp.sum(Kbar * K3 * 2.0 * al * q / Bq),           # log lm
            jnp.sum(Kbar * K3),                               # log s3
            jnp.sum(Kbar * d4),                               # log ln
            jnp.sum(Kbar * K4),                               # log s4
        )

    nm_parts = grams(xcol, n_mask * mcol_mask)
    mm_parts = grams(zcol, mrow_mask * mcol_mask)
    Knm = nm_parts[0] + nm_parts[1] + nm_parts[2] + nm_parts[3]
    Kmm_raw = mm_parts[0] + mm_parts[1] + mm_parts[2] + mm_parts[3]
    Kmm = jnp.where((mrow_mask * mcol_mask) > 0, Kmm_raw, eyeM)
    svar = s1 + s2v + s3 + s4                                 # mean diagonal
    jit_scale = jnp.maximum(svar, 1.0)                        # linalg.add_jitter
    Kmm_j = Kmm + (jitter * jit_scale) * eyeM

    if pivot_floor is None:
        U, V = chol_inv(Kmm_j)                                # U = L^T, V = L^-T
    else:
        U, V = chol_inv(Kmm_j, pivot_floor * jit_scale)
    An = _dg(Knm, V, 1, 0) / sigma                            # A^T (Np,Mp)
    B = _dg(An, An, 0, 0) + eyeM
    if pivot_floor is None:
        UB, VB = chol_inv(B)
    else:
        UB, VB = chol_inv(B, pivot_floor)
    Binv = _dg(VB, VB, 1, 1)
    u = _dg(An, yp, 0, 0)
    sb = max(32, Mp // 2)
    c_u = ut_t_solve_vec(UB, VB, u, block=sb)
    v = ut_solve_vec(UB, VB, c_u, block=sb)
    w = ut_solve_vec(U, V, v, block=sb)
    alpha_v = (yp - An @ v) / s2                              # (Np,1)

    diagUB = jnp.sum(UB * eyeM, axis=1, keepdims=True)
    logdetB = 2.0 * jnp.sum(jnp.log(diagUB))
    uv = jnp.sum(c_u * c_u)
    yy = jnp.sum(yp * yp)
    trB = jnp.sum(B * eyeM)
    trBinv = jnp.sum(Binv * eyeM)
    kdiag_sum = n * svar
    t_term = kdiag_sum - s2 * (trB - Mp)
    F = (-0.5 * n * jnp.log(2.0 * jnp.asarray(jnp.pi, dt) * s2)
         - 0.5 * logdetB - 0.5 * (yy - uv) / s2 - 0.5 * t_term / s2)

    # ---- adjoints (identical machinery to the rbf core) ----
    Y1 = _dg(eyeM - Binv, V, 1, 1)
    wT = _dg(one11, w, 1, 1)
    dKnm = (An @ Y1 + alpha_v * wT) / sigma
    T0 = 2.0 * eyeM - B - Binv
    dKmm = (-(w * wT) / (2.0 * s2)
            + 0.5 * _dg(_dg(V, T0, 1, 0), V, 1, 1))
    trW = (n - Mp + trBinv) / s2
    dF_ds2 = (0.5 * jnp.sum(alpha_v * alpha_v) - 0.5 * trW
              + t_term / (2.0 * s2 * s2))
    dlog_noise = dF_ds2 * s2

    g_nm = hyper_contractions(dKnm, nm_parts)
    g_mm = hyper_contractions(dKmm, mm_parts)
    # variance lanes additionally see the relative-jitter scale and the
    # kdiag trace term (rbf core lines above, generalised per component)
    tr_dKmm = jnp.sum(dKmm * eyeM)
    jit_gate = jitter * (svar > 1.0) * tr_dKmm
    extra = {2: s1, 4: s2v, 7: s3, 9: s4}
    gk = []
    for i in range(10):
        gi = g_nm[i] + g_mm[i]
        if i in extra:
            gi = gi + extra[i] * (jit_gate - n / (2.0 * s2))
        gk.append(gi)

    zero = jnp.zeros((1, _LANES), dt)
    g = zero
    for i in range(10):
        g = jnp.where(lane == i, gk[i], g)
    g = jnp.where(lane == 10, dlog_noise, g)
    g = g * (lane < 11).astype(dt)

    if not want_prior:
        return -F, -g

    spec = prior_spec if prior_spec is not None else _CO2_SPEC_DEFAULT
    lp = jnp.zeros((), dt)
    gp = zero
    for i in range(11):
        lpi, gpi = _prior_lane_terms(spec[i], th[i])
        lp = lp + lpi
        gp = jnp.where(lane == i, gpi, gp)
    g = g + gp
    return -(F + lp), -g


def co2_fused_spec(kernel, likelihood, prior_tree):
    """(noise_comp, 11-leaf prior spec) when (kernel, likelihood, priors)
    match the fused CO2 composite target, else None.

    Kernel must be kernels/composite.py:co2_kernel's structure: Sum of
    Scale(Periodic(fixed_period) x RBF), Scale(RBF), Scale(RQ),
    Scale(Matern32 | RBF), all non-ARD; the prior tree must mirror
    ``{"kernel": kernel.init_params(1), "log_noise": ...}`` with
    closed-form leaves (VERDICT r4 item 6)."""
    import jax.tree_util as jtu

    from ..kernels.base import (RBF, Matern32, Periodic, Product,
                                RationalQuadratic, Scale, Sum)
    from ..likelihoods import GaussianLikelihood
    from ..priors import Prior

    if type(likelihood) is not GaussianLikelihood:
        return None
    if not (isinstance(kernel, Sum) and len(kernel.terms) == 4):
        return None
    seas, trend, med, noise = kernel.terms
    ok = (isinstance(seas, Scale) and isinstance(seas.base, Product)
          and len(seas.base.terms) == 2
          and type(seas.base.terms[0]) is Periodic
          and seas.base.terms[0].fixed_period is not None
          and abs(float(seas.base.terms[0].fixed_period) - 1.0) < 1e-12
          and type(seas.base.terms[1]) is RBF and not seas.base.terms[1].ard
          and isinstance(trend, Scale) and type(trend.base) is RBF
          and not trend.base.ard
          and isinstance(med, Scale)
          and type(med.base) is RationalQuadratic and not med.base.ard
          and isinstance(noise, Scale)
          and type(noise.base) in (Matern32, RBF) and not noise.base.ard)
    if not ok:
        return None
    noise_comp = "m32" if type(noise.base) is Matern32 else "rbf"
    try:
        leaves = (jtu.tree_leaves(prior_tree["kernel"],
                                  is_leaf=lambda x: isinstance(x, Prior))
                  + [prior_tree["log_noise"]])
    except (KeyError, TypeError):
        return None
    if len(leaves) != 11 or set(prior_tree) != {"kernel", "log_noise"}:
        return None
    # reuse prior_spec_of_tree's leaf mapping via a throwaway rbf tree
    spec = []
    for p in leaves:
        probe = prior_spec_of_tree({
            "kernel": {"log_outputscale": p,
                       "base": {"log_lengthscale": p}},
            "log_noise": p})
        if probe is None:
            return None
        spec.append(probe[0])
    return noise_comp, tuple(spec)


def make_co2_vfe_potential(X, y, jitter: float, *, noise_comp="m32",
                           prior_spec=None, max_n: int = 32768):
    """Factory: ``potential_fn(zvec, Z) -> (U, grad)`` over the 11 CO2
    hypers (XLA-level twin of the rbf :func:`make_rbf_vfe_potential`; the
    production consumer is the Pallas whole-transition kernel,
    ops/fused_nuts target="co2")."""
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    n, d = X.shape
    if d != 1 or n > max_n:
        return None
    dt = X.dtype
    Np = _round_up(n, 8)
    Xp = jnp.zeros((Np, _LANES), dt).at[:n, :d].set(X)
    yp = jnp.zeros((Np, 1), dt).at[:n, 0].set(y)
    jitter = float(jitter)

    def potential_fn(zvec, Z):
        m = Z.shape[0]
        Mp = _round_up(m, _LANES)
        Zp = jnp.zeros((Mp, _LANES), dt).at[:m, :1].set(Z.astype(dt))
        theta_pad = jnp.zeros((1, _LANES), dt).at[0, :11].set(zvec)
        Upot, g = _co2_vfe_neg_logpost_vg(
            theta_pad, Xp, yp, Zp, n, m, 1, jitter,
            prior_spec=prior_spec, noise_comp=noise_comp)
        return Upot, g[0, :11]

    return potential_fn


def _rbf_vfe_neg_logpost_vg_streaming(theta_pad, Zp, n, m, d, jitter,
                                      chol_inv, loop_blocks, NB,
                                      want_z_grad=False, want_prior=True,
                                      pivot_floor=None, data_scale=0.0,
                                      prior_spec=None):
    """Streaming variant of :func:`_rbf_vfe_neg_logpost_vg` for N past the
    VMEM-resident envelope (VERDICT r2 item 2): X and y live in HBM packed
    into ONE (Np, 128) array — X in lanes [0, d), y in lane 127 (Mosaic
    cannot DMA-slice a 1-lane column, and packing halves the DMA count) —
    visited in (NB, 128) row blocks through ``loop_blocks(body, carry)``, a
    kernel-supplied iterator that double-buffers the HBM->VMEM DMA so block
    b+1 streams in while block b computes. ``body(t, XYb, carry)``.

    Identical math to the resident version, reorganised into two additive
    passes over row blocks:
      pass 1:  B = I + sum_b A_b^T A_b,  u = sum_b A_b^T y_b,  yy
      (M x M epilogue: factorisations, solves, Y1, dKmm — unchanged)
      pass 2:  ||alpha||^2, sum(Pnm), row/col-sum dls terms, cross terms
    Knm_b is recomputed in pass 2 (MXU-cheap) instead of cached (VMEM-
    expensive). All accumulators are O(M^2) or O(1) — HBM traffic per eval
    is exactly two reads of X/y.
    """
    dt = Zp.dtype
    Mp = Zp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    ls_mask = (lane < d).astype(dt)
    log_os = theta_pad[0, d]
    log_noise = theta_pad[0, d + 1]
    # streaming: X lives in HBM — its static max|X| rides in via
    # data_scale so the cap matches the resident core's (ADVICE r4)
    inv_ls = capped_inv_ls(theta_pad, ls_mask, Zp,
                           data_scale=data_scale)             # (1,128)
    sf2 = jnp.exp(log_os)
    s2 = jnp.exp(log_noise)
    sigma = jnp.sqrt(s2)

    rowb = jax.lax.broadcasted_iota(jnp.int32, (NB, 1), 0)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    mrow_mask = (rowm < m).astype(dt)
    mcol_mask = (colm < m).astype(dt)
    eyeM = (rowm == colm).astype(dt)
    one11 = jnp.ones((1, 1), dt)

    Zs = Zp * inv_ls
    Zs2 = Zs * Zs
    zn = jnp.sum(Zs2, axis=1, keepdims=True)                  # (Mp,1)
    znT = _dg(one11, zn, 1, 1)                                # (1,Mp)
    r2_mm = jnp.maximum(zn + znT - 2.0 * _dg(Zs, Zs, 1, 1), 0.0)
    Kmm = sf2 * jnp.exp(-0.5 * r2_mm)
    Kmm = jnp.where((mrow_mask * mcol_mask) > 0, Kmm, eyeM)
    jit_scale = jnp.maximum(sf2, 1.0)
    Kmm_j = Kmm + (jitter * jit_scale) * eyeM
    if pivot_floor is None:
        U, V = chol_inv(Kmm_j)                                # U = L^T, V = L^-T
    else:
        U, V = chol_inv(Kmm_j, pivot_floor * jit_scale)

    ey = (lane == (_LANES - 1)).astype(dt)                    # y lane one-hot

    def _block_An(t, XYb):
        """Per-block scaled inputs, y column, and A^T rows (both passes)."""
        rowg = rowb + t * NB
        nmask = (rowg < n).astype(dt)                         # (NB,1)
        yb = _dg(XYb, ey, 1, 1) * nmask                       # (NB,1)
        Xs_b = XYb * inv_ls                                   # ls_mask zeroes y
        xn_b = jnp.sum(Xs_b * Xs_b, axis=1, keepdims=True)    # (NB,1)
        r2 = jnp.maximum(xn_b + znT - 2.0 * _dg(Xs_b, Zs, 1, 1), 0.0)
        Knm_b = sf2 * jnp.exp(-0.5 * r2) * nmask * mcol_mask  # (NB,Mp)
        An_b = _dg(Knm_b, V, 1, 0) / sigma
        return Xs_b, yb, Knm_b, An_b

    def fwd_body(t, XYb, carry):
        Bacc, u, yy = carry
        _, yb, _, An_b = _block_An(t, XYb)
        return (Bacc + _dg(An_b, An_b, 0, 0),
                u + _dg(An_b, yb, 0, 0),
                yy + jnp.sum(yb * yb))

    Bacc, u, yy = loop_blocks(fwd_body, (
        jnp.zeros((Mp, Mp), dt), jnp.zeros((Mp, 1), dt),
        jnp.zeros((), dt)))
    B = Bacc + eyeM

    if pivot_floor is None:
        UB, VB = chol_inv(B)
    else:
        UB, VB = chol_inv(B, pivot_floor)                     # diag(B) >= 1
    Binv = _dg(VB, VB, 1, 1)
    # vector solves against the factors (see the resident version)
    c_u = ut_t_solve_vec(UB, VB, u)
    v = ut_solve_vec(UB, VB, c_u)
    w = ut_solve_vec(U, V, v)                                 # L^-T v

    diagUB = jnp.sum(UB * eyeM, axis=1, keepdims=True)
    logdetB = 2.0 * jnp.sum(jnp.log(diagUB))
    uv = jnp.sum(c_u * c_u)
    trB = jnp.sum(B * eyeM)
    trBinv = jnp.sum(Binv * eyeM)
    kdiag_sum = n * sf2
    t_term = kdiag_sum - s2 * (trB - Mp)
    F = (-0.5 * n * jnp.log(2.0 * jnp.asarray(jnp.pi, dt) * s2)
         - 0.5 * logdetB - 0.5 * (yy - uv) / s2 - 0.5 * t_term / s2)

    # ---- adjoints ----
    Y1 = _dg(eyeM - Binv, V, 1, 1)                            # (I-B^-1) L^-1
    wT = _dg(one11, w, 1, 1)                                  # (1,Mp)

    def adj_body(t, XYb, carry):
        alpha2, osum, dls_nm, cs_nm, cross, pnmx = carry
        Xs_b, yb, Knm_b, An_b = _block_An(t, XYb)
        alpha_b = (yb - An_b @ v) / s2                        # (NB,1)
        dKnm_b = (An_b @ Y1 + alpha_b * wT) / sigma
        Pnm_b = dKnm_b * Knm_b
        Xs2_b = Xs_b * Xs_b
        if want_z_grad:
            pnmx = pnmx + _dg(Pnm_b, Xs_b, 0, 0)              # Pnm^T Xs
        return (alpha2 + jnp.sum(alpha_b * alpha_b),
                osum + jnp.sum(Pnm_b),
                dls_nm + _dg(jnp.sum(Pnm_b, axis=1, keepdims=True),
                             Xs2_b, 0, 0),
                cs_nm + jnp.sum(Pnm_b, axis=0, keepdims=True),
                cross + jnp.sum(Xs_b * (Pnm_b @ Zs), axis=0,
                                keepdims=True),
                pnmx)

    alpha2, osum, dls_nm, cs_nm, cross, pnmx = loop_blocks(adj_body, (
        jnp.zeros((), dt), jnp.zeros((), dt),
        jnp.zeros((1, _LANES), dt), jnp.zeros((1, Mp), dt),
        jnp.zeros((1, _LANES), dt), jnp.zeros((Mp, _LANES), dt)))

    T0 = 2.0 * eyeM - B - Binv
    dKmm = (-(w * wT) / (2.0 * s2)
            + 0.5 * _dg(_dg(V, T0, 1, 0), V, 1, 1))
    trW = (n - Mp + trBinv) / s2
    dF_ds2 = 0.5 * alpha2 - 0.5 * trW + t_term / (2.0 * s2 * s2)
    dlog_noise = dF_ds2 * s2
    dlog_os = (jnp.sum(dKmm * Kmm) + osum
               + jitter * sf2 * (sf2 > 1.0) * jnp.sum(dKmm * eyeM)
               - n * sf2 / (2.0 * s2))

    Pmm = dKmm * Kmm
    rs_mm = jnp.sum(Pmm, axis=1, keepdims=True)
    cs_mm = jnp.sum(Pmm, axis=0, keepdims=True)
    dls = (_dg(rs_mm, Zs2, 0, 0) + cs_mm @ Zs2
           - 2.0 * jnp.sum(Zs * (Pmm @ Zs), axis=0, keepdims=True)
           + dls_nm + cs_nm @ Zs2 - 2.0 * cross)

    dZ = None
    if want_z_grad:
        # same chain as the resident version; the streamed nm part uses
        # the accumulated column sums and Pnm^T Xs
        cs_nmT = _dg(cs_nm, one11, 0, 0)                      # (Mp,1)
        dZs = (-2.0 * (rs_mm * Zs - Pmm @ Zs)
               - (cs_nmT * Zs - pnmx))
        dZ = dZs * inv_ls * mrow_mask * ls_mask

    if not want_prior:
        g = dls
        g = jnp.where(lane == d, dlog_os, g)
        g = jnp.where(lane == d + 1, dlog_noise, g)
        g = g * (lane < d + 2).astype(dt)
        if want_z_grad:
            return -F, -g, -dZ
        return -F, -g

    # ---- priors (identical to the resident version) ----
    lp, g_ls, g_os, g_noise = _prior_terms(theta_pad, log_os, log_noise,
                                           ls_mask, prior_spec)

    g = dls + g_ls
    g = jnp.where(lane == d, dlog_os + g_os, g)
    g = jnp.where(lane == d + 1, dlog_noise + g_noise, g)
    g = g * (lane < d + 2).astype(dt)
    if want_z_grad:
        return -(F + lp), -g, -dZ
    return -(F + lp), -g


def make_rbf_vfe_potential(X, y, jitter: float, max_n: int = 32768,
                           prior_spec=None):
    """Factory: ``potential_fn(zvec, Z) -> (U, grad)`` for ``build_sampler``.

    ``zvec`` is the flat unconstrained hyper vector in ravel_pytree order
    [log_lengthscale (D), log_outputscale, log_noise] (asserted by the
    caller, models/bayesian_sgpr_hmc.py). Returns None if the problem is out
    of the fused path's envelope (D+2 > 128 or N > max_n).
    """
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    n, d = X.shape
    if d + 2 > _LANES or n > max_n:
        return None
    dt = X.dtype
    Np = _round_up(n, 8)
    Xp = jnp.zeros((Np, _LANES), dt).at[:n, :d].set(X)
    yp = jnp.zeros((Np, 1), dt).at[:n, 0].set(y)
    jitter = float(jitter)

    def potential_fn(zvec, Z):
        m = Z.shape[0]
        Mp = _round_up(m, _LANES)
        Zp = jnp.zeros((Mp, _LANES), dt).at[:m, :d].set(Z.astype(dt))
        theta_pad = jnp.zeros((1, _LANES), dt).at[0, :d + 2].set(zvec)
        Upot, g = _rbf_vfe_neg_logpost_vg(theta_pad, Xp, yp, Zp, n, m, d,
                                          jitter, prior_spec=prior_spec)
        return Upot, g[0, :d + 2]

    return potential_fn


def make_gpr_potential(X, y, jitter: float, prior_spec=None):
    """Factory: ``potential_fn(zvec) -> (U, grad)`` for the dense GPR_HMC
    target (companion of :func:`make_rbf_vfe_potential`; used by the Pallas
    whole-transition path via the "gpr" core and directly testable at XLA
    level). Returns None outside the envelope (N > 512 or D+2 > 128)."""
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    n, d = X.shape
    if d + 2 > _LANES or n > 512:
        return None
    dt = X.dtype
    Np = _round_up(n, _LANES)
    Xp = jnp.zeros((Np, _LANES), dt).at[:n, :d].set(X)
    yp = jnp.zeros((Np, 1), dt).at[:n, 0].set(y)
    jitter = float(jitter)

    def potential_fn(zvec):
        theta_pad = jnp.zeros((1, _LANES), dt).at[0, :d + 2].set(zvec)
        Upot, g = _gpr_neg_logpost_vg(theta_pad, Xp, yp, None, n, 0, d,
                                      jitter, prior_spec=prior_spec)
        return Upot, g[0, :d + 2]

    return potential_fn


def fused_potential_is_eligible(kernel, likelihood, prior_tree) -> bool:
    """True when (kernel, likelihood, priors) match the fused RBF-VFE target
    exactly: Scale(RBF(ard)) x Gaussian x prior_tree_rbf().

    NOTE this gates only the MODEL-STRUCTURE match. The XLA-level fused
    potential is opt-in (``GGP_FUSED_NUTS=1``): measured 6x SLOWER than the
    autodiff potential at XLA level (the blocked panel loops decompose into
    thousands of sub-tile HLOs). Its production consumer is the Pallas
    whole-transition kernel (ggp_tpu.ops.fused_nuts), where the same panel
    algorithms compile to straight VPU/MXU code.
    """
    import os
    if os.environ.get("GGP_FUSED_NUTS", "0") != "1":
        return False
    return fused_structure_matches(kernel, likelihood, prior_tree)


def fused_structure_matches(kernel, likelihood, prior_tree) -> bool:
    """Pure (env-independent) structure check shared with the Pallas
    whole-transition path (ops.fused_nuts).

    Round 5 (VERDICT r4 item 7): any prior tree with the rbf structure and
    closed-form leaf families qualifies (``prior_spec_of_tree``) — users
    changing a prior's family or parameters no longer silently drop to the
    ~3x-slower XLA custom-call path."""
    from ..kernels.base import RBF, Scale
    from ..likelihoods import GaussianLikelihood
    return (isinstance(kernel, Scale) and type(kernel.base) is RBF
            and kernel.base.ard
            and type(likelihood) is GaussianLikelihood
            and prior_spec_of_tree(prior_tree) is not None)


def _gpr_neg_logpost_vg(theta_pad, Xp, yp, Zp, n, m, d, jitter,
                        chol_inv=_default_chol_inv, prior_spec=None):
    """Potential U = -(dense GP marginal log-lik + log prior) and dU/dtheta
    for the GPR_HMC target (reference models/gpr_hmc.py:47-57: pm.gp.Marginal
    with ls ~ Gamma(2,1), sig_f/sig_n ~ HalfCauchy(1)).

    Matches ``-(gp_marginal_loglik + log_prior(prior_tree_rbf()))``
    (models/gpr_hmc.py:33-39): K = Knn + (s2 + jitter) I with the model's
    ABSOLUTE jitter policy (s2 on the diagonal already conditions K).
    ``Zp``/``m`` are accepted for signature uniformity with the other cores
    and ignored. State lanes: [log_lengthscale (d), log_outputscale,
    log_noise]. Gradient: Kbar = (a a^T - K^-1)/2 with a = K^-1 y via two
    triangular solves, then the RBF-ARD chain rules.
    """
    del Zp, m
    dt = Xp.dtype
    Np = Xp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    ls_mask = (lane < d).astype(dt)
    log_os = theta_pad[0, d]
    log_noise = theta_pad[0, d + 1]
    inv_ls = capped_inv_ls(theta_pad, ls_mask, Xp)
    sf2 = jnp.exp(log_os)
    s2 = jnp.exp(log_noise)

    rown = jax.lax.broadcasted_iota(jnp.int32, (Np, 1), 0)
    coln = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    n_row = (rown < n).astype(dt)
    n_col = (coln < n).astype(dt)
    eyeN = (rown == coln).astype(dt)
    one11 = jnp.ones((1, 1), dt)

    Xs = Xp * inv_ls
    Xs2 = Xs * Xs
    xn = jnp.sum(Xs2, axis=1, keepdims=True)                  # (Np,1)
    xnT = _dg(one11, xn, 1, 1)                                # (1,Np)
    r2 = jnp.maximum(xn + xnT - 2.0 * _dg(Xs, Xs, 1, 1), 0.0)
    Kcore = sf2 * jnp.exp(-0.5 * r2) * n_row * n_col          # zero pad
    K = Kcore + ((s2 + jitter) * n_row + (1.0 - n_row)) * eyeN

    U, V = chol_inv(K)                                        # U=L^T, V=L^-T
    # wide solve panels: at Np=512 a block-32 substitution costs 16 panels
    # x several small MXU ops per vector — measurably slower in-kernel;
    # 4 panels keep the substitution structure at ~1/4 the op count
    sb = max(32, Np // 4)
    t = ut_t_solve_vec(U, V, yp, block=sb)                    # L^-1 y
    a = ut_solve_vec(U, V, t, block=sb)                       # K^-1 y
    quad = jnp.sum(t * t)
    diagU = jnp.sum(U * eyeN, axis=1, keepdims=True)          # (Np,1)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.where(n_row > 0, diagU, 1.0)))
    F = -0.5 * (quad + logdet
                + n * jnp.log(2.0 * jnp.asarray(jnp.pi, dt)))

    # ---- adjoints ----
    Kinv = _dg(V, V, 1, 1)                                    # V V^T
    aT = _dg(one11, a, 1, 1)                                  # (1,Np)
    Kbar = 0.5 * (a * aT - Kinv)                              # dF/dK
    dlog_noise = s2 * jnp.sum((Kbar * eyeN) * n_row)
    P = Kbar * Kcore
    dlog_os = jnp.sum(P)
    rs = jnp.sum(P, axis=1, keepdims=True)                    # (Np,1)
    cs = jnp.sum(P, axis=0, keepdims=True)                    # (1,Np)
    dls = (_dg(rs, Xs2, 0, 0) + cs @ Xs2
           - 2.0 * jnp.sum(Xs * (P @ Xs), axis=0, keepdims=True))  # (1,128)

    # ---- priors (static spec; default Gamma(2,1) ls + HalfCauchyOnStd(1))
    lp, g_ls, g_os, g_noise = _prior_terms(theta_pad, log_os, log_noise,
                                           ls_mask, prior_spec)

    g = dls + g_ls
    g = jnp.where(lane == d, dlog_os + g_os, g)
    g = jnp.where(lane == d + 1, dlog_noise + g_noise, g)
    g = g * (lane < d + 2).astype(dt)
    return -(F + lp), -g


def _sgpmc_neg_logpost_vg(state_pad, Xp, yrow, Zp, n, m, d, jitter,
                          chol_inv=_default_chol_inv, want_z_grad=False,
                          want_prior=True, pivot_floor=None):
    """Potential U = -(whitened-SGPMC log posterior) and dU/dstate for the
    Scale(RBF-ARD) x Gaussian x Zero-mean JointHMC target
    (models/sgpmc.py:_logpost; reference gpflow SGPMC, models/sgp_hmc.py:32-91).

    State lanes (ravel order of {"kernel","lik","v"}): [log_lengthscale (d),
    log_outputscale, log_noise, v (m)]; dim = d + 2 + m <= 128.
    Shapes: state_pad (1,128), Xp (Np,128) zero-padded, yrow (1,Np) with Np a
    lane multiple of 128, Zp (Mp,128). Priors: Gamma(2,1) on every positive
    hyper (the SGPMC default tree) + the built-in N(0,I) on v.

    Adjoints: with A = L^-1 Kms, e = y - A^T v, msk the var clamp/col mask,
      Abar   = (v e^T + A msk) / s2
      Kms_b  = L^-T Abar
      Kmm_b  = -sym(L^-T Phi(Abar A^T) L^-1)     [Phi = tril, half diag]
    then the same RBF chain rules as the VFE potential. Verified against
    jax.grad of SGPMC._logpost (tests/test_fused_nuts.py).

    ``want_prior=False`` drops the Gamma hyperpriors but KEEPS the N(0,I)
    whitened-v term — exactly the reference's warm-start objective
    (models/sgp_hmc.py:54-56; models/sgpmc.py warm_start). ``want_z_grad``
    additionally returns dU/dZ (fused warm start trains Z before freezing
    it). ``pivot_floor`` forwards modified-Cholesky clamping to the blocked
    factorisation (training-only; samplers keep NaN divergence semantics).
    """
    dt = Xp.dtype
    Np, Mp = Xp.shape[0], Zp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    laneN = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    ls_mask = (lane < d).astype(dt)
    log_os = state_pad[0, d]
    log_noise = state_pad[0, d + 1]
    inv_ls = capped_inv_ls(state_pad, ls_mask, Xp, Zp)
    sf2 = jnp.exp(log_os)
    s2 = jnp.exp(log_noise)

    rowm = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    eyeM = (rowm == colm).astype(dt)
    mcol_mask = (colm < m).astype(dt)
    ncol_mask = (laneN < n).astype(dt)                        # (1,Np)
    one11 = jnp.ones((1, 1), dt)

    # v occupies state lanes [d+2, d+2+m): shift into (1,Mp) via one MXU
    # permutation (Mosaic cannot lane-shift values directly);
    # perm[in,out] = (in == out + d + 2)
    perm = (jax.lax.broadcasted_iota(jnp.int32, (_LANES, 1), 0)
            == (jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
                + (d + 2))).astype(dt)                        # (128,128)
    vrow = _dg(state_pad, perm, 1, 0) * mcol_mask             # (1,Mp=128)

    Zs = Zp * inv_ls
    Xs = Xp * inv_ls
    Zs2 = Zs * Zs
    Xs2 = Xs * Xs
    zn = jnp.sum(Zs2, axis=1, keepdims=True)                  # (Mp,1)
    xn = jnp.sum(Xs2, axis=1, keepdims=True)                  # (Np,1)
    znT = _dg(one11, zn, 1, 1)                                # (1,Mp)
    xnT = _dg(one11, xn, 1, 1)                                # (1,Np)
    r2_mm = jnp.maximum(zn + znT - 2.0 * _dg(Zs, Zs, 1, 1), 0.0)
    Kmm = sf2 * jnp.exp(-0.5 * r2_mm)
    mrow_mask = (rowm < m).astype(dt)
    Kmm = jnp.where((mrow_mask * mcol_mask) > 0, Kmm, eyeM)
    jit_scale = jnp.maximum(sf2, 1.0)
    Kmm_j = Kmm + (jitter * jit_scale) * eyeM
    r2_ms = jnp.maximum(zn + xnT - 2.0 * _dg(Zs, Xs, 1, 1), 0.0)  # (Mp,Np)
    Kms = sf2 * jnp.exp(-0.5 * r2_ms) * mrow_mask * ncol_mask

    if pivot_floor is None:
        U, V = chol_inv(Kmm_j)                                # U=L^T, V=L^-T
    else:
        U, V = chol_inv(Kmm_j, pivot_floor * jit_scale)
    A = _dg(V, Kms, 0, 0)                                     # L^-1 Kms (Mp,Np)
    mean = _dg(vrow, A, 1, 0)                                 # (1,Np)
    e = (yrow - mean) * ncol_mask
    var_raw = sf2 - jnp.sum(A * A, axis=0, keepdims=True)     # (1,Np)
    msk = (var_raw > 1e-12).astype(dt) * ncol_mask
    var = jnp.maximum(var_raw, 1e-12) * ncol_mask

    see = jnp.sum(e * e)
    svar = jnp.sum(var)
    F = (-0.5 * n * jnp.log(2.0 * jnp.asarray(jnp.pi, dt) * s2)
         - 0.5 * (see + svar) / s2
         - 0.5 * jnp.sum(vrow * vrow))
    if want_prior:
        # Gamma(2,1) priors on the d+2 positive hypers: lp = 2u - e^u each
        F = F + jnp.sum((2.0 * state_pad - jnp.exp(state_pad)) * ls_mask)
        F = F + (2.0 * log_os - sf2) + (2.0 * log_noise - s2)

    # ---- adjoints ----
    g_v = _dg(e, A, 1, 1) / s2 - vrow                         # (1,Mp)
    g_v = g_v * mcol_mask
    vcol = _dg(vrow, one11, 0, 0)                             # (Mp,1)
    Abar = (vcol * e + A * msk) / s2                          # (Mp,Np)
    Kms_b = _dg(V, Abar, 1, 0)                                # (Mp,Np)
    T = _dg(Abar, A, 1, 1)                                    # (Mp,Mp)
    Phi = T * ((rowm > colm).astype(dt) + 0.5 * eyeM)
    T1 = _dg(V, Phi, 1, 0)
    Kmm_b = -_dg(T1, V, 1, 1)
    Kmm_bT = _dg(eyeM, Kmm_b, 1, 1)                           # transpose
    Kmm_b = 0.5 * (Kmm_b + Kmm_bT)

    dF_ds2 = (-0.5 * n / s2 + 0.5 * (see + svar) / (s2 * s2))
    pr = jnp.asarray(1.0 if want_prior else 0.0, dt)
    dlog_noise = dF_ds2 * s2 + pr * (2.0 - s2)
    dlog_os = (jnp.sum(Kmm_b * Kmm) + jnp.sum(Kms_b * Kms)
               + jitter * sf2 * (sf2 > 1.0) * jnp.sum(Kmm_b * eyeM)
               + jnp.sum(msk) * sf2 * (-0.5 / s2)             # kdiag term
               + pr * (2.0 - sf2))

    Pmm = Kmm_b * Kmm
    Pms = Kms_b * Kms
    rs_mm = jnp.sum(Pmm, axis=1, keepdims=True)
    cs_mm = jnp.sum(Pmm, axis=0, keepdims=True)
    rs_ms = jnp.sum(Pms, axis=1, keepdims=True)               # (Mp,1)
    cs_ms = jnp.sum(Pms, axis=0, keepdims=True)               # (1,Np)
    dls = (_dg(rs_mm, Zs2, 0, 0) + cs_mm @ Zs2
           - 2.0 * jnp.sum(Zs * (Pmm @ Zs), axis=0, keepdims=True)
           + _dg(rs_ms, Zs2, 0, 0) + cs_ms @ Xs2
           - 2.0 * jnp.sum(Zs * _dg(Pms, Xs, 1, 0), axis=0, keepdims=True))
    g_ls = (dls + pr * (2.0 - jnp.exp(state_pad))) * ls_mask

    g = g_ls
    g = jnp.where(lane == d, dlog_os, g)
    g = jnp.where(lane == d + 1, dlog_noise, g)
    # v gradient back into lanes [d+2, d+2+m): inverse permutation
    g_v_shift = _dg(g_v, perm, 1, 1)                          # (1,128)
    g = g + g_v_shift
    g = g * (lane < d + 2 + m).astype(dt)
    if want_z_grad:
        # inducing-location chain (same pattern as ops/fused_svi.py): Pmm
        # symmetric -> -2(rowsum o Zs - Pmm Zs); the ms gram's row entity
        # gives -(rowsum o Zs - Pms Xs). dZ = dZs / ls.
        dZs = (-2.0 * (rs_mm * Zs - Pmm @ Zs)
               - (rs_ms * Zs - _dg(Pms, Xs, 1, 0)))
        dZ = dZs * inv_ls * mrow_mask * ls_mask
        return -F, -g, -dZ
    return -F, -g


def _sgpmc_neg_logpost_vg_streaming(state_pad, Zp, n, m, d, jitter,
                                    chol_inv, loop_blocks, NB,
                                    want_prior=True, data_scale=0.0):
    """Streaming variant of :func:`_sgpmc_neg_logpost_vg` for N past the
    VMEM-resident envelope: X and y live in HBM packed into ONE (Np, 128)
    array — X in lanes [0, d), y in lane 127, the same packing as
    :func:`_rbf_vfe_neg_logpost_vg_streaming` — visited in (NB, 128) row
    blocks through ``loop_blocks(body, carry)`` (kernel-supplied
    double-buffered DMA iterator).

    Unlike the VFE bound, the whitened JointHMC potential is fully
    block-ADDITIVE: the factorised matrix Kmm depends only on (theta, Z),
    and every data-coupled quantity — the conditional residual e, the
    clamped variance, and ALL the adjoint contractions (e A^T, Abar A^T,
    the Pms row/column sums) — is computable per row block given (v, V).
    So ONE pass over X/y per potential eval suffices (HBM traffic = one
    read, vs the VFE core's two), accumulating O(M^2)/O(M)/O(1) state:

      see, svar, sum(msk), sum(Pms)                       scalars
      A e                                                  (Mp,1)
      T    = Abar A^T                                      (Mp,Mp)
      rs_ms = rowsum_N(Pms), csX2 = cs_ms @ Xs2, Pms Xs   (1,Mp)/(1,128)/(Mp,128)

    with the epilogue identical to the resident core from T onward.
    Blocks are processed in A^T (row) orientation: At_b = Knm_b V is the
    (NB, Mp) transpose of the resident core's A = L^-1 Kms columns.

    Reference behavior: gpflow SGPMC whitened joint posterior
    (/root/reference/models/sgp_hmc.py:32-91)."""
    dt = Zp.dtype
    Mp = Zp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    ls_mask = (lane < d).astype(dt)
    log_os = state_pad[0, d]
    log_noise = state_pad[0, d + 1]
    # streaming: X lives in HBM — static max|X| via data_scale (ADVICE r4)
    inv_ls = capped_inv_ls(state_pad, ls_mask, Zp,
                           data_scale=data_scale)
    sf2 = jnp.exp(log_os)
    s2 = jnp.exp(log_noise)

    rowb = jax.lax.broadcasted_iota(jnp.int32, (NB, 1), 0)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    eyeM = (rowm == colm).astype(dt)
    mrow_mask = (rowm < m).astype(dt)
    mcol_mask = (colm < m).astype(dt)
    one11 = jnp.ones((1, 1), dt)
    ey = (lane == (_LANES - 1)).astype(dt)                    # y lane one-hot

    # v lanes -> (1,Mp) via the same MXU permutation as the resident core
    perm = (jax.lax.broadcasted_iota(jnp.int32, (_LANES, 1), 0)
            == (jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
                + (d + 2))).astype(dt)
    vrow = _dg(state_pad, perm, 1, 0) * mcol_mask             # (1,Mp)
    vcol = _dg(vrow, one11, 0, 0)                             # (Mp,1)

    Zs = Zp * inv_ls
    Zs2 = Zs * Zs
    zn = jnp.sum(Zs2, axis=1, keepdims=True)
    znT = _dg(one11, zn, 1, 1)
    r2_mm = jnp.maximum(zn + znT - 2.0 * _dg(Zs, Zs, 1, 1), 0.0)
    Kmm = sf2 * jnp.exp(-0.5 * r2_mm)
    Kmm = jnp.where((mrow_mask * mcol_mask) > 0, Kmm, eyeM)
    jit_scale = jnp.maximum(sf2, 1.0)
    Kmm_j = Kmm + (jitter * jit_scale) * eyeM
    U, V = chol_inv(Kmm_j)                                    # U=L^T, V=L^-T

    def body(t, XYb, carry):
        (see, svar, smsk, spms, ae, T, rsms, csx2, pmsx) = carry
        rowg = rowb + t * NB
        nmask = (rowg < n).astype(dt)                         # (NB,1)
        yb = _dg(XYb, ey, 1, 1) * nmask                       # (NB,1)
        Xs_b = XYb * inv_ls                                   # y lane zeroed
        xn_b = jnp.sum(Xs_b * Xs_b, axis=1, keepdims=True)
        r2 = jnp.maximum(xn_b + znT - 2.0 * _dg(Xs_b, Zs, 1, 1), 0.0)
        Knm_b = sf2 * jnp.exp(-0.5 * r2) * nmask * mcol_mask  # (NB,Mp)
        At_b = _dg(Knm_b, V, 1, 0)                            # A^T rows
        e_b = (yb - At_b @ vcol) * nmask                      # (NB,1)
        var_raw = sf2 - jnp.sum(At_b * At_b, axis=1, keepdims=True)
        msk_b = (var_raw > 1e-12).astype(dt) * nmask
        var_b = jnp.maximum(var_raw, 1e-12) * nmask
        Abart_b = (e_b * vrow + At_b * msk_b) / s2            # Abar^T rows
        KmsbT_b = _dg(Abart_b, V, 1, 1)                       # (L^-T Abar)^T
        PmsT_b = KmsbT_b * Knm_b
        cs_b = jnp.sum(PmsT_b, axis=1, keepdims=True)         # (NB,1)
        Xs2_b = Xs_b * Xs_b
        return (see + jnp.sum(e_b * e_b),
                svar + jnp.sum(var_b),
                smsk + jnp.sum(msk_b),
                spms + jnp.sum(PmsT_b),
                ae + _dg(At_b, e_b, 0, 0),
                T + _dg(Abart_b, At_b, 0, 0),
                rsms + jnp.sum(PmsT_b, axis=0, keepdims=True),
                csx2 + _dg(cs_b, Xs2_b, 0, 0),
                pmsx + _dg(PmsT_b, Xs_b, 0, 0))

    zero = jnp.zeros((), dt)
    (see, svar, smsk, spms, ae, T, rsms_row, csX2, PmsX) = loop_blocks(
        body, (zero, zero, zero, zero,
               jnp.zeros((Mp, 1), dt), jnp.zeros((Mp, Mp), dt),
               jnp.zeros((1, Mp), dt), jnp.zeros((1, _LANES), dt),
               jnp.zeros((Mp, _LANES), dt)))

    F = (-0.5 * n * jnp.log(2.0 * jnp.asarray(jnp.pi, dt) * s2)
         - 0.5 * (see + svar) / s2
         - 0.5 * jnp.sum(vrow * vrow))
    if want_prior:
        F = F + jnp.sum((2.0 * state_pad - jnp.exp(state_pad)) * ls_mask)
        F = F + (2.0 * log_os - sf2) + (2.0 * log_noise - s2)

    # ---- adjoints (epilogue identical to the resident core from T on) ----
    g_v = (_dg(one11, ae, 1, 1) / s2 - vrow) * mcol_mask      # (1,Mp)
    Phi = T * ((rowm > colm).astype(dt) + 0.5 * eyeM)
    T1 = _dg(V, Phi, 1, 0)
    Kmm_b = -_dg(T1, V, 1, 1)
    Kmm_bT = _dg(eyeM, Kmm_b, 1, 1)
    Kmm_b = 0.5 * (Kmm_b + Kmm_bT)

    dF_ds2 = (-0.5 * n / s2 + 0.5 * (see + svar) / (s2 * s2))
    pr = jnp.asarray(1.0 if want_prior else 0.0, dt)
    dlog_noise = dF_ds2 * s2 + pr * (2.0 - s2)
    dlog_os = (jnp.sum(Kmm_b * Kmm) + spms
               + jitter * sf2 * (sf2 > 1.0) * jnp.sum(Kmm_b * eyeM)
               + smsk * sf2 * (-0.5 / s2)                     # kdiag term
               + pr * (2.0 - sf2))

    Pmm = Kmm_b * Kmm
    rs_mm = jnp.sum(Pmm, axis=1, keepdims=True)
    cs_mm = jnp.sum(Pmm, axis=0, keepdims=True)
    rs_ms = _dg(rsms_row, one11, 0, 0)                        # (Mp,1)
    dls = (_dg(rs_mm, Zs2, 0, 0) + cs_mm @ Zs2
           - 2.0 * jnp.sum(Zs * (Pmm @ Zs), axis=0, keepdims=True)
           + _dg(rs_ms, Zs2, 0, 0) + csX2
           - 2.0 * jnp.sum(Zs * PmsX, axis=0, keepdims=True))
    g_ls = (dls + pr * (2.0 - jnp.exp(state_pad))) * ls_mask

    g = g_ls
    g = jnp.where(lane == d, dlog_os, g)
    g = jnp.where(lane == d + 1, dlog_noise, g)
    g = g + _dg(g_v, perm, 1, 1)
    g = g * (lane < d + 2 + m).astype(dt)
    return -F, -g
