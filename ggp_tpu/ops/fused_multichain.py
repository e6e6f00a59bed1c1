"""Chain-batched fused kernels: C lock-step HMC chains in ONE Pallas call.

Why (VERDICT r2 item 3): the single-chip throughput configuration is
8-chain fixed-leapfrog HMC (PERF.md), which round 2 left on the XLA path —
vmap-of-pallas serialises chains, forfeiting the fused kernels' ~1.5x
exactly where throughput matters. The fix is batching chains INSIDE the
kernel:

* per-chain state is a row of a (C, 128) block — all elementwise leapfrog/
  accept/adaptation math vectorises over the sublane axis for free;
* the blocked Cholesky/inverse factorises all C (Mp, Mp) matrices together:
  panels are stored chain-MAJOR (K_all[c*Mp:(c+1)*Mp] = K_c) for cheap
  per-chain MXU matmuls, while the op-issue-bound mini-factorisation tiles
  are INTERLEAVED chain-minor (row i*C+c) via one constant permutation
  matmul per panel, so the unrolled per-row ops — the dominant cost of the
  single-chain kernel (PERF.md: ~2k vector ops/eval) — are shared by all
  chains at sublane granularity: a (1,B) op and a (C,B) op cost the same
  vector-op issue.

Scope: vfe target (Scale(RBF-ARD) x Gaussian x prior_tree_rbf()),
algorithms "hmc" and (round 3) lock-step multinomial "nuts", N-streaming
past the resident cap. The value/gradient-critical vectors go through the
same blocked triangular substitutions as the single-chain kernel
(ut_t_solve_vec / ut_solve_vec against the factors): the formed-inverse
shortcut originally used here was measured to produce O(10)-relative
gradient errors at warmup-extreme hyper rows on TPU, whose spurious
divergences dragged dual averaging ~35% low in eps and cost ~2x
min-ESS/s (round 3; the sample-phase parity that motivated the shortcut
was real but warmup conditioning is what sets the adapted step size).

Reference behavior being accelerated: models/bayesian_sgpr_hmc.py:74-78
(NUTS over the VFE marginal; chains=1 there — multi-chain is our
capability), sampling protocol models/sgp_hmc.py:67-69 for fixed-leapfrog.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_bound import _dg, _prior_terms, _round_up, capped_inv_ls
from .fused_nuts import _lae, _log_unif, _popcount32, _trailing_ones32

__all__ = ["make_fused_hmc_multichain", "fused_multichain_supported",
           "FusedMultichainHMC"]

_LANES = 128
_DIVERGENCE_THRESHOLD = 1000.0


def _mc_solve_vectors() -> str:
    """Trace-time gate for the value/gradient-critical vectors:
    "1" (default) = chain-BATCHED triangular solves (ut_t_solve_maj /
    ut_solve_maj — one set of panel ops for all chains); "chain" =
    per-chain blocked solves (round-3 pre-batching path, ablation);
    "0" = formed-inverse multiplies (fastest, but loses off-diagonal
    coupling at warmup-extreme conditioning — the capped inv_ls already
    removes the garbage-gradient hazard; solves additionally protect
    near-singular-B conditioning, same rationale as the single-chain
    kernel)."""
    import os
    return os.environ.get("GGP_MC_SOLVES", "1")


# envelope: C * (Knm (Np,Mp) + An (Np,Mp)) value buffers must fit VMEM
MAX_N_MULTICHAIN = 1024
MAX_CHAINS = 16
# vfe-core streaming (round 3): past the resident cap, X/y live in HBM and
# every chain's gram passes share each double-buffered (STREAM_NB, 128) row
# block — HBM traffic per eval stays 2 reads of X/y regardless of C; the
# cap is per-eval wall (C x per-block compute x 2 passes), not memory
MC_STREAM_NB = 1024
MAX_N_STREAM_MC = 16384


def fused_multichain_supported(n: int, d: int, m: int, c: int,
                               target: str = "vfe") -> bool:
    # both cores stream past the resident cap (vfe: round 3; sgpmc:
    # round 4 — the whitened JointHMC potential is block-additive, so its
    # streaming pass is single-read)
    max_n = MAX_N_STREAM_MC if target in ("vfe", "sgpmc") \
        else MAX_N_MULTICHAIN
    return (d + 2 <= _LANES and n <= max_n and m <= 128
            and 2 <= c <= MAX_CHAINS)


# ---------------------------------------------------------------------------
# Batched blocked Cholesky + triangular inverse
# ---------------------------------------------------------------------------

def _interleave_perm(C: int, B: int, dt):
    """(C*B, C*B) permutation: chain-minor row i*C+c <- chain-major c*B+i."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (C * B, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, C * B), 1)
    i = rows // C
    c = rows - i * C
    return (cols == (c * B + i)).astype(dt)


def _mini_chol_inv_batched(Dmin, C: int, B: int):
    """chol + inverse of C independent (B, B) SPD tiles stored chain-minor
    (row i*C+c = row i of chain c). Same unrolled step count as the
    single-chain _mini_chol_inv; every op covers all chains."""
    dt = Dmin.dtype
    colB = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    rowsB = jax.lax.broadcasted_iota(jnp.int32, (C * B, 1), 0) // C
    P = Dmin
    rows = []
    for i in range(B):
        ri = P[i * C:(i + 1) * C, :]                        # (C, B)
        d = jnp.sum(ri * (colB == i).astype(dt), axis=1, keepdims=True)
        dis = jnp.where(d > 0,
                        jax.lax.rsqrt(jnp.maximum(d, jnp.asarray(1e-38, dt))),
                        jnp.asarray(jnp.nan, dt))           # (C, 1)
        ui = ri * dis * (colB >= i).astype(dt)              # (C, B)
        rows.append(ui)
        cu = jnp.sum(P * (colB == i).astype(dt), axis=1, keepdims=True)
        dis_t = jnp.tile(dis, (B, 1))                       # row r -> chain r%C
        ui_t = jnp.tile(ui, (B, 1))
        P = P - jnp.where(rowsB > i, cu * dis_t,
                          jnp.asarray(0.0, dt)) * ui_t
    ud = jnp.concatenate(rows, axis=0)                      # chain-minor

    vrows: list = [None] * B
    R = (rowsB == colB).astype(dt)                          # chain-minor I
    for k in range(B - 1, -1, -1):
        rk = R[k * C:(k + 1) * C, :]
        ukk = jnp.sum(ud[k * C:(k + 1) * C, :] * (colB == k).astype(dt),
                      axis=1, keepdims=True)                # (C, 1)
        vk = rk / ukk
        vrows[k] = vk
        ck = jnp.sum(ud * (colB == k).astype(dt), axis=1, keepdims=True)
        vk_t = jnp.tile(vk, (B, 1))
        R = R - jnp.where(rowsB < k, ck, jnp.asarray(0.0, dt)) * vk_t
    return ud, jnp.concatenate(vrows, axis=0)


def _mini_chol_inv_batched_lg(Dlg, C: int, B: int, G: int):
    """chol + inverse of C independent (B, B) SPD tiles in LANE-GROUP
    layout: G groups of B lanes x Cs=C/G sublane-chains per pivot row;
    entry [(i*Cs+s), (g*B+j)] = K_{g*Cs+s}[i, j]. Same elimination order
    as :func:`_mini_chol_inv_batched`, but every big per-pivot op covers
    G chains per 8-sublane vreg tile, cutting the op-issue count of the
    dominant inner loop by G (round 4, VERDICT r3 item 3). Per-chain
    scalars (pivot, column entries) are moved/broadcast within their lane
    group by one exact MXU product with a 0/1 group matrix."""
    dt = Dlg.dtype
    Cs = C // G
    GB = G * B
    jg = jax.lax.broadcasted_iota(jnp.int32, (1, GB), 1) % B
    rowsB = jax.lax.broadcasted_iota(jnp.int32, (Cs * B, 1), 0) // Cs
    p_ = jax.lax.broadcasted_iota(jnp.int32, (GB, GB), 0) // B
    q_ = jax.lax.broadcasted_iota(jnp.int32, (GB, GB), 1) // B
    GBmat = (p_ == q_).astype(dt)       # x @ GBmat: in-group sum-broadcast
    P = Dlg
    rows = []
    for i in range(B):
        Mi = (jg == i).astype(dt)
        ri = P[i * Cs:(i + 1) * Cs, :]                      # (Cs, GB)
        d = _dg(ri * Mi, GBmat, 1, 1)                       # exact move
        dis = jnp.where(d > 0,
                        jax.lax.rsqrt(jnp.maximum(d, jnp.asarray(1e-38, dt))),
                        jnp.asarray(jnp.nan, dt))           # (Cs, GB)
        ui = ri * dis * (jg >= i).astype(dt)                # (Cs, GB)
        rows.append(ui)
        cu = _dg(P * Mi, GBmat, 1, 1)                       # (Cs*B, GB)
        dis_t = jnp.tile(dis, (B, 1))                       # row r -> r%Cs
        ui_t = jnp.tile(ui, (B, 1))
        P = P - jnp.where(rowsB > i, cu * dis_t,
                          jnp.asarray(0.0, dt)) * ui_t
    ud = jnp.concatenate(rows, axis=0)

    vrows: list = [None] * B
    R = (rowsB == jg).astype(dt)        # per-group identity
    for k in range(B - 1, -1, -1):
        Mk = (jg == k).astype(dt)
        rk = R[k * Cs:(k + 1) * Cs, :]
        ukk = _dg(ud[k * Cs:(k + 1) * Cs, :] * Mk, GBmat, 1, 1)
        vk = rk / ukk
        vrows[k] = vk
        ck = _dg(ud * Mk, GBmat, 1, 1)
        vk_t = jnp.tile(vk, (B, 1))
        R = R - jnp.where(rowsB < k, ck, jnp.asarray(0.0, dt)) * vk_t
    return ud, jnp.concatenate(vrows, axis=0)


def _pick_lane_groups(C: int, block: int) -> int:
    """Lane-group count for the diagonal-tile mini-factorisation. Opt-in
    via GGP_MC_LANE_GROUPS (must divide C, G*block <= 128); default 1.

    Measured on TPU v5e (round 4, Boston-shaped in-program potential
    evals): G=4 is 0.91x at C=8 and ~1.04x at C=16 vs the chain-minor
    sublane layout — the in-group move/broadcast contractions (one
    (Cs*B, GB) x (GB, GB) product per pivot) cost as much op-issue as the
    G-fold tile sharing saves, so the layout stays an ablation, not the
    default."""
    import os
    env = os.environ.get("GGP_MC_LANE_GROUPS")
    if env is not None:
        g = int(env)
        if g > 1 and C % g == 0 and g * block <= _LANES:
            return g
    return 1


def chol_u_inv_batched_inplace(K_ref, U_ref, V_ref, Dinv_ref, C: int,
                               block: int = 32, lane_groups: int = 0) -> None:
    """U_c = chol(K_c)^T and V_c = U_c^-1 for C matrices stacked chain-major
    in (C*Mp, Mp) refs. K_ref destroyed. The panel loop is Python-unrolled
    (static slices only — no dynamic indexing on values).

    ``lane_groups``: G>1 runs the diagonal-tile mini-factorisation in the
    lane-group layout (G chains side by side in lanes — see
    :func:`_mini_chol_inv_batched_lg`); 0 picks G automatically, 1 keeps
    the round-3 chain-minor sublane layout."""
    Mp = K_ref.shape[1]
    dt = jnp.float32
    nb = Mp // block
    rowb = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    dpad = Dinv_ref.shape[1] - block
    G = _pick_lane_groups(C, block) if lane_groups == 0 else lane_groups
    if C % G != 0 or G * block > _LANES:
        G = 1
    Cs = C // G
    perm = _interleave_perm(Cs, block, dt)
    if G > 1:
        # E[g] (B, G*B) embeds/extracts group g's lane block; S[s] (B, Cs*B)
        # selects sublane-chain s's rows from the lane-group layout
        erow = jax.lax.broadcasted_iota(jnp.int32, (block, G * block), 0)
        ecol = jax.lax.broadcasted_iota(jnp.int32, (block, G * block), 1)
        E = [(ecol == g * block + erow).astype(dt) for g in range(G)]
        srow = jax.lax.broadcasted_iota(jnp.int32, (block, Cs * block), 0)
        scol = jax.lax.broadcasted_iota(jnp.int32, (block, Cs * block), 1)
        S = [(scol == srow * Cs + s).astype(dt) for s in range(Cs)]

    for j in range(nb):
        j0 = j * block
        Ej = ((rowb + j0) == col).astype(dt)                # (B, Mp)
        P = jnp.concatenate(
            [K_ref[c * Mp + j0:c * Mp + j0 + block, :] for c in range(C)],
            axis=0)                                         # (C*B, Mp) major
        Dall = _dg(P, Ej, 1, 1)                             # (C*B, B) major
        if G > 1:
            Dlg = sum(
                _dg(_dg(perm,
                        Dall[g * Cs * block:(g + 1) * Cs * block, :], 1, 0),
                    E[g], 1, 0)
                for g in range(G))                          # (Cs*B, G*B)
            _, udinv_lg = _mini_chol_inv_batched_lg(Dlg, C, block, G)
            udinv_all = jnp.concatenate(
                [_dg(_dg(S[c % Cs], udinv_lg, 1, 0), E[c // Cs], 1, 1)
                 for c in range(C)], axis=0)                # back to major
        else:
            Dmin = _dg(perm, Dall, 1, 0)                    # chain-minor
            ud_min, udinv_min = _mini_chol_inv_batched(Dmin, C, block)
            udinv_all = _dg(perm, udinv_min, 0, 0)          # back to major
        lmask = (col >= j0).astype(dt)
        for c in range(C):
            udinv_c = udinv_all[c * block:(c + 1) * block, :]
            p_c = P[c * block:(c + 1) * block, :]
            Up_c = _dg(udinv_c, p_c, 0, 0) * lmask
            U_ref[c * Mp + j0:c * Mp + j0 + block, :] = Up_c
            if dpad > 0:
                udinv_c = jnp.concatenate(
                    [udinv_c, jnp.zeros((block, dpad), dt)], axis=1)
            Dinv_ref[c * Mp + j0:c * Mp + j0 + block, :] = udinv_c
            K_ref[c * Mp:(c + 1) * Mp, :] = (
                K_ref[c * Mp:(c + 1) * Mp, :] - _dg(Up_c, Up_c, 0, 0))

    for c in range(C):
        V_ref[c * Mp:(c + 1) * Mp, :] = jnp.zeros((Mp, Mp), dt)
    for t in range(nb):
        i0 = (nb - 1 - t) * block
        E = ((rowb + i0) == col).astype(dt)
        smask = (col >= i0 + block).astype(dt)
        for c in range(C):
            S = U_ref[c * Mp + i0:c * Mp + i0 + block, :]
            R = E - _dg(S * smask, V_ref[c * Mp:(c + 1) * Mp, :], 1, 0)
            udinv_c = Dinv_ref[c * Mp + i0:c * Mp + i0 + block, :][:, :block]
            V_ref[c * Mp + i0:c * Mp + i0 + block, :] = _dg(udinv_c, R, 1, 0)


# ---------------------------------------------------------------------------
# Chain-batched triangular substitutions (chain-major vector layout)
# ---------------------------------------------------------------------------

def _chain_major_consts(C: int, Mp: int, dt):
    """(rm, Gbig, diagM) for the chain-major solvers: rm (C*Mp,1) is the
    row-in-chain index, Gbig (C*Mp, C) the chain indicator, diagM the
    (C*Mp, Mp) row-in-chain == lane mask."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (C * Mp, 1), 0)
    ch = rows // Mp
    rm = rows - ch * Mp
    chcol = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    Gbig = (chcol == ch).astype(dt)
    colM = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    diagM = (colM == rm).astype(dt)
    return rm, Gbig, diagM


def ut_t_solve_maj(U_all, V_all, b, C: int, block: int = 64):
    """Solve U_c^T c_c = b_c for ALL C chains in lock-step.

    Chain-major layout: ``U_all``/``V_all`` (C*Mp, Mp) stack the upper
    factors / their inverses, ``b`` (C*Mp, 1) stacks the right-hand-side
    columns. The per-chain :func:`fused_bound.ut_t_solve_vec` issues every
    panel op C times (measured as 15-19% of wall on the 8-16 chain
    throughput configs, PERF.md round 3) — here one set of panel ops covers
    all chains: the already-solved prefix contribution is a chain-indicator
    MXU contraction, and the diagonal-block solves read (U_ii)^-1 straight
    from lane-slices of ``V_all`` (the inverse of a block-triangular matrix
    carries the block-diagonal inverses for ANY block partition)."""
    CM, Mp = U_all.shape
    dt = U_all.dtype
    rm, Gbig, diagM = _chain_major_consts(C, Mp, dt)
    colB = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
    c = jnp.zeros_like(b)
    for i0 in range(0, Mp, block):
        pmask = ((rm >= i0) & (rm < i0 + block)).astype(dt)
        if i0 == 0:
            rhs = b * pmask
        else:
            # t_c[r] = sum_k U_c[k, r] c_c[k]; c zero at unsolved rows
            W = U_all * c                                   # (C*Mp, Mp)
            t_wide = _dg(Gbig, W, 0, 0)                     # (C, Mp)
            t_majmat = _dg(Gbig, t_wide, 1, 0)              # rows = t_c
            t_maj = jnp.sum(t_majmat * diagM, axis=1, keepdims=True)
            rhs = (b - t_maj) * pmask
        # cb_c = (U_ii^c)^-T rhs_c — contraction over the panel rows
        W2 = V_all[:, i0:i0 + block] * rhs                  # (C*Mp, B)
        cb_wide = _dg(Gbig, W2, 0, 0)                       # (C, B)
        cb_majmat = _dg(Gbig, cb_wide, 1, 0)                # rows = cb_c
        c = c + jnp.sum(cb_majmat * ((colB + i0) == rm).astype(dt),
                        axis=1, keepdims=True)
    return c


def ut_solve_maj(U_all, V_all, b, C: int, block: int = 64):
    """Solve U_c v_c = b_c for ALL C chains (bottom-up companion of
    :func:`ut_t_solve_maj`; same chain-major layout)."""
    CM, Mp = U_all.shape
    dt = U_all.dtype
    rm, Gbig, _ = _chain_major_consts(C, Mp, dt)
    colB = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
    rowb = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    colM = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    v = jnp.zeros_like(b)
    v_wide = jnp.zeros((C, Mp), dt)                         # solved rows
    for i0 in range(Mp - block, -1, -block):
        pmask = ((rm >= i0) & (rm < i0 + block)).astype(dt)
        if i0 == Mp - block:
            rhs = b * pmask
        else:
            # t_c[r] = sum_k U_c[r, k] v_c[k] over the solved suffix
            v_majmat = _dg(Gbig, v_wide, 1, 0)              # rows = v_c
            t_maj = jnp.sum(U_all * v_majmat, axis=1, keepdims=True)
            rhs = (b - t_maj) * pmask
        blkmask = ((colB + i0) == rm).astype(dt)            # (C*Mp, B)
        rhs_wide = _dg(Gbig, rhs * blkmask, 0, 0)           # (C, B)
        rhs_majmat = _dg(Gbig, rhs_wide, 1, 0)              # rows = rhs_c
        # vb_c = (U_ii^c)^-1 rhs_c — rowwise contraction on the panel rows
        vb_maj = jnp.sum(V_all[:, i0:i0 + block] * rhs_majmat, axis=1,
                         keepdims=True) * pmask
        v = v + vb_maj
        vb_wide = _dg(Gbig, vb_maj * blkmask, 0, 0)         # (C, B)
        E = ((rowb + i0) == colM).astype(dt)                # (B, Mp)
        v_wide = v_wide + _dg(vb_wide, E, 1, 0)
    return v


class _StackedUV(list):
    """batched_chol result: indexes like the per-chain [(U_c, V_c)] list,
    plus whole-stack loads for the chain-batched solvers."""

    def __init__(self, uv_list, U_all, V_all):
        super().__init__(uv_list)
        self.U_all = U_all
        self.V_all = V_all


def _solve_critical_vectors_batched(UV1, UV2, u_l, C: int, Mp: int):
    """(c_u, v, w) per-chain column lists via the chain-batched solvers:
    c_u = UB^-T u, v = UB^-1 c_u, w = U1^-1 v (same recurrences as the
    per-chain path in fused_bound — VERDICT r2 item 5 conditioning
    rationale; batched over chains for the op-issue win)."""
    def stacks(UV):
        if isinstance(UV, _StackedUV):
            return UV.U_all, UV.V_all
        return (jnp.concatenate([UV[c][0] for c in range(C)], axis=0),
                jnp.concatenate([UV[c][1] for c in range(C)], axis=0))

    U1_all, V1_all = stacks(UV1)
    UB_all, VB_all = stacks(UV2)
    b_maj = jnp.concatenate(u_l, axis=0)
    sbv = min(Mp, 64)
    cu_maj = ut_t_solve_maj(UB_all, VB_all, b_maj, C, block=sbv)
    v_maj = ut_solve_maj(UB_all, VB_all, cu_maj, C, block=sbv)
    w_maj = ut_solve_maj(U1_all, V1_all, v_maj, C, block=sbv)
    sl = [slice(c * Mp, (c + 1) * Mp) for c in range(C)]
    return ([cu_maj[s] for s in sl], [v_maj[s] for s in sl],
            [w_maj[s] for s in sl])


# ---------------------------------------------------------------------------
# Batched VFE potential (value + gradient for C chains)
# ---------------------------------------------------------------------------

def _rbf_vfe_batched_vg(thetas, Xp, yp, Zp, n, m, d, jitter, C,
                        batched_chol, prior_spec=None):
    """(U (C,1), g (C,128)) for C hyper rows ``thetas`` (C,128).

    Same math as fused_bound._rbf_vfe_neg_logpost_vg; matrices per chain
    (Python loop, static slices), factorisations batched through
    ``batched_chol(list of (Mp,Mp)) -> list of (U_c, V_c)``, priors and
    state chains vectorised over the (C, 128) sublane axis."""
    dt = Xp.dtype
    Np, Mp = Xp.shape[0], Zp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    ls_mask = (lane < d).astype(dt)
    rown = jax.lax.broadcasted_iota(jnp.int32, (Np, 1), 0)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    n_mask = (rown < n).astype(dt)
    mrow_mask = (rowm < m).astype(dt)
    mcol_mask = (colm < m).astype(dt)
    eyeM = (rowm == colm).astype(dt)
    one11 = jnp.ones((1, 1), dt)

    inv_ls_all = capped_inv_ls(thetas, ls_mask, Xp, Zp)     # (C,128)
    log_os_all = jnp.sum(thetas * (lane == d).astype(dt), axis=1,
                         keepdims=True)                     # (C,1)
    log_noise_all = jnp.sum(thetas * (lane == d + 1).astype(dt), axis=1,
                            keepdims=True)
    sf2_all = jnp.exp(log_os_all)
    s2_all = jnp.exp(log_noise_all)

    # ---- phase 1: per-chain Kmm, batched factorisation ----
    Zs_l, Zs2_l, K_list = [], [], []
    for c in range(C):
        inv_ls = inv_ls_all[c:c + 1, :]
        sf2 = sf2_all[c, 0]
        Zs = Zp * inv_ls
        Zs2 = Zs * Zs
        zn = jnp.sum(Zs2, axis=1, keepdims=True)
        znT = _dg(one11, zn, 1, 1)
        r2 = jnp.maximum(zn + znT - 2.0 * _dg(Zs, Zs, 1, 1), 0.0)
        Kmm = sf2 * jnp.exp(-0.5 * r2)
        Kmm = jnp.where((mrow_mask * mcol_mask) > 0, Kmm, eyeM)
        Kj = Kmm + (jitter * jnp.maximum(sf2, 1.0)) * eyeM
        Zs_l.append(Zs); Zs2_l.append(Zs2); K_list.append((Kmm, Kj))
    UV1 = batched_chol([kj for _, kj in K_list])

    # ---- phase 2: per-chain An/B, batched factorisation ----
    An_l, Knm_l, B_list, u_l, Xs_l = [], [], [], [], []
    for c in range(C):
        inv_ls = inv_ls_all[c:c + 1, :]
        sf2 = sf2_all[c, 0]
        sigma = jnp.sqrt(s2_all[c, 0])
        _, V = UV1[c]
        Xs = Xp * inv_ls
        xn = jnp.sum(Xs * Xs, axis=1, keepdims=True)
        zn = jnp.sum(Zs2_l[c], axis=1, keepdims=True)
        znT = _dg(one11, zn, 1, 1)
        r2 = jnp.maximum(xn + znT - 2.0 * _dg(Xs, Zs_l[c], 1, 1), 0.0)
        Knm = sf2 * jnp.exp(-0.5 * r2) * n_mask * mcol_mask
        An = _dg(Knm, V, 1, 0) / sigma
        B = _dg(An, An, 0, 0) + eyeM
        u = _dg(An, yp, 0, 0)
        Xs_l.append(Xs); An_l.append(An); Knm_l.append(Knm)
        B_list.append(B); u_l.append(u)
    UV2 = batched_chol(B_list)

    # ---- phase 3: per-chain epilogue + adjoints ----
    yy = jnp.sum(yp * yp)
    solve_mode = _mc_solve_vectors()
    if solve_mode == "1":
        cu_l, v_l, w_l = _solve_critical_vectors_batched(UV1, UV2, u_l,
                                                         C, Mp)
    U_rows, g_rows = [], []
    for c in range(C):
        sf2 = sf2_all[c, 0]
        s2 = s2_all[c, 0]
        sigma = jnp.sqrt(s2)
        Kmm, _ = K_list[c]
        U1, V = UV1[c]
        UB, VB = UV2[c]
        An, Knm, B, u = An_l[c], Knm_l[c], B_list[c], u_l[c]
        Zs, Zs2, Xs = Zs_l[c], Zs2_l[c], Xs_l[c]
        Binv = _dg(VB, VB, 1, 1)
        # value/gradient-critical VECTORS via blocked triangular SOLVES
        # against the factors, not formed-inverse multiplies: the inverse
        # form loses the off-diagonal coupling at warmup-extreme
        # conditioning (TPU grad scan showed rows with O(10) relative
        # gradient error -> spurious divergences -> dual averaging adapts
        # eps ~35% low and min-ESS/s pays 2x; same fix as the single-chain
        # kernel, fused_bound.py VERDICT r2 item 5)
        if solve_mode == "1":
            c_u, v, w = cu_l[c], v_l[c], w_l[c]
        elif solve_mode == "chain":
            from .fused_bound import ut_solve_vec, ut_t_solve_vec
            sbv = max(32, Mp // 2)
            c_u = ut_t_solve_vec(UB, VB, u, block=sbv)
            v = ut_solve_vec(UB, VB, c_u, block=sbv)
            w = ut_solve_vec(U1, V, v, block=sbv)
        else:
            c_u = _dg(VB, u, 0, 0)
            v = VB @ c_u
            w = _dg(V, v, 1, 0)
        alpha = (yp - An @ v) / s2
        diagUB = jnp.sum(UB * eyeM, axis=1, keepdims=True)
        logdetB = 2.0 * jnp.sum(jnp.log(diagUB))
        uv = jnp.sum(c_u * c_u)
        trB = jnp.sum(B * eyeM)
        trBinv = jnp.sum(Binv * eyeM)
        t_term = n * sf2 - s2 * (trB - Mp)
        F = (-0.5 * n * jnp.log(2.0 * jnp.asarray(jnp.pi, dt) * s2)
             - 0.5 * logdetB - 0.5 * (yy - uv) / s2 - 0.5 * t_term / s2)

        Y1 = _dg(eyeM - Binv, V, 1, 1)
        wT = _dg(one11, w, 1, 1)
        dKnm = (An @ Y1 + alpha * wT) / sigma
        T0 = 2.0 * eyeM - B - Binv
        dKmm = (-(w * wT) / (2.0 * s2)
                + 0.5 * _dg(_dg(V, T0, 1, 0), V, 1, 1))
        trW = (n - Mp + trBinv) / s2
        dF_ds2 = (0.5 * jnp.sum(alpha * alpha) - 0.5 * trW
                  + t_term / (2.0 * s2 * s2))
        dlog_noise = dF_ds2 * s2
        dlog_os = (jnp.sum(dKmm * Kmm) + jnp.sum(dKnm * Knm)
                   + jitter * sf2 * (sf2 > 1.0) * jnp.sum(dKmm * eyeM)
                   - n * sf2 / (2.0 * s2))

        Pmm = dKmm * Kmm
        Pnm = dKnm * Knm
        rs_mm = jnp.sum(Pmm, axis=1, keepdims=True)
        cs_mm = jnp.sum(Pmm, axis=0, keepdims=True)
        rs_nm = jnp.sum(Pnm, axis=1, keepdims=True)
        cs_nm = jnp.sum(Pnm, axis=0, keepdims=True)
        Xs2 = Xs * Xs
        dls = (_dg(rs_mm, Zs2, 0, 0) + cs_mm @ Zs2
               - 2.0 * jnp.sum(Zs * (Pmm @ Zs), axis=0, keepdims=True)
               + _dg(rs_nm, Xs2, 0, 0) + cs_nm @ Zs2
               - 2.0 * jnp.sum(Xs * (Pnm @ Zs), axis=0, keepdims=True))

        g = dls
        g = jnp.where(lane == d, dlog_os, g)
        g = jnp.where(lane == d + 1, dlog_noise, g)
        U_rows.append(F * jnp.ones((1, 1), dt))
        g_rows.append(g)

    F_all = jnp.concatenate(U_rows, axis=0)                 # (C,1)
    g_all = jnp.concatenate(g_rows, axis=0)                 # (C,128)

    # ---- priors, vectorised over chains (static spec; VERDICT r4 item 7)
    lp, g_ls, g_os, g_noise = _prior_terms(thetas, log_os_all,
                                           log_noise_all, ls_mask,
                                           prior_spec)
    g_prior = g_ls
    g_prior = jnp.where(lane == d, g_os, g_prior)
    g_prior = jnp.where(lane == d + 1, g_noise, g_prior)
    g_all = (g_all + g_prior) * (lane < d + 2).astype(dt)
    return -(F_all + lp), -g_all


def _rbf_vfe_batched_vg_streaming(thetas, Zp, n, m, d, jitter, C,
                                  batched_chol, loop_blocks, NB,
                                  data_scale=0.0, prior_spec=None):
    """Streaming variant of :func:`_rbf_vfe_batched_vg`: X/y live in HBM
    packed into one (Np, 128) array (X lanes [0, d), y lane 127 — same
    packing as fused_bound._rbf_vfe_neg_logpost_vg_streaming) and each
    double-buffered (NB, 128) row block is visited ONCE per pass by ALL C
    chains, so HBM traffic per eval is two reads of X/y regardless of C.

    Same two-pass decomposition as the single-chain streaming core:
      pass 1: per chain  B_c = I + sum_b A_b^T A_b, u_c = sum_b A_b^T y_b
      (batched M x M epilogue: factorisations, v/w, Y1, dKmm)
      pass 2: per chain  ||alpha||^2, sum(Pnm), dls row/col/cross terms
    with the value path using the chain-batched formed-inverse form of the
    resident multichain core (see module docstring for why)."""
    dt = Zp.dtype
    Mp = Zp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    ls_mask = (lane < d).astype(dt)
    rowb = jax.lax.broadcasted_iota(jnp.int32, (NB, 1), 0)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    mrow_mask = (rowm < m).astype(dt)
    mcol_mask = (colm < m).astype(dt)
    eyeM = (rowm == colm).astype(dt)
    one11 = jnp.ones((1, 1), dt)
    ey = (lane == (_LANES - 1)).astype(dt)                  # y lane one-hot

    # streaming: X in HBM — static max|X| via data_scale (ADVICE r4)
    inv_ls_all = capped_inv_ls(thetas, ls_mask, Zp,
                               data_scale=data_scale)       # (C,128)
    log_os_all = jnp.sum(thetas * (lane == d).astype(dt), axis=1,
                         keepdims=True)                     # (C,1)
    log_noise_all = jnp.sum(thetas * (lane == d + 1).astype(dt), axis=1,
                            keepdims=True)
    sf2_all = jnp.exp(log_os_all)
    s2_all = jnp.exp(log_noise_all)

    # ---- per-chain Kmm, batched factorisation (no X needed) ----
    Zs_l, Zs2_l, zn_l, K_list = [], [], [], []
    for c in range(C):
        inv_ls = inv_ls_all[c:c + 1, :]
        sf2 = sf2_all[c, 0]
        Zs = Zp * inv_ls
        Zs2 = Zs * Zs
        zn = jnp.sum(Zs2, axis=1, keepdims=True)
        znT = _dg(one11, zn, 1, 1)
        r2 = jnp.maximum(zn + znT - 2.0 * _dg(Zs, Zs, 1, 1), 0.0)
        Kmm = sf2 * jnp.exp(-0.5 * r2)
        Kmm = jnp.where((mrow_mask * mcol_mask) > 0, Kmm, eyeM)
        Kj = Kmm + (jitter * jnp.maximum(sf2, 1.0)) * eyeM
        Zs_l.append(Zs); Zs2_l.append(Zs2); zn_l.append(zn)
        K_list.append((Kmm, Kj))
    UV1 = batched_chol([kj for _, kj in K_list])
    V_l = [UV1[c][1] for c in range(C)]                     # value snapshots
    U1_l = [UV1[c][0] for c in range(C)]

    def _block_An(t, XYb, c):
        """Chain c's scaled inputs + A^T rows for one block (both passes)."""
        rowg = rowb + t * NB
        nmask = (rowg < n).astype(dt)                       # (NB,1)
        yb = _dg(XYb, ey, 1, 1) * nmask                     # (NB,1)
        Xs_b = XYb * inv_ls_all[c:c + 1, :]                 # y lane zeroed
        xn_b = jnp.sum(Xs_b * Xs_b, axis=1, keepdims=True)
        znT = _dg(one11, zn_l[c], 1, 1)
        r2 = jnp.maximum(xn_b + znT - 2.0 * _dg(Xs_b, Zs_l[c], 1, 1), 0.0)
        sigma = jnp.sqrt(s2_all[c, 0])
        Knm_b = sf2_all[c, 0] * jnp.exp(-0.5 * r2) * nmask * mcol_mask
        An_b = _dg(Knm_b, V_l[c], 1, 0) / sigma
        return Xs_b, yb, Knm_b, An_b

    # ---- pass 1: B_c, u_c, yy ----
    def fwd_body(t, XYb, carry):
        Bacc, uacc, yy = carry
        Bout, uout = [], []
        for c in range(C):
            _, yb, _, An_b = _block_An(t, XYb, c)
            Bout.append(Bacc[c] + _dg(An_b, An_b, 0, 0))
            uout.append(uacc[c] + _dg(An_b, yb, 0, 0))
        rowg = rowb + t * NB
        yb0 = _dg(XYb, ey, 1, 1) * (rowg < n).astype(dt)
        return (tuple(Bout), tuple(uout), yy + jnp.sum(yb0 * yb0))

    Bacc, uacc, yy = loop_blocks(fwd_body, (
        tuple(jnp.zeros((Mp, Mp), dt) for _ in range(C)),
        tuple(jnp.zeros((Mp, 1), dt) for _ in range(C)),
        jnp.zeros((), dt)))
    B_l = [Bacc[c] + eyeM for c in range(C)]
    UV2 = batched_chol(B_l)

    # ---- batched epilogue (per-chain scalars + adjoint operators) ----
    # triangular solves for the critical vectors — see the resident
    # core (_rbf_vfe_batched_vg) for the warmup-divergence rationale
    solve_mode = _mc_solve_vectors()
    if solve_mode == "1":
        cu_b, v_b, w_b = _solve_critical_vectors_batched(
            UV1, UV2, list(uacc), C, Mp)
    F_rows, v_l, Y1_l, wT_l, trB_l, trBinv_l = [], [], [], [], [], []
    for c in range(C):
        s2 = s2_all[c, 0]
        sf2 = sf2_all[c, 0]
        UB, VB = UV2[c]
        u = uacc[c]
        B = B_l[c]
        V = V_l[c]
        U1 = U1_l[c]
        Binv = _dg(VB, VB, 1, 1)
        if solve_mode == "1":
            c_u, v, w = cu_b[c], v_b[c], w_b[c]
        elif solve_mode == "chain":
            from .fused_bound import ut_solve_vec, ut_t_solve_vec
            sbv = max(32, Mp // 2)
            c_u = ut_t_solve_vec(UB, VB, u, block=sbv)
            v = ut_solve_vec(UB, VB, c_u, block=sbv)
            w = ut_solve_vec(U1, V, v, block=sbv)
        else:
            c_u = _dg(VB, u, 0, 0)
            v = VB @ c_u
            w = _dg(V, v, 1, 0)
        diagUB = jnp.sum(UB * eyeM, axis=1, keepdims=True)
        logdetB = 2.0 * jnp.sum(jnp.log(diagUB))
        uv = jnp.sum(c_u * c_u)
        trB = jnp.sum(B * eyeM)
        trBinv = jnp.sum(Binv * eyeM)
        t_term = n * sf2 - s2 * (trB - Mp)
        F = (-0.5 * n * jnp.log(2.0 * jnp.asarray(jnp.pi, dt) * s2)
             - 0.5 * logdetB - 0.5 * (yy - uv) / s2 - 0.5 * t_term / s2)
        F_rows.append(F * jnp.ones((1, 1), dt))
        v_l.append(v)
        Y1_l.append(_dg(eyeM - Binv, V, 1, 1))
        wT_l.append(_dg(one11, w, 1, 1))
        trB_l.append(trB)
        trBinv_l.append(trBinv)
        # dKmm needs B/Binv/V/w — keep via closure lists below
        K_list[c] = (K_list[c][0], (B, Binv, w))

    # ---- pass 2: per-chain data-sum adjoints ----
    zero1L = jnp.zeros((1, _LANES), dt)

    def adj_body(t, XYb, carry):
        a2, osum, dlsnm, csnm, cross = carry
        a2o, oso, dno, cso, cro = [], [], [], [], []
        for c in range(C):
            Xs_b, yb, Knm_b, An_b = _block_An(t, XYb, c)
            s2 = s2_all[c, 0]
            sigma = jnp.sqrt(s2)
            alpha_b = (yb - An_b @ v_l[c]) / s2
            dKnm_b = (An_b @ Y1_l[c] + alpha_b * wT_l[c]) / sigma
            Pnm_b = dKnm_b * Knm_b
            Xs2_b = Xs_b * Xs_b
            a2o.append(a2[c] + jnp.sum(alpha_b * alpha_b))
            oso.append(osum[c] + jnp.sum(Pnm_b))
            dno.append(dlsnm[c] + _dg(jnp.sum(Pnm_b, axis=1, keepdims=True),
                                      Xs2_b, 0, 0))
            cso.append(csnm[c] + jnp.sum(Pnm_b, axis=0, keepdims=True))
            cro.append(cross[c] + jnp.sum(Xs_b * (Pnm_b @ Zs_l[c]), axis=0,
                                          keepdims=True))
        return tuple(map(tuple, (a2o, oso, dno, cso, cro)))

    a2, osum, dlsnm, csnm, cross = loop_blocks(adj_body, (
        tuple(jnp.zeros((), dt) for _ in range(C)),
        tuple(jnp.zeros((), dt) for _ in range(C)),
        tuple(zero1L for _ in range(C)),
        tuple(jnp.zeros((1, Mp), dt) for _ in range(C)),
        tuple(zero1L for _ in range(C))))

    g_rows = []
    for c in range(C):
        s2 = s2_all[c, 0]
        sf2 = sf2_all[c, 0]
        Kmm, (B, Binv, w) = K_list[c]
        V = V_l[c]
        wT = wT_l[c]
        Zs, Zs2 = Zs_l[c], Zs2_l[c]
        T0 = 2.0 * eyeM - B - Binv
        dKmm = (-(w * wT) / (2.0 * s2)
                + 0.5 * _dg(_dg(V, T0, 1, 0), V, 1, 1))
        t_term = n * sf2 - s2 * (trB_l[c] - Mp)
        trW = (n - Mp + trBinv_l[c]) / s2
        dF_ds2 = 0.5 * a2[c] - 0.5 * trW + t_term / (2.0 * s2 * s2)
        dlog_noise = dF_ds2 * s2
        dlog_os = (jnp.sum(dKmm * Kmm) + osum[c]
                   + jitter * sf2 * (sf2 > 1.0) * jnp.sum(dKmm * eyeM)
                   - n * sf2 / (2.0 * s2))
        Pmm = dKmm * Kmm
        rs_mm = jnp.sum(Pmm, axis=1, keepdims=True)
        cs_mm = jnp.sum(Pmm, axis=0, keepdims=True)
        dls = (_dg(rs_mm, Zs2, 0, 0) + cs_mm @ Zs2
               - 2.0 * jnp.sum(Zs * (Pmm @ Zs), axis=0, keepdims=True)
               + dlsnm[c] + csnm[c] @ Zs2 - 2.0 * cross[c])
        g = dls
        g = jnp.where(lane == d, dlog_os, g)
        g = jnp.where(lane == d + 1, dlog_noise, g)
        g_rows.append(g)

    F_all = jnp.concatenate(F_rows, axis=0)                 # (C,1)
    g_all = jnp.concatenate(g_rows, axis=0)                 # (C,128)

    # ---- priors, vectorised over chains (same as the resident core) ----
    lp, g_ls, g_os, g_noise = _prior_terms(thetas, log_os_all,
                                           log_noise_all, ls_mask,
                                           prior_spec)
    g_prior = g_ls
    g_prior = jnp.where(lane == d, g_os, g_prior)
    g_prior = jnp.where(lane == d + 1, g_noise, g_prior)
    g_all = (g_all + g_prior) * (lane < d + 2).astype(dt)
    return -(F_all + lp), -g_all


def _sgpmc_batched_vg(states, Xp, yrow, Zp, n, m, d, jitter, C,
                      batched_chol):
    """(U (C,1), g (C,128)) for C whitened-JointHMC states (C,128) — the
    sgpmc core (fused_bound._sgpmc_neg_logpost_vg) with the single Kmm
    factorisation batched over chains. State lanes per chain:
    [log_lengthscale (d), log_outputscale, log_noise, v (m)]."""
    dt = Xp.dtype
    Np, Mp = Xp.shape[0], Zp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    laneN = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
    ls_mask = (lane < d).astype(dt)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    eyeM = (rowm == colm).astype(dt)
    mcol_mask = (colm < m).astype(dt)
    mrow_mask = (rowm < m).astype(dt)
    ncol_mask = (laneN < n).astype(dt)
    one11 = jnp.ones((1, 1), dt)
    # v lanes -> (1,Mp) via the same MXU permutation as the single core
    perm = (jax.lax.broadcasted_iota(jnp.int32, (_LANES, 1), 0)
            == (jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
                + (d + 2))).astype(dt)

    inv_ls_all = capped_inv_ls(states, ls_mask, Xp, Zp)
    log_os_all = jnp.sum(states * (lane == d).astype(dt), axis=1,
                         keepdims=True)
    log_noise_all = jnp.sum(states * (lane == d + 1).astype(dt), axis=1,
                            keepdims=True)
    sf2_all = jnp.exp(log_os_all)
    s2_all = jnp.exp(log_noise_all)

    # phase 1: per-chain Kmm, batched factorisation
    Zs_l, Zs2_l, Kmm_l, K_list = [], [], [], []
    for c in range(C):
        inv_ls = inv_ls_all[c:c + 1, :]
        sf2 = sf2_all[c, 0]
        Zs = Zp * inv_ls
        Zs2 = Zs * Zs
        zn = jnp.sum(Zs2, axis=1, keepdims=True)
        znT = _dg(one11, zn, 1, 1)
        r2 = jnp.maximum(zn + znT - 2.0 * _dg(Zs, Zs, 1, 1), 0.0)
        Kmm = sf2 * jnp.exp(-0.5 * r2)
        Kmm = jnp.where((mrow_mask * mcol_mask) > 0, Kmm, eyeM)
        Kj = Kmm + (jitter * jnp.maximum(sf2, 1.0)) * eyeM
        Zs_l.append(Zs); Zs2_l.append(Zs2); Kmm_l.append(Kmm)
        K_list.append(Kj)
    UV = batched_chol(K_list)

    # phase 2: per-chain conditional + adjoints
    U_rows, g_rows = [], []
    for c in range(C):
        inv_ls = inv_ls_all[c:c + 1, :]
        sf2 = sf2_all[c, 0]
        s2 = s2_all[c, 0]
        Zs, Zs2, Kmm = Zs_l[c], Zs2_l[c], Kmm_l[c]
        _, V = UV[c]
        state = states[c:c + 1, :]
        vrow = _dg(state, perm, 1, 0) * mcol_mask             # (1,Mp)
        Xs = Xp * inv_ls
        Xs2 = Xs * Xs
        xn = jnp.sum(Xs2, axis=1, keepdims=True)
        zn = jnp.sum(Zs2, axis=1, keepdims=True)
        xnT = _dg(one11, xn, 1, 1)
        r2_ms = jnp.maximum(zn + xnT - 2.0 * _dg(Zs, Xs, 1, 1), 0.0)
        Kms = sf2 * jnp.exp(-0.5 * r2_ms) * mrow_mask * ncol_mask
        A = _dg(V, Kms, 0, 0)
        mean = _dg(vrow, A, 1, 0)
        e = (yrow - mean) * ncol_mask
        var_raw = sf2 - jnp.sum(A * A, axis=0, keepdims=True)
        msk = (var_raw > 1e-12).astype(dt) * ncol_mask
        var = jnp.maximum(var_raw, 1e-12) * ncol_mask

        see = jnp.sum(e * e)
        svar = jnp.sum(var)
        F = (-0.5 * n * jnp.log(2.0 * jnp.asarray(jnp.pi, dt) * s2)
             - 0.5 * (see + svar) / s2
             - 0.5 * jnp.sum(vrow * vrow))
        log_os = log_os_all[c, 0]
        log_noise = log_noise_all[c, 0]
        F = F + jnp.sum((2.0 * state - jnp.exp(state)) * ls_mask)
        F = F + (2.0 * log_os - sf2) + (2.0 * log_noise - s2)

        g_v = _dg(e, A, 1, 1) / s2 - vrow
        g_v = g_v * mcol_mask
        vcol = _dg(vrow, one11, 0, 0)
        Abar = (vcol * e + A * msk) / s2
        Kms_b = _dg(V, Abar, 1, 0)
        T = _dg(Abar, A, 1, 1)
        Phi = T * ((rowm > colm).astype(dt) + 0.5 * eyeM)
        T1 = _dg(V, Phi, 1, 0)
        Kmm_b = -_dg(T1, V, 1, 1)
        Kmm_bT = _dg(eyeM, Kmm_b, 1, 1)
        Kmm_b = 0.5 * (Kmm_b + Kmm_bT)

        dF_ds2 = (-0.5 * n / s2 + 0.5 * (see + svar) / (s2 * s2))
        dlog_noise = dF_ds2 * s2 + (2.0 - s2)
        dlog_os = (jnp.sum(Kmm_b * Kmm) + jnp.sum(Kms_b * Kms)
                   + jitter * sf2 * (sf2 > 1.0) * jnp.sum(Kmm_b * eyeM)
                   + jnp.sum(msk) * sf2 * (-0.5 / s2)
                   + (2.0 - sf2))

        Pmm = Kmm_b * Kmm
        Pms = Kms_b * Kms
        rs_mm = jnp.sum(Pmm, axis=1, keepdims=True)
        cs_mm = jnp.sum(Pmm, axis=0, keepdims=True)
        rs_ms = jnp.sum(Pms, axis=1, keepdims=True)
        cs_ms = jnp.sum(Pms, axis=0, keepdims=True)
        dls = (_dg(rs_mm, Zs2, 0, 0) + cs_mm @ Zs2
               - 2.0 * jnp.sum(Zs * (Pmm @ Zs), axis=0, keepdims=True)
               + _dg(rs_ms, Zs2, 0, 0) + cs_ms @ Xs2
               - 2.0 * jnp.sum(Zs * _dg(Pms, Xs, 1, 0), axis=0,
                               keepdims=True))
        g_ls = (dls + (2.0 - jnp.exp(state))) * ls_mask

        g = g_ls
        g = jnp.where(lane == d, dlog_os, g)
        g = jnp.where(lane == d + 1, dlog_noise, g)
        g = g + _dg(g_v, perm, 1, 1)
        g = g * (lane < d + 2 + m).astype(dt)
        U_rows.append(F * jnp.ones((1, 1), dt))
        g_rows.append(g)

    return (-jnp.concatenate(U_rows, axis=0),
            -jnp.concatenate(g_rows, axis=0))


def _sgpmc_batched_vg_streaming(states, Zp, n, m, d, jitter, C,
                                batched_chol, loop_blocks, NB,
                                data_scale=0.0):
    """Streaming variant of :func:`_sgpmc_batched_vg`: X/y live in HBM
    packed into one (Np, 128) array (X lanes [0, d), y lane 127 — same
    packing as :func:`_rbf_vfe_batched_vg_streaming`) and each
    double-buffered (NB, 128) row block is visited ONCE by all C chains.

    The whitened JointHMC potential is fully block-additive (see
    fused_bound._sgpmc_neg_logpost_vg_streaming), so a SINGLE pass over
    X/y suffices — HBM traffic per eval is one read regardless of C — with
    per-chain O(M^2) accumulators:
      see, svar, sum(msk), sum(Pms)                      scalars
      A e (Mp,1), T = Abar A^T (Mp,Mp),
      rowsum_N(Pms) (1,Mp), cs_ms @ Xs2 (1,128), Pms Xs (Mp,128)."""
    dt = Zp.dtype
    Mp = Zp.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    ls_mask = (lane < d).astype(dt)
    rowb = jax.lax.broadcasted_iota(jnp.int32, (NB, 1), 0)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (Mp, 1), 0)
    colm = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    mrow_mask = (rowm < m).astype(dt)
    mcol_mask = (colm < m).astype(dt)
    eyeM = (rowm == colm).astype(dt)
    one11 = jnp.ones((1, 1), dt)
    ey = (lane == (_LANES - 1)).astype(dt)                  # y lane one-hot
    perm = (jax.lax.broadcasted_iota(jnp.int32, (_LANES, 1), 0)
            == (jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
                + (d + 2))).astype(dt)

    # streaming: X in HBM — static max|X| via data_scale (ADVICE r4)
    inv_ls_all = capped_inv_ls(states, ls_mask, Zp,
                               data_scale=data_scale)       # (C,128)
    log_os_all = jnp.sum(states * (lane == d).astype(dt), axis=1,
                         keepdims=True)
    log_noise_all = jnp.sum(states * (lane == d + 1).astype(dt), axis=1,
                            keepdims=True)
    sf2_all = jnp.exp(log_os_all)
    s2_all = jnp.exp(log_noise_all)

    # ---- per-chain Kmm, batched factorisation (no X needed) ----
    Zs_l, Zs2_l, zn_l, Kmm_l, K_list, vrow_l, vcol_l = [], [], [], [], [], \
        [], []
    for c in range(C):
        inv_ls = inv_ls_all[c:c + 1, :]
        sf2 = sf2_all[c, 0]
        Zs = Zp * inv_ls
        Zs2 = Zs * Zs
        zn = jnp.sum(Zs2, axis=1, keepdims=True)
        znT = _dg(one11, zn, 1, 1)
        r2 = jnp.maximum(zn + znT - 2.0 * _dg(Zs, Zs, 1, 1), 0.0)
        Kmm = sf2 * jnp.exp(-0.5 * r2)
        Kmm = jnp.where((mrow_mask * mcol_mask) > 0, Kmm, eyeM)
        Kj = Kmm + (jitter * jnp.maximum(sf2, 1.0)) * eyeM
        Zs_l.append(Zs); Zs2_l.append(Zs2); zn_l.append(zn)
        Kmm_l.append(Kmm); K_list.append(Kj)
        vrow = _dg(states[c:c + 1, :], perm, 1, 0) * mcol_mask
        vrow_l.append(vrow)
        vcol_l.append(_dg(vrow, one11, 0, 0))
    UV = batched_chol(K_list)
    V_l = [UV[c][1] for c in range(C)]

    # ---- single pass: all data-coupled accumulators, all chains ----
    def body(t, XYb, carry):
        see, svar, smsk, spms, ae, T, rsms, csx2, pmsx = carry
        rowg = rowb + t * NB
        nmask = (rowg < n).astype(dt)                       # (NB,1)
        yb = _dg(XYb, ey, 1, 1) * nmask                     # (NB,1)
        outs = ([], [], [], [], [], [], [], [], [])
        for c in range(C):
            s2 = s2_all[c, 0]
            Xs_b = XYb * inv_ls_all[c:c + 1, :]             # y lane zeroed
            xn_b = jnp.sum(Xs_b * Xs_b, axis=1, keepdims=True)
            znT = _dg(one11, zn_l[c], 1, 1)
            r2 = jnp.maximum(xn_b + znT - 2.0 * _dg(Xs_b, Zs_l[c], 1, 1),
                             0.0)
            Knm_b = sf2_all[c, 0] * jnp.exp(-0.5 * r2) * nmask * mcol_mask
            At_b = _dg(Knm_b, V_l[c], 1, 0)                 # A^T rows
            e_b = (yb - At_b @ vcol_l[c]) * nmask
            var_raw = sf2_all[c, 0] - jnp.sum(At_b * At_b, axis=1,
                                              keepdims=True)
            msk_b = (var_raw > 1e-12).astype(dt) * nmask
            var_b = jnp.maximum(var_raw, 1e-12) * nmask
            Abart_b = (e_b * vrow_l[c] + At_b * msk_b) / s2
            KmsbT_b = _dg(Abart_b, V_l[c], 1, 1)
            PmsT_b = KmsbT_b * Knm_b
            cs_b = jnp.sum(PmsT_b, axis=1, keepdims=True)   # (NB,1)
            Xs2_b = Xs_b * Xs_b
            outs[0].append(see[c] + jnp.sum(e_b * e_b))
            outs[1].append(svar[c] + jnp.sum(var_b))
            outs[2].append(smsk[c] + jnp.sum(msk_b))
            outs[3].append(spms[c] + jnp.sum(PmsT_b))
            outs[4].append(ae[c] + _dg(At_b, e_b, 0, 0))
            outs[5].append(T[c] + _dg(Abart_b, At_b, 0, 0))
            outs[6].append(rsms[c] + jnp.sum(PmsT_b, axis=0, keepdims=True))
            outs[7].append(csx2[c] + _dg(cs_b, Xs2_b, 0, 0))
            outs[8].append(pmsx[c] + _dg(PmsT_b, Xs_b, 0, 0))
        return tuple(map(tuple, outs))

    zero = jnp.zeros((), dt)
    see, svar, smsk, spms, ae, T, rsms, csx2, pmsx = loop_blocks(body, (
        tuple(zero for _ in range(C)), tuple(zero for _ in range(C)),
        tuple(zero for _ in range(C)), tuple(zero for _ in range(C)),
        tuple(jnp.zeros((Mp, 1), dt) for _ in range(C)),
        tuple(jnp.zeros((Mp, Mp), dt) for _ in range(C)),
        tuple(jnp.zeros((1, Mp), dt) for _ in range(C)),
        tuple(jnp.zeros((1, _LANES), dt) for _ in range(C)),
        tuple(jnp.zeros((Mp, _LANES), dt) for _ in range(C))))

    # ---- per-chain epilogue (identical to the resident core from T on) ----
    U_rows, g_rows = [], []
    for c in range(C):
        sf2 = sf2_all[c, 0]
        s2 = s2_all[c, 0]
        state = states[c:c + 1, :]
        vrow = vrow_l[c]
        V = V_l[c]
        Kmm = Kmm_l[c]
        Zs, Zs2 = Zs_l[c], Zs2_l[c]
        log_os = log_os_all[c, 0]
        log_noise = log_noise_all[c, 0]

        F = (-0.5 * n * jnp.log(2.0 * jnp.asarray(jnp.pi, dt) * s2)
             - 0.5 * (see[c] + svar[c]) / s2
             - 0.5 * jnp.sum(vrow * vrow))
        F = F + jnp.sum((2.0 * state - jnp.exp(state)) * ls_mask)
        F = F + (2.0 * log_os - sf2) + (2.0 * log_noise - s2)

        g_v = (_dg(one11, ae[c], 1, 1) / s2 - vrow) * mcol_mask
        Phi = T[c] * ((rowm > colm).astype(dt) + 0.5 * eyeM)
        T1 = _dg(V, Phi, 1, 0)
        Kmm_b = -_dg(T1, V, 1, 1)
        Kmm_bT = _dg(eyeM, Kmm_b, 1, 1)
        Kmm_b = 0.5 * (Kmm_b + Kmm_bT)

        dF_ds2 = (-0.5 * n / s2 + 0.5 * (see[c] + svar[c]) / (s2 * s2))
        dlog_noise = dF_ds2 * s2 + (2.0 - s2)
        dlog_os = (jnp.sum(Kmm_b * Kmm) + spms[c]
                   + jitter * sf2 * (sf2 > 1.0) * jnp.sum(Kmm_b * eyeM)
                   + smsk[c] * sf2 * (-0.5 / s2)
                   + (2.0 - sf2))

        Pmm = Kmm_b * Kmm
        rs_mm = jnp.sum(Pmm, axis=1, keepdims=True)
        cs_mm = jnp.sum(Pmm, axis=0, keepdims=True)
        rs_ms = _dg(rsms[c], one11, 0, 0)                   # (Mp,1)
        dls = (_dg(rs_mm, Zs2, 0, 0) + cs_mm @ Zs2
               - 2.0 * jnp.sum(Zs * (Pmm @ Zs), axis=0, keepdims=True)
               + _dg(rs_ms, Zs2, 0, 0) + csx2[c]
               - 2.0 * jnp.sum(Zs * pmsx[c], axis=0, keepdims=True))
        g_ls = (dls + (2.0 - jnp.exp(state))) * ls_mask

        g = g_ls
        g = jnp.where(lane == d, dlog_os, g)
        g = jnp.where(lane == d + 1, dlog_noise, g)
        g = g + _dg(g_v, perm, 1, 1)
        g = g * (lane < d + 2 + m).astype(dt)
        U_rows.append(F * jnp.ones((1, 1), dt))
        g_rows.append(g)

    return (-jnp.concatenate(U_rows, axis=0),
            -jnp.concatenate(g_rows, axis=0))


# ---------------------------------------------------------------------------
# Batched HMC transition + chunk kernels
# ---------------------------------------------------------------------------

def _da_update_rows(le, lea, h, mu, t, accept, target):
    """Dual averaging on (C,1) rows (same constants as inference/hmc.py)."""
    t1 = t + 1.0
    h1 = (1.0 - 1.0 / (t1 + 10.0)) * h + (target - accept) / (t1 + 10.0)
    le1 = mu - jnp.sqrt(t1) / 0.05 * h1
    w = jnp.exp(-0.75 * jnp.log(t1))
    lea1 = w * le1 + (1.0 - w) * lea
    return le1, lea1, h1, mu, t1


def _hmc_transition_batched(z0, U0, g0, eps, inv_mass, pot, mom, mh_u,
                            num_leapfrog):
    """One fixed-leapfrog transition for C lock-step chains.
    z0/g0/mom/inv_mass (C,128); U0/eps/mh_u (C,1)."""
    f32 = jnp.float32

    def kinetic(r):
        return 0.5 * jnp.sum(inv_mass * r * r, axis=1, keepdims=True)

    r0 = mom / jnp.sqrt(inv_mass)
    H0 = U0 + kinetic(r0)

    def step(_, carry):
        z, r, U, g = carry
        r_half = r - 0.5 * eps * g
        z = z + eps * inv_mass * r_half
        U, g = pot(z)
        r = r_half - 0.5 * eps * g
        return (z, r, U, g)

    z, r, U, g = jax.lax.fori_loop(0, num_leapfrog, step, (z0, r0, U0, g0))
    H1 = U + kinetic(r)
    delta = jnp.where(jnp.isnan(H1), jnp.asarray(jnp.inf, f32), H1 - H0)
    accept_prob = jnp.minimum(1.0, jnp.exp(-delta))         # (C,1)
    acc = mh_u < accept_prob
    zp = jnp.where(acc, z, z0)
    Up = jnp.where(acc, U, U0)
    gp = jnp.where(acc, g, g0)
    diverging = (delta > _DIVERGENCE_THRESHOLD).astype(f32)
    return zp, Up, gp, accept_prob, diverging


def _nuts_transition_batched(z0, U0, g0, eps, inv_mass, pot, mom, TR, LU,
                             *, C, max_depth, leaf_rows):
    """One multinomial-NUTS transition for C lock-step chains (round 3).

    The per-chain doubling/subtree recursion of the single-chain kernel
    (ops/fused_nuts._transition_inkernel) is flattened into ONE while loop
    whose every tick leapfrogs ALL still-building chains through the shared
    batched potential; per-chain tree bookkeeping (subtree boundaries,
    progressive multinomial, U-turn closures) is masked vector math.
    Chains that finish early (U-turn / divergence / max depth) idle until
    the slowest chain completes — the idle cost is bounded by the shared
    panel loops that dominate each eval, exactly the lock-step economics
    that make the batched HMC kernel 4x the XLA path (PERF.md round 3).

    Checkpoint storage is VECTORISED, not ref-based: the z/v checkpoint
    stacks live as loop-carried (C*(max_depth+1), 128) VALUES, written via
    one-hot row masks and read back with masked-row-sum gather matmuls — no
    per-chain dynamic stores, no vector->scalar register round trips (the
    89->47us/leaf lesson, PERF.md round 3).

    Randomness: ``TR`` (C, 128) — per-chain doubling uniforms, lanes
    [2*depth] = direction, [2*depth+1] = subtree swap-accept;
    ``LU`` (C*leaf_rows, 128) — per-chain leaf uniforms indexed by the
    chain's leaf counter (row c*leaf_rows + k>>7, lane k&127), matching the
    single-chain indexing scheme (ops/fused_nuts._run_transition).

    Returns (zp (C,128), Up (C,1), gp (C,128), accept (C,1),
    diverging (C,1) f32, depth (C,1) f32, nl (C,1) f32, H0 (C,1)).

    Mosaic layout rules this function is built around (all real-TPU only —
    interpret mode hides every one of them):
    - Per-chain scalars live as LANE-UNIFORM (C,128) ROWS, never (C,1)
      columns: selects and broadcasts on narrow f32/i32 vectors hit
      unimplemented relayouts ("lane broadcast", "replicated in
      destination but not in source"), while full-width (C,128) selects
      are the same ops the proven HMC kernels use — and a (C,1) column
      costs the same single vreg as a (C,128) row anyway. Reductions
      produce rows directly via matmuls with an all-ones matrix.
    - Counters are exact small-integer f32 (no carried/lane-broadcast
      i32); the single-chain kernel's bit tricks (popcount /
      trailing-ones / shifts) become unrolled mod-2 f32 arithmetic.
    - Flags are f32 0/1 masks, not jnp.bool_ (carried i1 materialises as
      i8 and cannot be truncated back).
    - Loop-carry inits are tied to computed values (0.0 * U0, not
      jnp.zeros): constant splats get the fully-replicated layout and the
      body's tiled outputs cannot be relayouted back to it.
    - Stack gathers select rows with full-shape masks and contract with
      the chain-selector matrix P instead of comparing a data (C,1)
      against a (1,rows) iota (integer lane-broadcast again).
    """
    f32 = jnp.float32
    i32 = jnp.int32
    D1 = max_depth + 1
    CD1 = C * D1
    CLR = C * leaf_rows
    NBITS = max_depth + 1
    lanef = jax.lax.broadcasted_iota(i32, (1, _LANES), 1).astype(f32)
    ones_LL = jnp.ones((_LANES, _LANES), f32)

    def _mod2(x):
        return x - 2.0 * jnp.floor(0.5 * x)

    def popcount_f(x):
        cnt = jnp.zeros_like(x)
        for _ in range(NBITS):
            cnt = cnt + _mod2(x)
            x = jnp.floor(0.5 * x)
        return cnt

    def trailing_ones_f(x):
        cnt = jnp.zeros_like(x)
        alive = jnp.ones_like(x)
        for _ in range(NBITS):
            alive = alive * _mod2(x)
            cnt = cnt + alive
            x = jnp.floor(0.5 * x)
        return cnt

    def widen(x_c1):
        """(C,1) -> lane-uniform (C,128) via an outer product."""
        return _dg(x_c1, jnp.ones((1, _LANES), f32), 1, 0)

    def row_sum(x):
        """(R,128) -> lane-uniform (R,128) row sums (one MXU contraction)."""
        return _dg(x, ones_LL, 1, 0)

    def row_dot(a, b):
        return row_sum(a * b)

    # chain-selector P (CD1, C): row r belongs to chain c iff
    # c*D1 <= r < (c+1)*D1 (iota compares — Mosaic re-materialises iotas
    # in any layout, unlike computed data)
    rowi = jax.lax.broadcasted_iota(i32, (CD1, 1), 0).astype(f32)
    lo = (jax.lax.broadcasted_iota(i32, (1, C), 1) * D1).astype(f32)
    P = ((rowi >= lo) & (rowi < lo + D1)).astype(f32)
    # within-block slot index of each checkpoint row, lane-uniform
    s_iota = (jax.lax.broadcasted_iota(i32, (CD1, _LANES), 0).astype(f32)
              - widen(_dg(P, lo, 1, 1)))
    # leaf-slab selector Pl (CLR, C) and within-block row index
    rowl = jax.lax.broadcasted_iota(i32, (CLR, 1), 0).astype(f32)
    lol = (jax.lax.broadcasted_iota(i32, (1, C), 1) * leaf_rows).astype(f32)
    Pl = ((rowl >= lol) & (rowl < lol + leaf_rows)).astype(f32)
    l_iota = (jax.lax.broadcasted_iota(i32, (CLR, _LANES), 0).astype(f32)
              - widen(_dg(Pl, lol, 1, 1)))

    def pick_lane(rows, idx):
        """rows (C,128), idx lane-uniform (C,128) whole number ->
        lane-uniform (C,128) gather of rows[c, idx[c]]."""
        return row_sum(rows * (lanef == idx).astype(f32))

    def leaf_u(k):
        """k lane-uniform (C,128) leaf counters -> (C,128) uniforms."""
        krow = jnp.floor(k * (1.0 / _LANES))
        klane = k - _LANES * krow
        # select each chain's LU row (leaf_rows rows per chain), then lane
        rmask = (l_iota == _dg(Pl, krow, 1, 0)).astype(f32)  # (CLR,128)
        rows = _dg(Pl, rmask * LU, 0, 0)                     # (C,128)
        return row_sum(rows * (lanef == klane).astype(f32))

    def kinetic(r):
        return 0.5 * row_dot(inv_mass * r, r)

    r0 = mom / jnp.sqrt(inv_mass)
    U0w = widen(U0)
    epsw = widen(eps)
    H0 = U0w + kinetic(r0)
    # computed-layout zeros (see layout rules above)
    zeros_cw = 0.0 * U0w
    false_cw = zeros_cw
    izero = zeros_cw
    zc0 = _dg(P, 0.0 * z0, 1, 0)      # (CD1, 128) computed-layout zeros

    u_dir0 = pick_lane(TR, zeros_cw)
    dirf0 = 1.0 - 2.0 * (u_dir0 >= 0.5).astype(f32)
    u_swap0 = pick_lane(TR, zeros_cw + 1.0)

    init = (
        # checkpoint stacks (values, not refs)
        zc0, zc0,
        # trajectory endpoints l/r: z, r, U, g
        z0, r0, U0w, g0, z0, r0, U0w, g0,
        # proposal + trajectory log-weight
        z0, U0w, g0, zeros_cw,
        # current subtree: endpoint z/r/U/g, proposal z/U/g, logw, turn,
        # div, acc, pending swap uniform
        z0, r0, U0w, g0, z0, U0w, g0, zeros_cw - jnp.inf,
        false_cw, false_cw, zeros_cw, u_swap0,
        # counters: dirf, i, nleaf, nl0
        dirf0, izero, zeros_cw + 1.0, izero,
        # trajectory: depth, turning, diverging, acc, nl, done
        izero, false_cw, false_cw, zeros_cw, izero, false_cw,
    )

    def cond(carry):
        done = carry[-1]
        return jnp.sum(done) < C * _LANES   # lane-uniform 0/1 rows

    def body(carry):
        (zc, vc, lz, lr_, lU, lg, rz, rr, rU, rg, zp, Up, gp, logw,
         sz, sr, sU, sg, zps, Ups, gps, logw_sub, turn_sub, div_sub,
         acc_sub, u_swap_reg, dirf, i, nleaf, nl0,
         depth, turning, diverging, acc, nl, done) = carry
        act = done < 0.5          # ephemeral (C,128) bool; carries stay f32

        # ---- one leapfrog step for every still-building chain ----
        eps_s = dirf * epsw
        r_half = sr - 0.5 * eps_s * sg
        z_leap = sz + eps_s * inv_mass * r_half
        # done chains re-evaluate at z0 (finite, well-conditioned) — their
        # results are discarded by the masks below, and this keeps frozen
        # NaN states of diverged chains out of the shared factorisation
        z_eval = jnp.where(act, z_leap, z0)
        U_new_c1, g_new = pot(z_eval)
        U_new = widen(U_new_c1)
        r_new = r_half - 0.5 * eps_s * g_new
        v_new = inv_mass * r_new
        H = U_new + kinetic(r_new)
        delta = H - H0
        delta = jnp.where(jnp.isnan(delta), jnp.asarray(jnp.inf, f32),
                          delta)
        div_leaf = delta > _DIVERGENCE_THRESHOLD
        logw_leaf = -delta
        sz1 = jnp.where(act, z_eval, sz)
        sr1 = jnp.where(act, r_new, sr)
        sU1 = jnp.where(act, U_new, sU)
        sg1 = jnp.where(act, g_new, sg)
        acc_sub1 = acc_sub + jnp.where(act, jnp.minimum(1.0,
                                                        jnp.exp(-delta)),
                                       0.0)
        div_sub1 = jnp.maximum(div_sub, (act & div_leaf).astype(f32))

        # ---- progressive multinomial within the subtree ----
        logw_new = _lae(logw_sub, logw_leaf)
        u_l = leaf_u(nl0 + i)
        take = act & (_log_unif(u_l) < (logw_leaf - logw_new))
        zps1 = jnp.where(take, z_eval, zps)
        Ups1 = jnp.where(take, U_new, Ups)
        gps1 = jnp.where(take, g_new, gps)
        logw_sub1 = jnp.where(act, logw_new, logw_sub)

        # ---- checkpoint writes (even leaves), one-hot masked ----
        is_even = _mod2(i) < 0.5
        slot = popcount_f(i)
        # NaN rows would contaminate other chains through the 0-weights of
        # the P matmul; a NaN leaf diverges this very tick, so its
        # checkpoint is never read — store zeros instead
        z_st = jnp.where(jnp.isnan(z_eval), 0.0, z_eval)
        v_st = jnp.where(jnp.isnan(v_new), 0.0, v_new)
        wmask = ((s_iota == _dg(P, slot, 1, 0))
                 & (_dg(P, (act & is_even).astype(f32), 1, 0) > 0.5))
        zc1 = jnp.where(wmask, _dg(P, z_st, 1, 0), zc)
        vc1 = jnp.where(wmask, _dg(P, v_st, 1, 0), vc)

        # ---- U-turn closures (odd leaves), gather-based ----
        t_ones = trailing_ones_f(i)
        odd_act = act & (~is_even)

        def close(mmf, ts):
            need = odd_act & (mmf <= t_ones)

            def run(ts):
                j = i - jnp.exp2(mmf) + 1.0
                sj = popcount_f(j)
                # rows of chain c whose slot == sj[c]; gather by P^T
                smask = (s_iota == _dg(P, sj, 1, 0)).astype(f32)
                zcj = _dg(P, smask * zc1, 0, 0)             # (C,128)
                vcj = _dg(P, smask * vc1, 0, 0)
                dz = dirf * (z_eval - zcj)
                bad = (row_dot(dz, vcj) < 0.0) | (row_dot(dz, v_new) < 0.0)
                return jnp.maximum(ts, (need & bad).astype(f32))

            return jax.lax.cond(jnp.sum(need.astype(f32)) > 0.0, run,
                                lambda ts: ts, ts)

        turn_sub1 = close(jnp.asarray(1.0, f32), turn_sub)
        turn_sub1 = jax.lax.fori_loop(
            2, max_depth + 1,
            lambda mm, ts: close(mm.astype(f32), ts), turn_sub1)

        i1 = jnp.where(act, i + 1.0, i)
        nl1 = jnp.where(act, nl + 1.0, nl)

        # ---- subtree completion: merge into the trajectory ----
        comp = act & ((i1 >= nleaf) | (turn_sub1 > 0.5) | (div_sub1 > 0.5))
        ok = comp & (turn_sub1 < 0.5) & (div_sub1 < 0.5)
        take2 = ok & (_log_unif(u_swap_reg) < (logw_sub1 - logw))
        zp1 = jnp.where(take2, zps1, zp)
        Up1 = jnp.where(take2, Ups1, Up)
        gp1 = jnp.where(take2, gps1, gp)
        logw1 = jnp.where(ok, _lae(logw, logw_sub1), logw)
        fwd = dirf > 0
        adv_l = ok & (~fwd)
        adv_r = ok & fwd
        lz1 = jnp.where(adv_l, sz1, lz)
        lr1 = jnp.where(adv_l, sr1, lr_)
        lU1 = jnp.where(adv_l, sU1, lU)
        lg1 = jnp.where(adv_l, sg1, lg)
        rz1 = jnp.where(adv_r, sz1, rz)
        rr1 = jnp.where(adv_r, sr1, rr)
        rU1 = jnp.where(adv_r, sU1, rU)
        rg1 = jnp.where(adv_r, sg1, rg)
        dzt = rz1 - lz1
        full_turn = (row_dot(dzt, inv_mass * lr1) < 0.0) | \
                    (row_dot(dzt, inv_mass * rr1) < 0.0)
        turning1 = jnp.where(comp,
                             jnp.maximum(turn_sub1,
                                         (ok & full_turn).astype(f32)),
                             turning)
        diverging1 = jnp.maximum(diverging, jnp.where(comp, div_sub1, 0.0))
        acc1 = acc + jnp.where(comp, acc_sub1, 0.0)
        depth1 = jnp.where(comp, depth + 1.0, depth)
        done1 = jnp.maximum(done, (comp & ((turning1 > 0.5)
                                           | (diverging1 > 0.5)
                                           | (depth1 >= max_depth))
                                   ).astype(f32))

        # ---- next doubling for chains that completed and continue ----
        start = comp & (done1 < 0.5)
        u_dir = pick_lane(TR, 2.0 * depth1)
        u_swap_n = pick_lane(TR, 2.0 * depth1 + 1.0)
        dirf_n = 1.0 - 2.0 * (u_dir >= 0.5).astype(f32)
        fwd_n = dirf_n > 0
        dirf1 = jnp.where(start, dirf_n, dirf)
        sz2 = jnp.where(start, jnp.where(fwd_n, rz1, lz1), sz1)
        sr2 = jnp.where(start, jnp.where(fwd_n, rr1, lr1), sr1)
        sU2 = jnp.where(start, jnp.where(fwd_n, rU1, lU1), sU1)
        sg2 = jnp.where(start, jnp.where(fwd_n, rg1, lg1), sg1)
        i2 = jnp.where(start, 0.0, i1)
        # 2^depth via f32 exp2 (no vector shifts; see the layout rules)
        nleaf1 = jnp.where(start, jnp.exp2(depth1), nleaf)
        nl01 = jnp.where(start, nl1, nl0)
        logw_sub2 = jnp.where(start, -jnp.inf, logw_sub1)
        turn_sub2 = jnp.where(start, 0.0, turn_sub1)
        div_sub2 = jnp.where(start, 0.0, div_sub1)
        acc_sub2 = jnp.where(start, 0.0, acc_sub1)
        u_swap1 = jnp.where(start, u_swap_n, u_swap_reg)

        return (zc1, vc1, lz1, lr1, lU1, lg1, rz1, rr1, rU1, rg1,
                zp1, Up1, gp1, logw1,
                sz2, sr2, sU2, sg2, zps1, Ups1, gps1, logw_sub2,
                turn_sub2, div_sub2, acc_sub2, u_swap1,
                dirf1, i2, nleaf1, nl01,
                depth1, turning1, diverging1, acc1, nl1, done1)

    out = jax.lax.while_loop(cond, body, init)
    (zp, Upw, gp) = (out[10], out[11], out[12])
    (depth, turning, diverging, acc, nl) = (out[30], out[31], out[32],
                                            out[33], out[34])
    lane0 = (lanef == 0.0).astype(f32)

    def narrow(x):
        """lane-uniform (C,128) -> (C,1) via a masked lane sum."""
        return jnp.sum(x * lane0, axis=1, keepdims=True)

    accept = narrow(acc / jnp.maximum(nl, 1.0))
    return (zp, narrow(Upw), gp, accept, narrow(diverging), narrow(depth),
            narrow(nl), narrow(H0))


_BATCHED_CORES = {}  # populated below (vfe / sgpmc)


def _make_batched_pot(x_ref, y_ref, zz_ref, Ks, Us, Vs, Ds, n, m, d, jitter,
                      block, C, core="vfe", stream=None, prior_spec=None):
    Mp = zz_ref.shape[0]
    core_fn = _BATCHED_CORES[core]
    if core == "vfe":
        # parameterised hyper-prior spec (VERDICT r4 item 7); the sgpmc
        # core keeps its protocol-fixed Gamma(2,1) tree
        core_fn = partial(core_fn, prior_spec=prior_spec)

    def batched_chol(K_list):
        for c in range(C):
            Ks[c * Mp:(c + 1) * Mp, :] = K_list[c]
        chol_u_inv_batched_inplace(Ks, Us, Vs, Ds, C, block=block)
        out = [(Us[c * Mp:(c + 1) * Mp, :], Vs[c * Mp:(c + 1) * Mp, :])
               for c in range(C)]
        # whole-ref loads for the chain-batched solvers (avoids re-stacking
        # the per-chain slices with C concat copies per factorisation)
        return _StackedUV(out, Us[:], Vs[:])

    if stream is not None:
        assert core in ("vfe", "sgpmc"), \
            "multichain N-streaming: vfe and sgpmc cores"
        stream_fn = (_rbf_vfe_batched_vg_streaming if core == "vfe"
                     else _sgpmc_batched_vg_streaming)
        if core == "vfe":
            stream_fn = partial(stream_fn, prior_spec=prior_spec)
        NB, nblk = stream["NB"], stream["nblocks"]
        xbuf, sem = stream["xbuf"], stream["sem"]

        def _dma(slot, t):
            # x_ref is the packed (Np, 128) HBM array: X lanes [0, d),
            # y in lane 127 (see _rbf_vfe_batched_vg_streaming)
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(t * NB, NB), :], xbuf.at[slot], sem.at[slot])

        def loop_blocks(body, carry):
            _dma(0, 0).start()

            def lb(t, c):
                slot = jax.lax.rem(t, 2)

                @pl.when(t + 1 < nblk)
                def _():
                    _dma(jax.lax.rem(t + 1, 2), t + 1).start()

                _dma(slot, t).wait()
                return body(t, xbuf[slot], c)

            return jax.lax.fori_loop(0, nblk, lb, carry)

        def pot(zrows):
            return stream_fn(
                zrows, zz_ref[:], n, m, d, jitter, C, batched_chol,
                loop_blocks, NB, data_scale=stream.get("data_scale", 0.0))

        return pot

    def pot(zrows):
        return core_fn(zrows, x_ref[:], y_ref[:], zz_ref[:],
                       n, m, d, jitter, C, batched_chol)

    return pot


_BATCHED_CORES["vfe"] = _rbf_vfe_batched_vg
_BATCHED_CORES["sgpmc"] = _sgpmc_batched_vg


def _chain_sel(C):
    """(C, 128) one-hot rows: row c selects lane c (for reading per-chain
    scalars out of a (1, 128) slab row via one MXU contraction)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    return (cols == rows).astype(jnp.float32)


_DA_LANES = 8   # da_ref lanes: [log_eps, log_eps_avg, h, mu, t, wf_cnt]


def _mc_stream_dict(stream_nb, xsbuf, dsem):
    if stream_nb is None:
        return None
    return {"NB": stream_nb[0], "nblocks": stream_nb[1],
            "data_scale": stream_nb[2] if len(stream_nb) > 2 else 0.0,
            "xbuf": xsbuf, "sem": dsem}


def _mc_potential_body(z_ref, x_ref, y_ref, zz_ref, uout_ref, gout_ref,
                       Ks, Us, Vs, Ds, xsbuf=None, dsem=None,
                       *, n, m, d, jitter, block, C,
                       core="vfe", stream_nb=None, prior_spec=None):
    pot = _make_batched_pot(x_ref, y_ref, zz_ref, Ks, Us, Vs, Ds, n, m, d,
                            jitter, block, C, core,
                            stream=_mc_stream_dict(stream_nb, xsbuf, dsem),
                            prior_spec=prior_spec)
    U, g = pot(z_ref[:])
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, _DA_LANES), 1)
    uout_ref[:] = U * (lane8 == 0).astype(jnp.float32)
    gout_ref[:] = g


def _stan_adapt_rows(zp, accept, da, wfm, wfm2, inv_mass, in_w, w_end,
                     target_accept, adapt_mass, pick, lane8):
    """Per-chain Stan warmup adaptation on (C,*) rows (dual averaging +
    windowed Welford mass), shared by the HMC and NUTS chunk bodies.
    Mirrors inference/hmc.py's single-chain schedule exactly."""
    f32 = jnp.float32
    le, lea, h, mu = (pick(da, 0), pick(da, 1), pick(da, 2), pick(da, 3))
    tda, wfc = pick(da, 4), pick(da, 5)
    le1, lea1, h1, mu1, tda1 = _da_update_rows(
        le, lea, h, mu, tda, accept, target_accept)
    wfm1, wfm21, wfc1, im1 = wfm, wfm2, wfc, inv_mass
    if adapt_mass:
        cnt1 = wfc + 1.0
        delta = zp - wfm
        mean1 = wfm + delta / cnt1
        m21 = wfm2 + delta * (zp - mean1)
        wfm1 = jnp.where(in_w, mean1, wfm)
        wfm21 = jnp.where(in_w, m21, wfm2)
        wfc1 = jnp.where(in_w, cnt1, wfc)
        var = wfm21 / jnp.maximum(wfc1 - 1.0, 1.0)
        var = ((wfc1 / (wfc1 + 5.0)) * var
               + 1e-3 * (5.0 / (wfc1 + 5.0)))
        im1 = jnp.where(w_end, var, inv_mass)
        wfm1 = jnp.where(w_end, jnp.zeros_like(wfm1), wfm1)
        wfm21 = jnp.where(w_end, jnp.zeros_like(wfm21), wfm21)
        wfc1 = jnp.where(w_end, jnp.zeros_like(wfc1), wfc1)
        # window end restarts dual averaging at current eps
        lea1 = jnp.where(w_end, le1, lea1)
        mu1 = jnp.where(w_end, jnp.log(10.0) + le1, mu1)
        h1 = jnp.where(w_end, jnp.zeros_like(h1), h1)
        tda1 = jnp.where(w_end, jnp.zeros_like(tda1), tda1)
    da1 = (le1 * (lane8 == 0) + lea1 * (lane8 == 1)
           + h1 * (lane8 == 2) + mu1 * (lane8 == 3)
           + tda1 * (lane8 == 4) + wfc1 * (lane8 == 5)).astype(f32)
    return da1, im1, wfm1, wfm21


def _mc_warm_chunk_body(scal_ref, flags_ref, z_ref, g_ref, u_ref, da_ref,
                        im_ref, wfm_ref, wfm2_ref, mom_ref, mh_ref,
                        x_ref, y_ref, zz_ref,
                        zout_ref, gout_ref, uout_ref, daout_ref, imout_ref,
                        wfmout_ref, wfm2out_ref, statout_ref,
                        Ks, Us, Vs, Ds, xsbuf=None, dsem=None,
                        *, n, m, d, jitter, block, chunk, C,
                        num_leapfrog, target_accept, adapt_mass,
                        core="vfe", stream_nb=None, prior_spec=None):
    """``chunk`` warmup HMC transitions for C chains with per-chain Stan
    adaptation (mirrors inference/hmc.py exactly, vectorised over chains).

    da_ref (C,8) lanes: [log_eps, log_eps_avg, h, mu, t, wf_cnt];
    u_ref (C,8) lane 0 = potential. flags_ref (SMEM i32, 2*chunk):
    in_window then window_end per step. scal_ref (SMEM f32, 1): n_active.
    mom_ref (chunk*C, 128); mh_ref (chunk, 128) lane c = chain c's uniform.
    statout (C,8): lanes [acc_sum, div_sum]."""
    f32 = jnp.float32
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, _DA_LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    _dim = d + 2 + (m if core == "sgpmc" else 0)
    dmask = (lane < _dim).astype(f32)
    sel = _chain_sel(C)
    pot = _make_batched_pot(x_ref, y_ref, zz_ref, Ks, Us, Vs, Ds, n, m, d,
                            jitter, block, C, core,
                            stream=_mc_stream_dict(stream_nb, xsbuf, dsem),
                            prior_spec=prior_spec)
    n_active = scal_ref[0].astype(jnp.int32)

    def pick(rows8, i):
        return jnp.sum(rows8 * (lane8 == i).astype(f32), axis=1,
                       keepdims=True)

    def step(t, carry):
        z, g, U, da, inv_mass, wfm, wfm2, accs, divs = carry

        def run(_):
            le = pick(da, 0)
            # mask padding-lane momenta: otherwise z's pad lanes random-walk
            # and pollute the Welford mass estimate across windows
            mom = mom_ref[pl.ds(t * C, C), :] * dmask
            mh_u = _dg(sel, mh_ref[pl.ds(t, 1), :], 1, 1)   # (C,1)
            eps = jnp.exp(le)
            zp, Up, gp, accept, div = _hmc_transition_batched(
                z, pick(U, 0), g, eps, inv_mass, pot, mom, mh_u,
                num_leapfrog)
            da1, im1, wfm1, wfm21 = _stan_adapt_rows(
                zp, accept, da, wfm, wfm2, inv_mass,
                flags_ref[t] > 0, flags_ref[chunk + t] > 0,
                target_accept, adapt_mass, pick, lane8)
            U1 = Up * (lane8 == 0).astype(f32)
            return (zp, gp, U1, da1, im1, wfm1, wfm21,
                    accs + accept, divs + div)

        return jax.lax.cond(t < n_active, run, lambda _: carry, 0)

    zero_c1 = jnp.zeros((C, 1), f32)
    init = (z_ref[:], g_ref[:], u_ref[:], da_ref[:], im_ref[:], wfm_ref[:],
            wfm2_ref[:], zero_c1, zero_c1)
    (z, g, U, da, inv_mass, wfm, wfm2, accs, divs) = jax.lax.fori_loop(
        0, chunk, step, init)
    zout_ref[:] = z
    gout_ref[:] = g
    uout_ref[:] = U
    daout_ref[:] = da
    imout_ref[:] = inv_mass
    wfmout_ref[:] = wfm
    wfm2out_ref[:] = wfm2
    statout_ref[:] = (accs * (lane8 == 0).astype(f32)
                      + divs * (lane8 == 1).astype(f32))


def _mc_sample_chunk_body(scal_ref, z_ref, g_ref, u_ref, eps_ref, im_ref,
                          mom_ref, mh_ref, x_ref, y_ref, zz_ref,
                          zsout_ref, accout_ref, divout_ref, zout_ref,
                          gout_ref, uout_ref,
                          Ks, Us, Vs, Ds, xsbuf=None, dsem=None,
                          *, n, m, d, jitter, block, chunk, C, num_leapfrog,
                          core="vfe", stream_nb=None, prior_spec=None):
    """``chunk`` sampling transitions at per-chain fixed eps (C,8 lane 0).
    zsout (chunk*C, 128) draw t rows [t*C, (t+1)*C); acc/div (chunk, 128)
    lane c = chain c. scal_ref (SMEM f32, 1): n_active."""
    f32 = jnp.float32
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, _DA_LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    sel = _chain_sel(C)
    pot = _make_batched_pot(x_ref, y_ref, zz_ref, Ks, Us, Vs, Ds, n, m, d,
                            jitter, block, C, core,
                            stream=_mc_stream_dict(stream_nb, xsbuf, dsem),
                            prior_spec=prior_spec)
    n_active = scal_ref[0].astype(jnp.int32)
    eps = jnp.sum(eps_ref[:] * (lane8 == 0).astype(f32), axis=1,
                  keepdims=True)                            # (C,1)

    zsout_ref[:] = jnp.zeros((chunk * C, _LANES), f32)
    accout_ref[:] = jnp.zeros((chunk, _LANES), f32)
    divout_ref[:] = jnp.zeros((chunk, _LANES), f32)

    def step(t, carry):
        z, g, U = carry

        def run(_):
            mom = mom_ref[pl.ds(t * C, C), :] * \
                (lane < (d + 2 + (m if core == "sgpmc" else 0))).astype(f32)
            mh_u = _dg(sel, mh_ref[pl.ds(t, 1), :], 1, 1)
            zp, Up, gp, accept, div = _hmc_transition_batched(
                z, jnp.sum(U * (lane8 == 0).astype(f32), axis=1,
                           keepdims=True),
                g, eps, im_ref[:], pot, mom, mh_u, num_leapfrog)
            zsout_ref[pl.ds(t * C, C), :] = zp
            # (C,1) -> (1,C lanes) via the selector transpose
            accout_ref[pl.ds(t, 1), :] = _dg(accept, sel, 0, 0) * \
                (lane < C).astype(f32)
            divout_ref[pl.ds(t, 1), :] = _dg(div, sel, 0, 0) * \
                (lane < C).astype(f32)
            return (zp, gp, Up * (lane8 == 0).astype(f32))

        return jax.lax.cond(t < n_active, run, lambda _: carry, 0)

    z, g, U = jax.lax.fori_loop(0, chunk, step,
                                (z_ref[:], g_ref[:], u_ref[:]))
    zout_ref[:] = z
    gout_ref[:] = g
    uout_ref[:] = U


def _mc_nuts_warm_chunk_body(scal_ref, flags_ref, z_ref, g_ref, u_ref,
                             da_ref, im_ref, wfm_ref, wfm2_ref, mom_ref,
                             treeu_ref, leafu_ref, x_ref, y_ref, zz_ref,
                             zout_ref, gout_ref, uout_ref, daout_ref,
                             imout_ref, wfmout_ref, wfm2out_ref, statout_ref,
                             Ks, Us, Vs, Ds, xsbuf=None, dsem=None,
                             *, n, m, d, jitter, block, chunk, C,
                             max_depth, leaf_rows, target_accept,
                             adapt_mass, core="vfe", stream_nb=None, prior_spec=None):
    """``chunk`` warmup NUTS transitions for C lock-step chains with
    per-chain Stan adaptation — the NUTS counterpart of
    :func:`_mc_warm_chunk_body` (same refs except mh -> treeu+leafu).
    statout (C,8) lanes: [acc_sum, div_sum, leaves_sum, depth_sum]."""
    f32 = jnp.float32
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, _DA_LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    _dim = d + 2 + (m if core == "sgpmc" else 0)
    dmask = (lane < _dim).astype(f32)
    pot = _make_batched_pot(x_ref, y_ref, zz_ref, Ks, Us, Vs, Ds, n, m, d,
                            jitter, block, C, core,
                            stream=_mc_stream_dict(stream_nb, xsbuf, dsem),
                            prior_spec=prior_spec)
    n_active = scal_ref[0].astype(jnp.int32)

    def pick(rows8, i):
        return jnp.sum(rows8 * (lane8 == i).astype(f32), axis=1,
                       keepdims=True)

    def step(t, carry):
        z, g, U, da, inv_mass, wfm, wfm2, accs, divs, lvs, dps = carry

        def run(_):
            mom = mom_ref[pl.ds(t * C, C), :] * dmask
            TR = treeu_ref[pl.ds(t * C, C), :]
            LU = leafu_ref[pl.ds(t * C * leaf_rows, C * leaf_rows), :]
            eps = jnp.exp(pick(da, 0))
            zp, Up, gp, accept, div, dep, nlv, _H0 = _nuts_transition_batched(
                z, pick(U, 0), g, eps, inv_mass, pot, mom, TR, LU,
                C=C, max_depth=max_depth, leaf_rows=leaf_rows)
            da1, im1, wfm1, wfm21 = _stan_adapt_rows(
                zp, accept, da, wfm, wfm2, inv_mass,
                flags_ref[t] > 0, flags_ref[chunk + t] > 0,
                target_accept, adapt_mass, pick, lane8)
            U1 = Up * (lane8 == 0).astype(f32)
            return (zp, gp, U1, da1, im1, wfm1, wfm21, accs + accept,
                    divs + div, lvs + nlv.astype(f32),
                    dps + dep.astype(f32))

        return jax.lax.cond(t < n_active, run, lambda _: carry, 0)

    zero_c1 = jnp.zeros((C, 1), f32)
    init = (z_ref[:], g_ref[:], u_ref[:], da_ref[:], im_ref[:], wfm_ref[:],
            wfm2_ref[:], zero_c1, zero_c1, zero_c1, zero_c1)
    (z, g, U, da, inv_mass, wfm, wfm2, accs, divs, lvs, dps) = \
        jax.lax.fori_loop(0, chunk, step, init)
    zout_ref[:] = z
    gout_ref[:] = g
    uout_ref[:] = U
    daout_ref[:] = da
    imout_ref[:] = inv_mass
    wfmout_ref[:] = wfm
    wfm2out_ref[:] = wfm2
    statout_ref[:] = (accs * (lane8 == 0).astype(f32)
                      + divs * (lane8 == 1).astype(f32)
                      + lvs * (lane8 == 2).astype(f32)
                      + dps * (lane8 == 3).astype(f32))


def _mc_nuts_sample_chunk_body(scal_ref, z_ref, g_ref, u_ref, eps_ref,
                               im_ref, mom_ref, treeu_ref, leafu_ref,
                               x_ref, y_ref, zz_ref,
                               zsout_ref, accout_ref, divout_ref,
                               depout_ref, nlout_ref, zout_ref, gout_ref,
                               uout_ref,
                               Ks, Us, Vs, Ds, xsbuf=None, dsem=None,
                               *, n, m, d, jitter, block, chunk, C,
                               max_depth, leaf_rows, core="vfe",
                               stream_nb=None, prior_spec=None):
    """``chunk`` sampling NUTS transitions at per-chain fixed eps.
    zsout (chunk*C, 128); acc/div/depth/nleaves (chunk, 128) lane c =
    chain c. scal_ref (SMEM f32, 1): n_active."""
    f32 = jnp.float32
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, _DA_LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    _dim = d + 2 + (m if core == "sgpmc" else 0)
    dmask = (lane < _dim).astype(f32)
    cmask = (lane < C).astype(f32)
    pot = _make_batched_pot(x_ref, y_ref, zz_ref, Ks, Us, Vs, Ds, n, m, d,
                            jitter, block, C, core,
                            stream=_mc_stream_dict(stream_nb, xsbuf, dsem),
                            prior_spec=prior_spec)
    n_active = scal_ref[0].astype(jnp.int32)
    eps = jnp.sum(eps_ref[:] * (lane8 == 0).astype(f32), axis=1,
                  keepdims=True)                            # (C,1)

    zsout_ref[:] = jnp.zeros((chunk * C, _LANES), f32)
    accout_ref[:] = jnp.zeros((chunk, _LANES), f32)
    divout_ref[:] = jnp.zeros((chunk, _LANES), f32)
    depout_ref[:] = jnp.zeros((chunk, _LANES), f32)
    nlout_ref[:] = jnp.zeros((chunk, _LANES), f32)

    def step(t, carry):
        z, g, U = carry

        def run(_):
            mom = mom_ref[pl.ds(t * C, C), :] * dmask
            TR = treeu_ref[pl.ds(t * C, C), :]
            LU = leafu_ref[pl.ds(t * C * leaf_rows, C * leaf_rows), :]
            zp, Up, gp, accept, div, dep, nlv, _H0 = _nuts_transition_batched(
                z, jnp.sum(U * (lane8 == 0).astype(f32), axis=1,
                           keepdims=True),
                g, eps, im_ref[:], pot, mom, TR, LU,
                C=C, max_depth=max_depth, leaf_rows=leaf_rows)
            zsout_ref[pl.ds(t * C, C), :] = zp
            accout_ref[pl.ds(t, 1), :] = _dg(accept, sel, 0, 0) * cmask
            divout_ref[pl.ds(t, 1), :] = _dg(div, sel, 0, 0) * cmask
            depout_ref[pl.ds(t, 1), :] = _dg(dep.astype(f32), sel,
                                             0, 0) * cmask
            nlout_ref[pl.ds(t, 1), :] = _dg(nlv.astype(f32), sel,
                                            0, 0) * cmask
            return (zp, gp, Up * (lane8 == 0).astype(f32))

        return jax.lax.cond(t < n_active, run, lambda _: carry, 0)

    sel = _chain_sel(C)
    z, g, U = jax.lax.fori_loop(0, chunk, step,
                                (z_ref[:], g_ref[:], u_ref[:]))
    zout_ref[:] = z
    gout_ref[:] = g
    uout_ref[:] = U


class FusedMultichainHMC(NamedTuple):
    potential: Callable       # (C, dim) -> (U (C,), g (C, dim))
    warm_chunk: Callable
    sample_chunk: Callable
    chunk: int
    num_chains: int
    num_leapfrog: int
    target_accept: float
    adapt_mass: bool
    algo: str = "hmc"         # "hmc" (fixed leapfrog) or "nuts" (round 3)
    max_depth: int = 0        # NUTS only


def make_fused_hmc_multichain(X, y, jitter: float, *, num_chains: int,
                              chunk: int = 8, num_leapfrog: int = 10,
                              target_accept: float = 0.8,
                              adapt_mass: bool = True, block: int = 32,
                              target: str = "vfe",
                              stream_block: int = MC_STREAM_NB,
                              algo: str = "hmc", max_depth: int = 8,
                              interpret: bool = False, prior_spec=None):
    """Factory: ``builder(Z) -> FusedMultichainHMC`` or None outside the
    envelope. All chains advance lock-step inside one kernel call.

    ``target``: "vfe" (BayesianSGPR_HMC hyper posterior) or "sgpmc"
    (whitened JointHMC over (hypers, v); per-chain state dim d+2+M).

    ``algo``: "hmc" (fixed-leapfrog, ``num_leapfrog`` steps) or "nuts"
    (round 3: lock-step multinomial NUTS via
    :func:`_nuts_transition_batched`; ``num_leapfrog`` is ignored and the
    per-transition tree is capped at ``max_depth``).

    For the vfe and sgpmc targets at n > MAX_N_MULTICHAIN, X/y stay in
    HBM and every chain's gram passes share double-buffered
    (stream_block, 128) row blocks (vfe: round 3; sgpmc: round 4 —
    single-pass; same DMA pipeline as the single-chain streaming path,
    ops/fused_nuts.py)."""
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n, d = X.shape
    C = int(num_chains)
    if not fused_multichain_supported(n, d, 0, C, target):
        return None
    stream_nb = None
    if target == "sgpmc" and n <= MAX_N_MULTICHAIN:
        Np = _round_up(n, _LANES)
        Xp = jnp.zeros((Np, _LANES), jnp.float32).at[:n, :d].set(X)
        yp = jnp.zeros((1, Np), jnp.float32).at[0, :n].set(y)
    elif n > MAX_N_MULTICHAIN:
        # streaming vfe/sgpmc: HBM-resident X/y padded to whole DMA blocks;
        # y packed into lane 127 (1-lane columns cannot be DMA-sliced from
        # HBM); the separate y input is an unused dummy
        if d + 2 > _LANES - 1:
            return None
        Np = _round_up(n, stream_block)
        Xp = (jnp.zeros((Np, _LANES), jnp.float32)
              .at[:n, :d].set(X).at[:n, _LANES - 1].set(y))
        yp = jnp.zeros((8, 1), jnp.float32)
        # static max|X| so the streaming cores' inv_ls cap matches the
        # resident cores' data-aware envelope (ADVICE r4)
        stream_nb = (stream_block, Np // stream_block,
                     float(np.max(np.abs(np.asarray(X)))))
    else:
        Np = _round_up(n, 8)
        Xp = jnp.zeros((Np, _LANES), jnp.float32).at[:n, :d].set(X)
        yp = jnp.zeros((Np, 1), jnp.float32).at[:n, 0].set(y)
    jitter = float(jitter)
    f32 = jnp.float32

    def builder(Z):
        m = Z.shape[0]
        dim = d + 2 + (m if target == "sgpmc" else 0)
        Mp = _round_up(m, _LANES)
        if not fused_multichain_supported(n, d, m, C, target) or dim > _LANES:
            return None
        common = dict(n=n, m=m, d=d, jitter=jitter, block=block, C=C,
                      core=target, stream_nb=stream_nb,
                      prior_spec=prior_spec)

        def _scratch():
            s = ([pltpu.VMEM((C * Mp, Mp), f32) for _ in range(3)]
                 + [pltpu.VMEM((C * Mp, _LANES), f32)])
            if stream_nb is not None:
                s += [pltpu.VMEM((2, stream_nb[0], _LANES), f32),
                      pltpu.SemaphoreType.DMA((2,))]
            return s

        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        # streaming: X/y stay off-chip and the kernels DMA row blocks in
        xy = (pl.BlockSpec(memory_space=pl.ANY)
              if stream_nb is not None else vmem)
        # C chains' per-phase value sets exceed the compiler's conservative
        # 16 MB scoped-VMEM default; the hardware has headroom (same
        # treatment as the dense-GPR core, ops/fused_nuts.py)
        cparams = (pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
                   if not interpret else None)
        pot_call = pl.pallas_call(
            partial(_mc_potential_body, **common),
            out_shape=(jax.ShapeDtypeStruct((C, _DA_LANES), f32),
                       jax.ShapeDtypeStruct((C, _LANES), f32)),
            in_specs=[vmem, xy, xy, vmem],
            out_specs=(vmem,) * 2,
            scratch_shapes=_scratch(),
            compiler_params=cparams,
            interpret=interpret,
        )
        warm_state_shapes = (
            jax.ShapeDtypeStruct((C, _LANES), f32),     # z
            jax.ShapeDtypeStruct((C, _LANES), f32),     # g
            jax.ShapeDtypeStruct((C, _DA_LANES), f32),  # U
            jax.ShapeDtypeStruct((C, _DA_LANES), f32),  # da
            jax.ShapeDtypeStruct((C, _LANES), f32),     # inv mass
            jax.ShapeDtypeStruct((C, _LANES), f32),     # wfm
            jax.ShapeDtypeStruct((C, _LANES), f32),     # wfm2
            jax.ShapeDtypeStruct((C, _DA_LANES), f32))  # stats
        leaf_rows = max(1, (1 << max_depth) >> 7)
        if algo == "nuts":
            warm_call = pl.pallas_call(
                partial(_mc_nuts_warm_chunk_body, chunk=chunk,
                        max_depth=max_depth, leaf_rows=leaf_rows,
                        target_accept=target_accept, adapt_mass=adapt_mass,
                        **common),
                out_shape=warm_state_shapes,
                in_specs=[smem, smem] + [vmem] * 10 + [xy, xy, vmem],
                out_specs=(vmem,) * 8,
                scratch_shapes=_scratch(),
                compiler_params=cparams,
                interpret=interpret,
            )
            sample_call = pl.pallas_call(
                partial(_mc_nuts_sample_chunk_body, chunk=chunk,
                        max_depth=max_depth, leaf_rows=leaf_rows,
                        **common),
                out_shape=(jax.ShapeDtypeStruct((chunk * C, _LANES), f32),
                           jax.ShapeDtypeStruct((chunk, _LANES), f32),
                           jax.ShapeDtypeStruct((chunk, _LANES), f32),
                           jax.ShapeDtypeStruct((chunk, _LANES), f32),
                           jax.ShapeDtypeStruct((chunk, _LANES), f32),
                           jax.ShapeDtypeStruct((C, _LANES), f32),
                           jax.ShapeDtypeStruct((C, _LANES), f32),
                           jax.ShapeDtypeStruct((C, _DA_LANES), f32)),
                in_specs=[smem] + [vmem] * 8 + [xy, xy, vmem],
                out_specs=(vmem,) * 8,
                scratch_shapes=_scratch(),
                compiler_params=cparams,
                interpret=interpret,
            )
        else:
            warm_call = pl.pallas_call(
                partial(_mc_warm_chunk_body, chunk=chunk,
                        num_leapfrog=num_leapfrog,
                        target_accept=target_accept, adapt_mass=adapt_mass,
                        **common),
                out_shape=warm_state_shapes,
                in_specs=[smem, smem] + [vmem] * 9 + [xy, xy, vmem],
                out_specs=(vmem,) * 8,
                scratch_shapes=_scratch(),
                compiler_params=cparams,
                interpret=interpret,
            )
            sample_call = pl.pallas_call(
                partial(_mc_sample_chunk_body, chunk=chunk,
                        num_leapfrog=num_leapfrog, **common),
                out_shape=(jax.ShapeDtypeStruct((chunk * C, _LANES), f32),
                           jax.ShapeDtypeStruct((chunk, _LANES), f32),
                           jax.ShapeDtypeStruct((chunk, _LANES), f32),
                           jax.ShapeDtypeStruct((C, _LANES), f32),
                           jax.ShapeDtypeStruct((C, _LANES), f32),
                           jax.ShapeDtypeStruct((C, _DA_LANES), f32)),
                in_specs=[smem] + [vmem] * 7 + [xy, xy, vmem],
                out_specs=(vmem,) * 6,
                scratch_shapes=_scratch(),
                compiler_params=cparams,
                interpret=interpret,
            )
        Zp = jnp.zeros((Mp, _LANES), f32).at[:m, :d].set(Z.astype(f32))

        def _pad_rows(v, fill=0.0):
            out = jnp.full((C, _LANES), fill, f32)
            return out.at[:, :v.shape[-1]].set(v.astype(f32))

        def _rand(key, k_steps):
            k1, k2 = jax.random.split(key)
            mom = jax.random.normal(k1, (k_steps * C, _LANES), f32)
            mh = jax.random.uniform(k2, (k_steps, _LANES), f32)
            return mom, mh

        def _rand_nuts(key, k_steps):
            k1, k2, k3 = jax.random.split(key, 3)
            mom = jax.random.normal(k1, (k_steps * C, _LANES), f32)
            treeu = jax.random.uniform(k2, (k_steps * C, _LANES), f32)
            leafu = jax.random.uniform(
                k3, (k_steps * C * leaf_rows, _LANES), f32)
            return mom, treeu, leafu

        def potential(zrows):
            zp = jnp.zeros((C, _LANES), f32).at[:, :dim].set(
                zrows.astype(f32))
            urows, grows = pot_call(zp, Xp, yp, Zp)
            return (urows[:, 0].astype(zrows.dtype),
                    grows[:, :dim].astype(zrows.dtype))

        def _da_pack(le, lea, h, mu, t, wfc):
            cols = [le, lea, h, mu, t, wfc]
            out = jnp.zeros((C, _DA_LANES), f32)
            for i, v in enumerate(cols):
                out = out.at[:, i].set(v.astype(f32))
            return out

        def warm_chunk(z, U, g, key, da_cols, wf, inv_mass, in_w, w_end,
                       n_active):
            """da_cols: tuple of (C,) arrays (log_eps, log_eps_avg, h, mu,
            t); wf: (mean (C,dim), m2 (C,dim), count (C,)). Returns updated
            state + per-chain (acc_sum, div_sum)."""
            scal = jnp.asarray([n_active], f32)
            flags = jnp.concatenate([in_w.astype(jnp.int32),
                                     w_end.astype(jnp.int32)])
            da8 = _da_pack(*da_cols, wf[2])
            urow = jnp.zeros((C, _DA_LANES), f32).at[:, 0].set(
                U.astype(f32))
            state = (scal, flags, _pad_rows(z), _pad_rows(g), urow, da8,
                     _pad_rows(inv_mass, 1.0), _pad_rows(wf[0]),
                     _pad_rows(wf[1]))
            if algo == "nuts":
                mom, treeu, leafu = _rand_nuts(key, chunk)
                (zo, go, uo, dao, imo, wfmo, wfm2o, st) = warm_call(
                    *state, mom, treeu, leafu, Xp, yp, Zp)
            else:
                mom, mh = _rand(key, chunk)
                (zo, go, uo, dao, imo, wfmo, wfm2o, st) = warm_call(
                    *state, mom, mh, Xp, yp, Zp)
            da_out = tuple(dao[:, i] for i in range(5))
            wf_out = (wfmo[:, :dim], wfm2o[:, :dim], dao[:, 5])
            return (zo[:, :dim], uo[:, 0], go[:, :dim], da_out, wf_out,
                    imo[:, :dim], st[:, 0], st[:, 1])

        def sample_chunk(z, U, g, key, eps, inv_mass, n_active):
            scal = jnp.asarray([n_active], f32)
            epsrow = jnp.zeros((C, _DA_LANES), f32).at[:, 0].set(
                eps.astype(f32))
            urow = jnp.zeros((C, _DA_LANES), f32).at[:, 0].set(
                U.astype(f32))
            state = (scal, _pad_rows(z), _pad_rows(g), urow, epsrow,
                     _pad_rows(inv_mass, 1.0))
            if algo == "nuts":
                mom, treeu, leafu = _rand_nuts(key, chunk)
                zs, acc, div, dep, nlv, zo, go, uo = sample_call(
                    *state, mom, treeu, leafu, Xp, yp, Zp)
                zs = zs.reshape(chunk, C, _LANES)[:, :, :dim]
                return (zs, zo[:, :dim], uo[:, 0], go[:, :dim],
                        acc[:, :C], div[:, :C], dep[:, :C], nlv[:, :C])
            mom, mh = _rand(key, chunk)
            zs, acc, div, zo, go, uo = sample_call(
                *state, mom, mh, Xp, yp, Zp)
            zs = zs.reshape(chunk, C, _LANES)[:, :, :dim]
            return (zs, zo[:, :dim], uo[:, 0], go[:, :dim],
                    acc[:, :C], div[:, :C])

        return FusedMultichainHMC(potential, warm_chunk, sample_chunk,
                                  chunk, C, num_leapfrog, target_accept,
                                  adapt_mass, algo, max_depth)

    return builder
