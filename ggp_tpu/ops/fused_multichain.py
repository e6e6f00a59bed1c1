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
algorithm "hmc" (lock-step chains; NUTS tree sizes diverge per chain),
VMEM-resident N. The value path uses the factor-based form (c = VB^T u);
the per-chain triangular substitutions of the single-chain kernel are
skipped here (3 solves x nb panels x C chains of tiny matvecs would cost
more than the whole mini-factorisation — and the throughput config runs at
benchmark conditioning, where round-2 measurements show 0 divergences for
this path).

Reference behavior being accelerated: models/bayesian_sgpr_hmc.py:74-78
(NUTS over the VFE marginal; chains=1 there — multi-chain is our
capability), sampling protocol models/sgp_hmc.py:67-69 for fixed-leapfrog.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_bound import _dg, _round_up

__all__ = ["make_fused_hmc_multichain", "fused_multichain_supported",
           "FusedMultichainHMC"]

_LANES = 128
_DIVERGENCE_THRESHOLD = 1000.0

# envelope: C * (Knm (Np,Mp) + An (Np,Mp)) value buffers must fit VMEM
MAX_N_MULTICHAIN = 1024
MAX_CHAINS = 8
# vfe-core streaming (round 3): past the resident cap, X/y live in HBM and
# every chain's gram passes share each double-buffered (STREAM_NB, 128) row
# block — HBM traffic per eval stays 2 reads of X/y regardless of C; the
# cap is per-eval wall (C x per-block compute x 2 passes), not memory
MC_STREAM_NB = 1024
MAX_N_STREAM_MC = 16384


def fused_multichain_supported(n: int, d: int, m: int, c: int,
                               target: str = "vfe") -> bool:
    max_n = MAX_N_STREAM_MC if target == "vfe" else MAX_N_MULTICHAIN
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


def chol_u_inv_batched_inplace(K_ref, U_ref, V_ref, Dinv_ref, C: int,
                               block: int = 32) -> None:
    """U_c = chol(K_c)^T and V_c = U_c^-1 for C matrices stacked chain-major
    in (C*Mp, Mp) refs. K_ref destroyed. The panel loop is Python-unrolled
    (static slices only — no dynamic indexing on values)."""
    Mp = K_ref.shape[1]
    dt = jnp.float32
    nb = Mp // block
    rowb = jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Mp), 1)
    perm = _interleave_perm(C, block, dt)
    dpad = Dinv_ref.shape[1] - block

    for j in range(nb):
        j0 = j * block
        Ej = ((rowb + j0) == col).astype(dt)                # (B, Mp)
        P = jnp.concatenate(
            [K_ref[c * Mp + j0:c * Mp + j0 + block, :] for c in range(C)],
            axis=0)                                         # (C*B, Mp) major
        Dall = _dg(P, Ej, 1, 1)                             # (C*B, B) major
        Dmin = _dg(perm, Dall, 1, 0)                        # chain-minor
        ud_min, udinv_min = _mini_chol_inv_batched(Dmin, C, block)
        udinv_all = _dg(perm, udinv_min, 0, 0)              # back to major
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
# Batched VFE potential (value + gradient for C chains)
# ---------------------------------------------------------------------------

def _rbf_vfe_batched_vg(thetas, Xp, yp, Zp, n, m, d, jitter, C,
                        batched_chol):
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

    inv_ls_all = jnp.exp(-thetas) * ls_mask                 # (C,128)
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
    U_rows, g_rows = [], []
    for c in range(C):
        sf2 = sf2_all[c, 0]
        s2 = s2_all[c, 0]
        sigma = jnp.sqrt(s2)
        Kmm, _ = K_list[c]
        _, V = UV1[c]
        UB, VB = UV2[c]
        An, Knm, B, u = An_l[c], Knm_l[c], B_list[c], u_l[c]
        Zs, Zs2, Xs = Zs_l[c], Zs2_l[c], Xs_l[c]
        Binv = _dg(VB, VB, 1, 1)
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

    # ---- priors, vectorised over chains ----
    lp_ls = jnp.sum((2.0 * thetas - jnp.exp(thetas)) * ls_mask, axis=1,
                    keepdims=True)
    log_pi = jnp.log(jnp.asarray(jnp.pi, dt))

    def _hc(uu):
        return 0.5 * uu - jnp.log1p(jnp.exp(uu)) - log_pi

    lp = lp_ls + _hc(log_os_all) + _hc(log_noise_all)       # (C,1)
    g_prior = (2.0 - jnp.exp(thetas)) * ls_mask
    g_prior = jnp.where(lane == d,
                        0.5 - jax.nn.sigmoid(log_os_all), g_prior)
    g_prior = jnp.where(lane == d + 1,
                        0.5 - jax.nn.sigmoid(log_noise_all), g_prior)
    g_all = (g_all + g_prior) * (lane < d + 2).astype(dt)
    return -(F_all + lp), -g_all


def _rbf_vfe_batched_vg_streaming(thetas, Zp, n, m, d, jitter, C,
                                  batched_chol, loop_blocks, NB):
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

    inv_ls_all = jnp.exp(-thetas) * ls_mask                 # (C,128)
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
    F_rows, v_l, Y1_l, wT_l, trB_l, trBinv_l = [], [], [], [], [], []
    for c in range(C):
        s2 = s2_all[c, 0]
        sf2 = sf2_all[c, 0]
        UB, VB = UV2[c]
        u = uacc[c]
        B = B_l[c]
        V = V_l[c]
        Binv = _dg(VB, VB, 1, 1)
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
    lp_ls = jnp.sum((2.0 * thetas - jnp.exp(thetas)) * ls_mask, axis=1,
                    keepdims=True)
    log_pi = jnp.log(jnp.asarray(jnp.pi, dt))

    def _hc(uu):
        return 0.5 * uu - jnp.log1p(jnp.exp(uu)) - log_pi

    lp = lp_ls + _hc(log_os_all) + _hc(log_noise_all)
    g_prior = (2.0 - jnp.exp(thetas)) * ls_mask
    g_prior = jnp.where(lane == d,
                        0.5 - jax.nn.sigmoid(log_os_all), g_prior)
    g_prior = jnp.where(lane == d + 1,
                        0.5 - jax.nn.sigmoid(log_noise_all), g_prior)
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

    inv_ls_all = jnp.exp(-states) * ls_mask
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


_BATCHED_CORES = {}  # populated below (vfe / sgpmc)


def _make_batched_pot(x_ref, y_ref, zz_ref, Ks, Us, Vs, Ds, n, m, d, jitter,
                      block, C, core="vfe", stream=None):
    Mp = zz_ref.shape[0]
    core_fn = _BATCHED_CORES[core]

    def batched_chol(K_list):
        for c in range(C):
            Ks[c * Mp:(c + 1) * Mp, :] = K_list[c]
        chol_u_inv_batched_inplace(Ks, Us, Vs, Ds, C, block=block)
        return [(Us[c * Mp:(c + 1) * Mp, :], Vs[c * Mp:(c + 1) * Mp, :])
                for c in range(C)]

    if stream is not None:
        assert core == "vfe", "multichain N-streaming: vfe core only"
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
            return _rbf_vfe_batched_vg_streaming(
                zrows, zz_ref[:], n, m, d, jitter, C, batched_chol,
                loop_blocks, NB)

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
            "xbuf": xsbuf, "sem": dsem}


def _mc_potential_body(z_ref, x_ref, y_ref, zz_ref, uout_ref, gout_ref,
                       Ks, Us, Vs, Ds, xsbuf=None, dsem=None,
                       *, n, m, d, jitter, block, C,
                       core="vfe", stream_nb=None):
    pot = _make_batched_pot(x_ref, y_ref, zz_ref, Ks, Us, Vs, Ds, n, m, d,
                            jitter, block, C, core,
                            stream=_mc_stream_dict(stream_nb, xsbuf, dsem))
    U, g = pot(z_ref[:])
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, _DA_LANES), 1)
    uout_ref[:] = U * (lane8 == 0).astype(jnp.float32)
    gout_ref[:] = g


def _mc_warm_chunk_body(scal_ref, flags_ref, z_ref, g_ref, u_ref, da_ref,
                        im_ref, wfm_ref, wfm2_ref, mom_ref, mh_ref,
                        x_ref, y_ref, zz_ref,
                        zout_ref, gout_ref, uout_ref, daout_ref, imout_ref,
                        wfmout_ref, wfm2out_ref, statout_ref,
                        Ks, Us, Vs, Ds, xsbuf=None, dsem=None,
                        *, n, m, d, jitter, block, chunk, C,
                        num_leapfrog, target_accept, adapt_mass,
                        core="vfe", stream_nb=None):
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
                            stream=_mc_stream_dict(stream_nb, xsbuf, dsem))
    n_active = scal_ref[0].astype(jnp.int32)

    def pick(rows8, i):
        return jnp.sum(rows8 * (lane8 == i).astype(f32), axis=1,
                       keepdims=True)

    def step(t, carry):
        z, g, U, da, inv_mass, wfm, wfm2, accs, divs = carry

        def run(_):
            le, lea, h, mu = (pick(da, 0), pick(da, 1), pick(da, 2),
                              pick(da, 3))
            tda, wfc = pick(da, 4), pick(da, 5)
            # mask padding-lane momenta: otherwise z's pad lanes random-walk
            # and pollute the Welford mass estimate across windows
            mom = mom_ref[pl.ds(t * C, C), :] * dmask
            mh_u = _dg(sel, mh_ref[pl.ds(t, 1), :], 1, 1)   # (C,1)
            eps = jnp.exp(le)
            zp, Up, gp, accept, div = _hmc_transition_batched(
                z, pick(U, 0), g, eps, inv_mass, pot, mom, mh_u,
                num_leapfrog)
            le1, lea1, h1, mu1, tda1 = _da_update_rows(
                le, lea, h, mu, tda, accept, target_accept)
            wfm1, wfm21, wfc1, im1 = wfm, wfm2, wfc, inv_mass
            if adapt_mass:
                in_w = flags_ref[t] > 0
                w_end = flags_ref[chunk + t] > 0
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
                          core="vfe", stream_nb=None):
    """``chunk`` sampling transitions at per-chain fixed eps (C,8 lane 0).
    zsout (chunk*C, 128) draw t rows [t*C, (t+1)*C); acc/div (chunk, 128)
    lane c = chain c. scal_ref (SMEM f32, 1): n_active."""
    f32 = jnp.float32
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, _DA_LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    sel = _chain_sel(C)
    pot = _make_batched_pot(x_ref, y_ref, zz_ref, Ks, Us, Vs, Ds, n, m, d,
                            jitter, block, C, core,
                            stream=_mc_stream_dict(stream_nb, xsbuf, dsem))
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


class FusedMultichainHMC(NamedTuple):
    potential: Callable       # (C, dim) -> (U (C,), g (C, dim))
    warm_chunk: Callable
    sample_chunk: Callable
    chunk: int
    num_chains: int
    num_leapfrog: int
    target_accept: float
    adapt_mass: bool


def make_fused_hmc_multichain(X, y, jitter: float, *, num_chains: int,
                              chunk: int = 8, num_leapfrog: int = 10,
                              target_accept: float = 0.8,
                              adapt_mass: bool = True, block: int = 32,
                              target: str = "vfe",
                              stream_block: int = MC_STREAM_NB,
                              interpret: bool = False):
    """Factory: ``builder(Z) -> FusedMultichainHMC`` or None outside the
    envelope. All chains advance lock-step inside one kernel call.

    ``target``: "vfe" (BayesianSGPR_HMC hyper posterior) or "sgpmc"
    (whitened JointHMC over (hypers, v); per-chain state dim d+2+M).

    For the vfe target at n > MAX_N_MULTICHAIN, X/y stay in HBM and every
    chain's gram passes share double-buffered (stream_block, 128) row
    blocks (round 3; same DMA pipeline as the single-chain streaming path,
    ops/fused_nuts.py)."""
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n, d = X.shape
    C = int(num_chains)
    if not fused_multichain_supported(n, d, 0, C, target):
        return None
    stream_nb = None
    if target == "sgpmc":
        Np = _round_up(n, _LANES)
        Xp = jnp.zeros((Np, _LANES), jnp.float32).at[:n, :d].set(X)
        yp = jnp.zeros((1, Np), jnp.float32).at[0, :n].set(y)
    elif n > MAX_N_MULTICHAIN:
        # streaming vfe: HBM-resident X/y padded to whole DMA blocks; y
        # packed into lane 127 (1-lane columns cannot be DMA-sliced from
        # HBM); the separate y input is an unused dummy
        if d + 2 > _LANES - 1:
            return None
        Np = _round_up(n, stream_block)
        Xp = (jnp.zeros((Np, _LANES), jnp.float32)
              .at[:n, :d].set(X).at[:n, _LANES - 1].set(y))
        yp = jnp.zeros((8, 1), jnp.float32)
        stream_nb = (stream_block, Np // stream_block)
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
                      core=target, stream_nb=stream_nb)

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
        warm_call = pl.pallas_call(
            partial(_mc_warm_chunk_body, chunk=chunk,
                    num_leapfrog=num_leapfrog,
                    target_accept=target_accept, adapt_mass=adapt_mass,
                    **common),
            out_shape=(jax.ShapeDtypeStruct((C, _LANES), f32),    # z
                       jax.ShapeDtypeStruct((C, _LANES), f32),    # g
                       jax.ShapeDtypeStruct((C, _DA_LANES), f32),  # U
                       jax.ShapeDtypeStruct((C, _DA_LANES), f32),  # da
                       jax.ShapeDtypeStruct((C, _LANES), f32),    # inv mass
                       jax.ShapeDtypeStruct((C, _LANES), f32),    # wfm
                       jax.ShapeDtypeStruct((C, _LANES), f32),    # wfm2
                       jax.ShapeDtypeStruct((C, _DA_LANES), f32)),  # stats
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
            mom, mh = _rand(key, chunk)
            scal = jnp.asarray([n_active], f32)
            flags = jnp.concatenate([in_w.astype(jnp.int32),
                                     w_end.astype(jnp.int32)])
            da8 = _da_pack(*da_cols, wf[2])
            urow = jnp.zeros((C, _DA_LANES), f32).at[:, 0].set(
                U.astype(f32))
            (zo, go, uo, dao, imo, wfmo, wfm2o, st) = warm_call(
                scal, flags, _pad_rows(z), _pad_rows(g), urow, da8,
                _pad_rows(inv_mass, 1.0), _pad_rows(wf[0]),
                _pad_rows(wf[1]), mom, mh, Xp, yp, Zp)
            da_out = tuple(dao[:, i] for i in range(5))
            wf_out = (wfmo[:, :dim], wfm2o[:, :dim], dao[:, 5])
            return (zo[:, :dim], uo[:, 0], go[:, :dim], da_out, wf_out,
                    imo[:, :dim], st[:, 0], st[:, 1])

        def sample_chunk(z, U, g, key, eps, inv_mass, n_active):
            mom, mh = _rand(key, chunk)
            scal = jnp.asarray([n_active], f32)
            epsrow = jnp.zeros((C, _DA_LANES), f32).at[:, 0].set(
                eps.astype(f32))
            urow = jnp.zeros((C, _DA_LANES), f32).at[:, 0].set(
                U.astype(f32))
            zs, acc, div, zo, go, uo = sample_call(
                scal, _pad_rows(z), _pad_rows(g), urow, epsrow,
                _pad_rows(inv_mass, 1.0), mom, mh, Xp, yp, Zp)
            zs = zs.reshape(chunk, C, _LANES)[:, :, :dim]
            return (zs, zo[:, :dim], uo[:, 0], go[:, :dim],
                    acc[:, :C], div[:, :C])

        return FusedMultichainHMC(potential, warm_chunk, sample_chunk,
                                  chunk, C, num_leapfrog, target_accept,
                                  adapt_mass)

    return builder
