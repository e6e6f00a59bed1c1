"""Whole-transition NUTS as ONE Pallas TPU kernel (the hot path of
BayesianSGPR_HMC, reference /root/reference/models/bayesian_sgpr_hmc.py:74-78).

Why a whole-transition kernel (PERF.md): on this TPU runtime every XLA loop
iteration containing ANY custom call — a lapack Cholesky or even a trivial
Pallas call — pays ~80 us fixed overhead. A fused per-EVAL kernel therefore
cannot beat the autodiff potential (~108 us/eval, ~90 us of it overhead). The
entire NUTS *transition* — tree building, multinomial sampling, U-turn
checks, and every leapfrog's collapsed-bound value+grad — runs inside one
kernel, so the overhead is paid once per transition and amortised over the
~2^depth bound evaluations.

Pieces:
* collapsed-bound value+grad: the exact math of
  ``ops.fused_bound._rbf_vfe_neg_logpost_vg`` (tested against ``jax.grad`` to
  machine precision) with the ref-based blocked Cholesky/inverse;
* iterative fixed-max-depth multinomial NUTS: a port of
  ``inference.hmc.nuts_kernel`` (same checkpoint-slot/popcount tree logic,
  same divergence threshold, same multinomial acceptance);
* all randomness is PRECOMPUTED host-side with ``jax.random`` and passed in
  (momentum normals, per-doubling direction/swap uniforms, per-leaf
  multinomial uniforms indexed by the global leaf counter) — this keeps the
  kernel deterministic given inputs, testable in interpret mode on CPU (the
  interpreters stub the TPU PRNG), and on threefry-quality randomness;
* a single-eval potential kernel for warmup initialisation
  (``find_reasonable_step_size``) so initial energies are consistent with
  the in-kernel potential.

Interpret-mode correctness tests: tests/test_fused_nuts.py. On-TPU
statistical parity + timing: the bench harness.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_bound import (_rbf_vfe_neg_logpost_vg, _round_up, chol_u_inplace,
                          ut_inv_inplace)

__all__ = ["make_fused_nuts", "fused_nuts_supported"]

_LANES = 128
_DIVERGENCE_THRESHOLD = 1000.0   # matches inference/hmc.py


# --------------------------------------------------------------------------
# Scalar bit tricks (SWAR popcount — lax.population_count is not lowered
# for Mosaic scalars)
# --------------------------------------------------------------------------

def _popcount32(x):
    x = x.astype(jnp.uint32)
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _trailing_ones32(x):
    xp1 = (x + 1).astype(jnp.uint32)
    low = xp1 & (jnp.uint32(0) - xp1)
    return _popcount32(low - jnp.uint32(1))


def _lae(a, b):
    """Scalar logaddexp (safe when one operand is -inf)."""
    m = jnp.maximum(a, b)
    d = -jnp.abs(a - b)
    return m + jnp.log1p(jnp.exp(d))


def _log_unif(u):
    return jnp.log(jnp.maximum(u, jnp.asarray(1e-12, u.dtype)))


# --------------------------------------------------------------------------
# The transition kernel
# --------------------------------------------------------------------------

def _nuts_kernel_body(scal_ref, z_ref, g_ref, im_ref, mom_ref, treeu_ref,
                      leafu_ref, x_ref, y_ref, zz_ref,
                      zout_ref, gout_ref, stat_ref,
                      Ks, Us, Vs, zc_ref, vc_ref,
                      *, n, m, d, jitter, max_depth, block):
    f32 = jnp.float32
    eps = scal_ref[0]
    U0v = scal_ref[1]
    z0 = z_ref[:]
    g0 = g_ref[:]
    inv_mass = im_ref[:]                       # padding lanes = 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    dim_mask = (lane < d + 2).astype(f32)

    def ref_chol_inv(K):
        Ks[:] = K
        chol_u_inplace(Ks, Us, block=block)
        ut_inv_inplace(Us, Vs, block=block)
        return Us[:], Vs[:]

    def pot(zrow):
        return _rbf_vfe_neg_logpost_vg(zrow, x_ref[:], y_ref[:], zz_ref[:],
                                       n, m, d, jitter,
                                       chol_inv=ref_chol_inv)

    def kinetic(r):
        return 0.5 * jnp.sum(inv_mass * r * r)

    def leaf_uniform(k):
        """k-th precomputed leaf uniform: row k>>7, lane k&127."""
        row = leafu_ref[pl.ds(k >> 7, 1), :]
        onehot = (lane == (k & 127)).astype(f32)
        return jnp.sum(row * onehot)

    # momentum r ~ N(0, mass) from a precomputed standard-normal row
    r0 = mom_ref[:] / jnp.sqrt(inv_mass) * dim_mask
    H0 = U0v + kinetic(r0)

    def build_subtree(z, r, U, g, dirf, depth, nl0):
        num_leaves = jnp.left_shift(jnp.int32(1), depth)
        eps_s = dirf * eps

        def cond(c):
            i = c[0]
            turning, diverging = c[9], c[10]
            return (i < num_leaves) & (~turning) & (~diverging)

        def body(c):
            (i, z, r, U, g, zp, Up, gp, logw, turning, diverging, acc) = c
            r_half = r - 0.5 * eps_s * g
            z = z + eps_s * inv_mass * r_half
            U, g = pot(z)
            r = r_half - 0.5 * eps_s * g
            v = inv_mass * r
            H = U + kinetic(r)
            delta = H - H0
            delta = jnp.where(jnp.isnan(delta), jnp.asarray(jnp.inf, f32),
                              delta)
            diverging = delta > _DIVERGENCE_THRESHOLD
            logw_leaf = -delta
            acc = acc + jnp.minimum(1.0, jnp.exp(-delta))

            # progressive multinomial sampling within the subtree
            logw_new = _lae(logw, logw_leaf)
            take = _log_unif(leaf_uniform(nl0 + i)) < (logw_leaf - logw_new)
            zp = jnp.where(take, z, zp)
            Up = jnp.where(take, U, Up)
            gp = jnp.where(take, g, gp)

            is_even = jnp.remainder(i, 2) == 0
            slot = _popcount32(i)

            @pl.when(is_even)
            def _():
                zc_ref[pl.ds(slot, 1), :] = z
                vc_ref[pl.ds(slot, 1), :] = v

            t_ones = _trailing_ones32(i)

            def check(mm, turn):
                j = i - jnp.left_shift(jnp.int32(1), mm) + 1
                sj = _popcount32(j)
                zcj = zc_ref[pl.ds(sj, 1), :]
                vcj = vc_ref[pl.ds(sj, 1), :]
                dz = dirf * (z - zcj)
                bad = (jnp.sum(dz * vcj) < 0.0) | (jnp.sum(dz * v) < 0.0)
                active = (~is_even) & (mm <= t_ones) & (mm >= 1)
                return turn | (active & bad)

            turning = jax.lax.fori_loop(1, max_depth + 1, check, turning)
            return (i + 1, z, r, U, g, zp, Up, gp, logw_new, turning,
                    diverging, acc)

        init = (jnp.int32(0), z, r, U, g, z, U, g,
                jnp.asarray(-jnp.inf, f32), jnp.bool_(False),
                jnp.bool_(False), jnp.asarray(0.0, f32))
        return jax.lax.while_loop(cond, body, init)

    # outer doubling loop; carry:
    # (lz, lr, lU, lg, rz, rr, rU, rg, zp, Up, gp, logw, depth, turning,
    #  diverging, acc, nl)
    def cond(c):
        depth, turning, diverging = c[12], c[13], c[14]
        return (~turning) & (~diverging) & (depth < max_depth)

    def body(c):
        (lz, lr, lU, lg, rz, rr, rU, rg, zp, Up, gp, logw, depth, turning,
         diverging, acc, nl) = c
        urow = treeu_ref[pl.ds(depth, 1), :]
        u_dir = jnp.sum(urow[0:1, 0:1])
        u_swap = jnp.sum(urow[0:1, 1:2])
        dirf = jnp.where(u_dir < 0.5, jnp.asarray(1.0, f32),
                         jnp.asarray(-1.0, f32))
        fwd = dirf > 0
        sz = jnp.where(fwd, rz, lz)
        sr = jnp.where(fwd, rr, lr)
        sU = jnp.where(fwd, rU, lU)
        sg = jnp.where(fwd, rg, lg)
        (i_new, ez, er, eU, eg, zps, Ups, gps, logw_sub, turn_sub, div_sub,
         acc_sub) = build_subtree(sz, sr, sU, sg, dirf, depth, nl)

        ok = (~turn_sub) & (~div_sub)
        take = (_log_unif(u_swap) < (logw_sub - logw)) & ok
        zp = jnp.where(take, zps, zp)
        Up = jnp.where(take, Ups, Up)
        gp = jnp.where(take, gps, gp)
        logw = jnp.where(ok, _lae(logw, logw_sub), logw)

        adv_l = ok & (~fwd)
        adv_r = ok & fwd
        lz = jnp.where(adv_l, ez, lz)
        lr = jnp.where(adv_l, er, lr)
        lU = jnp.where(adv_l, eU, lU)
        lg = jnp.where(adv_l, eg, lg)
        rz = jnp.where(adv_r, ez, rz)
        rr = jnp.where(adv_r, er, rr)
        rU = jnp.where(adv_r, eU, rU)
        rg = jnp.where(adv_r, eg, rg)

        dz = rz - lz
        full_turn = (jnp.sum(dz * inv_mass * lr) < 0.0) | \
                    (jnp.sum(dz * inv_mass * rr) < 0.0)
        turning = turn_sub | (ok & full_turn)
        return (lz, lr, lU, lg, rz, rr, rU, rg, zp, Up, gp, logw, depth + 1,
                turning, div_sub, acc + acc_sub, nl + i_new)

    zero = jnp.asarray(0.0, f32)
    init = (z0, r0, U0v, g0, z0, r0, U0v, g0, z0, U0v, g0, zero,
            jnp.int32(0), jnp.bool_(False), jnp.bool_(False), zero,
            jnp.int32(0))
    out = jax.lax.while_loop(cond, body, init)
    (zp, Up, gp, depth, turning, diverging, acc, nl) = (
        out[8], out[9], out[10], out[12], out[13], out[14], out[15], out[16])

    accept_prob = acc / jnp.maximum(nl.astype(f32), 1.0)
    zout_ref[:] = zp
    gout_ref[:] = gp
    row = jnp.where(lane == 0, Up, zero)
    row = jnp.where(lane == 1, accept_prob, row)
    row = jnp.where(lane == 2, diverging.astype(f32), row)
    row = jnp.where(lane == 3, depth.astype(f32), row)
    row = jnp.where(lane == 4, nl.astype(f32), row)
    row = jnp.where(lane == 5, H0, row)
    stat_ref[:] = row


def _potential_kernel_body(z_ref, x_ref, y_ref, zz_ref, uout_ref, gout_ref,
                           Ks, Us, Vs, *, n, m, d, jitter, block):
    def ref_chol_inv(K):
        Ks[:] = K
        chol_u_inplace(Ks, Us, block=block)
        ut_inv_inplace(Us, Vs, block=block)
        return Us[:], Vs[:]

    U, g = _rbf_vfe_neg_logpost_vg(z_ref[:], x_ref[:], y_ref[:], zz_ref[:],
                                   n, m, d, jitter, chol_inv=ref_chol_inv)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    uout_ref[:] = jnp.where(lane == 0, U, 0.0)
    gout_ref[:] = g


# --------------------------------------------------------------------------
# Host-side factory
# --------------------------------------------------------------------------

def fused_nuts_supported(n: int, d: int, m: int, *, max_n: int = 2048,
                         max_m: int = 256) -> bool:
    """Size envelope: everything must fit VMEM (X, the (Np x Mp)
    intermediates, and 3 (Mp x Mp) scratch buffers)."""
    return (d + 2 <= _LANES) and (n <= max_n) and (m <= max_m)


def make_fused_nuts(X, y, jitter: float, *, max_depth: int = 8,
                    block: int = 16, interpret: bool = False,
                    max_n: int = 2048, max_m: int = 256):
    """Factory for the fused transition + matching single-eval potential.

    Returns ``builder(Z) -> (transition_kernel, potential_vg)`` where
    ``transition_kernel`` has the ``inference.hmc.nuts_kernel`` call
    signature ``(potential_vg_ignored, z, U, g, key, eps, inv_mass)`` and
    ``potential_vg(zvec) -> (U, grad)``; or None if the problem exceeds the
    VMEM envelope.
    """
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n, d = X.shape
    if not fused_nuts_supported(n, d, 0, max_n=max_n, max_m=max_m):
        return None
    dim = d + 2
    Np = _round_up(n, 8)
    Xp = jnp.zeros((Np, _LANES), jnp.float32).at[:n, :d].set(X)
    yp = jnp.zeros((Np, 1), jnp.float32).at[:n, 0].set(y)
    jitter = float(jitter)
    leaf_rows = max(1, (1 << max_depth) // _LANES)

    def builder(Z):
        m = Z.shape[0]
        if m > max_m:
            raise ValueError(f"M={m} exceeds fused-NUTS envelope {max_m}")
        Mp = _round_up(m, _LANES)

        def _scratch():
            return [pltpu.VMEM((Mp, Mp), jnp.float32) for _ in range(3)]

        kb = partial(_nuts_kernel_body, n=n, m=m, d=d, jitter=jitter,
                     max_depth=max_depth, block=block)
        trans_call = pl.pallas_call(
            kb,
            out_shape=(jax.ShapeDtypeStruct((1, _LANES), jnp.float32),) * 3,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                     [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
            scratch_shapes=_scratch() + [
                pltpu.VMEM((max_depth + 1, _LANES), jnp.float32),
                pltpu.VMEM((max_depth + 1, _LANES), jnp.float32),
            ],
            interpret=interpret,
        )
        pb = partial(_potential_kernel_body, n=n, m=m, d=d, jitter=jitter,
                     block=block)
        pot_call = pl.pallas_call(
            pb,
            out_shape=(jax.ShapeDtypeStruct((1, _LANES), jnp.float32),) * 2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
            scratch_shapes=_scratch(),
            interpret=interpret,
        )
        Zp = jnp.zeros((Mp, _LANES), jnp.float32).at[:m, :d].set(
            Z.astype(jnp.float32))

        def potential_vg(zvec):
            zrow = jnp.zeros((1, _LANES), jnp.float32).at[0, :dim].set(
                zvec.astype(jnp.float32))
            urow, grow = pot_call(zrow, Xp, yp, Zp)
            return urow[0, 0].astype(zvec.dtype), grow[0, :dim].astype(zvec.dtype)

        def transition_kernel(_potential_vg, z, U, g, key, eps, inv_mass):
            f32 = jnp.float32
            zrow = jnp.zeros((1, _LANES), f32).at[0, :dim].set(z.astype(f32))
            grow = jnp.zeros((1, _LANES), f32).at[0, :dim].set(g.astype(f32))
            imrow = jnp.ones((1, _LANES), f32).at[0, :dim].set(
                inv_mass.astype(f32))
            k1, k2, k3 = jax.random.split(key, 3)
            mom = jax.random.normal(k1, (1, _LANES), f32)
            treeu = jax.random.uniform(k2, (max_depth, _LANES), f32)
            leafu = jax.random.uniform(k3, (leaf_rows, _LANES), f32)
            scal = jnp.stack([jnp.asarray(eps, f32), jnp.asarray(U, f32)])
            zo, go, st = trans_call(scal, zrow, grow, imrow, mom, treeu,
                                    leafu, Xp, yp, Zp)
            stats = {
                "accept_prob": st[0, 1].astype(z.dtype),
                "diverging": st[0, 2] > 0.5,
                "depth": st[0, 3].astype(jnp.int32),
                "n_leapfrog": st[0, 4].astype(jnp.int32),
                "energy": st[0, 5].astype(z.dtype),
            }
            return (zo[0, :dim].astype(z.dtype), st[0, 0].astype(z.dtype),
                    go[0, :dim].astype(z.dtype), stats)

        return transition_kernel, potential_vg

    return builder
