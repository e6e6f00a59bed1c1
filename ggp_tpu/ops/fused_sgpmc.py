"""Fused SGPMC warm start: whole chunks of (state, Z) Adam steps in-kernel.

The reference warm-starts its gpflow SGPMC by optimising (u, theta, Z) for
100 iterations before freezing Z and sampling (models/sgp_hmc.py:54-56).
Our XLA path scans those steps under one jit (models/sgpmc.py
``SGPMC.warm_start``), but each step still pays the runtime's per-iteration
custom-call floor for the Kmm factorisation (~80-90 us, PERF.md). Here the
ENTIRE step — both grams, the blocked in-VMEM Cholesky, the whitened
conditional, the hand adjoint wrt (hypers, v, Z) (the ``want_z_grad`` /
``want_prior=False`` extension of ops/fused_bound._sgpmc_neg_logpost_vg),
and the exact optax chain of the XLA path (zero_nans ->
clip_by_global_norm(10) -> adam) — runs in-kernel, K steps per Pallas call.

Scope: Scale(RBF-ARD) x Gaussian x Zero-mean (the reference's UCI JointHMC
configuration, experiments/regression_sgmc_tf.py), n <= 2048 VMEM-resident
rows, d + 2 + m <= 128 (the sampler state-lane envelope — v rides the same
row as the hypers). Same zero_nans deviation as ops/fused_sgpr.py: optax
zeroes the whole update on an inf global norm, the kernel masks non-finite
entries per-element first; they differ only on blow-up steps.

Training-only robustness: the blocked Cholesky runs with the modified-
Cholesky pivot floor (a transiently non-PSD f32 Kmm while Z moves must not
poison Adam state); the sampler kernels for the SAME target keep their
NaN-on-non-PSD divergence semantics (ops/fused_nuts.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_bound import _round_up, _sgpmc_neg_logpost_vg
from .fused_svi import _adam_update

__all__ = ["sgpmc_warm_loss_vg", "make_fused_sgpmc_warm"]

_LANES = 128
_PIVOT_FLOOR = 1e-6           # relative; scaled by max(sf2,1) in the core
_CLIP_NORM = 10.0             # models/sgpmc.py warm_start optax chain


def sgpmc_warm_loss_vg(state_pad, Xp, yrow, Zp, n, m, d, jitter,
                       chol_inv=None):
    """loss = -(loglik + log N(v|0,I)) — the warm-start objective with NO
    hyperprior (models/sgpmc.py warm_start ``loss``; reference
    models/sgp_hmc.py:54-56) — and gradients wrt (state, Z), padded layout.
    Thin wrapper over the sampler potential core with ``want_z_grad`` /
    ``want_prior=False`` (ops/fused_bound.py)."""
    kwargs = {} if chol_inv is None else {"chol_inv": chol_inv}
    return _sgpmc_neg_logpost_vg(state_pad, Xp, yrow, Zp, n, m, d, jitter,
                                 want_z_grad=True, want_prior=False,
                                 pivot_floor=_PIVOT_FLOOR, **kwargs)


def _warm_chunk_body(scal_ref, x_ref, y_ref, st_ref, z_ref,
                     m_st, m_z, v_st, v_z,
                     st_o, z_o, mo_st, mo_z, vo_st, vo_z, loss_o,
                     Ks, Us, Vs, Ds,
                     *, n, m, d, jitter, K, lr, block, clip_norm):
    """K warm-start Adam steps on resident X (Np,128) / y (1,Np)."""
    from .fused_bound import chol_u_inv_inplace

    f32 = jnp.float32
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    t0 = scal_ref[0]
    X = x_ref[:]
    y = y_ref[:]

    def ref_chol_inv(Kmat, pivot_floor):
        Ks[:] = Kmat
        chol_u_inv_inplace(Ks, Us, Vs, Ds, block=block,
                           pivot_floor=pivot_floor)
        return Us[:], Vs[:]

    def step(t, carry):
        st, Z, ms, mz, vs, vz = carry
        loss, gs, gZ = sgpmc_warm_loss_vg(st, X, y, Z, n, m, d, jitter,
                                          chol_inv=ref_chol_inv)
        # optax chain: zero_nans (per-element, extended to inf) then
        # clip_by_global_norm(10) over the whole (state, Z) tree
        gs = jnp.where(jnp.abs(gs) <= 3.0e38, gs, jnp.zeros_like(gs))
        gZ = jnp.where(jnp.abs(gZ) <= 3.0e38, gZ, jnp.zeros_like(gZ))
        gn = jnp.sqrt(jnp.sum(gs * gs) + jnp.sum(gZ * gZ))
        sc = jnp.minimum(jnp.asarray(1.0, f32), clip_norm / gn)
        gs = gs * sc
        gZ = gZ * sc
        ta = t0 + t.astype(f32) + 1.0
        st, ms, vs = _adam_update(st, gs, ms, vs, ta, lr)
        Z, mz, vz = _adam_update(Z, gZ, mz, vz, ta, lr)
        loss_o[pl.ds(t, 1), :] = loss * (lane8 == 0).astype(f32)
        return st, Z, ms, mz, vs, vz

    init = (st_ref[:], z_ref[:], m_st[:], m_z[:], v_st[:], v_z[:])
    st, Z, ms, mz, vs, vz = jax.lax.fori_loop(0, K, step, init)
    st_o[:] = st
    z_o[:] = Z
    mo_st[:] = ms
    mo_z[:] = mz
    vo_st[:] = vs
    vo_z[:] = vz


def make_fused_sgpmc_warm(n, m, d, jitter, *, steps_per_call, lr=0.01,
                          clip_norm=_CLIP_NORM, block=32, interpret=False):
    """Factory: ``chunk(state, Z, adam_m, adam_v, Xp, yrow, t0) ->
    (state, Z, adam_m, adam_v, losses (K,))`` with adam_m/v =
    {"state": (1,128), "Z": (Mp,128)}. State lanes: [log_ls (d), log_os,
    log_noise, v (m)] — the sampler layout, so the warm-started row feeds
    the fused NUTS/HMC kernels directly. Envelope: n <= 2048 resident,
    d + 2 + m <= 128. Returns None outside it."""
    from jax.experimental.pallas import tpu as pltpu

    if n > 2048 or d + 2 + m > _LANES:
        return None
    Mp = _LANES
    Np = _round_up(n, _LANES)
    K = int(steps_per_call)
    f32 = jnp.float32
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    shapes = [(1, _LANES), (Mp, _LANES)] * 3
    out_shape = tuple([jax.ShapeDtypeStruct(s, f32) for s in shapes]
                      + [jax.ShapeDtypeStruct((K, 8), f32)])
    scratch = ([pltpu.VMEM((Mp, Mp), f32) for _ in range(3)]
               + [pltpu.VMEM((Mp, _LANES), f32)])
    cparams = (pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024) if not interpret else None)
    call = pl.pallas_call(
        partial(_warm_chunk_body, n=n, m=m, d=d, jitter=float(jitter),
                K=K, lr=float(lr), block=block, clip_norm=float(clip_norm)),
        out_shape=out_shape,
        in_specs=[smem] + [vmem] * 8,
        out_specs=(vmem,) * 7,
        scratch_shapes=scratch,
        compiler_params=cparams,
        interpret=interpret,
    )

    def chunk(state, Z, adam_m, adam_v, Xp, yrow, t0):
        outs = call(jnp.asarray([t0], f32), Xp, yrow, state, Z,
                    adam_m["state"], adam_m["Z"],
                    adam_v["state"], adam_v["Z"])
        st1, z1, ms, mz, vs, vz = outs[:6]
        return (st1, z1, {"state": ms, "Z": mz}, {"state": vs, "Z": vz},
                outs[6][:, 0])

    return chunk
