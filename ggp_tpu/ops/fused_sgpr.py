"""Fused SGPR (Titsias) training: whole chunks of full-batch Adam steps
inside one Pallas kernel.

The reference trains SGPR with one gpytorch ELBO + Adam step per Python
iteration (reference models/sgpr.py:110-144); our XLA path already scans
steps under jit (models/sgpr.py `_run_adam`), but every step still pays
this runtime's per-iteration custom-call floor for the two Cholesky
factorizations (~80-90 us each, PERF.md) plus XLA op-issue — measured
~717 us/step at Boston size. Here the ENTIRE step runs in-kernel: both
grams, the two blocked in-VMEM factorizations, the collapsed-bound value,
the hand adjoint wrt ALL parameters (hypers AND inducing locations — the
``want_z_grad`` extension of ops/fused_bound._rbf_vfe_neg_logpost_vg),
the optax chain (zero_nans -> clip_by_global_norm(100) -> adam), and the
log-param box projection — with K steps per Pallas call on resident X/y.

Scope: Scale(RBF-ARD) x Gaussian (the reference's regression benchmark
configuration), n <= 2048 resident rows, m <= 128, d <= 125. The
optimizer chain mirrors models/sgpr.py `_run_adam` exactly, with one
documented deviation: optax's clip_by_global_norm zeroes the WHOLE update
when any gradient entry is inf (norm = inf -> scale 0), while the kernel
masks non-finite entries per-element before the norm — they differ only
on blow-up events that would otherwise stall training.

Training-only robustness: the blocked Cholesky runs with the SVI
modified-Cholesky pivot floor (ops/fused_bound._pivot_row) — a NaN factor
would permanently poison Adam state; sampler kernels keep NaN divergence
semantics.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_bound import _rbf_vfe_neg_logpost_vg, _round_up
from .fused_svi import _adam_update

__all__ = ["sgpr_loss_vg", "make_fused_sgpr", "make_fused_z_adam"]

_LANES = 128
_PIVOT_FLOOR = 1e-6           # relative; scaled by max(sf2,1) in the core
_CLIP_NORM = 100.0            # models/sgpr.py train_model optax chain
_BOX = 15.0                   # log-hyper box projection (models/sgpr.py)


def sgpr_loss_vg(theta_pad, Xp, yp, Zp, n, m, d, jitter, chol_inv=None):
    """loss = -sgpr_elbo (NO prior — the ML-II training objective,
    reference models/sgpr.py:121) and gradients wrt (theta, Z), padded
    layout. Thin wrapper over the sampler potential core with
    ``want_z_grad``/``want_prior=False`` (ops/fused_bound.py)."""
    kwargs = {} if chol_inv is None else {"chol_inv": chol_inv}
    return _rbf_vfe_neg_logpost_vg(theta_pad, Xp, yp, Zp, n, m, d, jitter,
                                   want_z_grad=True, want_prior=False,
                                   pivot_floor=_PIVOT_FLOOR, **kwargs)


def _sgpr_chunk_body(scal_ref, x_ref, y_ref, th_ref, z_ref,
                     m_th, m_z, v_th, v_z,
                     th_o, z_o, mo_th, mo_z, vo_th, vo_z, loss_o,
                     Ks, Us, Vs, Ds,
                     *, n, m, d, jitter, K, lr, block, min_noise,
                     clip_norm):
    """K full-batch SGPR Adam steps on resident X (Np,128) / y (Np,1)."""
    from .fused_bound import chol_u_inv_inplace

    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    hyp_mask = (lane < d + 2).astype(f32)
    noise_lane = (lane == d + 1).astype(f32)
    t0 = scal_ref[0]
    X = x_ref[:]
    y = y_ref[:]
    log_floor = math.log(min_noise)

    def ref_chol_inv(Kmat, pivot_floor):
        Ks[:] = Kmat
        chol_u_inv_inplace(Ks, Us, Vs, Ds, block=block,
                           pivot_floor=pivot_floor)
        return Us[:], Vs[:]

    def step(t, carry):
        theta, Z, mt, mz, vt, vz = carry
        loss, gt, gZ = sgpr_loss_vg(theta, X, y, Z, n, m, d, jitter,
                                    chol_inv=ref_chol_inv)
        # optax chain: zero_nans (per-element, extended to inf) then
        # clip_by_global_norm(100) over the whole (theta, Z) tree
        gt = jnp.where(jnp.abs(gt) <= 3.0e38, gt, jnp.zeros_like(gt))
        gZ = jnp.where(jnp.abs(gZ) <= 3.0e38, gZ, jnp.zeros_like(gZ))
        gn = jnp.sqrt(jnp.sum(gt * gt) + jnp.sum(gZ * gZ))
        sc = jnp.minimum(jnp.asarray(1.0, f32), clip_norm / gn)
        gt = gt * sc
        gZ = gZ * sc
        ta = t0 + t.astype(f32) + 1.0
        theta, mt, vt = _adam_update(theta, gt, mt, vt, ta, lr)
        Z, mz, vz = _adam_update(Z, gZ, mz, vz, ta, lr)
        # box-project log hypers (never Z) + noise floor (models/sgpr.py)
        theta = jnp.clip(theta, -_BOX, _BOX) * hyp_mask
        theta = jnp.maximum(theta, log_floor * noise_lane
                            - _BOX * (1.0 - noise_lane))
        loss_o[pl.ds(t, 1), :] = loss * (lane8 == 0).astype(f32)
        return theta, Z, mt, mz, vt, vz

    init = (th_ref[:], z_ref[:], m_th[:], m_z[:], v_th[:], v_z[:])
    theta, Z, mt, mz, vt, vz = jax.lax.fori_loop(0, K, step, init)
    th_o[:] = theta
    z_o[:] = Z
    mo_th[:] = mt
    mo_z[:] = mz
    vo_th[:] = vt
    vo_z[:] = vz


def _sgpr_stream_chunk_body(scal_ref, x_ref, th_ref, z_ref,
                            m_th, m_z, v_th, v_z,
                            th_o, z_o, mo_th, mo_z, vo_th, vo_z, loss_o,
                            Ks, Us, Vs, Ds, xsbuf, dsem,
                            *, n, m, d, jitter, K, lr, block, min_noise,
                            clip_norm, NB, nblocks, data_scale=0.0):
    """Streaming variant: X/y live in HBM packed into one (Np, 128) array
    (X lanes [0,d), y lane 127 — a 1-lane column cannot be DMA-sliced),
    visited in double-buffered (NB, 128) blocks per gram/adjoint pass
    (same iterator as the streaming fused-NUTS kernels). O(M^2) VMEM."""
    from .fused_bound import (_rbf_vfe_neg_logpost_vg_streaming,
                              chol_u_inv_inplace)
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    hyp_mask = (lane < d + 2).astype(f32)
    noise_lane = (lane == d + 1).astype(f32)
    t0 = scal_ref[0]
    log_floor = math.log(min_noise)

    def ref_chol_inv(Kmat, pivot_floor):
        Ks[:] = Kmat
        chol_u_inv_inplace(Ks, Us, Vs, Ds, block=block,
                           pivot_floor=pivot_floor)
        return Us[:], Vs[:]

    def _dma(slot, t):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(t * NB, NB), :], xsbuf.at[slot], dsem.at[slot])

    def loop_blocks(body, carry):
        _dma(0, 0).start()

        def lb(t, c):
            slot = jax.lax.rem(t, 2)

            @pl.when(t + 1 < nblocks)
            def _():
                _dma(jax.lax.rem(t + 1, 2), t + 1).start()

            _dma(slot, t).wait()
            return body(t, xsbuf[slot], c)

        return jax.lax.fori_loop(0, nblocks, lb, carry)

    def step(t, carry):
        theta, Z, mt, mz, vt, vz = carry
        loss, gt, gZ = _rbf_vfe_neg_logpost_vg_streaming(
            theta, Z, n, m, d, jitter, chol_inv=ref_chol_inv,
            loop_blocks=loop_blocks, NB=NB, want_z_grad=True,
            want_prior=False, pivot_floor=_PIVOT_FLOOR,
            data_scale=data_scale)
        gt = jnp.where(jnp.abs(gt) <= 3.0e38, gt, jnp.zeros_like(gt))
        gZ = jnp.where(jnp.abs(gZ) <= 3.0e38, gZ, jnp.zeros_like(gZ))
        gn = jnp.sqrt(jnp.sum(gt * gt) + jnp.sum(gZ * gZ))
        sc = jnp.minimum(jnp.asarray(1.0, f32), clip_norm / gn)
        gt = gt * sc
        gZ = gZ * sc
        ta = t0 + t.astype(f32) + 1.0
        theta, mt, vt = _adam_update(theta, gt, mt, vt, ta, lr)
        Z, mz, vz = _adam_update(Z, gZ, mz, vz, ta, lr)
        theta = jnp.clip(theta, -_BOX, _BOX) * hyp_mask
        theta = jnp.maximum(theta, log_floor * noise_lane
                            - _BOX * (1.0 - noise_lane))
        loss_o[pl.ds(t, 1), :] = loss * (lane8 == 0).astype(f32)
        return theta, Z, mt, mz, vt, vz

    init = (th_ref[:], z_ref[:], m_th[:], m_z[:], v_th[:], v_z[:])
    theta, Z, mt, mz, vt, vz = jax.lax.fori_loop(0, K, step, init)
    th_o[:] = theta
    z_o[:] = Z
    mo_th[:] = mt
    mo_z[:] = mz
    vo_th[:] = vt
    vo_z[:] = vz


STREAM_NB = 1024
MAX_N_STREAM = 16384


# ---------------------------------------------------------------------------
# Fused Z-only Adam under the MC-averaged bound (BayesianSGPR_HMC phase B)
# ---------------------------------------------------------------------------

def _zadam_chunk_body(scal_ref, x_ref, y_ref, th_ref, z_ref,
                      m_z, v_z, z_o, mo_z, vo_z, loss_o,
                      Ks, Us, Vs, Ds, xsbuf=None, dsem=None,
                      *, n, m, d, S, jitter, K, lr, block,
                      NB=None, nblocks=None, data_scale=0.0):
    """Up to K Adam steps on Z only; per-step loss/grad = mean over the
    active hyper rows of th_ref (the current HMC trace) of
    -sgpr_elbo(theta_s, Z) — the reference's interleaved Z-optimisation
    objective (models/bayesian_sgpr_hmc.py:119-134). Resident X/y by
    default; with ``NB`` set, X/y live in HBM (y packed in lane 127) and
    every theta's gram/adjoint passes stream double-buffered row blocks.
    Theta gradients from the shared core are computed and discarded (same
    matrices).

    Round 4 (VERDICT r3 item 5): the trace size and step count are RUNTIME
    scalars — scal_ref = [t0, s_active, k_active] with s_active <= S and
    k_active <= K as dynamic fori_loop bounds — so the alternating
    scheduler's varying (S, steps) rounds all reuse ONE Mosaic executable
    compiled at the (S, K) caps."""
    from .fused_bound import (_rbf_vfe_neg_logpost_vg_streaming,
                              chol_u_inv_inplace)
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    t0 = scal_ref[0]
    s_act = scal_ref[1].astype(jnp.int32)      # exact small-int f32
    k_act = scal_ref[2].astype(jnp.int32)
    inv_s = 1.0 / scal_ref[1]

    def ref_chol_inv(Kmat, pivot_floor):
        Ks[:] = Kmat
        chol_u_inv_inplace(Ks, Us, Vs, Ds, block=block,
                           pivot_floor=pivot_floor)
        return Us[:], Vs[:]

    if NB is None:
        X = x_ref[:]
        y = y_ref[:]

        def eval_one(th, Z):
            return sgpr_loss_vg(th, X, y, Z, n, m, d, jitter,
                                chol_inv=ref_chol_inv)
    else:
        def _dma(slot, t):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(t * NB, NB), :], xsbuf.at[slot],
                dsem.at[slot])

        def loop_blocks(body, carry):
            _dma(0, 0).start()

            def lb(t, c):
                slot = jax.lax.rem(t, 2)

                @pl.when(t + 1 < nblocks)
                def _():
                    _dma(jax.lax.rem(t + 1, 2), t + 1).start()

                _dma(slot, t).wait()
                return body(t, xsbuf[slot], c)

            return jax.lax.fori_loop(0, nblocks, lb, carry)

        def eval_one(th, Z):
            return _rbf_vfe_neg_logpost_vg_streaming(
                th, Z, n, m, d, jitter, chol_inv=ref_chol_inv,
                loop_blocks=loop_blocks, NB=NB, want_z_grad=True,
                want_prior=False, pivot_floor=_PIVOT_FLOOR,
                data_scale=data_scale)

    loss_o[:] = jnp.zeros_like(loss_o)

    def step(t, carry):
        Z, mz, vz = carry

        def one(s, acc):
            lacc, gacc = acc
            th = th_ref[pl.ds(s, 1), :]
            loss, _, gZ = eval_one(th, Z)
            return lacc + inv_s * loss, gacc + inv_s * gZ

        loss, gZ = jax.lax.fori_loop(
            0, s_act, one, (jnp.zeros((), f32), jnp.zeros_like(Z)))
        # zero_nans on the averaged gradient (matches the XLA chain's
        # placement: optax.chain(zero_nans, adam) on the mean grad)
        ta = t0 + t.astype(f32) + 1.0
        Z, mz, vz = _adam_update(Z, gZ, mz, vz, ta, lr)
        loss_o[pl.ds(t, 1), :] = loss * (lane8 == 0).astype(f32)
        return Z, mz, vz

    Z, mz, vz = jax.lax.fori_loop(0, k_act, step,
                                  (z_ref[:], m_z[:], v_z[:]))
    z_o[:] = Z
    mo_z[:] = mz
    vo_z[:] = vz


def make_fused_z_adam(n, m, d, S, jitter, *, steps_per_call, lr=0.01,
                      block=32, interpret=False, data_scale=0.0):
    """Factory: ``chunk(Z, adam_m, adam_v, thetas, Xp, yp, t0,
    s_active=None, n_steps=None) -> (Z, adam_m, adam_v, losses (K,))``;
    ``thetas`` is the packed hyper trace (any row count <= S). Envelope:
    m <= 512, d <= 125, S <= 512 rows; n <= 2048 resident, up to 16384
    streamed from HBM. Returns None outside it.

    ``S`` and ``steps_per_call`` are compile-time CAPS; the per-call
    ``s_active`` (trace rows actually averaged) and ``n_steps`` (Adam
    steps actually taken, losses beyond it zero-padded) are runtime
    scalars, so one executable serves the alternating scheduler's whole
    (S, steps) schedule (VERDICT r3 item 5). Both default to the caps."""
    from jax.experimental.pallas import tpu as pltpu

    if n > MAX_N_STREAM or m > 512 or d > _LANES - 3 or S > 512:
        return None
    Mp = max(_LANES, _round_up(m, _LANES))
    Sp = _round_up(S, 8)
    K = int(steps_per_call)
    f32 = jnp.float32
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    streaming = n > 2048
    Np = _round_up(n, STREAM_NB if streaming else 8)
    out_shape = tuple([jax.ShapeDtypeStruct((Mp, _LANES), f32)] * 3
                      + [jax.ShapeDtypeStruct((K, 8), f32)])
    scratch = ([pltpu.VMEM((Mp, Mp), f32) for _ in range(3)]
               + [pltpu.VMEM((Mp, _LANES), f32)])
    cparams = (pltpu.CompilerParams(
        vmem_limit_bytes=112 * 1024 * 1024) if not interpret else None)
    if streaming:
        scratch += [pltpu.VMEM((2, STREAM_NB, _LANES), f32),
                    pltpu.SemaphoreType.DMA((2,))]
        # y_ref becomes an unused (8,1) dummy: y rides lane 127 of the slab
        call = pl.pallas_call(
            partial(_zadam_chunk_body, n=n, m=m, d=d, S=S,
                    jitter=float(jitter), K=K, lr=float(lr), block=block,
                    NB=STREAM_NB, nblocks=Np // STREAM_NB,
                    data_scale=float(data_scale)),
            out_shape=out_shape,
            in_specs=[smem, pl.BlockSpec(memory_space=pl.ANY)]
            + [vmem] * 5,
            out_specs=(vmem,) * 4,
            scratch_shapes=scratch,
            compiler_params=cparams,
            interpret=interpret,
        )
    else:
        call = pl.pallas_call(
            partial(_zadam_chunk_body, n=n, m=m, d=d, S=S,
                    jitter=float(jitter), K=K, lr=float(lr), block=block),
            out_shape=out_shape,
            in_specs=[smem] + [vmem] * 6,
            out_specs=(vmem,) * 4,
            scratch_shapes=scratch,
            compiler_params=cparams,
            interpret=interpret,
        )

    def chunk(Z, adam_m, adam_v, thetas, Xp, yp, t0, s_active=None,
              n_steps=None):
        s_act = thetas.shape[0] if s_active is None else s_active
        k_act = K if n_steps is None else n_steps
        th = jnp.zeros((Sp, _LANES), f32).at[:thetas.shape[0], :].set(thetas)
        scal = jnp.stack([jnp.asarray(t0, f32),
                          jnp.asarray(s_act, f32),
                          jnp.asarray(k_act, f32)])
        if streaming:
            slab = jnp.zeros((Np, _LANES), f32)
            slab = slab.at[:Xp.shape[0], :].set(Xp)
            slab = slab.at[:yp.shape[0], _LANES - 1].set(yp[:, 0])
            outs = call(scal, slab,
                        jnp.zeros((8, 1), f32), th, Z,
                        adam_m, adam_v)
        else:
            outs = call(scal, Xp, yp, th, Z,
                        adam_m, adam_v)
        z1, mz, vz, losses = outs
        return z1, mz, vz, losses[:, 0]

    return chunk


def make_fused_sgpr(n, m, d, jitter, *, steps_per_call, lr=0.01,
                    min_noise=1e-4, clip_norm=_CLIP_NORM, block=32,
                    interpret=False, data_scale=0.0):
    """Factory: ``chunk(theta, Z, adam_m, adam_v, Xp, yp, t0) ->
    (theta, Z, adam_m, adam_v, losses (K,))`` with adam_m/v =
    {"theta": (1,128), "Z": (Mp,128)}. Envelope: m <= 512 (Mp = next
    128-multiple; the blocked linalg is Mp-generic, same as the M<=512
    fused-NUTS envelope), d <= 125; n <= 2048 rows VMEM-resident, past
    that up to 16384 rows streamed from HBM in double-buffered (1024,128)
    blocks (y repacked into lane 127). Returns None outside it."""
    from jax.experimental.pallas import tpu as pltpu

    if n > MAX_N_STREAM or m > 512 or d > _LANES - 3:
        return None
    Mp = max(_LANES, _round_up(m, _LANES))
    K = int(steps_per_call)
    f32 = jnp.float32
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    streaming = n > 2048
    Np = _round_up(n, STREAM_NB if streaming else 8)
    shapes = [(1, _LANES), (Mp, _LANES)] * 3
    out_shape = tuple([jax.ShapeDtypeStruct(s, f32) for s in shapes]
                      + [jax.ShapeDtypeStruct((K, 8), f32)])
    scratch = ([pltpu.VMEM((Mp, Mp), f32) for _ in range(3)]
               + [pltpu.VMEM((Mp, _LANES), f32)])
    # 100MB suffices at Mp=128 but the Mp=512/N~1600 resident step's
    # scoped stack measures ~101MB — the v5e chip has 128MB headroom
    cparams = (pltpu.CompilerParams(
        vmem_limit_bytes=112 * 1024 * 1024) if not interpret else None)
    if streaming:
        scratch += [pltpu.VMEM((2, STREAM_NB, _LANES), f32),
                    pltpu.SemaphoreType.DMA((2,))]
        call = pl.pallas_call(
            partial(_sgpr_stream_chunk_body, n=n, m=m, d=d,
                    jitter=float(jitter), K=K, lr=float(lr), block=block,
                    min_noise=float(min_noise), clip_norm=float(clip_norm),
                    NB=STREAM_NB, nblocks=Np // STREAM_NB,
                    data_scale=float(data_scale)),
            out_shape=out_shape,
            in_specs=[smem, pl.BlockSpec(memory_space=pl.ANY)] + [vmem] * 6,
            out_specs=(vmem,) * 7,
            scratch_shapes=scratch,
            compiler_params=cparams,
            interpret=interpret,
        )
    else:
        call = pl.pallas_call(
            partial(_sgpr_chunk_body, n=n, m=m, d=d, jitter=float(jitter),
                    K=K, lr=float(lr), block=block,
                    min_noise=float(min_noise), clip_norm=float(clip_norm)),
            out_shape=out_shape,
            in_specs=[smem] + [vmem] * 8,
            out_specs=(vmem,) * 7,
            scratch_shapes=scratch,
            compiler_params=cparams,
            interpret=interpret,
        )

    def chunk(theta, Z, adam_m, adam_v, Xp, yp, t0):
        if streaming:
            # repack y into lane 127 of the HBM slab (1-lane columns
            # cannot be DMA-sliced); pad rows to whole DMA blocks
            slab = jnp.zeros((Np, _LANES), f32)
            slab = slab.at[:Xp.shape[0], :].set(Xp)
            slab = slab.at[:yp.shape[0], _LANES - 1].set(yp[:, 0])
            outs = call(jnp.asarray([t0], f32), slab, theta, Z,
                        adam_m["theta"], adam_m["Z"],
                        adam_v["theta"], adam_v["Z"])
        else:
            outs = call(jnp.asarray([t0], f32), Xp, yp, theta, Z,
                        adam_m["theta"], adam_m["Z"],
                        adam_v["theta"], adam_v["Z"])
        th1, z1, mt, mz, vt, vz, losses = outs
        return (th1, z1, {"theta": mt, "Z": mz}, {"theta": vt, "Z": vz},
                losses[:, 0])

    return chunk
