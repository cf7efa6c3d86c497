"""Pallas TPU kernel: the stacked velocity-recurrence scan.

``ops/velocity.stacked_vel_scan`` runs R independent velocity recurrences
(forward friction-circle, brake, backward refinement — the passes behind
tph ``calc_vel_profile`` / ``calc_vel_profile_brake``,
VpForwardBackward.py:213 / calc_vel_profile_follow.py:152) as ONE
``lax.scan``.  On this TPU backend each of the T sequential steps issues a
handful of tiny fused ops over the (batch x R) rows, costing ~4 us/step of
pure dispatch overhead — 4 levels x 448 steps made the velocity stage 22%
of the batched tick (BENCH_r02 roofline: "velocity_ns_per_step": 4180).

This kernel runs the *identical* per-step arithmetic with the scan rows laid
out along the 128-lane axis — inputs are transposed to ``(G, T, 128)`` and
blocked over G, so every sequential step is a full-width VPU op on a
``(GB, 128)`` tile held in VMEM, and one grid block advances 128*GB rows per
step.  The T-step loop never touches HBM (inputs stream in once per block,
the profile streams out once).

Numerical semantics match ``stacked_vel_scan`` step-for-step (same formula
order; the machine-limit interpolation is an explicit piecewise-linear
select with np.interp's constant extrapolation).  Equivalence is pinned in
tests/test_pallas_velocity.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
GB = 2            # row-groups of 128 lanes per grid block (VMEM budget:
#                   8 inputs x GB x T x 128 f32 x 2 (pipelining) < 16 MB)


def _on_tpu():
    return jax.default_backend() == "tpu"


def _kernel(mach_ref, par_ref, mode_ref, vinit_ref,
            k1_ref, a1_ref, y1_ref, k2_ref, a2_ref, y2_ref,
            ds_ref, vl_ref, out_ref, *, T, M):
    exp = par_ref[0, 0]
    inv_exp = par_ref[0, 1]
    drag_coeff = par_ref[0, 2]
    m_veh = par_ref[0, 3]

    mode = mode_ref[:, 0, :]                             # (GB, 128) i32
    is_fwd = mode == 0
    is_brake = mode == 1
    v0 = vinit_ref[:, 0, :]                              # (GB, 128)
    out_ref[:, 0, :] = v0

    mxs = [mach_ref[j, 0] for j in range(M)]
    mfs = [mach_ref[j, 1] for j in range(M)]

    def interp_m(v):
        # np.interp semantics for sorted xp: constant extrapolation
        res = jnp.full_like(v, mfs[M - 1])
        for j in range(M - 1):
            tt = (v - mxs[j]) / jnp.maximum(mxs[j + 1] - mxs[j], 1e-30)
            res = jnp.where((v >= mxs[j]) & (v < mxs[j + 1]),
                            mfs[j] + tt * (mfs[j + 1] - mfs[j]), res)
        return jnp.where(v < mxs[0], mfs[0], res)

    def ax_tires(v, k_abs, axm, aym):
        ay_used = v * v * k_abs
        frac = jnp.clip(ay_used / jnp.maximum(aym, 1e-9), 0.0, 1.0)
        radicand = 1.0 - jnp.power(frac, exp)
        return axm * jnp.power(jnp.maximum(radicand, 0.0), inv_exp)

    def body(t, v):
        sl = (slice(None), pl.ds(t, 1), slice(None))
        k1 = k1_ref[sl][:, 0, :]
        a1 = a1_ref[sl][:, 0, :]
        y1 = y1_ref[sl][:, 0, :]
        k2 = k2_ref[sl][:, 0, :]
        a2 = a2_ref[sl][:, 0, :]
        y2 = y2_ref[sl][:, 0, :]
        d_ = ds_ref[sl][:, 0, :]
        vl = vl_ref[sl][:, 0, :]

        a_t = ax_tires(v, k1, a1, y1)
        drag = v * v * drag_coeff / m_veh
        a_m = interp_m(v)
        # MODE_FWD
        acc = jnp.minimum(a_t, a_m) - drag
        v_f = jnp.minimum(
            jnp.sqrt(jnp.maximum(v * v + 2.0 * acc * d_, 0.0)), vl)
        # MODE_BRAKE
        dec = a_t + drag
        v_b = jnp.sqrt(jnp.maximum(v * v - 2.0 * dec * d_, 0.0))
        # MODE_BWD (two-step conservative refinement)
        v_est = jnp.sqrt(v * v + 2.0 * dec * d_)
        a_t2 = ax_tires(v_est, k2, a2, y2)
        dec2 = a_t2 + v_est * v_est * drag_coeff / m_veh
        v_r = jnp.minimum(
            jnp.sqrt(jnp.maximum(v * v + 2.0 * jnp.minimum(dec, dec2) * d_,
                                 0.0)), vl)
        v_next = jnp.where(is_fwd, v_f, jnp.where(is_brake, v_b, v_r))
        out_ref[:, pl.ds(t + 1, 1), :] = v_next[:, None, :]
        return v_next

    jax.lax.fori_loop(0, T, body, v0)


def _to_lanes(x, G, T):
    """(R_pad, T) -> (G, T, 128): rows split over (group, lane)."""
    return jnp.transpose(x.reshape(G, LANES, T), (0, 2, 1))


@functools.partial(jax.jit,
                   static_argnames=("interpret",))
def _fused_vel_scan_flat(k1, a1, y1, k2, a2, y2, ds, v_lim, v_init, mode,
                         machines, params, interpret=False):
    """(R, T) inputs -> (R, T+1) profile via the Pallas kernel."""
    R, T = k1.shape
    M = machines.shape[0]
    Rp = int(np.ceil(R / (LANES * GB)) * LANES * GB)
    G = Rp // LANES

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((Rp - R,) + x.shape[1:], fill, x.dtype)], axis=0) \
            if Rp != R else x

    args = [_to_lanes(pad(a), G, T)
            for a in (k1, a1, y1, k2, a2, y2, ds, v_lim)]
    mode_l = pad(mode.astype(jnp.int32), 1).reshape(G, 1, LANES)
    vinit_l = pad(v_init).reshape(G, 1, LANES)

    grid = (G // GB,)
    row_spec = pl.BlockSpec((GB, T, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((GB, 1, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, M=M),
        out_shape=jax.ShapeDtypeStruct((G, T + 1, LANES), k1.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  scalar_spec, scalar_spec] + [row_spec] * 8,
        out_specs=pl.BlockSpec((GB, T + 1, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(machines, params, mode_l, vinit_l, *args)
    out = jnp.transpose(out, (0, 2, 1)).reshape(Rp, T + 1)
    return out[:R]


def make_fused_vel_scan(interpret: bool = None):
    """Drop-in replacement for ``velocity.stacked_vel_scan`` (same signature
    minus ``unroll``) backed by the Pallas kernel.

    Wrapped with ``custom_vmap``: under ``jax.vmap`` (the batched scenario
    engine) the batch axis is flattened into the row axis and ONE kernel
    launch handles batch*R rows — vmap never lifts the pallas_call itself.
    """
    if interpret is None:
        interpret = not _on_tpu()

    @jax.custom_batching.custom_vmap
    def fused(k1, a1, y1, k2, a2, y2, ds, v_lim, v_init, mode,
              machines, dyn_model_exp, drag_coeff, m_veh):
        params = jnp.stack([
            jnp.asarray(dyn_model_exp, jnp.float32),
            1.0 / jnp.asarray(dyn_model_exp, jnp.float32),
            jnp.asarray(drag_coeff, jnp.float32),
            jnp.asarray(m_veh, jnp.float32)]).reshape(1, 4)
        return _fused_vel_scan_flat(
            k1, a1, y1, k2, a2, y2, ds, v_lim,
            jnp.asarray(v_init, k1.dtype), mode, machines, params,
            interpret=interpret)

    @fused.def_vmap
    def _fused_vmap(axis_size, in_batched, *batched_args):
        (k1, a1, y1, k2, a2, y2, ds, v_lim, v_init, mode,
         machines, dyn_model_exp, drag_coeff, m_veh) = batched_args
        rows_b, scalars_b = in_batched[:10], in_batched[10:]
        if any(scalars_b):
            raise NotImplementedError(
                "batched machines/physics params unsupported")

        def flat(x, b):
            if not b:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            return x.reshape((axis_size * x.shape[1],) + x.shape[2:])

        R = next(x.shape[1] if b else x.shape[0]
                 for x, b in zip(batched_args[:10], rows_b))
        args = [flat(x, b) for x, b in zip(batched_args[:10], rows_b)]
        out = fused(*args, machines, dyn_model_exp, drag_coeff, m_veh)
        return out.reshape(axis_size, R, out.shape[-1]), True

    return fused
