"""Pallas TPU kernel: the stacked velocity-recurrence scan.

``ops/velocity.stacked_vel_scan`` runs R independent velocity recurrences
(forward friction-circle, brake, backward refinement — the passes behind
tph ``calc_vel_profile`` / ``calc_vel_profile_brake``,
VpForwardBackward.py:213 / calc_vel_profile_follow.py:152) as ONE
``lax.scan``.  On this TPU backend each of the T sequential steps issues a
handful of tiny fused ops over the (batch x R) rows, costing ~4 us/step of
pure dispatch overhead — 4 levels x 448 steps made the velocity stage 22%
of the batched tick (BENCH_r02 roofline: "velocity_ns_per_step": 4180).

Kernel layout (v2 — the v1 in-kernel ``fori_loop`` with dynamic sublane
indexing was SLOWER than the scan; Mosaic's dynamic per-step slices cost
tens of cycles each):

  * rows are tiled ``(sublane, lane) = (SUBS, 128)`` — ``SUBS*128`` rows
    per row-block, inputs transposed to ``(G, T, SUBS, 128)``;
  * the T axis is CHUNKED INTO THE GRID: grid = (row blocks, T/TC chunks),
    the carry velocity lives in VMEM scratch and persists across the
    sequential chunk iterations (TPU grids execute in order);
  * within a chunk the step loop is a static python ``range(TC)`` so every
    memory access is statically indexed — each step is a handful of
    full-tile (SUBS, 128) VPU ops (wide tiles amortize per-op issue
    overhead; statically-known physics drop the pow transcendentals).

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
SUBS = 32
ROWS_BLK = SUBS * LANES       # rows per row-block
TC = 16                       # T-chunk per grid step


def _on_tpu():
    return jax.default_backend() == "tpu"


def _kernel(mach_ref, par_ref, mode_ref, vinit_ref,
            k1_ref, a1_ref, y1_ref, k2_ref, a2_ref, y2_ref,
            ds_ref, vl_ref, out_ref, v_carry, *, M, exp_one):
    exp = par_ref[0, 0]
    inv_exp = par_ref[0, 1]
    drag_coeff = par_ref[0, 2]
    m_veh = par_ref[0, 3]

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        v_carry[:, :] = vinit_ref[0, 0]

    mode = mode_ref[0, 0]                                # (SUBS, 128) i32
    is_fwd = mode == 0
    is_brake = mode == 1

    mxs = [mach_ref[m, 0] for m in range(M)]
    mfs = [mach_ref[m, 1] for m in range(M)]

    def interp_m(v):
        # np.interp semantics for sorted xp: constant extrapolation
        res = jnp.full_like(v, mfs[M - 1])
        for m in range(M - 1):
            tt = (v - mxs[m]) / jnp.maximum(mxs[m + 1] - mxs[m], 1e-30)
            res = jnp.where((v >= mxs[m]) & (v < mxs[m + 1]),
                            mfs[m] + tt * (mfs[m + 1] - mfs[m]), res)
        return jnp.where(v < mxs[0], mfs[0], res)

    def ax_tires(v, k_abs, axm, aym):
        # exp_one (the config default dyn_model_exp == 1) removes the four
        # transcendental pow evaluations from every step
        ay_used = v * v * k_abs
        frac = jnp.clip(ay_used / jnp.maximum(aym, 1e-9), 0.0, 1.0)
        if exp_one:
            return axm * (1.0 - frac)
        radicand = 1.0 - jnp.power(frac, exp)
        return axm * jnp.power(jnp.maximum(radicand, 0.0), inv_exp)

    v = v_carry[:, :]
    for t in range(TC):                                  # static indices
        k1 = k1_ref[0, t]
        a1 = a1_ref[0, t]
        y1 = y1_ref[0, t]
        d_ = ds_ref[0, t]
        vl = vl_ref[0, t]

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
        a_t2 = ax_tires(v_est, k2_ref[0, t], a2_ref[0, t], y2_ref[0, t])
        dec2 = a_t2 + v_est * v_est * drag_coeff / m_veh
        v_r = jnp.minimum(
            jnp.sqrt(jnp.maximum(v * v + 2.0 * jnp.minimum(dec, dec2) * d_,
                                 0.0)), vl)
        v = jnp.where(is_fwd, v_f, jnp.where(is_brake, v_b, v_r))
        out_ref[0, t] = v
    v_carry[:, :] = v


def _to_tiles(x, G, Tp):
    """(R_pad, Tp) -> (G, Tp, SUBS, 128)."""
    return jnp.transpose(x.reshape(G, SUBS, LANES, Tp), (0, 3, 1, 2))


@functools.partial(jax.jit, static_argnames=("interpret", "exp_one"))
def _fused_vel_scan_flat(k1, a1, y1, k2, a2, y2, ds, v_lim, v_init, mode,
                         machines, params, exp_one=False, interpret=False):
    """(R, T) inputs -> (R, T+1) profile via the Pallas kernel."""
    R, T = k1.shape
    M = machines.shape[0]
    Rp = int(np.ceil(R / ROWS_BLK) * ROWS_BLK)
    Tp = int(np.ceil(T / TC) * TC)
    G = Rp // ROWS_BLK

    def pad(x, fill_r, fill_t=None):
        if Rp != R:
            x = jnp.concatenate(
                [x, jnp.full((Rp - R,) + x.shape[1:], fill_r, x.dtype)],
                axis=0)
        if fill_t is not None and Tp != T:
            x = jnp.concatenate(
                [x, jnp.full((Rp, Tp - T), fill_t, x.dtype)], axis=1)
        return x

    # padded steps are identities: ds=0 and an INF cap leave v unchanged
    # in every mode
    args = [_to_tiles(pad(a, 0.0, ft), G, Tp)
            for a, ft in ((k1, 0.0), (a1, 1.0), (y1, 1.0), (k2, 0.0),
                          (a2, 1.0), (y2, 1.0), (ds, 0.0),
                          (v_lim, jnp.inf))]
    mode_t = pad(mode.astype(jnp.int32), 1).reshape(G, 1, SUBS, LANES)
    vinit_t = pad(v_init, 0.0).reshape(G, 1, SUBS, LANES)

    row_spec = pl.BlockSpec((1, TC, SUBS, LANES), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1, 1, SUBS, LANES), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, M=M, exp_one=exp_one),
        out_shape=jax.ShapeDtypeStruct((G, Tp, SUBS, LANES), k1.dtype),
        grid=(G, Tp // TC),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  scalar_spec, scalar_spec] + [row_spec] * 8,
        out_specs=pl.BlockSpec((1, TC, SUBS, LANES),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SUBS, LANES), k1.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(machines, params, mode_t, vinit_t, *args)
    # (G, Tp, SUBS, 128) -> (Rp, Tp); prepend the v_init column
    out = jnp.transpose(out, (0, 2, 3, 1)).reshape(Rp, Tp)[:R, :T]
    return jnp.concatenate([v_init[:R, None], out], axis=1)


def make_fused_vel_scan(interpret: bool = None, physics: tuple = None):
    """Drop-in replacement for ``velocity.stacked_vel_scan`` (same signature
    minus ``unroll``) backed by the Pallas kernel.

    Wrapped with ``custom_vmap``: under ``jax.vmap`` (the batched scenario
    engine) the batch axis is flattened into the row axis and ONE kernel
    launch handles batch*R rows — vmap never lifts the pallas_call itself.

    :param physics: optional STATIC ``(dyn_model_exp, drag_coeff, m_veh)``
        floats, folded into the kernel as compile-time constants (the
        ``dyn_model_exp == 1`` config default then drops all four pow
        transcendentals per step).  custom_vmap converts scalar *arguments*
        to tracers, so static specialization must come through the factory.
        ``None`` keeps the physics as traced runtime args.
    """
    if interpret is None:
        interpret = not _on_tpu()

    def _params(dyn_model_exp, drag_coeff, m_veh):
        return jnp.stack([
            jnp.asarray(dyn_model_exp, jnp.float32),
            1.0 / jnp.asarray(dyn_model_exp, jnp.float32),
            jnp.asarray(drag_coeff, jnp.float32),
            jnp.asarray(m_veh, jnp.float32)]).reshape(1, 4)

    def _flatten(axis_size, in_batched, row_args):
        def flat(x, b):
            if not b:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            return x.reshape((axis_size * x.shape[1],) + x.shape[2:])
        R = next(x.shape[1] if b else x.shape[0]
                 for x, b in zip(row_args, in_batched))
        return R, [flat(x, b) for x, b in zip(row_args, in_batched)]

    if physics is not None:
        exp_s, drag_s, mveh_s = (float(physics[0]), float(physics[1]),
                                 float(physics[2]))

        @jax.custom_batching.custom_vmap
        def fused_s(k1, a1, y1, k2, a2, y2, ds, v_lim, v_init, mode,
                    machines):
            return _fused_vel_scan_flat(
                k1, a1, y1, k2, a2, y2, ds, v_lim,
                jnp.asarray(v_init, k1.dtype), mode, machines,
                _params(exp_s, drag_s, mveh_s),
                exp_one=(exp_s == 1.0), interpret=interpret)

        @fused_s.def_vmap
        def _fused_s_vmap(axis_size, in_batched, *batched_args):
            if in_batched[10]:
                raise NotImplementedError("batched machines unsupported")
            R, args = _flatten(axis_size, in_batched[:10], batched_args[:10])
            out = fused_s(*args, batched_args[10])
            return out.reshape(axis_size, R, out.shape[-1]), True

        return fused_s

    @jax.custom_batching.custom_vmap
    def fused(k1, a1, y1, k2, a2, y2, ds, v_lim, v_init, mode,
              machines, dyn_model_exp, drag_coeff, m_veh):
        return _fused_vel_scan_flat(
            k1, a1, y1, k2, a2, y2, ds, v_lim,
            jnp.asarray(v_init, k1.dtype), mode, machines,
            _params(dyn_model_exp, drag_coeff, m_veh),
            exp_one=False, interpret=interpret)

    @fused.def_vmap
    def _fused_vmap(axis_size, in_batched, *batched_args):
        if any(in_batched[10:]):
            raise NotImplementedError(
                "batched machines/physics params unsupported")
        R, args = _flatten(axis_size, in_batched[:10], batched_args[:10])
        out = fused(*args, *batched_args[10:])
        return out.reshape(axis_size, R, out.shape[-1]), True

    return fused


def _kernel_cgg(mach_ref, par_ref, mode_ref, vinit_ref,
                k1_ref, k2_ref, ds_ref, vl_ref, out_ref, v_carry,
                *, M, exp_one):
    """Constant-gg variant of :func:`_kernel`: the four per-step gg columns
    collapse to two SMEM scalars (par_ref[0, 4:6]) — the batched engine's
    local gg is a config constant, so streaming (R, T) tiles of a constant
    was half the velocity stage's input traffic."""
    exp = par_ref[0, 0]
    inv_exp = par_ref[0, 1]
    drag_coeff = par_ref[0, 2]
    m_veh = par_ref[0, 3]
    axm = par_ref[0, 4]
    aym = par_ref[0, 5]

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        v_carry[:, :] = vinit_ref[0, 0]

    mode = mode_ref[0, 0]
    is_fwd = mode == 0
    is_brake = mode == 1

    mxs = [mach_ref[m, 0] for m in range(M)]
    mfs = [mach_ref[m, 1] for m in range(M)]

    def interp_m(v):
        res = jnp.full_like(v, mfs[M - 1])
        for m in range(M - 1):
            tt = (v - mxs[m]) / jnp.maximum(mxs[m + 1] - mxs[m], 1e-30)
            res = jnp.where((v >= mxs[m]) & (v < mxs[m + 1]),
                            mfs[m] + tt * (mfs[m + 1] - mfs[m]), res)
        return jnp.where(v < mxs[0], mfs[0], res)

    def ax_tires(v, k_abs):
        ay_used = v * v * k_abs
        frac = jnp.clip(ay_used / jnp.maximum(aym, 1e-9), 0.0, 1.0)
        if exp_one:
            return axm * (1.0 - frac)
        radicand = 1.0 - jnp.power(frac, exp)
        return axm * jnp.power(jnp.maximum(radicand, 0.0), inv_exp)

    v = v_carry[:, :]
    for t in range(TC):
        k1 = k1_ref[0, t]
        d_ = ds_ref[0, t]
        vl = vl_ref[0, t]

        a_t = ax_tires(v, k1)
        drag = v * v * drag_coeff / m_veh
        a_m = interp_m(v)
        acc = jnp.minimum(a_t, a_m) - drag
        v_f = jnp.minimum(
            jnp.sqrt(jnp.maximum(v * v + 2.0 * acc * d_, 0.0)), vl)
        dec = a_t + drag
        v_b = jnp.sqrt(jnp.maximum(v * v - 2.0 * dec * d_, 0.0))
        v_est = jnp.sqrt(v * v + 2.0 * dec * d_)
        a_t2 = ax_tires(v_est, k2_ref[0, t])
        dec2 = a_t2 + v_est * v_est * drag_coeff / m_veh
        v_r = jnp.minimum(
            jnp.sqrt(jnp.maximum(v * v + 2.0 * jnp.minimum(dec, dec2) * d_,
                                 0.0)), vl)
        v = jnp.where(is_fwd, v_f, jnp.where(is_brake, v_b, v_r))
        out_ref[0, t] = v
    v_carry[:, :] = v


@functools.partial(jax.jit, static_argnames=("interpret", "exp_one"))
def _fused_vel_scan_flat_cgg(k1, k2, ds, v_lim, v_init, mode,
                             machines, params, exp_one=False,
                             interpret=False):
    """(R, T) inputs (no gg streams) -> (R, T+1) profile."""
    R, T = k1.shape
    M = machines.shape[0]
    Rp = int(np.ceil(R / ROWS_BLK) * ROWS_BLK)
    Tp = int(np.ceil(T / TC) * TC)
    G = Rp // ROWS_BLK

    def pad(x, fill_r, fill_t=None):
        if Rp != R:
            x = jnp.concatenate(
                [x, jnp.full((Rp - R,) + x.shape[1:], fill_r, x.dtype)],
                axis=0)
        if fill_t is not None and Tp != T:
            x = jnp.concatenate(
                [x, jnp.full((Rp, Tp - T), fill_t, x.dtype)], axis=1)
        return x

    args = [_to_tiles(pad(a, 0.0, ft), G, Tp)
            for a, ft in ((k1, 0.0), (k2, 0.0), (ds, 0.0),
                          (v_lim, jnp.inf))]
    mode_t = pad(mode.astype(jnp.int32), 1).reshape(G, 1, SUBS, LANES)
    vinit_t = pad(v_init, 0.0).reshape(G, 1, SUBS, LANES)

    row_spec = pl.BlockSpec((1, TC, SUBS, LANES), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1, 1, SUBS, LANES), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_cgg, M=M, exp_one=exp_one),
        out_shape=jax.ShapeDtypeStruct((G, Tp, SUBS, LANES), k1.dtype),
        grid=(G, Tp // TC),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  scalar_spec, scalar_spec] + [row_spec] * 4,
        out_specs=pl.BlockSpec((1, TC, SUBS, LANES),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SUBS, LANES), k1.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(machines, params, mode_t, vinit_t, *args)
    out = jnp.transpose(out, (0, 2, 3, 1)).reshape(Rp, Tp)[:R, :T]
    return jnp.concatenate([v_init[:R, None], out], axis=1)


def make_fused_vel_scan_cgg(physics: tuple, gg: tuple,
                            interpret: bool = None):
    """Constant-gg factory: ``fn(k1, k2, ds, v_lim, v_init, mode,
    machines) -> (R, T+1)`` with the local gg (ax, ay) and physics folded
    in as compile-time SMEM constants.  Same custom_vmap row-flattening as
    :func:`make_fused_vel_scan`."""
    if interpret is None:
        interpret = not _on_tpu()
    exp_s, drag_s, mveh_s = (float(physics[0]), float(physics[1]),
                             float(physics[2]))
    ax_s, ay_s = float(gg[0]), float(gg[1])
    params = np.array([[exp_s, 1.0 / exp_s, drag_s, mveh_s, ax_s, ay_s]],
                      np.float32)

    def _flatten(axis_size, in_batched, row_args):
        def flat(x, b):
            if not b:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            return x.reshape((axis_size * x.shape[1],) + x.shape[2:])
        R = next(x.shape[1] if b else x.shape[0]
                 for x, b in zip(row_args, in_batched))
        return R, [flat(x, b) for x, b in zip(row_args, in_batched)]

    @jax.custom_batching.custom_vmap
    def fused_c(k1, k2, ds, v_lim, v_init, mode, machines):
        return _fused_vel_scan_flat_cgg(
            k1, k2, ds, v_lim, jnp.asarray(v_init, k1.dtype), mode,
            machines, jnp.asarray(params),
            exp_one=(exp_s == 1.0), interpret=interpret)

    @fused_c.def_vmap
    def _fused_c_vmap(axis_size, in_batched, *batched_args):
        if in_batched[6]:
            raise NotImplementedError("batched machines unsupported")
        R, args = _flatten(axis_size, in_batched[:6], batched_args[:6])
        out = fused_c(*args, batched_args[6])
        return out.reshape(axis_size, R, out.shape[-1]), True

    return fused_c
