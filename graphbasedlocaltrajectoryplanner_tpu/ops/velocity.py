"""Velocity-profile kernels (JAX) — forward-backward friction-circle solver,
brake profile, follow-mode controller, acceleration profile, smoothing.

TPU-native equivalents of tph ``calc_vel_profile`` / ``calc_vel_profile_brake``
/ ``calc_ax_profile`` / ``conv_filt`` and the repo-local follow-mode law
(reference ``graph_ltpl/helper_funcs/src/calc_vel_profile_follow.py``,
``graph_ltpl/online_graph/src/VpForwardBackward.py``).

Physics model (matches the reference's fb solver semantics):
  * local gg per point: ``loc_gg[i] = (ax_max_i, ay_max_i)`` [m/s^2]
  * friction shape ``dyn_model_exp`` in [1, 2]:
        ax_avail_tires = ax_max * (1 - min(ay_used/ay_max, 1)^exp)^(1/exp)
  * machine limit: ``ax_max_machines`` rows ``[v, ax]`` interpolated at v,
    applied only while accelerating
  * drag: ``ax_drag = -v^2 * drag_coeff / m_veh`` (reduces acceleration,
    assists braking)

All profiles operate on fixed-size padded arrays: beyond the true path end
the element lengths must be zero, which makes every scan a no-op there
(velocities simply carry through) — no dynamic shapes anywhere.

Sequential dependence note: the fwd/bwd recurrences depend on v through the
gg/machine interpolation, so they are genuine ``lax.scan``s (length <= ~160).
Throughput comes from batching (vmap over actions x trajectories x
scenarios), where each scan step processes the whole batch on the VPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-9


def _interp_sorted(x, xp, fp):
    """np.interp for sorted xp (constant extrapolation), broadcastable x."""
    return jnp.interp(x, xp, fp)


def _ax_tires(v, kappa_abs, ax_max, ay_max, dyn_model_exp):
    """Available longitudinal tire accel magnitude under lateral usage."""
    ay_used = v * v * kappa_abs
    frac = jnp.clip(ay_used / jnp.maximum(ay_max, _EPS), 0.0, 1.0)
    radicand = 1.0 - jnp.power(frac, dyn_model_exp)
    return ax_max * jnp.power(jnp.maximum(radicand, 0.0), 1.0 / dyn_model_exp)


def calc_vel_profile_fb(kappa: jnp.ndarray,
                        el_lengths: jnp.ndarray,
                        loc_gg: jnp.ndarray,
                        ax_max_machines: jnp.ndarray,
                        v_max,
                        v_start,
                        v_end=None,
                        dyn_model_exp: float = 1.0,
                        drag_coeff: float = 0.85,
                        m_veh: float = 1000.0,
                        end_idx=None):
    """Forward-backward velocity profile on an (optionally padded) path.

    Equivalent of tph ``calc_vel_profile(..., closed=False)`` as invoked by
    the reference fb planner (VpForwardBackward.py:213-225).

    :param kappa:           (P,) curvature per point.
    :param el_lengths:      (P,) distance point i -> i+1; **el_lengths[i] = 0
                            for i >= end_idx - 1** (padding no-ops).
    :param loc_gg:          (P, 2) local [ax_max, ay_max] per point.
    :param ax_max_machines: (M, 2) rows [v, ax] — machine acceleration limit.
    :param v_max:           scalar velocity cap.
    :param v_start:         scalar start velocity (profile[0] = min(...,v_start)).
    :param v_end:           optional scalar end-velocity constraint applied at
                            ``end_idx - 1`` (and into the padding).
    :param end_idx:         number of valid points (static or traced); default
                            all P points valid.
    :returns: (P,) velocity profile.
    """
    P = kappa.shape[0]
    kappa_abs = jnp.abs(kappa)
    ax_max = loc_gg[..., 0]
    ay_max = loc_gg[..., 1]

    # pointwise lateral-limit velocity
    v_lat = jnp.sqrt(ay_max / jnp.maximum(kappa_abs, _EPS))
    v0 = jnp.minimum(v_lat, v_max)

    idx = jnp.arange(P)
    if end_idx is None:
        end_idx = P
    if v_end is not None:
        # clamp the last valid point and the padding to v_end so the backward
        # pass propagates the boundary condition across zero-length padding
        v0 = jnp.where(idx >= end_idx - 1, jnp.minimum(v0, v_end), v0)
    v0 = v0.at[0].set(jnp.minimum(v0[0], v_start))

    def accel(v, k_abs, axm, aym):
        a_t = _ax_tires(v, k_abs, axm, aym, dyn_model_exp)
        a_m = _interp_sorted(v, ax_max_machines[:, 0], ax_max_machines[:, 1])
        return jnp.minimum(a_t, a_m) - v * v * drag_coeff / m_veh

    def decel(v, k_abs, axm, aym):
        a_t = _ax_tires(v, k_abs, axm, aym, dyn_model_exp)
        return a_t + v * v * drag_coeff / m_veh

    # ---- forward pass ----
    def fwd(v_prev, inp):
        k_abs, axm, aym, ds, v_lim = inp
        a = accel(v_prev, k_abs, axm, aym)
        v_next = jnp.sqrt(jnp.maximum(v_prev * v_prev + 2.0 * a * ds, 0.0))
        v = jnp.minimum(v_next, v_lim)
        return v, v

    _, v_fwd_tail = jax.lax.scan(
        fwd, v0[0],
        (kappa_abs[:-1], ax_max[:-1], ay_max[:-1], el_lengths[:-1], v0[1:]),
        unroll=8)
    v_f = jnp.concatenate([v0[:1], v_fwd_tail])

    # ---- backward pass (2-step conservative refinement like the reference
    # solver's backwards re-evaluation) ----
    def bwd(v_next, inp):
        k_abs_n, axm_n, aym_n, k_abs_c, axm_c, aym_c, ds, v_lim = inp
        a1 = decel(v_next, k_abs_n, axm_n, aym_n)
        v_est = jnp.sqrt(v_next * v_next + 2.0 * a1 * ds)
        a2 = decel(v_est, k_abs_c, axm_c, aym_c)
        a = jnp.minimum(a1, a2)
        v_prev = jnp.sqrt(jnp.maximum(v_next * v_next + 2.0 * a * ds, 0.0))
        v = jnp.minimum(v_prev, v_lim)
        return v, v

    _, v_bwd_head = jax.lax.scan(
        bwd, v_f[-1],
        (kappa_abs[1:], ax_max[1:], ay_max[1:],
         kappa_abs[:-1], ax_max[:-1], ay_max[:-1],
         el_lengths[:-1], v_f[:-1]),
        reverse=True, unroll=8)
    v = jnp.concatenate([v_bwd_head, v_f[-1:]])
    return v


def calc_vel_profile_brake(kappa: jnp.ndarray,
                           el_lengths: jnp.ndarray,
                           loc_gg: jnp.ndarray,
                           v_start,
                           dyn_model_exp: float = 1.0,
                           drag_coeff: float = 0.85,
                           m_veh: float = 1000.0):
    """Pure braking profile: decelerate as hard as the friction circle plus
    drag allow until standstill (tph ``calc_vel_profile_brake``; reference
    call sites VpForwardBackward.py:115,247, calc_vel_profile_follow.py:152,
    calc_brake_emergency.py:31).

    Shapes as in :func:`calc_vel_profile_fb`; returns (P,) velocities.
    """
    kappa_abs = jnp.abs(kappa)
    ax_max = loc_gg[..., 0]
    ay_max = loc_gg[..., 1]

    def step(v, inp):
        k_abs, axm, aym, ds = inp
        a_t = _ax_tires(v, k_abs, axm, aym, dyn_model_exp)
        a = a_t + v * v * drag_coeff / m_veh
        v_next = jnp.sqrt(jnp.maximum(v * v - 2.0 * a * ds, 0.0))
        return v_next, v_next

    _, v_tail = jax.lax.scan(
        step, jnp.asarray(v_start, kappa.dtype),
        (kappa_abs[:-1], ax_max[:-1], ay_max[:-1], el_lengths[:-1]),
        unroll=8)
    return jnp.concatenate([jnp.asarray(v_start, kappa.dtype)[None], v_tail])


# scan-pass modes for stacked_vel_scan
MODE_FWD = 0      # forward friction-circle + machine-limit acceleration
MODE_BRAKE = 1    # pure braking (friction + drag), no velocity bound
MODE_BWD = 2     # backward conservative-refinement pass (pre-flipped inputs)


def stacked_vel_scan(k1, axm1, aym1, k2, axm2, aym2, ds, v_lim, v_init, mode,
                     ax_max_machines, dyn_model_exp, drag_coeff, m_veh,
                     unroll: int = 16):
    """Run R *independent* velocity recurrences of length T in ONE
    ``lax.scan`` — the latency optimization for the velocity stage: the
    sequential scans of :func:`calc_vel_profile_fb` /
    :func:`calc_vel_profile_brake` are latency-bound on TPU (tiny per-step
    work, ~P sequential steps each), so independent passes are stacked on a
    leading batch axis instead of being issued one after the other
    (planner/velplan.velocity_kernel schedules its 8 passes as 4 stacked
    levels this way).

    All per-step arrays are (R, T); ``v_init``/``mode`` are (R,).  ``k2``/
    ``axm2``/``aym2`` are the *second* interpolation point used only by
    MODE_BWD rows (the fb solver's two-step conservative refinement) — pass
    the same arrays as k1/axm1/aym1 for other modes.  MODE_BWD rows must
    receive pre-flipped inputs (the scan always walks axis 1 forward); the
    caller flips the output back.

    :returns: (R, T + 1) velocities, column 0 = ``v_init``.

    The per-step math is identical to :func:`calc_vel_profile_fb` (fwd/bwd)
    and :func:`calc_vel_profile_brake`; computing all three candidate
    updates and selecting by ``mode`` costs 3x the (negligible) per-step
    FLOPs and removes (R-1)/R of the sequential latency.
    """
    mode = jnp.asarray(mode, jnp.int32)

    def step(v, inp):
        k1_, a1_, y1_, k2_, a2_, y2_, d_, vl_ = inp
        a_t = _ax_tires(v, k1_, a1_, y1_, dyn_model_exp)
        drag = v * v * drag_coeff / m_veh
        a_m = _interp_sorted(v, ax_max_machines[:, 0], ax_max_machines[:, 1])
        # MODE_FWD
        acc = jnp.minimum(a_t, a_m) - drag
        v_f = jnp.minimum(
            jnp.sqrt(jnp.maximum(v * v + 2.0 * acc * d_, 0.0)), vl_)
        # MODE_BRAKE
        dec = a_t + drag
        v_b = jnp.sqrt(jnp.maximum(v * v - 2.0 * dec * d_, 0.0))
        # MODE_BWD (two-step refinement, calc_vel_profile_fb bwd)
        v_est = jnp.sqrt(v * v + 2.0 * dec * d_)
        a_t2 = _ax_tires(v_est, k2_, a2_, y2_, dyn_model_exp)
        dec2 = a_t2 + v_est * v_est * drag_coeff / m_veh
        v_r = jnp.minimum(
            jnp.sqrt(jnp.maximum(v * v + 2.0 * jnp.minimum(dec, dec2) * d_,
                                 0.0)), vl_)
        v_next = jnp.where(mode == MODE_FWD, v_f,
                           jnp.where(mode == MODE_BRAKE, v_b, v_r))
        return v_next, v_next

    xs = tuple(jnp.moveaxis(a, 1, 0)
               for a in (k1, axm1, aym1, k2, axm2, aym2, ds, v_lim))
    v0 = jnp.asarray(v_init, k1.dtype)
    _, ys = jax.lax.scan(step, v0, xs, unroll=unroll)
    return jnp.concatenate([v0[None, :], ys], axis=0).T


_PALLAS_VEL = {}


def stacked_vel_scan_auto(k1, axm1, aym1, k2, axm2, aym2, ds, v_lim, v_init,
                          mode, ax_max_machines, dyn_model_exp, drag_coeff,
                          m_veh, unroll: int = 16):
    """Backend dispatch for the stacked velocity recurrences: the fused
    Pallas kernel (ops/pallas_velocity.py — rows tiled on the vector unit,
    the T-step loop entirely in VMEM) on TPU, the ``lax.scan`` formulation
    (:func:`stacked_vel_scan`) elsewhere.  Statically-known physics
    constants (the common case — they come from config) are folded into the
    kernel via the factory cache.  Identical step arithmetic; equivalence
    pinned in tests/test_pallas_velocity.py."""
    if jax.default_backend() == "tpu":
        from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_velocity \
            import make_fused_vel_scan
        try:
            key = (float(dyn_model_exp), float(drag_coeff), float(m_veh))
        except Exception:       # traced physics (non-static caller)
            key = None
        if key not in _PALLAS_VEL:
            _PALLAS_VEL[key] = make_fused_vel_scan(
                interpret=False, physics=key)
        fn = _PALLAS_VEL[key]
        args = (k1, axm1, aym1, k2, axm2, aym2, ds, v_lim,
                jnp.asarray(v_init, k1.dtype),
                jnp.asarray(mode, jnp.int32), ax_max_machines)
        if key is not None:
            return fn(*args)
        return fn(*args, dyn_model_exp, drag_coeff, m_veh)
    return stacked_vel_scan(k1, axm1, aym1, k2, axm2, aym2, ds, v_lim,
                            v_init, mode, ax_max_machines, dyn_model_exp,
                            drag_coeff, m_veh, unroll=unroll)


_PALLAS_VEL_CGG = {}


def stacked_vel_scan_cgg_auto(k1, k2, ds, v_lim, v_init, mode, machines,
                              dyn_model_exp, drag_coeff, m_veh,
                              gg_ax, gg_ay, unroll: int = 16):
    """Constant-gg backend dispatch for the stacked velocity recurrences:
    the batched engine's local gg is a config constant, so the four (R, T)
    gg streams of :func:`stacked_vel_scan_auto` collapse to two SMEM
    scalars on TPU (ops/pallas_velocity.make_fused_vel_scan_cgg — half the
    kernel input traffic); elsewhere the constants broadcast back into the
    ``lax.scan`` formulation.  All parameters must be static floats."""
    if jax.default_backend() == "tpu":
        key = (float(dyn_model_exp), float(drag_coeff), float(m_veh),
               float(gg_ax), float(gg_ay))
        if key not in _PALLAS_VEL_CGG:
            from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_velocity \
                import make_fused_vel_scan_cgg
            _PALLAS_VEL_CGG[key] = make_fused_vel_scan_cgg(
                key[:3], key[3:], interpret=False)
        return _PALLAS_VEL_CGG[key](k1, k2, ds, v_lim,
                                    jnp.asarray(v_init, k1.dtype),
                                    jnp.asarray(mode, jnp.int32), machines)
    ax = jnp.full_like(k1, gg_ax)
    ay = jnp.full_like(k1, gg_ay)
    return stacked_vel_scan(k1, ax, ay, k2, ax, ay, ds, v_lim, v_init,
                            jnp.asarray(mode, jnp.int32), machines,
                            dyn_model_exp, drag_coeff, m_veh, unroll=unroll)


def calc_vel_profile_brake_auto(kappa, el_lengths, loc_gg, v_start,
                                dyn_model_exp=1.0, drag_coeff=0.85,
                                m_veh=1000.0):
    """:func:`calc_vel_profile_brake` routed through the backend dispatch
    (one MODE_BRAKE row) so batched callers (emergency kernel, opponent
    summary) hit the fused Pallas path on TPU.  The machine-limit interp is
    inactive in brake mode; a constant dummy table is supplied."""
    _BRAKE_DUMMY_MACHINES = jnp.array([[0.0, 1.0], [1.0, 1.0]], jnp.float32)
    kappa_abs = jnp.abs(kappa)[None, :-1]
    ax_max = loc_gg[None, :-1, 0]
    ay_max = loc_gg[None, :-1, 1]
    v = stacked_vel_scan_auto(
        kappa_abs, ax_max, ay_max, kappa_abs, ax_max, ay_max,
        el_lengths[None, :-1], jnp.full_like(kappa_abs, jnp.inf),
        jnp.asarray(v_start, kappa.dtype)[None],
        jnp.full((1,), MODE_BRAKE, jnp.int32), _BRAKE_DUMMY_MACHINES,
        dyn_model_exp, drag_coeff, m_veh)
    return v[0]


def stacked_vel_scan_assoc(k1, axm1, aym1, k2, axm2, aym2, ds, v_lim, v_init,
                           mode, ax_max_machines, dyn_model_exp, drag_coeff,
                           m_veh, sweeps: int = 6):
    """Log-depth formulation of :func:`stacked_vel_scan` (SURVEY section 7
    "forward-backward associative scan"; VERDICT r2 item 2).

    The per-step recurrence of every mode is, in energy space ``E = v^2``,

        E_{t+1} = clip(E_t + c_t(v_t), 0, B_{t+1}),   B = v_lim^2

    (MODE_FWD: ``c = 2 (min(a_tires, a_machine) - a_drag) ds``; MODE_BRAKE:
    ``c = -2 (a_tires + a_drag) ds`` with no cap; MODE_BWD: ``c = 2 min(dec1,
    dec2) ds`` — exactly the update of :func:`stacked_vel_scan`).  Maps
    ``x -> clip(x + a, lo, hi)`` are closed under composition::

        g(f(x)) = clip(x + a_f + a_g, clip(lo_f + a_g, lo_g, hi_g),
                                      clip(hi_f + a_g, lo_g, hi_g))

    so for FIXED coefficients the whole chain is one
    ``jax.lax.associative_scan`` (log-depth) instead of T sequential steps.
    The velocity dependence of ``c_t`` is resolved by Picard iteration:
    each sweep evaluates the coefficients at the previous sweep's profile
    and rebuilds the prefix compositions; at the fixed point the result
    satisfies the sequential recurrence *exactly* (tolerance pinned against
    :func:`stacked_vel_scan` in tests/test_velocity.py).

    Same signature/semantics as :func:`stacked_vel_scan` plus ``sweeps``
    (static).  Work is ``sweeps``x the sequential version's FLOPs — still
    negligible — while the sequential depth drops from T to
    ``sweeps * log2(T)``, which removes the velocity stage's latency floor
    (BENCH_r02: 1792 steps x 4.2 us).
    """
    mode = jnp.asarray(mode, jnp.int32)[:, None]
    v0 = jnp.asarray(v_init, k1.dtype)
    E0 = v0 * v0                                        # (R,)
    B = jnp.where(jnp.isfinite(v_lim), v_lim * v_lim, jnp.inf)  # (R, T)
    # the sequential stacked_vel_scan never applies the v_lim cap on
    # MODE_BRAKE rows — drop it here too so a finite-v_lim brake row stays a
    # drop-in (advisor r3)
    B = jnp.where(mode == MODE_BRAKE, jnp.inf, B)

    def coeffs(v):
        """Per-step energy increment c_t at lagged from-point velocities v
        (R, T) — the same arithmetic as stacked_vel_scan.step."""
        a_t = _ax_tires(v, k1, axm1, aym1, dyn_model_exp)
        drag = v * v * drag_coeff / m_veh
        a_m = _interp_sorted(v, ax_max_machines[:, 0], ax_max_machines[:, 1])
        c_f = 2.0 * (jnp.minimum(a_t, a_m) - drag) * ds
        dec = a_t + drag
        c_b = -2.0 * dec * ds
        v_est = jnp.sqrt(v * v + 2.0 * dec * ds)
        a_t2 = _ax_tires(v_est, k2, axm2, aym2, dyn_model_exp)
        dec2 = a_t2 + v_est * v_est * drag_coeff / m_veh
        c_r = 2.0 * jnp.minimum(dec, dec2) * ds
        return jnp.where(mode == MODE_FWD, c_f,
                         jnp.where(mode == MODE_BRAKE, c_b, c_r))

    def combine(f, g):
        """Compose clip maps: g after f (scan walks left-to-right)."""
        af, lf, hf = f
        ag, lg, hg = g
        return (af + ag,
                jnp.clip(lf + ag, lg, hg),
                jnp.clip(hf + ag, lg, hg))

    # initial guess: pointwise bound (finite rows) / start velocity
    v = jnp.where(jnp.isfinite(v_lim), v_lim, v0[:, None])
    E = None
    zero = jnp.zeros_like(B)
    for _ in range(sweeps):
        c = coeffs(v)
        A, Lo, Hi = jax.lax.associative_scan(combine, (c, zero, B), axis=1)
        E = jnp.clip(E0[:, None] + A, Lo, Hi)           # (R, T) points 1..T
        v = jnp.sqrt(jnp.maximum(
            jnp.concatenate([E0[:, None], E[:, :-1]], axis=1), 0.0))
    return jnp.concatenate(
        [E0[:, None], E], axis=1) ** 0.5


def calc_ax_profile(vx_profile: jnp.ndarray, el_lengths: jnp.ndarray):
    """Acceleration implied by a velocity profile (tph ``calc_ax_profile``):
    ``ax_i = (v_{i+1}^2 - v_i^2) / (2 ds_i)``.  Zero where ``ds == 0``
    (padding).  Returns (P-1,) for (P,) inputs."""
    dv2 = vx_profile[1:] ** 2 - vx_profile[:-1] ** 2
    return jnp.where(el_lengths[:len(dv2)] > _EPS,
                     dv2 / jnp.maximum(2.0 * el_lengths[:len(dv2)], _EPS),
                     0.0)


def conv_filt(signal: jnp.ndarray, filt_window: int):
    """Unclosed moving-average filter (tph ``conv_filt(closed=False)``):
    interior points ``[half, n-half)`` averaged over the odd window; edge
    points ``i in [1, half)`` (and mirrored at the end) averaged over the
    largest centered window that fits (width ``2i+1``); the very first and
    last samples stay raw.  ``filt_window`` is static and must be odd
    (matches tph's ValueError for even windows)."""
    if filt_window <= 1:
        return signal
    w = int(filt_window)
    if w % 2 == 0:
        raise ValueError("filt_window must be odd")
    half = w // 2
    kernel = jnp.ones((w,)) / w
    mid = jnp.convolve(signal, kernel, mode='same')
    n = signal.shape[0]
    idx = jnp.arange(n)
    interior = (idx >= half) & (idx < n - half)
    out = jnp.where(interior, mid, signal)
    for i in range(1, half):
        out = out.at[i].set(jnp.mean(signal[:2 * i + 1]))
        out = out.at[n - 1 - i].set(jnp.mean(signal[n - 1 - 2 * i:]))
    return out


def follow_control_vel(control_params: dict,
                       obj_dist,
                       control_d,
                       v_obj,
                       v_ego,
                       control_type: str = "PD"):
    """Follow-mode desired velocity (reference
    calc_vel_profile_follow.py:28-75): PD or PD-with-tan control law."""
    if control_type == "PD":
        return (v_obj - control_params["k_p"] * (control_d - obj_dist)
                + control_params["k_d"] * (v_obj - v_ego))
    elif control_type == "PDtan":
        arg = jnp.clip((control_d - obj_dist) * jnp.pi / 2.0 / control_params["tan_w"],
                       -jnp.pi / 2 + 1e-5, jnp.pi / 2 - 1e-5)
        return (v_obj - jnp.tan(arg) * control_params["k_p"]
                + control_params["k_d"] * (v_obj - v_ego))
    raise ValueError(f"unsupported control type {control_type!r}")


def stop_distance(v_brake: jnp.ndarray, el_lengths: jnp.ndarray,
                  v_thresh: float = 0.1):
    """Distance travelled until a brake profile falls below ``v_thresh``
    (reference calc_vel_profile_follow.py:161-166): sum of element lengths
    while v > 0.1."""
    moving = v_brake > v_thresh
    n = el_lengths.shape[0]
    return jnp.sum(jnp.where(moving[:n], el_lengths, 0.0))


def calc_vel_profile_follow(kappa: jnp.ndarray,
                            el_lengths: jnp.ndarray,
                            loc_gg: jnp.ndarray,
                            ax_max_machines: jnp.ndarray,
                            v_start,
                            v_ego,
                            v_obj,
                            v_max,
                            safety_d,
                            veh_length,
                            obj_dist,
                            opp_stop_dist,
                            opp_vel_at,
                            control_params: dict,
                            control_type: str = "PD",
                            dyn_model_exp: float = 1.0,
                            drag_coeff: float = 0.85,
                            m_veh: float = 1000.0):
    """Follow-mode velocity profile (reference
    calc_vel_profile_follow.py:78-313), fully vectorized / jittable.

    The opponent's brake profile on the *global* raceline is summarized by
    the caller into ``opp_stop_dist`` (opponent stopping distance from its
    current position) and ``opp_vel_at(s)``-style scalar ``opp_vel_at``
    (raceline velocity at the point where the local trajectory ends relative
    to the opponent run-out) because those depend on lattice-global data; see
    ``planner/velplan.py`` for their computation.

    :returns: (vx (P,), too_close flag, vel_bound_ok flag)
    """
    P = kappa.shape[0]
    control_d = control_params["c_p"] * safety_d + veh_length
    safety_total = safety_d + veh_length
    too_close = (obj_dist - safety_total) < 0.0

    # ego braking profile + stopping distance on the local path
    v_ego_brake = calc_vel_profile_brake(kappa, el_lengths, loc_gg, v_start,
                                         dyn_model_exp, drag_coeff, m_veh)
    ego_stop_d = stop_distance(v_ego_brake, el_lengths)

    s = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(el_lengths[:-1])])
    s_stop = obj_dist - safety_total + opp_stop_dist

    # first index with s >= s_stop (reference loop :206-209); comparison-sum
    # instead of searchsorted (slow sequential lowering on TPU)
    stop_idx = jnp.clip(jnp.sum((s < s_stop).astype(jnp.int32)), 0, P - 1)

    v_end = jnp.where(s_stop > s[-1], opp_vel_at, 0.0)

    # control velocity
    v_control = follow_control_vel(control_params, obj_dist, control_d,
                                   v_obj, v_ego, control_type)
    v_control = jnp.clip(v_control, 0.0, v_max)

    # -- segment 1: decelerate to control velocity if faster ----------------
    seg1_active = (v_start > v_control) & (stop_idx >= 2)
    idx_c_raw = jnp.argmax(v_ego_brake <= v_control)
    idx_c_raw = jnp.where(v_ego_brake[idx_c_raw] <= v_control, idx_c_raw, stop_idx)
    idx_c = jnp.where(seg1_active, jnp.minimum(jnp.where(idx_c_raw == 0, stop_idx,
                                                         idx_c_raw), stop_idx), 0)
    vx_control_start = jnp.where(seg1_active, v_ego_brake[idx_c], v_start)

    # -- segment 2: standard profile capped at v_control up to stop_idx ----
    # run the fb solver on the full array but with v_max := v_control and the
    # end condition v_end applied at stop_idx; entries after stop_idx are
    # overwritten by zeros below.
    idxs = jnp.arange(P)
    el_seg2 = jnp.where(idxs < stop_idx, el_lengths, 0.0)
    # shift start: indices < idx_c belong to segment 1; make them no-ops by
    # zeroing their element lengths and pinning velocities afterwards.
    el_seg2 = jnp.where(idxs < idx_c, 0.0, el_seg2)
    v_seg2 = calc_vel_profile_fb(kappa, el_seg2, loc_gg, ax_max_machines,
                                 v_control,
                                 jnp.minimum(vx_control_start, v_control),
                                 v_end=v_end, dyn_model_exp=dyn_model_exp,
                                 drag_coeff=drag_coeff, m_veh=m_veh,
                                 end_idx=stop_idx + 1)
    # note: v_seg2[0] equals min(vx_control_start, v_control) which mirrors
    # the reference's v_start hand-off into tph.calc_vel_profile

    vel_bound_ok = jnp.abs(v_seg2[idx_c] - vx_control_start) <= 1.0
    vel_bound_ok &= ~((~seg1_active) & (stop_idx < 2))

    # assemble: seg1 brake values before idx_c, seg2 between, zeros after stop
    vx_profile = jnp.where(idxs < idx_c, v_ego_brake, v_seg2)
    vx_profile = jnp.where(idxs > stop_idx, 0.0, vx_profile)
    vel_bound_ok &= jnp.abs(vx_profile[0] - v_start) <= 1.0

    # if we cannot stop in the available distance anyway -> plain ego brake
    cannot_hold = ego_stop_d >= s_stop
    vx_profile = jnp.where(cannot_hold, v_ego_brake, vx_profile)
    vel_bound_ok = jnp.where(cannot_hold, True, vel_bound_ok)

    # intersect with the unconstrained profile (reference :296-310)
    vx_compl = calc_vel_profile_fb(kappa, el_lengths, loc_gg, ax_max_machines,
                                   v_max, v_start, v_end=None,
                                   dyn_model_exp=dyn_model_exp,
                                   drag_coeff=drag_coeff, m_veh=m_veh)
    vx_final = jnp.minimum(vx_profile, vx_compl)
    return vx_final, too_close, vel_bound_ok, v_control, control_d
