import numpy as np


def _ax_tires(v, kappa_abs, ax_max, ay_max, dyn_model_exp):
    ay_used = v * v * kappa_abs
    frac = np.clip(ay_used / max(ay_max, 1e-9), 0.0, 1.0)
    radicand = max(1.0 - frac ** dyn_model_exp, 0.0)
    return ax_max * radicand ** (1.0 / dyn_model_exp)


def calc_vel_profile(ax_max_machines, kappa, el_lengths, closed,
                     drag_coeff, m_veh, ggv=None, loc_gg=None,
                     v_max=None, dyn_model_exp=1.0, mu=None,
                     v_start=None, v_end=None, filt_window=None):
    """Forward-backward friction-circle velocity solver (tph
    calc_vel_profile, unclosed branch as invoked by the reference:
    VpForwardBackward.py:213-225, calc_vel_profile_follow.py:268-307).

    Physics model identical to the TPU framework's
    ops/velocity.calc_vel_profile_fb: pointwise lateral-limit seed, forward
    pass min(tire, machine-interp) accel minus drag, backward two-step
    conservative-refinement decel plus drag.
    """
    assert not closed, "parity shim implements the unclosed branch only"
    kappa = np.asarray(kappa, float)
    el = np.asarray(el_lengths, float)
    P = kappa.shape[0]
    if loc_gg is not None:
        loc_gg = np.asarray(loc_gg, float)
        ax_gg = loc_gg[:, 0]
        ay_gg = loc_gg[:, 1]
    else:
        ggv = np.asarray(ggv, float)
        # velocity-dependent gg handled per step below; seed with max ay
        ax_gg = None
        ay_gg = None
    mach = np.asarray(ax_max_machines, float)
    kappa_abs = np.abs(kappa)

    def gg_at(i, v):
        if ax_gg is not None:
            return ax_gg[i], ay_gg[i]
        return (np.interp(v, ggv[:, 0], ggv[:, 1]),
                np.interp(v, ggv[:, 0], ggv[:, 2]))

    # pointwise lateral-limit velocity
    v0 = np.empty(P)
    for i in range(P):
        ay_i = ay_gg[i] if ay_gg is not None else np.max(ggv[:, 2])
        v0[i] = np.sqrt(ay_i / max(kappa_abs[i], 1e-9))
    if v_max is not None:
        v0 = np.minimum(v0, v_max)
    if v_end is not None:
        v0[-1] = min(v0[-1], v_end)
    v0[0] = min(v0[0], v_start)

    # forward pass
    v = v0.copy()
    for i in range(P - 1):
        axm, aym = gg_at(i, v[i])
        a_t = _ax_tires(v[i], kappa_abs[i], axm, aym, dyn_model_exp)
        a_m = np.interp(v[i], mach[:, 0], mach[:, 1])
        a = min(a_t, a_m) - v[i] * v[i] * drag_coeff / m_veh
        v[i + 1] = min(np.sqrt(max(v[i] ** 2 + 2.0 * a * el[i], 0.0)),
                       v0[i + 1])

    # backward pass (two-step conservative refinement)
    for i in range(P - 2, -1, -1):
        axm_n, aym_n = gg_at(i + 1, v[i + 1])
        a1 = _ax_tires(v[i + 1], kappa_abs[i + 1], axm_n, aym_n,
                       dyn_model_exp) + v[i + 1] ** 2 * drag_coeff / m_veh
        v_est = np.sqrt(v[i + 1] ** 2 + 2.0 * a1 * el[i])
        axm_c, aym_c = gg_at(i, v_est)
        a2 = _ax_tires(v_est, kappa_abs[i], axm_c, aym_c,
                       dyn_model_exp) + v_est ** 2 * drag_coeff / m_veh
        a = min(a1, a2)
        v[i] = min(np.sqrt(max(v[i + 1] ** 2 + 2.0 * a * el[i], 0.0)), v[i])
    return v
