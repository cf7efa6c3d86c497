import numpy as np


def _ax_tires(v, kappa_abs, ax_max, ay_max, dyn_model_exp):
    ay_used = v * v * kappa_abs
    frac = np.clip(ay_used / max(ay_max, 1e-9), 0.0, 1.0)
    radicand = max(1.0 - frac ** dyn_model_exp, 0.0)
    return ax_max * radicand ** (1.0 / dyn_model_exp)


def calc_vel_profile_brake(kappa, el_lengths, v_start,
                           ggv=None, loc_gg=None, dyn_model_exp=1.0,
                           drag_coeff=0.85, m_veh=1000.0, mu=None):
    """Pure braking profile (tph calc_vel_profile_brake): decelerate as hard
    as the friction circle plus drag allow until standstill.  Accepts either
    a pointwise loc_gg (P,2) or a velocity-dependent ggv (M,3) table
    (reference opponent model, calc_vel_profile_follow.py:185-192).

    Physics identical to ops/velocity.calc_vel_profile_brake.
    """
    kappa = np.asarray(kappa, float)
    el = np.asarray(el_lengths, float)
    P = kappa.shape[0]
    kappa_abs = np.abs(kappa)
    if loc_gg is not None:
        loc_gg = np.asarray(loc_gg, float)
    else:
        ggv = np.asarray(ggv, float)

    v = np.zeros(P)
    v[0] = v_start
    for i in range(min(P - 1, el.shape[0])):
        if loc_gg is not None:
            axm, aym = loc_gg[i, 0], loc_gg[i, 1]
        else:
            axm = np.interp(v[i], ggv[:, 0], ggv[:, 1])
            aym = np.interp(v[i], ggv[:, 0], ggv[:, 2])
        a_t = _ax_tires(v[i], kappa_abs[i], axm, aym, dyn_model_exp)
        a = a_t + v[i] * v[i] * drag_coeff / m_veh
        v[i + 1] = np.sqrt(max(v[i] ** 2 - 2.0 * a * el[i], 0.0))
    return v
