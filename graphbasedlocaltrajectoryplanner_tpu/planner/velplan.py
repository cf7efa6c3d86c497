"""Per-action velocity planning (jitted) — TPU-native equivalent of
``OnlineTrajectoryHandler.calc_vel_profile`` (reference OTH:603-1040) built
on the fb solver kernels in ``ops/velocity.py``.

Everything operates on fixed-size padded arrays (element lengths are zero at
and beyond the true path end, making all scans no-ops there).  Dynamic
sub-ranges (delay-compensation prefix, brake prefix, reduced-horizon cut)
are realized by masking element lengths / curvatures instead of slicing, so
a single compiled kernel serves every tick.

Documented deviations from the reference (see tests/test_velplan.py):
  * when a brake prefix is active (vel_plan > vel_max), the deceleration
    segment is included in the assembled profile and the velocity-bound
    check compares against the post-brake velocity; the reference drops the
    segment (concatenating only ``vel_course``, OTH:916) and compares
    against ``vel_plan`` (OTH:907), which misaligns/fails whenever the
    prefix triggers — we implement the evident intent;
  * the follow ∧ reduced-horizon merge takes the element-wise minimum of the
    two velocity profiles; the reference's ``np.where(bp_out[5, :] < ...)``
    (OTH:923) compares a single row — again the evident intent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from graphbasedlocaltrajectoryplanner_tpu.ops import velocity as velops
from graphbasedlocaltrajectoryplanner_tpu.ops import projection as proj

# opponent brake-distance ggv (calc_vel_profile_follow.py:134)
OPP_GGV_AX = 14.0
OPP_GGV_AY = 14.0

# emergency-profile vehicle constants (calc_brake_emergency.py:4-6)
EMERG_VEH_MASS = 1160.0
EMERG_VEH_DRAGCOEFF = 0.854


@partial(jax.jit, static_argnames=("f_cap",))
def opponent_summary(glob_rl, glob_el, obj_pos, v_obj,
                     dyn_model_exp, drag_coeff, m_veh, f_cap: int = 512):
    """Opponent stopping behaviour on the global raceline
    (calc_vel_profile_follow.py:168-221).

    :param glob_rl: (F, 5) fine raceline [s, x, y, kappa, vel].
    :param glob_el: (F,) element lengths (trailing zero).
    :returns: (opp_stop_dist, roll_vel (f_cap,), roll_el (f_cap,),
               roll_cum (f_cap,) cumulative el)."""
    F = glob_rl.shape[0]
    _, (idx_a, _) = proj.get_s_coord(glob_rl[:, 1:3], obj_pos,
                                     glob_rl[:, 0], closed=True)
    roll = jnp.mod(idx_a + jnp.arange(f_cap), F - 1)
    kappa_r = glob_rl[roll, 3]
    vel_r = glob_rl[roll, 4]
    el_r = glob_el[roll]

    v_start = jnp.minimum(v_obj, vel_r[0])
    gg = jnp.stack([jnp.full((f_cap,), OPP_GGV_AX),
                    jnp.full((f_cap,), OPP_GGV_AY)], axis=1)
    v_brake = velops.calc_vel_profile_brake(kappa_r, el_r, gg, v_start,
                                            dyn_model_exp, drag_coeff, m_veh)
    opp_stop_dist = velops.stop_distance(v_brake, el_r)
    roll_cum = jnp.cumsum(el_r)
    return opp_stop_dist, vel_r, el_r, roll_cum


def _runout_velocity(roll_vel, roll_cum, target_dist):
    """Raceline velocity after the opponent travelled ``target_dist``
    (calc_vel_profile_follow.py:213-221 walk).  Comparison-sum instead of
    searchsorted (slow sequential lowering on TPU)."""
    idx = jnp.sum((roll_cum < target_dist).astype(jnp.int32)) + 1
    idx = jnp.clip(idx, 0, roll_vel.shape[0] - 1)
    return jnp.where(target_dist <= 0.0, roll_vel[0], roll_vel[idx])


@partial(jax.jit, static_argnames=("control_type", "filt_window",
                                   "vp_backend"))
def velocity_kernel(path,            # (P, 5) x, y, psi, kappa, el (cut @ pos)
                    n_valid,         # scalar int32 — valid points
                    gg,              # (P, 2) local gg (unscaled)
                    vel_course,      # (P,) padded delay-compensation course
                    c_len,           # scalar int32 — true vel_course length
                    vel_plan, vel_est, vel_max, gg_scale, old_gg_scale,
                    machines,        # (M, 2) [v, ax]
                    v_max_offset,
                    is_follow,       # bool — follow-mode profile requested
                    red_len,         # bool — reduced planning horizon
                    v_end_rl,        # raceline end velocity (normal branch)
                    obj_dist, v_obj, safety_d,
                    opp_stop_dist, roll_vel, roll_cum,
                    veh_length,
                    ctrl_cp, ctrl_kd, ctrl_kp, ctrl_tanw,
                    dyn_model_exp, drag_coeff, m_veh,
                    control_type: str = "PD",
                    filt_window: int = 1,
                    vp_backend: str = "fb"):
    """Full per-action velocity profile (OTH:736-941).

    :param vp_backend: "fb" (forward-backward solver) or "sqp" (ADMM QP,
        ops/qp.py) for the normal-branch profile — the reference's
        ``vp_type`` seam (ltpl_config_online.ini VP section,
        OTH:124-156).  Follow mode always uses the fb-based follow law.
    :returns: dict(traj (P, 7) [s x y psi kappa vx ax], vel_bound bool,
                   too_close bool)
    """
    P = path.shape[0]
    idx = jnp.arange(P)
    kappa = path[:, 3]
    el = path[:, 4]
    s = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(el[:-1])])
    gg_s = gg * gg_scale
    ctrl = {"c_p": ctrl_cp, "k_d": ctrl_kd, "k_p": ctrl_kp, "tan_w": ctrl_tanw}

    # ---- brake prefix to a lowered v_max (VpForwardBackward:86-139) -------
    vel_idx = c_len
    prefix_active = vel_plan > (vel_max + 0.1)
    el_pref = jnp.where(idx < vel_idx, 0.0, el)
    v_decel = velops.calc_vel_profile_brake(kappa, el_pref, gg * old_gg_scale,
                                            vel_plan, dyn_model_exp,
                                            drag_coeff, m_veh)
    reach = v_decel <= vel_max
    first_reach = jnp.argmax(reach)
    first_reach = jnp.where(reach[first_reach], first_reach, P - 1)
    pref_idx = jnp.where(prefix_active, jnp.maximum(first_reach, vel_idx),
                         vel_idx)
    vel_start = jnp.where(prefix_active, v_decel[pref_idx], vel_plan)

    # masked views representing "the profile from pref_idx onward"
    kappa_m = jnp.where(idx < pref_idx, 0.0, kappa)
    el_m = jnp.where(idx < pref_idx, 0.0, el)

    # ---- follow profile (calc_vel_profile_follow) -------------------------
    (vx_follow, too_close, follow_bound, follow_v_control,
     follow_control_d) = velops.calc_vel_profile_follow(
        kappa_m, el_m, gg_s, machines,
        v_start=vel_start, v_ego=vel_est, v_obj=v_obj, v_max=vel_max,
        safety_d=safety_d, veh_length=veh_length, obj_dist=obj_dist,
        opp_stop_dist=opp_stop_dist,
        # opponent run-out velocity where the local path ends (the follow
        # solver's own s starts at pref_idx, hence the inner end distance)
        opp_vel_at=_runout_velocity(
            roll_vel, roll_cum,
            opp_stop_dist - ((obj_dist - (safety_d + veh_length)
                              + opp_stop_dist)
                             - (s[jnp.clip(n_valid - 1, 0, P - 1)] - s[pref_idx]))),
        control_params=ctrl, control_type=control_type,
        dyn_model_exp=dyn_model_exp, drag_coeff=drag_coeff, m_veh=m_veh)

    # ---- normal profile (OTH:832-903) -------------------------------------
    spl_len = s[jnp.clip(n_valid - 1, 0, P - 1)]
    cum = jnp.cumsum(el[:-1])
    below = cum < (spl_len - 5.0)
    v_idx_red = jnp.argmin(below) + 1          # first idx reaching last 5 m
    v_idx_red = jnp.where((v_idx_red == 1) & (n_valid > 1), n_valid, v_idx_red)
    v_idx = jnp.where(red_len, v_idx_red, n_valid)
    v_end = jnp.where(red_len, 0.0, v_end_rl)

    kappa_n = kappa_m
    el_n = jnp.where(idx >= v_idx - 1, 0.0, el_m)
    if vp_backend == "sqp":
        from graphbasedlocaltrajectoryplanner_tpu.ops.qp import qp_vel_profile
        vx_normal, _ = qp_vel_profile(
            kappa_n, el_n, gg_s, machines, vel_max, vel_start, v_end=v_end,
            end_idx=v_idx, drag_coeff=drag_coeff, m_veh=m_veh,
            pin_idx=pref_idx)
    else:
        vx_normal = velops.calc_vel_profile_fb(
            kappa_n, el_n, gg_s, machines, vel_max, vel_start, v_end=v_end,
            dyn_model_exp=dyn_model_exp, drag_coeff=drag_coeff, m_veh=m_veh,
            end_idx=v_idx)
    # zeros beyond the (possibly reduced) profile end (OTH:900-903)
    vx_normal = jnp.where(idx >= v_idx, 0.0, vx_normal)
    # degenerate range -> all-zero profile (OTH:897-898)
    degenerate = (v_idx - pref_idx) <= 1
    vx_normal = jnp.where(degenerate, 0.0, vx_normal)

    normal_bound = jnp.abs(vx_normal[pref_idx] - vel_start) < v_max_offset
    normal_bound = jnp.where(degenerate, False, normal_bound)

    # ---- select / merge (OTH:918-923) -------------------------------------
    use_normal = ~is_follow
    use_merge = is_follow & red_len
    vx_branch = jnp.where(use_normal, vx_normal,
                          jnp.where(use_merge,
                                    jnp.minimum(vx_follow, vx_normal),
                                    vx_follow))
    vel_bound = jnp.where(use_normal, normal_bound, follow_bound)

    # ---- assemble: vel_course + decel prefix + branch profile -------------
    vx_full = jnp.where(idx < vel_idx, vel_course,
                        jnp.where(idx < pref_idx, v_decel, vx_branch))

    # ---- smoothing + acceleration (OTH:925-941) ---------------------------
    vx_f = velops.conv_filt(vx_full, filt_window)
    ax = velops.calc_ax_profile(vx_f, el)
    stationary = jnp.isclose(vx_f[:-1], 0.0) & jnp.isclose(ax, 0.0) \
        & (idx[:-1] < n_valid - 1)
    ax = jnp.where(stationary, -5.0, ax)
    ax_f = jnp.concatenate([ax, jnp.zeros((1,))])

    traj = jnp.column_stack([s, path[:, 0], path[:, 1], path[:, 2],
                             path[:, 3], vx_f, ax_f])
    return dict(traj=traj, vel_bound=vel_bound, too_close=too_close,
                pref_idx=pref_idx, vel_start=vel_start,
                follow_v_control=follow_v_control,
                follow_control_d=follow_control_d)


@jax.jit
def brake_on_backup_kernel(path,          # (P, 5) backup path cut at position
                           n_valid,
                           gg,            # (P, 2) unscaled
                           vel_course,    # (P,) padded
                           c_len,
                           vel_plan,
                           dyn_model_exp, drag_coeff, m_veh):
    """Recursive-infeasibility fallback: full deceleration on the backup
    path (OTH:950-1006 + VpForwardBackward.calc_vel_brake_em — no gg scale).
    """
    P = path.shape[0]
    idx = jnp.arange(P)
    kappa = path[:, 3]
    el = path[:, 4]
    el_m = jnp.where(idx < c_len, 0.0, el)
    vx = velops.calc_vel_profile_brake(kappa, el_m, gg, vel_plan,
                                       dyn_model_exp, drag_coeff, m_veh)
    vx_full = jnp.where(idx < c_len, vel_course, vx)
    ax = velops.calc_ax_profile(vx_full, el)
    stationary = jnp.isclose(vx_full[:-1], 0.0) & jnp.isclose(ax, 0.0) \
        & (idx[:-1] < n_valid - 1)
    ax = jnp.where(stationary, -5.0, ax)
    ax_f = jnp.concatenate([ax, jnp.zeros((1,))])
    s = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(el[:-1])])
    return jnp.column_stack([s, path[:, 0], path[:, 1], path[:, 2],
                             path[:, 3], vx_full, ax_f])


@jax.jit
def emergency_kernel(traj,       # (P, 7) s x y psi kappa vx ax
                     gg):        # (P, 2) local gg (unscaled)
    """Emergency brake-to-stop profile on an existing trajectory
    (calc_brake_emergency.py:9-47; hardcoded 1160 kg / 0.854 drag)."""
    el = jnp.diff(traj[:, 0])
    el = jnp.concatenate([el, jnp.zeros((1,))])
    v_brake = velops.calc_vel_profile_brake(
        traj[:, 4], el, gg, traj[0, 5], 1.0,
        EMERG_VEH_DRAGCOEFF, EMERG_VEH_MASS)
    a_brake = velops.calc_ax_profile(v_brake, el)
    a_brake = jnp.concatenate([a_brake, jnp.zeros((1,))])
    return jnp.column_stack([traj[:, 0:5], v_brake, a_brake])
