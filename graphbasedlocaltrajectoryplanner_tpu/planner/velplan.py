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
from graphbasedlocaltrajectoryplanner_tpu.ops import dynshift

# opponent brake-distance ggv (calc_vel_profile_follow.py:134)
OPP_GGV_AX = 14.0
OPP_GGV_AY = 14.0

# emergency-profile vehicle constants (calc_brake_emergency.py:4-6)
EMERG_VEH_MASS = 1160.0
EMERG_VEH_DRAGCOEFF = 0.854

# opponent brake-summary window: worst case 70 m/s at the fixed 14 m/s^2
# opponent ggv stops in 175 m ~ 60 fine-raceline points (~3 m spacing) —
# 128 is ample and keeps the sequential scan short (it sits on the tick's
# latency-critical path)
F_CAP = 128


@partial(jax.jit, static_argnames=("f_cap",))
def opponent_summary(glob_rl, glob_el, obj_pos, v_obj,
                     dyn_model_exp, drag_coeff, m_veh, f_cap: int = F_CAP):
    """Opponent stopping behaviour on the global raceline
    (calc_vel_profile_follow.py:168-221).

    :param glob_rl: (F, 5) fine raceline [s, x, y, kappa, vel].
    :param glob_el: (F,) element lengths (trailing zero).
    :returns: (opp_stop_dist, roll_vel (f_cap,), roll_el (f_cap,),
               roll_cum (f_cap,) cumulative el)."""
    F = glob_rl.shape[0]
    _, (idx_a, _) = proj.get_s_coord(glob_rl[:, 1:3], obj_pos,
                                     glob_rl[:, 0], closed=True)
    # contiguous wrap-around window via block-select + barrel shift —
    # both an (f_cap,)-index row gather and a vmapped dynamic_slice lower
    # to while-loops/gathers on this backend (ops/dynshift.py)
    start = jnp.mod(idx_a, F - 1)
    # enough wrap copies that start (< F-1) + f_cap rows always exist — a
    # track shorter than f_cap fine-raceline points wraps multiple times
    # instead of reading zero padding (advisor r3)
    n_tiles = 1 + -(-f_cap // (F - 1))
    glob2 = jnp.concatenate(
        [jnp.concatenate([glob_rl[:F - 1, 3:5], glob_el[:F - 1, None]],
                         axis=1)] * n_tiles, axis=0)    # (n_tiles(F-1), 3)
    win = dynshift.select_window(glob2, start, f_cap)
    kappa_r = win[:, 0]
    vel_r = win[:, 1]
    el_r = win[:, 2]

    v_start = jnp.minimum(v_obj, vel_r[0])
    gg = jnp.stack([jnp.full((f_cap,), OPP_GGV_AX),
                    jnp.full((f_cap,), OPP_GGV_AY)], axis=1)
    v_brake = velops.calc_vel_profile_brake_auto(kappa_r, el_r, gg, v_start,
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




def _at1(v, i):
    """v[i] for traced scalar i without a gather (comparison-sum — per-
    scenario scalar gathers are latency-bound on this backend, ~60 ns per
    index under vmap; one fused elementwise pass is cheaper)."""
    return jnp.sum(jnp.where(jnp.arange(v.shape[-1]) == i, v, 0.0),
                   axis=-1)


def _at_rows(v, i):
    """v[r, i[r]] for a (R, T) table and (R,) traced indices, gather-free."""
    return jnp.sum(jnp.where(jnp.arange(v.shape[1])[None, :] == i[:, None],
                             v, 0.0), axis=1)


def _sqp_m_window(cols, pref_idx, l_real, m):
    """VpSQP's m-point virtual window from a padded per-point table: rows
    ``pref_idx .. pref_idx+m-1``, clamped beyond the real slice length
    ``l_real`` by repeating the last row's values (kappa/gg) and the step
    at ``l_real - 2`` for the element-length column (VpSQP.py:185-205,
    329-359 truncation/enlargement).  ``pref_idx`` is the delay-comp cut
    (<= C_PAD = 64 rows, the barrel-shift bound).

    :param cols: (P, C) table with the element length in column 1.
    :returns: (m, C).
    """
    idx_m = jnp.arange(m)
    win = dynshift.shift_rows_up(cols, pref_idx, 64)[:m]

    def row_at(j):
        j = jnp.clip(j, 0, m - 1)
        return jnp.sum(jnp.where((idx_m == j)[:, None], win, 0.0), axis=0)
    last_v = row_at(l_real - 1)
    last_e = row_at(l_real - 2)
    out = jnp.where((idx_m < l_real)[:, None], win, last_v[None, :])
    el = jnp.where(idx_m < l_real - 1, win[:, 1], last_e[1])
    return out.at[:, 1].set(el)


def _sqp_follow_vmax(m, vel_max, v_obj, obj_dist, safety_d, veh_length,
                     axc, step):
    """VpSQP's follow-mode pointwise velocity cap on the UNIFORM step grid
    (VpSQP.py:146-181): free running to the safety gap, the opponent
    braking-assumption curve beyond (closed form of the reference's Euler
    recurrence v_k = sqrt(v_{k-1}^2 - 2 a step)), one depleted sample at
    2 m/s, and the v_obj prefill for entries the reference loop leaves
    untouched (including the final grid point when no depletion occurs
    within the horizon)."""
    idx_m = jnp.arange(m)
    idx_vmax = jnp.clip(
        jnp.ceil((obj_dist - safety_d - veh_length) / step).astype(jnp.int32),
        0, m)
    j = idx_m - idx_vmax
    rt = v_obj ** 2 - 2.0 * axc * step * j.astype(jnp.float32)
    dep_j = (jnp.floor(v_obj ** 2
                       / jnp.maximum(2.0 * axc * step, 1e-9))
             .astype(jnp.int32) + 1)
    fill_n = jnp.where(dep_j <= m - 1, dep_j + 1, m - 1)
    val = jnp.where(j == 0, v_obj,
                    jnp.where(j == dep_j, 2.0,
                              jnp.sqrt(jnp.maximum(rt, 0.0))))
    tail = jnp.where((j >= 0) & (j < fill_n), val, v_obj)
    return jnp.where(idx_m < idx_vmax, vel_max, tail)


@partial(jax.jit, static_argnames=("control_type", "filt_window",
                                   "vp_backend", "dyn_model_exp", "sqp_m"))
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
                    vp_backend: str = "fb",
                    sqp_x0=None,
                    is_overtake=False,
                    veh_turn=7.0,
                    tire_end_idx=0,
                    tire_end_mps2=5.0,
                    sqp_m: int = None,
                    sqp_step=2.5):
    """Full per-action velocity profile (OTH:736-941).

    :param vp_backend: "fb" (forward-backward solver) or "sqp" (ADMM QP,
        ops/qp.py) — the reference's ``vp_type`` seam
        (ltpl_config_online.ini VP section, OTH:124-156).  The SQP path
        mirrors VpSQP.py: no brake prefix (OTH:745-760), QP-based follow
        mode with the pointwise opponent vmax (VpSQP:146-259), conservative
        tire/end-velocity assumptions (VpSQP:74-81, 361-364), solver-status
        infeasibility handoff (VpSQP:238-243, 415-430), and no velocity
        smoothing (OTH:927-933).
    :param sqp_x0: (P,) cross-tick warm-start guess (SQP only; the handler
        maintains the MPC-shifted per-action state, VpSQP.py:86,213-217).
    :param is_overtake: left/right action — inaccurate SQP solutions are
        zeroed (removed) rather than kept (VpSQP.py:419-426).
    :param sqp_m: the SQP planner's fixed horizon length in points — the
        reference's ``nmbr_export_points`` (ltpl_config_online.ini EXPORT):
        VpSQP truncates longer profiles to m and pads shorter ones by
        repeating the last curvature / step length (VpSQP:185-205,329-359),
        solves the m-point virtual window with the conservative terminal
        velocity at index m-1, and zero-fills beyond.  None solves the full
        padded array (legacy round-3 behavior, unit-test shapes).
    :param sqp_step: the uniform spline step size [m] (offline
        ``stepsize_approx``) used by the reference's follow-mode opponent
        vmax fill (VpSQP:148-176 indexes the gap on the uniform grid, not
        on the actual element lengths).
    :returns: dict(traj (P, 7) [s x y psi kappa vx ax], vel_bound bool,
                   too_close bool; SQP adds vx_sqp (P,) raw profile for the
                   warm-start store and qp_status int32)
    """
    P = path.shape[0]
    idx = jnp.arange(P)
    kappa = path[:, 3]
    el = path[:, 4]
    s = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(el[:-1])])
    gg_s = gg * gg_scale
    ctrl = {"c_p": ctrl_cp, "k_d": ctrl_kd, "k_p": ctrl_kp, "tan_w": ctrl_tanw}
    INF = jnp.full((P - 1,), jnp.inf)
    kabs = jnp.abs(kappa)

    # The 8 sequential solver passes (brake prefix; follow's ego-brake +
    # seg2 fwd/bwd + unconstrained fwd/bwd; normal fwd/bwd) are scheduled as
    # 4 dependency levels of ONE stacked scan each (stacked_vel_scan) — the
    # passes are latency-bound, so independent ones run side by side.

    def _lvl(rows, mode):
        k1, a1, y1, k2, a2, y2, d_, vl, vi = [jnp.stack(x) for x in
                                              zip(*rows)]
        return velops.stacked_vel_scan_auto(
            k1, a1, y1, k2, a2, y2, d_, vl, vi, jnp.asarray(mode, jnp.int32),
            machines, dyn_model_exp, drag_coeff, m_veh)

    def _brake_row(k_abs, g, e, v0):
        z = k_abs[:-1]
        return (z, g[:-1, 0], g[:-1, 1], z, g[:-1, 0], g[:-1, 1],
                e[:-1], INF, v0)

    def _fwd_row(k_abs, g, e, v_bound, v0):
        # v_bound is the pointwise limit incl. v_end clamp; v0 the pinned
        # start (calc_vel_profile_fb's v0 construction)
        z = k_abs[:-1]
        return (z, g[:-1, 0], g[:-1, 1], z, g[:-1, 0], g[:-1, 1],
                e[:-1], v_bound[1:], jnp.minimum(v_bound[0], v0))

    def _bwd_row(k_abs, g, e, v_f):
        # pre-flipped inputs for the reverse refinement pass
        return (jnp.flip(k_abs[1:]), jnp.flip(g[1:, 0]), jnp.flip(g[1:, 1]),
                jnp.flip(k_abs[:-1]), jnp.flip(g[:-1, 0]),
                jnp.flip(g[:-1, 1]), jnp.flip(e[:-1]), jnp.flip(v_f[:-1]),
                v_f[-1])

    # ---- level 0: brake prefix to a lowered v_max (VpForwardBackward:86-139)
    vel_idx = c_len
    prefix_active = vel_plan > (vel_max + 0.1)
    el_pref = jnp.where(idx < vel_idx, 0.0, el)
    gg_old = gg * old_gg_scale
    v_decel = _lvl([_brake_row(kabs, gg_old, el_pref, vel_plan)],
                   [velops.MODE_BRAKE])[0]
    reach = v_decel <= vel_max
    first_reach = jnp.argmax(reach)
    first_reach = jnp.where(reach[first_reach], first_reach, P - 1)
    pref_idx = jnp.where(prefix_active, jnp.maximum(first_reach, vel_idx),
                         vel_idx)
    vel_start = jnp.where(prefix_active, v_decel[pref_idx], vel_plan)
    if vp_backend == "sqp":
        # the reference computes no brake prefix for the SQP planner —
        # profile starts at the delay-compensation index from vel_plan
        # (OTH:745-760)
        pref_idx = vel_idx
        vel_start = vel_plan

    # masked views representing "the profile from pref_idx onward"
    kappa_m = jnp.where(idx < pref_idx, 0.0, kappa)
    kabs_m = jnp.abs(kappa_m)
    el_m = jnp.where(idx < pref_idx, 0.0, el)

    # ---- follow-mode scalars (calc_vel_profile_follow.py:78-245) ----------
    follow_control_d = ctrl_cp * safety_d + veh_length
    safety_total = safety_d + veh_length
    too_close = (obj_dist - safety_total) < 0.0
    s_f = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(el_m[:-1])])
    s_stop = obj_dist - safety_total + opp_stop_dist
    stop_idx = jnp.clip(jnp.sum((s_f < s_stop).astype(jnp.int32)), 0, P - 1)
    opp_vel_at = _runout_velocity(
        roll_vel, roll_cum,
        opp_stop_dist - ((obj_dist - safety_total + opp_stop_dist)
                         - (s[jnp.clip(n_valid - 1, 0, P - 1)] - s[pref_idx])))
    v_end_f = jnp.where(s_stop > s_f[-1], opp_vel_at, 0.0)
    follow_v_control = jnp.clip(
        velops.follow_control_vel(ctrl, obj_dist, follow_control_d,
                                  v_obj, vel_est, control_type),
        0.0, vel_max)

    # ---- normal-branch bounds (OTH:832-903) --------------------------------
    spl_len = s[jnp.clip(n_valid - 1, 0, P - 1)]
    cum = jnp.cumsum(el[:-1])
    below = cum < (spl_len - 5.0)
    v_idx_red = jnp.argmin(below) + 1          # first idx reaching last 5 m
    v_idx_red = jnp.where((v_idx_red == 1) & (n_valid > 1), n_valid, v_idx_red)
    v_idx = jnp.where(red_len, v_idx_red, n_valid)
    v_end = jnp.where(red_len, 0.0, v_end_rl)
    el_n = jnp.where(idx >= v_idx - 1, 0.0, el_m)

    v_lat = jnp.sqrt(gg_s[:, 1] / jnp.maximum(kabs_m, 1e-9))
    v0_u = jnp.minimum(v_lat, vel_max)                  # unconstrained
    v0_n = jnp.minimum(v_lat, vel_max)                  # normal
    v0_n = jnp.where(idx >= v_idx - 1, jnp.minimum(v0_n, v_end), v0_n)

    # ---- level 1: ego brake + unconstrained fwd + normal fwd --------------
    lvl1 = _lvl([_brake_row(kabs_m, gg_s, el_m, vel_start),
                 _fwd_row(kabs_m, gg_s, el_m, v0_u, vel_start),
                 _fwd_row(kabs_m, gg_s, el_n, v0_n, vel_start)],
                [velops.MODE_BRAKE, velops.MODE_FWD, velops.MODE_FWD])
    v_ego_brake, vf_u, vf_n = lvl1[0], lvl1[1], lvl1[2]
    ego_stop_d = velops.stop_distance(v_ego_brake, el_m)

    # follow segment-1 handoff (calc_vel_profile_follow.py:285-291)
    seg1_active = (vel_start > follow_v_control) & (stop_idx >= 2)
    idx_c_raw = jnp.argmax(v_ego_brake <= follow_v_control)
    idx_c_raw = jnp.where(v_ego_brake[idx_c_raw] <= follow_v_control,
                          idx_c_raw, stop_idx)
    idx_c = jnp.where(seg1_active,
                      jnp.minimum(jnp.where(idx_c_raw == 0, stop_idx,
                                            idx_c_raw), stop_idx), 0)
    vx_control_start = jnp.where(seg1_active, v_ego_brake[idx_c], vel_start)

    el_seg2 = jnp.where(idx < stop_idx, el_m, 0.0)
    el_seg2 = jnp.where(idx < idx_c, 0.0, el_seg2)
    v0_s = jnp.minimum(v_lat, follow_v_control)
    v0_s = jnp.where(idx >= stop_idx, jnp.minimum(v0_s, v_end_f), v0_s)

    # ---- level 2: seg2 fwd + unconstrained bwd + normal bwd ---------------
    lvl2 = _lvl([_fwd_row(kabs_m, gg_s, el_seg2, v0_s,
                          jnp.minimum(vx_control_start, follow_v_control)),
                 _bwd_row(kabs_m, gg_s, el_m, vf_u),
                 _bwd_row(kabs_m, gg_s, el_n, vf_n)],
                [velops.MODE_FWD, velops.MODE_BWD, velops.MODE_BWD])
    vf_s = lvl2[0]
    vx_compl = jnp.flip(lvl2[1])
    vx_normal = jnp.flip(lvl2[2])

    # ---- level 3: seg2 bwd -------------------------------------------------
    v_seg2 = jnp.flip(_lvl([_bwd_row(kabs_m, gg_s, el_seg2, vf_s)],
                           [velops.MODE_BWD])[0])

    # ---- follow assembly (calc_vel_profile_follow.py:311-330) -------------
    follow_bound = jnp.abs(v_seg2[idx_c] - vx_control_start) <= 1.0
    follow_bound &= ~((~seg1_active) & (stop_idx < 2))
    vx_follow = jnp.where(idx < idx_c, v_ego_brake, v_seg2)
    vx_follow = jnp.where(idx > stop_idx, 0.0, vx_follow)
    follow_bound &= jnp.abs(vx_follow[0] - vel_start) <= 1.0
    cannot_hold = ego_stop_d >= s_stop
    vx_follow = jnp.where(cannot_hold, v_ego_brake, vx_follow)
    follow_bound = jnp.where(cannot_hold, True, follow_bound)
    vx_follow = jnp.minimum(vx_follow, vx_compl)

    # ---- normal assembly (OTH:897-911) -------------------------------------
    qp_status = jnp.int32(0)
    vx_sqp = jnp.zeros((P,))
    if vp_backend == "sqp":
        from graphbasedlocaltrajectoryplanner_tpu.ops.qp import (
            qp_vel_profile, qp_solver_status)
        # the reference SQP solves a FIXED m-point window from the cut
        # (m = nmbr_export_points): longer slices truncate, shorter ones
        # pad by repetition, the conservative terminal velocity applies at
        # virtual index m-1 and the tire-end window covers the last
        # tire_end_idx grid points (VpSQP.py:74-81, 185-205, 329-364)
        m = P if sqp_m is None else min(sqp_m, P)
        idx_m = jnp.arange(m)
        v_end_consv = jnp.sqrt(tire_end_mps2 * veh_turn)
        x0v = (sqp_x0 if sqp_x0 is not None else jnp.full((P,), 20.0))[:m]
        in_tire_m = idx_m >= m - tire_end_idx
        # UNSCALED gg: the reference applies gg_scale only through the fb
        # planner (OTH:674-680 passes vel_max alone to VpSQP; VpSQP consumes
        # loc_gg raw) — caught by the dyn-parameter SQP golden (gg_scale
        # sweep diverged 22 m/s when gg_s leaked in here)
        cols = jnp.stack([kappa, el, gg[:, 0], gg[:, 1]], axis=1)

        # --- normal branch: window over the v_idx-cut slice --------------
        win_n = _sqp_m_window(cols, pref_idx, v_idx - pref_idx, m)
        gg_n = jnp.where(in_tire_m[:, None], tire_end_mps2, win_n[:, 2:4])
        vx_qn, res_n = qp_vel_profile(
            win_n[:, 0], win_n[:, 1], gg_n, machines, vel_max, vel_start,
            v_end=v_end_consv, end_idx=m, drag_coeff=drag_coeff,
            m_veh=m_veh, pin_idx=0, x0_v=x0v)
        st_n = qp_solver_status(res_n)
        # infeasibility / inaccuracy handoff: straight+follow zero only on
        # infeasible (-3) -> vel_bound False -> handler's backup ladder;
        # overtakes are also removed on inaccurate solves (VpSQP:415-430)
        zero_n = (st_n == -3) | (jnp.asarray(is_overtake) & (st_n == 2))
        vx_qn = jnp.where(zero_n, 0.0, vx_qn)
        # place the m-grid solution back on the padded path rows
        # (pref_idx + i); rows beyond the window zero-fill (VpSQP:438-442)
        vx_normal = dynshift.shift_rows_down(
            jnp.concatenate([vx_qn, jnp.zeros((P - m,))])[:, None],
            pref_idx, 64)[:, 0]

        # --- follow branch: window over the full-path slice, pointwise
        # opponent vmax on the uniform step grid (VpSQP:146-181) ----------
        win_f = _sqp_m_window(cols, pref_idx, n_valid - pref_idx, m)
        gg_f = jnp.where(in_tire_m[:, None], tire_end_mps2, win_f[:, 2:4])
        vmax_f = _sqp_follow_vmax(m, vel_max, v_obj, obj_dist, safety_d,
                                  veh_length, gg[0, 0], sqp_step)
        vx_qf, res_f = qp_vel_profile(
            win_f[:, 0], win_f[:, 1], gg_f, machines, vmax_f, vel_start,
            v_end=v_end_consv, end_idx=m, drag_coeff=drag_coeff,
            m_veh=m_veh, pin_idx=0, x0_v=x0v)
        st_f = qp_solver_status(res_f)
        vx_qf = jnp.where(st_f == -3, 0.0, vx_qf)
        vx_follow = dynshift.shift_rows_down(
            jnp.concatenate([vx_qf, jnp.zeros((P - m,))])[:, None],
            pref_idx, 64)[:, 0]
        # SQP follow never raises too_close (VpSQP:246-247)
        too_close = jnp.asarray(False)
        follow_bound_sqp = jnp.abs(vx_follow[pref_idx] - vel_start) \
            < v_max_offset
        qp_status = jnp.where(is_follow, st_f, st_n)
        # MPC warm-start store: the m raw grid values, then the last value
        # repeated so the handler's shift-and-fill push reads the same
        # entries the reference's x0[m-1] repetition produces
        # (VpSQP.py:320-324)
        vx_raw_m = jnp.where(is_follow, vx_qf, vx_qn)
        vx_sqp = jnp.concatenate(
            [vx_raw_m, jnp.zeros((P - m,)) + vx_raw_m[m - 1]])
    # zeros beyond the (possibly reduced) profile end (OTH:900-903)
    vx_normal = jnp.where(idx >= v_idx, 0.0, vx_normal)
    # degenerate range -> all-zero profile (OTH:897-898)
    degenerate = (v_idx - pref_idx) <= 1
    vx_normal = jnp.where(degenerate, 0.0, vx_normal)

    normal_bound = jnp.abs(vx_normal[pref_idx] - vel_start) < v_max_offset
    normal_bound = jnp.where(degenerate, False, normal_bound)
    if vp_backend == "sqp":
        follow_bound = follow_bound_sqp

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
    # the reference filters only for the fb planner (OTH:927-933)
    vx_f = (vx_full if vp_backend == "sqp"
            else velops.conv_filt(vx_full, filt_window))
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
                follow_control_d=follow_control_d,
                vx_sqp=vx_sqp, qp_status=qp_status)


@partial(jax.jit, static_argnames=("control_type", "follow_slot",
                                   "dyn_model_exp", "filt_window",
                                   "vp_backend", "sqp_m", "const_gg"))
def velocity_stage_scenario(paths,        # (4, P, 5) per-slot assembled paths
                            n_valids,     # (4,)
                            gg,           # (P, 2) shared local gg (unscaled)
                            vel_course,   # (P,) committed delay-comp course
                            c_len,        # scalar int32 — true course length
                            vel_plan, vel_est, vel_max,
                            machines, v_max_offset,
                            v_end_rl,     # (4,) per-slot raceline end velocity
                            red_len,      # (4,) bool — reduced horizon per slot
                            obj_dist, v_obj, safety_d,
                            opp_stop_dist, roll_vel, roll_cum,
                            veh_length,
                            ctrl_cp, ctrl_kd, ctrl_kp, ctrl_tanw,
                            dyn_model_exp, drag_coeff, m_veh,
                            control_type: str = "PD",
                            follow_slot: int = 1,
                            filt_window: int = 1,
                            vp_backend: str = "fb",
                            sqp_x0=None,
                            veh_turn=7.0,
                            tire_end_idx=0,
                            tire_end_mps2=5.0,
                            sqp_m: int = None,
                            sqp_step=2.5,
                            const_gg: tuple = None):
    """Slot-specialized velocity stage for the batched scenario engine —
    the same math as 4x :func:`velocity_kernel` (with
    ``gg_scale=old_gg_scale=1``) but the follow solver runs ONLY for the
    follow slot: 13 recurrence rows across the 4 stacked levels instead of
    32 (prefix x4; ego-brake/unconstrained/seg2 x1 each; normal fwd/bwd x4).
    The first ``c_len`` rows keep the committed ``vel_course`` velocities
    and replanning starts from ``vel_plan`` at row ``c_len`` (OTH delay
    compensation).  Equivalence pinned by tests/test_velplan_fused.py.

    :param vp_backend: "fb" (stacked forward-backward scans) or "sqp" —
        the reference's ``vp_type`` seam at fleet scale (VpSQP.py:224-236,
        OTH:124-156): the 4 normal-branch QPs batch over the slot axis as
        dense MXU ADMM solves (ops/qp.py) plus one pointwise-vmax follow
        QP; no brake prefix, no smoothing, too_close never raised, solver-
        status infeasibility handoff per slot (overtake slots additionally
        removed on inaccurate solves).  Per-slot equivalence with
        :func:`velocity_kernel` is pinned in tests/test_velplan_fused.py.
    :param sqp_x0: optional (4, P) cross-tick warm-start guesses (SQP
        only); None uses the reference's cold 20 m/s fill (VpSQP:64).
    :returns: dict(trajs (4, P, 7), vel_bound (4,), too_close scalar; SQP
        adds vx_sqp (4, P) raw profiles + qp_status (4,) for warm-start
        stores).
    """
    F = follow_slot
    P = paths.shape[1]
    idx = jnp.arange(P)
    kappa = paths[:, :, 3]
    el = paths[:, :, 4]                                  # (4, P)
    kabs = jnp.abs(kappa)
    INF = jnp.full((P - 1,), jnp.inf)
    ctrl = {"c_p": ctrl_cp, "k_d": ctrl_kd, "k_p": ctrl_kp, "tan_w": ctrl_tanw}

    # constant-gg fast path (the engine's local gg is a config constant):
    # the 4 per-row gg streams disappear and the Pallas kernel reads the
    # constants from SMEM — half the velocity stage's input traffic
    # (requires static physics; falls back when traced)
    use_cgg = const_gg is not None and vp_backend != "sqp"
    if use_cgg:
        try:
            phys = (float(dyn_model_exp), float(drag_coeff), float(m_veh))
        except Exception:
            use_cgg = False

    if use_cgg:
        def _lvl(rows, mode):
            k1, k2, d_, vl, vi = [jnp.stack(x) for x in zip(*rows)]
            return velops.stacked_vel_scan_cgg_auto(
                k1, k2, d_, vl, vi, jnp.asarray(mode, jnp.int32), machines,
                phys[0], phys[1], phys[2],
                float(const_gg[0]), float(const_gg[1]))

        def _brake_row(k_abs, e, v0):
            return (k_abs[:-1], k_abs[:-1], e[:-1], INF, v0)

        def _fwd_row(k_abs, e, v_bound, v0):
            return (k_abs[:-1], k_abs[:-1], e[:-1], v_bound[1:],
                    jnp.minimum(v_bound[0], v0))

        def _bwd_row(k_abs, e, v_f):
            return (jnp.flip(k_abs[1:]), jnp.flip(k_abs[:-1]),
                    jnp.flip(e[:-1]), jnp.flip(v_f[:-1]), v_f[-1])
    else:
        def _lvl(rows, mode):
            k1, a1, y1, k2, a2, y2, d_, vl, vi = [jnp.stack(x) for x in
                                                  zip(*rows)]
            return velops.stacked_vel_scan_auto(
                k1, a1, y1, k2, a2, y2, d_, vl, vi,
                jnp.asarray(mode, jnp.int32),
                machines, dyn_model_exp, drag_coeff, m_veh)

        gcol0, gcol1 = gg[:-1, 0], gg[:-1, 1]

        def _brake_row(k_abs, e, v0):
            return (k_abs[:-1], gcol0, gcol1, k_abs[:-1], gcol0, gcol1,
                    e[:-1], INF, v0)

        def _fwd_row(k_abs, e, v_bound, v0):
            return (k_abs[:-1], gcol0, gcol1, k_abs[:-1], gcol0, gcol1,
                    e[:-1], v_bound[1:], jnp.minimum(v_bound[0], v0))

        def _bwd_row(k_abs, e, v_f):
            return (jnp.flip(k_abs[1:]), jnp.flip(gg[1:, 0]),
                    jnp.flip(gg[1:, 1]),
                    jnp.flip(k_abs[:-1]), jnp.flip(gg[:-1, 0]),
                    jnp.flip(gg[:-1, 1]), jnp.flip(e[:-1]),
                    jnp.flip(v_f[:-1]), v_f[-1])

    # ---- level 0: brake prefix per slot ------------------------------------
    if vp_backend == "sqp":
        # the reference computes no brake prefix for the SQP planner
        # (OTH:745-760) — profiles start at the delay-compensation index
        v_decel = jnp.zeros((4, P))
        pref_idx = jnp.broadcast_to(jnp.asarray(c_len, jnp.int32), (4,))
        vel_start = jnp.broadcast_to(jnp.asarray(vel_plan), (4,))
    else:
        prefix_active = vel_plan > (vel_max + 0.1)
        el_pref = jnp.where(idx[None, :] < c_len, 0.0, el)  # course rows no-op
        v_decel = _lvl([_brake_row(kabs[s], el_pref[s], vel_plan)
                        for s in range(4)],
                       [velops.MODE_BRAKE] * 4)          # (4, P)
        reach = v_decel <= vel_max
        first_reach = jnp.argmax(reach, axis=1)
        first_reach = jnp.where(jnp.any(reach, axis=1), first_reach, P - 1)
        pref_idx = jnp.where(prefix_active,
                             jnp.maximum(first_reach, c_len), c_len)  # (4,)
        vel_start = jnp.where(prefix_active, _at_rows(v_decel, pref_idx),
                              vel_plan)

    kappa_m = jnp.where(idx[None, :] < pref_idx[:, None], 0.0, kappa)
    kabs_m = jnp.abs(kappa_m)
    el_m = jnp.where(idx[None, :] < pref_idx[:, None], 0.0, el)

    # ---- follow scalars (follow slot only) ---------------------------------
    s4 = jnp.concatenate([jnp.zeros((4, 1)), jnp.cumsum(el[:, :-1], axis=1)],
                         axis=1)
    control_d = ctrl_cp * safety_d + veh_length
    safety_total = safety_d + veh_length
    too_close = (obj_dist - safety_total) < 0.0
    s_f = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(el_m[F, :-1])])
    s_stop = obj_dist - safety_total + opp_stop_dist
    stop_idx = jnp.clip(jnp.sum((s_f < s_stop).astype(jnp.int32)), 0, P - 1)
    opp_vel_at = _runout_velocity(
        roll_vel, roll_cum,
        opp_stop_dist - ((obj_dist - safety_total + opp_stop_dist)
                         - (_at1(s4[F], jnp.clip(n_valids[F] - 1, 0, P - 1))
                            - _at1(s4[F], pref_idx[F]))))
    v_end_f = jnp.where(s_stop > s_f[-1], opp_vel_at, 0.0)
    v_control = jnp.clip(
        velops.follow_control_vel(ctrl, obj_dist, control_d,
                                  v_obj, vel_est, control_type),
        0.0, vel_max)

    # ---- normal bounds per slot (OTH:832-903) -------------------------------
    # reduced horizon: zero end velocity, forced over the last 5 m
    spl_len = _at_rows(s4, jnp.clip(n_valids - 1, 0, P - 1))
    cum = jnp.cumsum(el[:, :-1], axis=1)
    below = cum < (spl_len[:, None] - 5.0)
    v_idx_red = jnp.argmin(below, axis=1) + 1
    v_idx_red = jnp.where((v_idx_red == 1) & (n_valids > 1),
                          n_valids, v_idx_red)
    v_idx = jnp.where(red_len, v_idx_red, n_valids)      # (4,)
    v_end = jnp.where(red_len, 0.0, v_end_rl)            # (4,)
    el_n = jnp.where(idx[None, :] >= v_idx[:, None] - 1, 0.0, el_m)
    v_lat = jnp.sqrt(gg[None, :, 1] / jnp.maximum(kabs_m, 1e-9))  # (4, P)
    v0_n = jnp.minimum(v_lat, vel_max)
    v0_n = jnp.where(idx[None, :] >= v_idx[:, None] - 1,
                     jnp.minimum(v0_n, v_end[:, None]), v0_n)
    v0_u = jnp.minimum(v_lat[F], vel_max)

    qp_status4 = jnp.zeros((4,), jnp.int32)
    vx_sqp = jnp.zeros((4, P))
    if vp_backend == "sqp":
        # ---- batched dense MXU ADMM solves over the reference's FIXED
        # m-point window (VpSQP.py:185-205, 224-236, 329-364): the 4
        # normal-branch QPs batch over the slot axis, plus one pointwise-
        # vmax follow QP; semantics identical to velocity_kernel's SQP
        # path (pinned in tests/test_velplan_fused.py)
        from graphbasedlocaltrajectoryplanner_tpu.ops.qp import (
            qp_vel_profile, qp_solver_status)
        m = P if sqp_m is None else min(sqp_m, P)
        idx_m = jnp.arange(m)
        v_end_consv = jnp.sqrt(tire_end_mps2 * veh_turn)
        x0v = (sqp_x0 if sqp_x0 is not None
               else jnp.full((4, P), 20.0))[:, :m]
        in_tire_m = idx_m >= m - tire_end_idx
        cols4 = jnp.concatenate(
            [kappa[:, :, None], el[:, :, None],
             jnp.broadcast_to(gg[None], (4,) + gg.shape)], axis=2)

        def place_back(vx_m):
            return dynshift.shift_rows_down(
                jnp.concatenate([vx_m, jnp.zeros(vx_m.shape[:-1] + (P - m,))],
                                axis=-1)[..., None], c_len, 64)[..., 0]

        # --- ALL FIVE QPs as ONE batched solve: the 4 normal-branch slots
        # (window over the v_idx-cut slice) stacked with the follow branch
        # (full-path slice, pointwise opponent vmax) — a single vmapped
        # ADMM runs ONE 150-step scan over 5 rows instead of two scans
        # (300 sequential steps); the per-row math is unchanged (the
        # normal rows' pointwise vmax is the broadcast scalar, so
        # v_max_scale = max = vel_max exactly as the scalar form) --------
        win_n = jax.vmap(lambda c, l: _sqp_m_window(c, c_len, l, m))(
            cols4, v_idx - pref_idx)                     # (4, m, 4)
        win_f = _sqp_m_window(cols4[F], c_len, n_valids[F] - pref_idx[F], m)
        vmax_f = _sqp_follow_vmax(m, vel_max, v_obj, obj_dist, safety_d,
                                  veh_length, gg[0, 0], sqp_step)
        win5 = jnp.concatenate([win_n, win_f[None]], axis=0)  # (5, m, 4)
        gg5 = jnp.where(in_tire_m[None, :, None], tire_end_mps2,
                        win5[:, :, 2:4])
        vmax5 = jnp.concatenate(
            [jnp.full((4, m), vel_max), vmax_f[None]], axis=0)
        vstart5 = jnp.concatenate([vel_start, vel_start[F:F + 1]])
        x05 = jnp.concatenate([x0v, x0v[F:F + 1]], axis=0)
        vx5, res5 = jax.vmap(
            lambda k, e, g, vm, vs, x0: qp_vel_profile(
                k, e, g, machines, vm, vs, v_end=v_end_consv,
                end_idx=m, drag_coeff=drag_coeff, m_veh=m_veh,
                pin_idx=0, x0_v=x0))(
            win5[:, :, 0], win5[:, :, 1], gg5, vmax5, vstart5, x05)
        st5 = jax.vmap(qp_solver_status)(res5)           # (5,)
        st_n, st_f = st5[:4], st5[4]
        vx_qn, vx_qf = vx5[:4], vx5[4]
        # infeasibility / inaccuracy handoff (VpSQP:238-243, 415-430):
        # all slots zero on infeasible (-3); overtake slots additionally
        # removed on inaccurate solves (2)
        is_ot = jnp.arange(4) >= 2
        zero_n = (st_n == -3) | (is_ot & (st_n == 2))
        vx_qn = jnp.where(zero_n[:, None], 0.0, vx_qn)
        vx_normal = place_back(vx_qn)                    # (4, P)
        vx_qf = jnp.where(st_f == -3, 0.0, vx_qf)
        vx_follow = place_back(vx_qf)                    # (P,)
        follow_bound = jnp.abs(
            vx_follow[pref_idx[F]] - vel_start[F]) < v_max_offset
        # SQP follow never raises too_close (VpSQP:246-247)
        too_close = jnp.asarray(False)
        is_follow4 = jnp.arange(4) == F
        qp_status4 = jnp.where(is_follow4, st_f, st_n)
        vx_raw_m = jnp.where(is_follow4[:, None], vx_qf[None, :], vx_qn)
        # MPC warm-start store: m grid values + last-value repetition for
        # the handler's shift-and-fill push (VpSQP.py:320-324)
        vx_sqp = jnp.concatenate(
            [vx_raw_m,
             jnp.zeros((4, P - m)) + vx_raw_m[:, m - 1:m]], axis=1)
    else:
        # ---- level 1: ego brake (F) + unconstr fwd (F) + normal fwd x4 ----
        lvl1 = _lvl([_brake_row(kabs_m[F], el_m[F], vel_start[F]),
                     _fwd_row(kabs_m[F], el_m[F], v0_u, vel_start[F])]
                    + [_fwd_row(kabs_m[s], el_n[s], v0_n[s], vel_start[s])
                       for s in range(4)],
                    [velops.MODE_BRAKE, velops.MODE_FWD]
                    + [velops.MODE_FWD] * 4)
        v_ego_brake = lvl1[0]
        vf_u = lvl1[1]
        vf_n = lvl1[2:]                                  # (4, P)
        ego_stop_d = velops.stop_distance(v_ego_brake, el_m[F])

        seg1_active = (vel_start[F] > v_control) & (stop_idx >= 2)
        below_c = v_ego_brake <= v_control
        idx_c_raw = jnp.argmax(below_c)
        idx_c_raw = jnp.where(jnp.any(below_c), idx_c_raw, stop_idx)
        idx_c = jnp.where(seg1_active,
                          jnp.minimum(jnp.where(idx_c_raw == 0, stop_idx,
                                                idx_c_raw), stop_idx), 0)
        vx_control_start = jnp.where(seg1_active, _at1(v_ego_brake, idx_c),
                                     vel_start[F])

        el_seg2 = jnp.where(idx < stop_idx, el_m[F], 0.0)
        el_seg2 = jnp.where(idx < idx_c, 0.0, el_seg2)
        v0_s = jnp.minimum(v_lat[F], v_control)
        v0_s = jnp.where(idx >= stop_idx, jnp.minimum(v0_s, v_end_f), v0_s)

        # ---- level 2: seg2 fwd (F) + unconstr bwd (F) + normal bwd x4 ----
        lvl2 = _lvl([_fwd_row(kabs_m[F], el_seg2, v0_s,
                              jnp.minimum(vx_control_start, v_control)),
                     _bwd_row(kabs_m[F], el_m[F], vf_u)]
                    + [_bwd_row(kabs_m[s], el_n[s], vf_n[s])
                       for s in range(4)],
                    [velops.MODE_FWD, velops.MODE_BWD]
                    + [velops.MODE_BWD] * 4)
        vf_s = lvl2[0]
        vx_compl = jnp.flip(lvl2[1])
        vx_normal = jnp.flip(lvl2[2:], axis=1)           # (4, P)

        # ---- level 3: seg2 bwd --------------------------------------------
        v_seg2 = jnp.flip(_lvl([_bwd_row(kabs_m[F], el_seg2, vf_s)],
                               [velops.MODE_BWD])[0])

        # ---- follow assembly ----------------------------------------------
        follow_bound = jnp.abs(_at1(v_seg2, idx_c)
                               - vx_control_start) <= 1.0
        follow_bound &= ~((~seg1_active) & (stop_idx < 2))
        vx_follow = jnp.where(idx < idx_c, v_ego_brake, v_seg2)
        vx_follow = jnp.where(idx > stop_idx, 0.0, vx_follow)
        follow_bound &= jnp.abs(vx_follow[0] - vel_start[F]) <= 1.0
        cannot_hold = ego_stop_d >= s_stop
        vx_follow = jnp.where(cannot_hold, v_ego_brake, vx_follow)
        follow_bound = jnp.where(cannot_hold, True, follow_bound)
        vx_follow = jnp.minimum(vx_follow, vx_compl)

    # ---- normal assembly per slot ------------------------------------------
    vx_normal = jnp.where(idx[None, :] >= v_idx[:, None], 0.0, vx_normal)
    degenerate = (v_idx - pref_idx) <= 1                 # (4,)
    vx_normal = jnp.where(degenerate[:, None], 0.0, vx_normal)
    at_pref = _at_rows(vx_normal, pref_idx)
    normal_bound = jnp.abs(at_pref - vel_start) < v_max_offset
    normal_bound = jnp.where(degenerate, False, normal_bound)

    # ---- select per slot + prefix + smoothing -------------------------------
    # follow with reduced horizon merges with the normal profile (OTH:918-923)
    is_follow = jnp.arange(4) == F
    vx_follow_sel = jnp.where(red_len[F],
                              jnp.minimum(vx_follow, vx_normal[F]), vx_follow)
    vx_branch = jnp.where(is_follow[:, None], vx_follow_sel[None, :],
                          vx_normal)
    vel_bound = jnp.where(is_follow, follow_bound, normal_bound)
    vx_full = jnp.where(idx[None, :] < pref_idx[:, None], v_decel, vx_branch)
    vx_full = jnp.where(idx[None, :] < c_len, vel_course[None, :], vx_full)

    # moving-average smoothing, identical to the handler's fb path
    # (OTH:925-941 conv_filt; the reference filters only for the fb
    # planner, OTH:927-933) — previously hard-coded to filt_window=1
    # semantics, silently diverging from the handler for smoothing configs
    if filt_window > 1 and vp_backend != "sqp":
        vx_full = jax.vmap(lambda v: velops.conv_filt(v, filt_window))(
            vx_full)

    ax = (vx_full[:, 1:] ** 2 - vx_full[:, :-1] ** 2) \
        / jnp.maximum(2.0 * el[:, :-1], 1e-9)
    ax = jnp.where(el[:, :-1] > 1e-9, ax, 0.0)
    stationary = jnp.isclose(vx_full[:, :-1], 0.0) & jnp.isclose(ax, 0.0) \
        & (idx[None, :-1] < n_valids[:, None] - 1)
    ax = jnp.where(stationary, -5.0, ax)
    ax_f = jnp.concatenate([ax, jnp.zeros((4, 1))], axis=1)

    trajs = jnp.stack([s4, paths[:, :, 0], paths[:, :, 1], paths[:, :, 2],
                       paths[:, :, 3], vx_full, ax_f], axis=2)
    return dict(trajs=trajs, vel_bound=vel_bound, too_close=too_close,
                vx_sqp=vx_sqp, qp_status=qp_status4)


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
    vx = velops.calc_vel_profile_brake_auto(kappa, el_m, gg, vel_plan,
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


@partial(jax.jit, static_argnames=("sqp_m",))
def brake_em_sqp_kernel(path,          # (P, 5) backup path cut at position
                        n_valid,
                        gg,            # (P, 2) unscaled
                        vel_course,    # (P,) padded
                        c_len,
                        vel_plan,
                        machines,
                        veh_turn, tire_end_mps2,
                        drag_coeff, m_veh,
                        sqp_m: int = None):
    """SQP-mode recursive-infeasibility fallback: the reference's
    ``VpSQP.calc_vel_brake_em`` (VpSQP.py:443-520) invoked by the handler's
    backup ladder (OTH:973-984) — the m-point window from the
    delay-compensation cut solved as a QP with a 1 m/s velocity cap, the
    conservative terminal velocity, and a linear-deceleration initial
    guess; no smoothing (OTH:985-991).  The fb ladder uses
    :func:`brake_on_backup_kernel` instead."""
    from graphbasedlocaltrajectoryplanner_tpu.ops.qp import qp_vel_profile
    P = path.shape[0]
    idx = jnp.arange(P)
    kappa = path[:, 3]
    el = path[:, 4]
    m = P if sqp_m is None else min(sqp_m, P)
    idx_m = jnp.arange(m)
    cols = jnp.stack([kappa, el, gg[:, 0], gg[:, 1]], axis=1)
    win = _sqp_m_window(cols, c_len, n_valid - c_len, m)
    v_end_consv = jnp.sqrt(tire_end_mps2 * veh_turn)
    # linear v_start -> 1 m/s deceleration guess (VpSQP:496-498)
    x0 = vel_plan + idx_m.astype(jnp.float32) * (1.0 - vel_plan) / m
    vx_m, _ = qp_vel_profile(
        win[:, 0], win[:, 1], win[:, 2:4], machines, jnp.ones((m,)),
        vel_plan, v_end=v_end_consv, end_idx=m, drag_coeff=drag_coeff,
        m_veh=m_veh, pin_idx=0, x0_v=x0)
    vx_full = dynshift.shift_rows_down(
        jnp.concatenate([vx_m, jnp.zeros((P - m,))])[:, None],
        c_len, 64)[:, 0]
    vx_full = jnp.where(idx < c_len, vel_course, vx_full)
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
    v_brake = velops.calc_vel_profile_brake_auto(
        traj[:, 4], el, gg, traj[0, 5], 1.0,
        EMERG_VEH_DRAGCOEFF, EMERG_VEH_MASS)
    a_brake = velops.calc_ax_profile(v_brake, el)
    a_brake = jnp.concatenate([a_brake, jnp.zeros((1,))])
    return jnp.column_stack([traj[:, 0:5], v_brake, a_brake])
