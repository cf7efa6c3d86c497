"""The fused (stacked-scan) velocity_kernel must reproduce the standalone
ops solvers exactly — pins the latency optimization to the oracle math."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphbasedlocaltrajectoryplanner_tpu.ops import velocity as velops
from graphbasedlocaltrajectoryplanner_tpu.planner import velplan as vp


def _path(P=160, seed=0, n_valid=120, kappa_scale=0.01):
    rng = np.random.default_rng(seed)
    kappa = rng.normal(0.0, kappa_scale, P).astype(np.float32)
    el = np.full((P,), 2.5, np.float32)
    el[n_valid - 1:] = 0.0
    psi = np.cumsum(kappa * el).astype(np.float32)
    x = np.cumsum(el * np.cos(psi)).astype(np.float32)
    y = np.cumsum(el * np.sin(psi)).astype(np.float32)
    return np.column_stack([x, y, psi, kappa, el]).astype(np.float32)


MACHINES = np.array([[0.0, 5.0], [100.0, 5.0]], np.float32)


def _run_kernel(path, n_valid, is_follow, red_len=False, vel_plan=20.0,
                vel_max=70.0, obj_dist=80.0, v_obj=12.0, c_len=0,
                old_gg_scale=1.0):
    P = path.shape[0]
    gg = np.full((P, 2), 8.0, np.float32)
    roll_vel = np.full((512,), 15.0, np.float32)
    roll_cum = np.cumsum(np.full((512,), 3.0)).astype(np.float32)
    return vp.velocity_kernel(
        jnp.asarray(path), jnp.int32(n_valid), jnp.asarray(gg),
        jnp.zeros((P,), jnp.float32), jnp.int32(c_len),
        jnp.float32(vel_plan), jnp.float32(vel_plan), jnp.float32(vel_max),
        jnp.float32(1.0), jnp.float32(old_gg_scale), jnp.asarray(MACHINES),
        jnp.float32(0.1), bool(is_follow), bool(red_len), jnp.float32(30.0),
        jnp.float32(obj_dist), jnp.float32(v_obj), jnp.float32(30.0),
        jnp.float32(25.0), jnp.asarray(roll_vel), jnp.asarray(roll_cum),
        jnp.float32(4.7), jnp.float32(1.25), jnp.float32(0.025),
        jnp.float32(0.2), jnp.float32(15.0), 1.0, 0.85, 1000.0), gg


@pytest.mark.parametrize("seed", [0, 3])
def test_fused_normal_matches_fb_solver(seed):
    path = _path(seed=seed)
    out, gg = _run_kernel(path, 120, is_follow=False)
    vx_ref = velops.calc_vel_profile_fb(
        jnp.asarray(path[:, 3]), jnp.asarray(path[:, 4]), jnp.asarray(gg),
        jnp.asarray(MACHINES), 70.0, 20.0, v_end=30.0,
        dyn_model_exp=1.0, drag_coeff=0.85, m_veh=1000.0, end_idx=120)
    vx_ref = np.where(np.arange(path.shape[0]) >= 120, 0.0,
                      np.asarray(vx_ref))
    # compare the raw branch (pre-smoothing): reconstruct from traj by
    # re-deriving with filt_window=1 (default) -> traj vx == branch profile
    vx = np.asarray(out["traj"][:, 5])
    np.testing.assert_allclose(vx, vx_ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("obj_dist", [40.0, 120.0])
def test_fused_follow_matches_follow_solver(obj_dist):
    path = _path(seed=1)
    out, gg = _run_kernel(path, 120, is_follow=True, obj_dist=obj_dist)
    ctrl = {"c_p": 1.25, "k_d": 0.025, "k_p": 0.2, "tan_w": 15.0}
    s = np.concatenate([[0.0], np.cumsum(path[:-1, 4])])
    roll_vel = np.full((512,), 15.0, np.float32)
    roll_cum = np.cumsum(np.full((512,), 3.0)).astype(np.float32)
    opp_vel_at = vp._runout_velocity(
        jnp.asarray(roll_vel), jnp.asarray(roll_cum),
        25.0 - ((obj_dist - (30.0 + 4.7) + 25.0) - (s[119] - s[0])))
    vx_ref, too_close, bound, v_ctrl, ctrl_d = velops.calc_vel_profile_follow(
        jnp.asarray(path[:, 3]), jnp.asarray(path[:, 4]), jnp.asarray(gg),
        jnp.asarray(MACHINES), v_start=20.0, v_ego=20.0, v_obj=12.0,
        v_max=70.0, safety_d=30.0, veh_length=4.7, obj_dist=obj_dist,
        opp_stop_dist=25.0, opp_vel_at=opp_vel_at, control_params=ctrl,
        dyn_model_exp=1.0, drag_coeff=0.85, m_veh=1000.0)
    vx = np.asarray(out["traj"][:, 5])
    np.testing.assert_allclose(vx, np.asarray(vx_ref), rtol=1e-5, atol=1e-4)
    assert bool(out["too_close"]) == bool(too_close)
    assert bool(out["vel_bound"]) == bool(bound)
    np.testing.assert_allclose(float(out["follow_v_control"]),
                               float(v_ctrl), rtol=1e-6)
    np.testing.assert_allclose(float(out["follow_control_d"]),
                               float(ctrl_d), rtol=1e-6)


@pytest.mark.parametrize("vel_plan,vel_max,obj_dist,red,c_len",
                         [(20.0, 70.0, 90.0, False, 0),   # plain
                          (60.0, 30.0, 40.0, False, 0),   # brake prefix
                          (20.0, 70.0, 90.0, True, 0),    # reduced horizon
                          (20.0, 70.0, 90.0, False, 6)])  # vel-course prefix
@pytest.mark.slow
def test_scenario_stage_matches_four_kernels(vel_plan, vel_max, obj_dist,
                                             red, c_len):
    """velocity_stage_scenario (13 stacked rows) == 4x velocity_kernel."""
    import jax.numpy as jnp
    P = 160
    paths = np.stack([_path(P=P, seed=s, n_valid=110 + 5 * s)
                      for s in range(4)])
    n_valids = np.array([110, 115, 120, 125], np.int32)
    gg = np.full((P, 2), 8.0, np.float32)
    roll_vel = np.full((128,), 15.0, np.float32)
    roll_cum = np.cumsum(np.full((128,), 3.0)).astype(np.float32)
    v_end_rl = np.array([28.0, 25.0, 27.0, 26.0], np.float32)
    red_len = np.full((4,), red)
    vel_course = np.zeros((P,), np.float32)
    vel_course[:c_len] = vel_plan
    common = dict(opp_stop_dist=jnp.float32(25.0),
                  roll_vel=jnp.asarray(roll_vel),
                  roll_cum=jnp.asarray(roll_cum))

    out = vp.velocity_stage_scenario(
        jnp.asarray(paths), jnp.asarray(n_valids), jnp.asarray(gg),
        jnp.asarray(vel_course), jnp.int32(c_len),
        jnp.float32(vel_plan), jnp.float32(vel_plan), jnp.float32(vel_max),
        jnp.asarray(MACHINES), jnp.float32(0.1), jnp.asarray(v_end_rl),
        jnp.asarray(red_len),
        jnp.float32(obj_dist), jnp.float32(12.0), jnp.float32(30.0),
        common["opp_stop_dist"], common["roll_vel"], common["roll_cum"],
        jnp.float32(4.7), jnp.float32(1.25), jnp.float32(0.025),
        jnp.float32(0.2), jnp.float32(15.0), 1.0, 0.85, 1000.0,
        follow_slot=1)

    for s in range(4):
        ref = vp.velocity_kernel(
            jnp.asarray(paths[s]), jnp.int32(int(n_valids[s])),
            jnp.asarray(gg), jnp.asarray(vel_course), jnp.int32(c_len),
            jnp.float32(vel_plan), jnp.float32(vel_plan),
            jnp.float32(vel_max), jnp.float32(1.0), jnp.float32(1.0),
            jnp.asarray(MACHINES), jnp.float32(0.1), s == 1, bool(red),
            jnp.float32(v_end_rl[s]), jnp.float32(obj_dist),
            jnp.float32(12.0), jnp.float32(30.0), common["opp_stop_dist"],
            common["roll_vel"], common["roll_cum"], jnp.float32(4.7),
            jnp.float32(1.25), jnp.float32(0.025), jnp.float32(0.2),
            jnp.float32(15.0), 1.0, 0.85, 1000.0)
        got, want = np.asarray(out["trajs"][s]), np.asarray(ref["traj"])
        np.testing.assert_allclose(got[:, :6], want[:, :6],
                                   rtol=1e-5, atol=1e-4,
                                   err_msg=f"slot {s}")
        # ax = dv^2/(2 ds) amplifies f32 rounding ~ 2 v / ds
        np.testing.assert_allclose(got[:, 6], want[:, 6],
                                   rtol=1e-4, atol=2e-3,
                                   err_msg=f"slot {s} ax")
        assert bool(out["vel_bound"][s]) == bool(ref["vel_bound"]), s
        if s == 1:
            assert bool(out["too_close"]) == bool(ref["too_close"])


@pytest.mark.parametrize("red,c_len,obj_dist",
                         [(False, 0, 90.0),    # plain
                          (False, 6, 40.0),    # vel-course prefix + close
                          (True, 0, 90.0)])    # reduced horizon (merge)
@pytest.mark.slow
def test_scenario_stage_sqp_matches_kernel(red, c_len, obj_dist):
    """Fleet-scale SQP (VERDICT r3 item 2): velocity_stage_scenario with
    vp_backend='sqp' == 4x velocity_kernel SQP (batched dense ADMM over the
    slot axis must be bit-equal per-slot math)."""
    P = 160
    paths = np.stack([_path(P=P, seed=s, n_valid=110 + 5 * s)
                      for s in range(4)])
    n_valids = np.array([110, 115, 120, 125], np.int32)
    gg = np.full((P, 2), 8.0, np.float32)
    roll_vel = np.full((128,), 15.0, np.float32)
    roll_cum = np.cumsum(np.full((128,), 3.0)).astype(np.float32)
    v_end_rl = np.array([28.0, 25.0, 27.0, 26.0], np.float32)
    red_len = np.full((4,), red)
    vel_course = np.zeros((P,), np.float32)
    vel_course[:c_len] = 20.0
    tire = dict(veh_turn=jnp.float32(7.0), tire_end_idx=jnp.int32(4),
                tire_end_mps2=jnp.float32(5.5))

    out = vp.velocity_stage_scenario(
        jnp.asarray(paths), jnp.asarray(n_valids), jnp.asarray(gg),
        jnp.asarray(vel_course), jnp.int32(c_len),
        jnp.float32(20.0), jnp.float32(20.0), jnp.float32(70.0),
        jnp.asarray(MACHINES), jnp.float32(0.1), jnp.asarray(v_end_rl),
        jnp.asarray(red_len),
        jnp.float32(obj_dist), jnp.float32(12.0), jnp.float32(30.0),
        jnp.float32(25.0), jnp.asarray(roll_vel), jnp.asarray(roll_cum),
        jnp.float32(4.7), jnp.float32(1.25), jnp.float32(0.025),
        jnp.float32(0.2), jnp.float32(15.0), 1.0, 0.85, 1000.0,
        follow_slot=1, vp_backend="sqp", **tire)

    for s in range(4):
        ref = vp.velocity_kernel(
            jnp.asarray(paths[s]), jnp.int32(int(n_valids[s])),
            jnp.asarray(gg), jnp.asarray(vel_course), jnp.int32(c_len),
            jnp.float32(20.0), jnp.float32(20.0),
            jnp.float32(70.0), jnp.float32(1.0), jnp.float32(1.0),
            jnp.asarray(MACHINES), jnp.float32(0.1), s == 1, bool(red),
            jnp.float32(v_end_rl[s]), jnp.float32(obj_dist),
            jnp.float32(12.0), jnp.float32(30.0), jnp.float32(25.0),
            jnp.asarray(roll_vel), jnp.asarray(roll_cum), jnp.float32(4.7),
            jnp.float32(1.25), jnp.float32(0.025), jnp.float32(0.2),
            jnp.float32(15.0), 1.0, 0.85, 1000.0,
            vp_backend="sqp", is_overtake=(s >= 2), **tire)
        got, want = np.asarray(out["trajs"][s]), np.asarray(ref["traj"])
        np.testing.assert_allclose(got[:, :6], want[:, :6],
                                   rtol=1e-5, atol=1e-4,
                                   err_msg=f"slot {s}")
        np.testing.assert_allclose(got[:, 6], want[:, 6],
                                   rtol=1e-4, atol=2e-3,
                                   err_msg=f"slot {s} ax")
        assert bool(out["vel_bound"][s]) == bool(ref["vel_bound"]), s
        assert int(out["qp_status"][s]) == int(ref["qp_status"]), s
        np.testing.assert_allclose(np.asarray(out["vx_sqp"][s]),
                                   np.asarray(ref["vx_sqp"]),
                                   rtol=1e-5, atol=1e-4, err_msg=f"slot {s}")
    # SQP never raises too_close (VpSQP:246-247)
    assert not bool(out["too_close"])


@pytest.mark.slow
def test_scenario_stage_filt_window_matches_kernel():
    """filt_window > 1 (VERDICT r3 item 6): the batched engine must smooth
    exactly like the handler kernel instead of silently diverging."""
    P = 160
    paths = np.stack([_path(P=P, seed=s, n_valid=110 + 5 * s)
                      for s in range(4)])
    n_valids = np.array([110, 115, 120, 125], np.int32)
    gg = np.full((P, 2), 8.0, np.float32)
    roll_vel = np.full((128,), 15.0, np.float32)
    roll_cum = np.cumsum(np.full((128,), 3.0)).astype(np.float32)
    v_end_rl = np.array([28.0, 25.0, 27.0, 26.0], np.float32)

    out = vp.velocity_stage_scenario(
        jnp.asarray(paths), jnp.asarray(n_valids), jnp.asarray(gg),
        jnp.zeros((P,), jnp.float32), jnp.int32(0),
        jnp.float32(20.0), jnp.float32(20.0), jnp.float32(70.0),
        jnp.asarray(MACHINES), jnp.float32(0.1), jnp.asarray(v_end_rl),
        jnp.zeros((4,), bool),
        jnp.float32(90.0), jnp.float32(12.0), jnp.float32(30.0),
        jnp.float32(25.0), jnp.asarray(roll_vel), jnp.asarray(roll_cum),
        jnp.float32(4.7), jnp.float32(1.25), jnp.float32(0.025),
        jnp.float32(0.2), jnp.float32(15.0), 1.0, 0.85, 1000.0,
        follow_slot=1, filt_window=5)

    smoothed_any = False
    for s in range(4):
        ref = vp.velocity_kernel(
            jnp.asarray(paths[s]), jnp.int32(int(n_valids[s])),
            jnp.asarray(gg), jnp.zeros((P,), jnp.float32), jnp.int32(0),
            jnp.float32(20.0), jnp.float32(20.0),
            jnp.float32(70.0), jnp.float32(1.0), jnp.float32(1.0),
            jnp.asarray(MACHINES), jnp.float32(0.1), s == 1, False,
            jnp.float32(v_end_rl[s]), jnp.float32(90.0),
            jnp.float32(12.0), jnp.float32(30.0), jnp.float32(25.0),
            jnp.asarray(roll_vel), jnp.asarray(roll_cum), jnp.float32(4.7),
            jnp.float32(1.25), jnp.float32(0.025), jnp.float32(0.2),
            jnp.float32(15.0), 1.0, 0.85, 1000.0, filt_window=5)
        raw = vp.velocity_kernel(
            jnp.asarray(paths[s]), jnp.int32(int(n_valids[s])),
            jnp.asarray(gg), jnp.zeros((P,), jnp.float32), jnp.int32(0),
            jnp.float32(20.0), jnp.float32(20.0),
            jnp.float32(70.0), jnp.float32(1.0), jnp.float32(1.0),
            jnp.asarray(MACHINES), jnp.float32(0.1), s == 1, False,
            jnp.float32(v_end_rl[s]), jnp.float32(90.0),
            jnp.float32(12.0), jnp.float32(30.0), jnp.float32(25.0),
            jnp.asarray(roll_vel), jnp.asarray(roll_cum), jnp.float32(4.7),
            jnp.float32(1.25), jnp.float32(0.025), jnp.float32(0.2),
            jnp.float32(15.0), 1.0, 0.85, 1000.0, filt_window=1)
        got, want = np.asarray(out["trajs"][s]), np.asarray(ref["traj"])
        np.testing.assert_allclose(got[:, 5], want[:, 5],
                                   rtol=1e-5, atol=1e-4,
                                   err_msg=f"slot {s}")
        np.testing.assert_allclose(got[:, 6], want[:, 6],
                                   rtol=1e-4, atol=2e-3,
                                   err_msg=f"slot {s} ax")
        if not np.allclose(want[:, 5], np.asarray(raw["traj"][:, 5]),
                           atol=1e-6):
            smoothed_any = True
    assert smoothed_any     # window 5 really changed at least one profile


def test_fused_brake_prefix_matches(seed=2):
    """vel_plan above vel_max triggers the decel prefix; the assembled
    profile must start on the brake curve and hand off at vel_max.  Near-
    straight path so the friction circle is longitudinally available."""
    path = _path(seed=seed, kappa_scale=0.0005)
    out, gg = _run_kernel(path, 120, is_follow=False, vel_plan=60.0,
                          vel_max=30.0, old_gg_scale=1.0)
    v_decel = np.asarray(velops.calc_vel_profile_brake(
        jnp.asarray(path[:, 3]), jnp.asarray(path[:, 4]), jnp.asarray(gg),
        60.0, 1.0, 0.85, 1000.0))
    pref_idx = int(out["pref_idx"])
    vx = np.asarray(out["traj"][:, 5])
    assert pref_idx > 0
    np.testing.assert_allclose(vx[:pref_idx], v_decel[:pref_idx],
                               rtol=1e-5, atol=1e-4)
    assert abs(float(out["vel_start"]) - v_decel[pref_idx]) < 1e-4
    assert float(out["vel_start"]) <= 30.0 + 0.5
