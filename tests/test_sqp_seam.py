"""SQP velocity-planner seam (vp_type='sqp'): cross-tick warm start,
follow mode via QP, infeasibility-status handoff, closed-loop laps.

Reference semantics: online_graph/src/VpSQP.py (warm-start state machine
:86,213-217 / :297-340; follow vmax fill :146-181; status handoff
:238-243,415-430) wired through OnlineTrajectoryHandler.py:679-760,800-815,
880-895.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import make_oval_track
from graphbasedlocaltrajectoryplanner_tpu.models import lattice as latmod
from graphbasedlocaltrajectoryplanner_tpu.utils.config import (OfflineConfig,
                                                               OnlineConfig)
from graphbasedlocaltrajectoryplanner_tpu.planner.handler import OnlineHandler
from graphbasedlocaltrajectoryplanner_tpu.planner import objects as objmod
from graphbasedlocaltrajectoryplanner_tpu.ops import qp as qpmod
from graphbasedlocaltrajectoryplanner_tpu.testing_tools.vdc_dummy import (
    vdc_dummy)

pytestmark = pytest.mark.slow

MACHINES = np.array([[0.0, 5.0], [100.0, 5.0]])


@pytest.fixture(scope="module")
def oval():
    gt = make_oval_track()
    lat = latmod.build_lattice(gt, OfflineConfig(), md5_params="cl")
    return gt, lat


def _start_pose(gt):
    refline = gt.refline
    pos = refline[0, :].copy()
    heading = float(np.arctan2(refline[1, 1] - refline[0, 1],
                               refline[1, 0] - refline[0, 0]) - np.pi / 2)
    return pos, heading


def _drive(lat, gt, vp_type, n_ticks, object_list_fn=None,
           sel_priority=("right", "left", "straight", "follow")):
    oth = OnlineHandler(lat, OnlineConfig(vp_type=vp_type))
    obj_if = objmod.ObjectListInterface()
    obj_if.set_track_data(np.asarray(lat.refline), np.asarray(lat.normvec),
                          np.asarray(lat.track_width_left),
                          np.asarray(lat.track_width_right))
    pos, heading = _start_pose(gt)
    assert oth.set_initial_pose(pos, heading, 0.0, max_heading_offset=0.8) \
        == (True, True)
    traj_set = {"straight": None}
    vel = 0.0
    hist = []
    for tick in range(n_ticks):
        for sel in sel_priority:
            if sel in traj_set:
                break
        obj_veh = obj_if.process_object_list(
            object_list_fn(tick) if object_list_fn else [])
        oth.update_objects(obj_veh, [])
        oth.calc_paths(action_id_sel=sel, idx_sel_traj=0)
        if traj_set[sel] is not None:
            t = traj_set[sel][0]
            pos, vel = vdc_dummy(pos, t[:, 0], t[:, 1:3], t[:, 5], 0.1)
        cp, cl, vpl, vc, ap = oth.get_ref_idx(sel, 0, pos)
        traj_set = oth.calc_vel_profile(
            cut_index_pos=cp, cut_layer=cl, vel_plan=vpl, acc_plan=ap,
            vel_course=vc, vel_est=vel, vel_max=70.0,
            ax_max_machines=MACHINES, safety_d=30.0, gg_scale=1.0,
            local_gg=(5.0, 5.0))[0]
        assert traj_set, f"no action at tick {tick} (vp_type={vp_type})"
        hist.append(dict(vel=vel, actions=set(traj_set), sel=sel,
                         traj=traj_set[next(iter(traj_set))][0]))
    return oth, hist


@pytest.mark.parametrize("vp_type", ["fb", "sqp"])
def test_closed_loop_free_track(oval, vp_type):
    gt, lat = oval
    oth, hist = _drive(lat, gt, vp_type, n_ticks=30)
    assert hist[-1]["vel"] > 5.0
    assert all(h["actions"] == {"straight"} for h in hist)
    t = hist[-1]["traj"]
    ay = t[:, 5] ** 2 * np.abs(t[:, 4])
    assert np.all(ay <= 5.0 * 1.1 + 0.3)
    if vp_type == "sqp":
        # warm-start state machine populated, MPC-anchor advanced
        assert ("slr", "straight") in oth.sqp_state
        assert oth.sqp_s_glob_old is not None and oth.sqp_s_glob_old > 0.0


def test_closed_loop_follow_sqp(oval):
    """Follow mode under vp_type='sqp' (VpSQP.calc_vel_profile_follow)."""
    gt, lat = oval
    raceline = np.asarray(lat.raceline)
    s_rl = np.asarray(lat.s_rl)
    v_opp = 8.0

    def obj_list(tick):
        s = (120.0 + v_opp * 0.1 * tick) % float(s_rl[-1])
        i = int(np.argmin(np.abs(s_rl - s)))
        return [{"X": float(raceline[i, 0]), "Y": float(raceline[i, 1]),
                 "theta": 0.0, "type": "physical", "id": 1, "length": 4.7,
                 "v": v_opp}]

    oth, hist = _drive(lat, gt, "sqp", n_ticks=40, object_list_fn=obj_list,
                       sel_priority=("follow", "straight", "right", "left"))
    assert any("follow" in h["actions"] for h in hist)
    assert ("f", "follow") in oth.sqp_state          # follow-plan warm store
    # ego approaches but respects the opponent: never faster than the free-
    # run cap, and once following, planned profile near the obstacle is
    # bounded by the opponent-braking assumption (>= v_obj floor far out)
    follow_ticks = [h for h in hist if h["sel"] == "follow"]
    assert follow_ticks, [h["sel"] for h in hist]
    for h in follow_ticks[-3:]:
        assert h["vel"] <= 70.0 + 0.1
    # ego does not plough through the opponent: closing speed drops once
    # follow mode engages
    assert follow_ticks[-1]["vel"] < max(h["vel"] for h in hist) + 1e-6


def test_sqp_warm_start_shift(oval):
    """Second tick's x0 comes from the stored solution shifted by the
    travelled distance (VpSQP.py:297-340)."""
    gt, lat = oval
    oth, _ = _drive(lat, gt, "sqp", n_ticks=3)
    stored = oth.sqp_state[("slr", "straight")]
    assert stored.shape[0] == oth.P
    assert np.any(stored > 0.0)


def test_qp_status_mapping():
    assert int(qpmod.qp_solver_status(dict(r_prim=jnp.float32(1e-4)))) == 0
    assert int(qpmod.qp_solver_status(dict(r_prim=jnp.float32(2e-2)))) == 2
    assert int(qpmod.qp_solver_status(dict(r_prim=jnp.float32(0.2)))) == -3


def test_sqp_infeasible_brake_triggers_handoff():
    """A physically infeasible deceleration demand produces qp_status == -3
    (the reference's `-3 -> zero profile -> vel_bound False -> ltpl
    infeasibility path`, VpSQP.py:238-243)."""
    P = 64
    kappa = jnp.zeros((P,))
    el = jnp.full((P,), 2.5)
    gg = jnp.full((P, 2), 0.05)      # near-zero braking capability
    v, res = qpmod.qp_vel_profile(
        kappa, el, gg, jnp.asarray(MACHINES), v_max=60.0, v_start=55.0,
        v_end=1.0, end_idx=P, pin_idx=0)
    assert int(qpmod.qp_solver_status(res)) == -3


def test_qp_follow_pointwise_vmax():
    """Pointwise v_max vector caps the profile section-wise (the follow-mode
    opponent constraint, VpSQP.py:156-181)."""
    P = 80
    kappa = jnp.zeros((P,))
    el = jnp.full((P,), 2.5)
    gg = jnp.full((P, 2), 10.0)
    vmax = np.full(P, 60.0)
    vmax[40:] = 12.0                  # opponent cap beyond the safety gap
    v, res = qpmod.qp_vel_profile(
        kappa, el, gg, jnp.asarray(MACHINES), v_max=jnp.asarray(vmax),
        v_start=20.0, v_end=10.0, end_idx=P, pin_idx=0, v_max_scale=60.0)
    v = np.asarray(v)
    assert np.all(v[40:] <= 12.0 + 0.3)
    assert v[:30].max() > 20.0        # still accelerates in the free section
