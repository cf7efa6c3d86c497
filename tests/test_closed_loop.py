"""Closed-loop integration: full facade driving the oval track with the
ideal-controller dummy (the TPU build's equivalent of running
main_min_example.py — SURVEY.md section 4 point 1)."""

import configparser
import os

import numpy as np
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import make_oval_track
from graphbasedlocaltrajectoryplanner_tpu.models import lattice as latmod
from graphbasedlocaltrajectoryplanner_tpu.utils.config import (OfflineConfig,
                                                               OnlineConfig)
from graphbasedlocaltrajectoryplanner_tpu.planner.handler import OnlineHandler
from graphbasedlocaltrajectoryplanner_tpu.planner import objects as objmod
from graphbasedlocaltrajectoryplanner_tpu.testing_tools.vdc_dummy import vdc_dummy

pytestmark = pytest.mark.slow


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


def _drive(lat, gt, n_ticks, object_list_fn=None, zones=None,
           sel_priority=("right", "left", "straight", "follow"),
           iter_time=0.1):
    """Run the handler loop like main_min_example.py:80-107 with a fixed
    simulated tick time.  Returns per-tick dicts for inspection."""
    oth = OnlineHandler(lat, OnlineConfig())
    obj_if = objmod.ObjectListInterface()
    obj_if.set_track_data(np.asarray(lat.refline), np.asarray(lat.normvec),
                          np.asarray(lat.track_width_left),
                          np.asarray(lat.track_width_right))

    pos, heading = _start_pose(gt)
    ok = oth.set_initial_pose(pos, heading, 0.0, max_heading_offset=0.8)
    assert ok == (True, True)

    traj_set = {"straight": None}
    vel = 0.0
    history = []
    obj_zone = []
    for tick in range(n_ticks):
        for sel_action in sel_priority:
            if sel_action in traj_set:
                break
        obj_list = object_list_fn(tick) if object_list_fn else []
        obj_veh = obj_if.process_object_list(obj_list)
        if zones is not None:
            for zid, zdata in zones.items():
                obj_zone = obj_if.update_zone(zid, zdata, zone_type="nodes")
        oth.update_objects(obj_veh, obj_zone)
        oth.calc_paths(action_id_sel=sel_action, idx_sel_traj=0)
        if traj_set[sel_action] is not None:
            traj = traj_set[sel_action][0]
            pos, vel = vdc_dummy(pos, traj[:, 0], traj[:, 1:3], traj[:, 5],
                                 iter_time)
        cut_pos, cut_layer, vel_plan, vel_course, acc_plan = \
            oth.get_ref_idx(sel_action, 0, pos)
        traj_set = oth.calc_vel_profile(
            cut_index_pos=cut_pos, cut_layer=cut_layer, vel_plan=vel_plan,
            acc_plan=acc_plan, vel_course=vel_course, vel_est=vel,
            vel_max=70.0, ax_max_machines=np.array([[0.0, 5.0], [100.0, 5.0]]),
            safety_d=30.0, gg_scale=1.0, local_gg=(5.0, 5.0))[0]
        assert traj_set, f"no action available at tick {tick}"
        history.append(dict(pos=np.array(pos), vel=vel, actions=set(traj_set),
                            sel=sel_action,
                            traj=traj_set[next(iter(traj_set))][0]))
    return history


def test_free_track_lap(oval):
    gt, lat = oval
    hist = _drive(lat, gt, n_ticks=60)
    # vehicle moves and accelerates
    dist = np.linalg.norm(hist[-1]["pos"] - hist[0]["pos"])
    assert hist[-1]["vel"] > 10.0
    # every tick only 'straight' was offered (no objects)
    assert all(h["actions"] == {"straight"} for h in hist)
    # the vehicle stays within track bounds
    refline = np.asarray(lat.refline)
    normvec = np.asarray(lat.normvec)
    wr = np.asarray(lat.track_width_right)
    wl = np.asarray(lat.track_width_left)
    for h in hist[1:]:
        d2 = np.sum((refline - h["pos"]) ** 2, axis=1)
        i = int(np.argmin(d2))
        lateral = (h["pos"] - refline[i]) @ normvec[i]
        assert -wl[i] - 1.0 <= lateral <= wr[i] + 1.0
    # trajectories respect the velocity/lat-acc limits
    for h in hist[5:]:
        t = h["traj"]
        ay = t[:, 5] ** 2 * np.abs(t[:, 4])
        assert np.all(ay <= 5.0 * 1.05 + 0.2)
        assert np.all(t[:, 5] <= 70.0 + 0.1)


def test_static_obstacle_produces_action_set(oval):
    gt, lat = oval
    raceline = np.asarray(lat.raceline)
    # static object on the raceline ~150 m ahead of start
    s_rl = np.asarray(lat.s_rl)
    li = int(np.argmin(np.abs(s_rl - 150.0)))
    obj = {"X": float(raceline[li, 0]), "Y": float(raceline[li, 1]),
           "theta": 0.0, "type": "physical", "id": 1, "length": 5.0,
           "v": 0.0}
    hist = _drive(lat, gt, n_ticks=25, object_list_fn=lambda tick: [obj])
    # once the object enters the horizon, overtake options appear
    assert any({"left", "right"} & h["actions"] for h in hist), \
        [h["actions"] for h in hist]
    assert any("follow" in h["actions"] for h in hist)


def test_zone_blocks_region(oval):
    gt, lat = oval
    # block the left half of layers 6-8 via a node zone
    layers, nodes = [], []
    nil = np.asarray(lat.nodes_in_layer)
    for l in (6, 7, 8):
        for n in range(int(nil[l]) // 2):
            layers.append(l)
            nodes.append(n)
    zones = {"z1": [layers, nodes, np.zeros((2, 2)), np.zeros((2, 2))]}
    hist = _drive(lat, gt, n_ticks=12, zones=zones)
    # planned trajectories avoid the blocked node positions
    blocked_pos = np.asarray(lat.node_pos)[np.array(layers), np.array(nodes)]
    for h in hist[2:8]:
        t = h["traj"]
        d = np.linalg.norm(t[None, :, 1:3] - blocked_pos[:, None, :], axis=-1)
        assert d.min() > 0.4, d.min()


def test_emergency_trajectory(oval):
    gt, lat = oval
    oth = OnlineHandler(lat, OnlineConfig())
    pos, heading = _start_pose(gt)
    oth.set_initial_pose(pos, heading, 15.0, max_heading_offset=0.8)
    oth.update_objects([], [])
    oth.calc_paths("straight", 0)
    cut_pos, cut_layer, vel_plan, vel_course, acc_plan = \
        oth.get_ref_idx("straight", 0, pos)
    traj_set, ids, _, _ = oth.calc_vel_profile(
        cut_index_pos=cut_pos, cut_layer=cut_layer, vel_plan=vel_plan,
        acc_plan=acc_plan, vel_course=vel_course, vel_est=15.0, vel_max=70.0,
        ax_max_machines=np.array([[0.0, 5.0], [100.0, 5.0]]), safety_d=30.0,
        gg_scale=1.0, local_gg=(5.0, 5.0), incl_emerg_traj=True)
    assert "emergency" in traj_set
    em = traj_set["emergency"][0]
    # monotone braking to stop
    assert np.all(np.diff(em[:, 5]) <= 1e-5)
    assert em[-1, 5] < 1.0
    assert ids["emergency"] == ids[next(iter(ids))]


def test_sqp_velocity_planner_drive(oval):
    """vp_type='sqp' (ADMM QP backend) drives the loop end to end."""
    gt, lat = oval
    from graphbasedlocaltrajectoryplanner_tpu.utils.config import OnlineConfig
    from graphbasedlocaltrajectoryplanner_tpu.planner.handler import OnlineHandler
    oth = OnlineHandler(lat, OnlineConfig(vp_type="sqp"))
    pos, heading = _start_pose(gt)
    oth.set_initial_pose(pos, heading, 10.0, max_heading_offset=0.8)
    oth.update_objects([], [])
    traj_set = None
    vel = 10.0
    for tick in range(8):
        oth.calc_paths("straight", 0)
        if traj_set is not None:
            t = traj_set["straight"][0]
            pos, vel = vdc_dummy(pos, t[:, 0], t[:, 1:3], t[:, 5], 0.1)
        cp, cl, vp_, vc, ap = oth.get_ref_idx("straight", 0, pos)
        traj_set = oth.calc_vel_profile(
            cut_index_pos=cp, cut_layer=cl, vel_plan=vp_, acc_plan=ap,
            vel_course=vc, vel_est=vel, vel_max=70.0,
            ax_max_machines=np.array([[0.0, 5.0], [100.0, 5.0]]),
            safety_d=30.0, gg_scale=1.0, local_gg=(5.0, 5.0))[0]
        assert "straight" in traj_set
    t = traj_set["straight"][0]
    ay = t[:, 5] ** 2 * np.abs(t[:, 4])
    assert np.all(ay <= 5.0 * 1.1 + 0.2)
    assert vel > 10.0  # accelerating on the straight
