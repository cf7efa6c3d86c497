"""Unclosed (open) track support: build, prune exemptions, horizon clamping,
forced-stop tail at the track end (reference closed=False paths)."""

import numpy as np
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import GlobalTrajectory
from graphbasedlocaltrajectoryplanner_tpu.models import lattice as latmod
from graphbasedlocaltrajectoryplanner_tpu.utils.config import (OfflineConfig,
                                                               OnlineConfig)
from graphbasedlocaltrajectoryplanner_tpu.planner.handler import OnlineHandler
from graphbasedlocaltrajectoryplanner_tpu.testing_tools.vdc_dummy import vdc_dummy

pytestmark = pytest.mark.slow


def make_strip_track(n=220, length=900.0, width=12.0, v_max=50.0):
    """Open S-shaped strip (start and end far apart -> unclosed)."""
    s = np.linspace(0.0, length, n)
    x = s
    y = 25.0 * np.sin(s / 140.0)
    pts = np.column_stack([x, y])
    d = np.gradient(y, x)
    psi_tan = np.arctan2(d, np.ones_like(d))
    normvec = np.column_stack([np.sin(psi_tan), -np.cos(psi_tan)])
    el = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    el = np.append(el, el[-1])
    ddy = np.gradient(d, x)
    kappa = ddy / np.power(1 + d ** 2, 1.5)
    vel = np.minimum(v_max, np.sqrt(10.0 / np.maximum(np.abs(kappa), 1e-6)))
    return GlobalTrajectory(
        refline=pts, width_right=np.full(n, width / 2),
        width_left=np.full(n, width / 2), normvec=normvec,
        alpha=np.zeros(n), el_lengths=el, vel_rl=vel, kappa_rl=kappa)


@pytest.fixture(scope="module")
def strip():
    gt = make_strip_track()
    lat = latmod.build_lattice(gt, OfflineConfig(), md5_params="open")
    return gt, lat


def test_unclosed_detection_and_structure(strip):
    gt, lat = strip
    assert not lat.closed
    ev = np.asarray(lat.edge_valid)
    # no wrap edges out of the final layer
    assert not ev[lat.L - 1].any()
    # last layer present (force_last in variable_step_size)
    assert int(np.asarray(lat.nodes_in_layer)[lat.L - 1]) > 0
    # horizon table clamps at the final layer
    end = np.asarray(lat.end_layer_for_start)
    assert end.max() == lat.L - 1
    assert np.all(end >= np.arange(lat.L))


def test_unclosed_drive_to_end_stops(strip):
    """Driving towards the open end: reduced-horizon handling forces a stop
    tail (OTH:846-859, v_end = 0 with last-5m zeroing)."""
    gt, lat = strip
    oth = OnlineHandler(lat, OnlineConfig())
    # start ~250 m before the end
    s_rl = np.asarray(lat.s_rl)
    start_layer = int(np.argmin(np.abs(s_rl - (s_rl[-1] - 250.0))))
    pos = np.asarray(lat.raceline)[start_layer].copy()
    psi = float(np.asarray(lat.node_psi)[start_layer,
                                         int(np.asarray(lat.rl_idx)[start_layer])])
    ok = oth.set_initial_pose(pos, psi, 15.0, 0.8)
    assert ok == (True, True)
    oth.update_objects([], [])
    traj_set = None
    vel = 15.0
    for tick in range(6):
        oth.calc_paths("straight", 0)
        if traj_set is not None:
            t = traj_set["straight"][0]
            pos, vel = vdc_dummy(pos, t[:, 0], t[:, 1:3], t[:, 5], 0.2)
        cp, cl, vp_, vc, ap = oth.get_ref_idx("straight", 0, pos)
        traj_set = oth.calc_vel_profile(
            cut_index_pos=cp, cut_layer=cl, vel_plan=vp_, acc_plan=ap,
            vel_course=vc, vel_est=vel, vel_max=70.0,
            ax_max_machines=np.array([[0.0, 5.0], [100.0, 5.0]]),
            safety_d=30.0, gg_scale=1.0, local_gg=(5.0, 5.0))[0]
        assert "straight" in traj_set
    t = traj_set["straight"][0]
    # reduced horizon: profile ends at (near) standstill before the edge
    assert t[-1, 5] < 0.5
    assert bool(oth.last_red_len["straight"][0])
    # and the path never leaves the strip
    assert t[:, 1].max() <= 905.0
