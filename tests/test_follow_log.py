"""Follow-mode controller logging (reference hook
calc_vel_profile_follow.py:241-245; channel format consumed by
visualize_graph_log.py:397-448) and the viewer's follow-debug figure."""

import logging
import os

import matplotlib
matplotlib.use("Agg")

import numpy as np
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import make_oval_track
from graphbasedlocaltrajectoryplanner_tpu.models import lattice as latmod
from graphbasedlocaltrajectoryplanner_tpu.utils.config import (OfflineConfig,
                                                               OnlineConfig)
from graphbasedlocaltrajectoryplanner_tpu.planner.handler import OnlineHandler
from graphbasedlocaltrajectoryplanner_tpu.planner import objects as objmod
from graphbasedlocaltrajectoryplanner_tpu.testing_tools.vdc_dummy import vdc_dummy
from graphbasedlocaltrajectoryplanner_tpu.visualization.log_viewer import (
    plot_follow_debug)

pytestmark = pytest.mark.slow

HEADER = "time;obj_dist;control_dist;v_control;v_target;v_ego\n"


def _register_follow_logger(path):
    """Mirror the facade's wiring (planner/facade.py)."""
    with open(path, "w") as fh:
        fh.write(HEADER)
    flog = logging.getLogger("follow_mode_logger")
    for h in list(flog.handlers):
        flog.removeHandler(h)
        h.close()
    fh_f = logging.FileHandler(path)
    fh_f.setFormatter(logging.Formatter("%(message)s"))
    flog.addHandler(fh_f)
    flog.setLevel(logging.INFO)
    flog.propagate = False
    return flog


def _silence_follow_logger():
    flog = logging.getLogger("follow_mode_logger")
    for h in list(flog.handlers):
        flog.removeHandler(h)
        h.close()


@pytest.fixture(scope="module")
def oval():
    gt = make_oval_track()
    lat = latmod.build_lattice(gt, OfflineConfig(), md5_params="flw")
    return gt, lat


def _drive_behind_slow_opponent(lat, gt, n_ticks):
    oth = OnlineHandler(lat, OnlineConfig())
    obj_if = objmod.ObjectListInterface()
    obj_if.set_track_data(np.asarray(lat.refline), np.asarray(lat.normvec),
                          np.asarray(lat.track_width_left),
                          np.asarray(lat.track_width_right))
    refline = gt.refline
    pos = refline[0, :].copy()
    heading = float(np.arctan2(refline[1, 1] - refline[0, 1],
                               refline[1, 0] - refline[0, 0]) - np.pi / 2)
    assert oth.set_initial_pose(pos, heading, 0.0,
                                max_heading_offset=0.8) == (True, True)

    raceline = np.asarray(lat.raceline)
    s_rl = np.asarray(lat.s_rl)
    li = int(np.argmin(np.abs(s_rl - 150.0)))
    obj = {"X": float(raceline[li, 0]), "Y": float(raceline[li, 1]),
           "theta": 0.0, "type": "physical", "id": 1, "length": 5.0,
           "v": 0.0}

    traj_set = {"straight": None}
    vel = 0.0
    for tick in range(n_ticks):
        # prefer follow once available so the controller row is the pursued
        # action's (like a behavior planner staying behind the opponent)
        for sel_action in ("follow", "straight", "right", "left"):
            if sel_action in traj_set:
                break
        obj_veh = obj_if.process_object_list([obj])
        oth.update_objects(obj_veh, [])
        oth.calc_paths(action_id_sel=sel_action, idx_sel_traj=0)
        if traj_set[sel_action] is not None:
            t = traj_set[sel_action][0]
            pos, vel = vdc_dummy(pos, t[:, 0], t[:, 1:3], t[:, 5], 0.1)
        cp, cl, vp_, vc, ap = oth.get_ref_idx(sel_action, 0, pos)
        traj_set = oth.calc_vel_profile(
            cut_index_pos=cp, cut_layer=cl, vel_plan=vp_, acc_plan=ap,
            vel_course=vc, vel_est=vel, vel_max=70.0,
            ax_max_machines=np.array([[0.0, 5.0], [100.0, 5.0]]),
            safety_d=30.0, gg_scale=1.0, local_gg=(5.0, 5.0))[0]
        assert traj_set


def test_follow_rows_written(oval, tmp_path):
    gt, lat = oval
    fpath = str(tmp_path / "run_follow.csv")
    _register_follow_logger(fpath)
    try:
        _drive_behind_slow_opponent(lat, gt, n_ticks=25)
    finally:
        _silence_follow_logger()

    data = np.genfromtxt(fpath, delimiter=";", names=True)
    data = np.atleast_1d(data)
    assert data.size > 0, "no follow-mode rows were logged"
    assert set(data.dtype.names) == {"time", "obj_dist", "control_dist",
                                     "v_control", "v_target", "v_ego"}
    # opponent is stationary -> v_target == 0; control distance is the
    # configured c_p * safety_d + veh_length
    assert np.allclose(data["v_target"], 0.0)
    cfg = OnlineConfig()
    expect_cd = cfg.control_params["c_p"] * 30.0 + lat.veh_length
    assert np.allclose(data["control_dist"], expect_cd, atol=1e-3)
    assert np.all(data["v_control"] >= 0.0)
    assert np.all(np.diff(data["time"]) >= 0.0)
    # object distance decreases as the ego closes in on the stopped car
    assert data["obj_dist"][-1] < data["obj_dist"][0]

    fig = plot_follow_debug(fpath)
    assert fig is not None
    assert len(fig.axes) == 2


def test_follow_debug_gap_split(tmp_path):
    """Rows >1 s apart render as separate segments (NaN gap)."""
    p = tmp_path / "gap_follow.csv"
    rows = [HEADER]
    for t in (0.0, 0.1, 0.2, 5.0, 5.1):
        rows.append(f"{t};50.0;42.2;10.0;8.0;9.0\n")
    p.write_text("".join(rows))
    fig = plot_follow_debug(str(p))
    line = fig.axes[0].lines[0]
    ydata = np.asarray(line.get_ydata(), float)
    assert np.isnan(ydata).sum() == 1


def test_facade_creates_follow_channel(tmp_path):
    """GraphLTPL.__init__ with log_follow_mode=true creates *_follow.csv and
    registers the logger; log_to_file=False silences it again."""
    from graphbasedlocaltrajectoryplanner_tpu.planner.facade import GraphLTPL
    TOP = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path_dict = {
        "globtraj_input_path": "unused.csv",
        "graph_store_path": str(tmp_path / "g.npz"),
        "ltpl_offline_param_path": TOP + "/params/ltpl_config_offline.ini",
        "ltpl_online_param_path": TOP + "/params/ltpl_config_online.ini",
        "log_path": str(tmp_path / "logs") + "/",
        "graph_log_id": "t0",
    }
    ltpl = GraphLTPL(path_dict, visual_mode=False, log_to_file=True)
    fpath = ltpl._path_dict["graph_log_follow_path"]
    assert os.path.isfile(fpath)
    assert open(fpath).readline() == HEADER
    flog = logging.getLogger("follow_mode_logger")
    assert flog.handlers
    flog.info("1.0;2.0;3.0;4.0;5.0;6.0")
    for h in flog.handlers:
        h.flush()
    assert open(fpath).read().count(";") == 10  # header + one row

    GraphLTPL(dict(path_dict), visual_mode=False, log_to_file=False)
    assert not flog.handlers
