"""Data logging + replay validation round trip (full facade drive)."""

import os

import numpy as np
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import make_oval_track
from graphbasedlocaltrajectoryplanner_tpu.models import lattice as latmod
from graphbasedlocaltrajectoryplanner_tpu.utils.config import OfflineConfig
from graphbasedlocaltrajectoryplanner_tpu.utils.logging import (DataLogger,
                                                                read_data_log)
from graphbasedlocaltrajectoryplanner_tpu.utils.replay import replay_validate

pytestmark = pytest.mark.slow


def test_log_roundtrip_and_replay(tmp_path):
    gt = make_oval_track()
    lat = latmod.build_lattice(gt, OfflineConfig(), md5_params="log")

    # drive a few ticks through the handler while logging
    from graphbasedlocaltrajectoryplanner_tpu.planner.handler import OnlineHandler
    from graphbasedlocaltrajectoryplanner_tpu.utils.config import OnlineConfig
    from graphbasedlocaltrajectoryplanner_tpu.testing_tools.vdc_dummy import vdc_dummy
    from graphbasedlocaltrajectoryplanner_tpu.planner import hostmath

    oth = OnlineHandler(lat, OnlineConfig())
    refline = gt.refline
    pos = refline[0, :]
    heading = float(np.arctan2(refline[1, 1] - refline[0, 1],
                               refline[1, 0] - refline[0, 0]) - np.pi / 2)
    oth.set_initial_pose(pos, heading, 0.0, max_heading_offset=0.8)

    log_path = str(tmp_path / "run_data.csv")
    logger = DataLogger("oval-test", log_path)

    traj_set = None
    vel = 0.0
    for tick in range(15):
        oth.update_objects([], [])
        path_dict, start_node, node_list, const_seg = \
            oth.calc_paths("straight", 0)
        if traj_set is not None:
            t = traj_set["straight"][0]
            pos, vel = vdc_dummy(pos, t[:, 0], t[:, 1:3], t[:, 5], 0.1)
        cp, cl, vp_, vc, ap = oth.get_ref_idx("straight", 0, pos)
        traj_set, ids, stamp, _ = oth.calc_vel_profile(
            cut_index_pos=cp, cut_layer=cl, vel_plan=vp_, acc_plan=ap,
            vel_course=vc, vel_est=vel, vel_max=70.0,
            ax_max_machines=np.array([[0.0, 5.0], [100.0, 5.0]]),
            safety_d=30.0, gg_scale=1.0, local_gg=(5.0, 5.0))
        s_ego = hostmath.get_s_coord(np.asarray(lat.raceline), tuple(pos),
                                     np.asarray(lat.s_rl), closed=True)[0]
        s_list = {k: [t[:, 0] for t in v] for k, v in traj_set.items()}
        pos_list = {k: [t[:, 1:3] for t in v] for k, v in traj_set.items()}
        vel_list = {k: [t[:, 5] for t in v] for k, v in traj_set.items()}
        logger.log_onlinegraph(
            time_stamp=stamp, s_coord=s_ego, start_node=start_node,
            obj_veh=[], obj_zone=[], nodes_list=node_list, s_list=s_list,
            pos_list=pos_list, vel_list=vel_list, a_list=vel_list,
            psi_list=vel_list, kappa_list=vel_list, traj_id=ids,
            clip_pos=list(pos), action_id_prev="straight", traj_id_prev=0,
            const_path_seg=const_seg)

    rows = read_data_log(log_path)
    assert len(rows) == 15
    assert rows[3]["start_node"] is not None
    assert "straight" in rows[3]["nodes_list"]

    rep = replay_validate(log_path, lat)
    assert rep.ticks == 15
    assert rep.actions_checked > 0
    assert rep.ok, rep.details           # no invalid edges in logged chains
    # optimum re-check: mismatches possible only via w_last discounting
    assert rep.node_mismatches <= rep.actions_checked

    # ---- gate: a corrupted chain that w_last discounting cannot explain
    # must FAIL the run (VERDICT round-1 item 10) -------------------------
    import graphbasedlocaltrajectoryplanner_tpu.utils.replay as replay_mod
    ev = np.asarray(lat.edge_valid)
    L = lat.L
    tampered = None
    for row in rows[5:]:
        chain = row["nodes_list"]["straight"][0]
        clean = [c for c in chain if c[0] is not None]
        k = clean.index([int(row["start_node"][0]),
                         int(row["start_node"][1])])
        # pick an interior suffix node beyond the w_last window and shift it
        # to another node that keeps both adjacent edges valid
        for off in range(4, len(clean) - 1 - k):
            i = clean.index(clean[k + off])
            la_prev, na_prev = clean[i - 1]
            la, na = clean[i]
            lb, nb = clean[i + 1]
            for cand in range(int(np.asarray(lat.nodes_in_layer)[la])):
                if cand != na and ev[la_prev % L, na_prev, cand] \
                        and ev[la % L, cand, nb]:
                    chain[chain.index([la, na])] = [la, cand]
                    tampered = True
                    break
            if tampered:
                break
        if tampered:
            break
    assert tampered, "could not construct a tampered chain"
    real_reader = replay_mod.read_data_log
    replay_mod.read_data_log = lambda p: rows
    try:
        rep2 = replay_validate(log_path, lat)
    finally:
        replay_mod.read_data_log = real_reader
    assert rep2.node_mismatch_failures >= 1, rep2.details
    assert not rep2.ok


def test_msg_log_and_tick_badge(tmp_path):
    """Viewer-side message ingestion + per-tick validation badge
    (visualize_graph_log.py:455-460, 209-234)."""
    from graphbasedlocaltrajectoryplanner_tpu.visualization.log_viewer import (
        read_msg_log, messages_near, tick_badge)

    msg = tmp_path / "run_msg.csv"
    msg.write_text("time;type;message\n"
                   "100.0;INFO;started\n"
                   "100.45;WARNING;One trajectory generation; took long\n"
                   "103.0;CRITICAL;track blocked\n")
    msgs = read_msg_log(str(msg))
    assert len(msgs) == 3
    assert msgs[1][1] == "WARNING"
    assert msgs[1][2] == "One trajectory generation; took long"  # ; kept
    near = messages_near(msgs, 100.2)
    assert [m[1] for m in near] == ["INFO", "WARNING"]
    assert messages_near(msgs, 200.0) == []

    # badge: a clean logged tick validates green
    gt = make_oval_track()
    lat = latmod.build_lattice(gt, OfflineConfig(), md5_params="log")
    from graphbasedlocaltrajectoryplanner_tpu.planner.handler import (
        OnlineHandler)
    from graphbasedlocaltrajectoryplanner_tpu.utils.config import OnlineConfig
    oth = OnlineHandler(lat, OnlineConfig())
    refline = gt.refline
    heading = float(np.arctan2(refline[1, 1] - refline[0, 1],
                               refline[1, 0] - refline[0, 0]) - np.pi / 2)
    oth.set_initial_pose(refline[0, :], heading, 0.0, max_heading_offset=0.8)
    oth.update_objects([], [])
    _, start_node, node_list, _ = oth.calc_paths("straight", 0)
    row = dict(time=0.0, start_node=list(start_node), obj_veh=[],
               nodes_list={k: [[list(x) for x in c] for c in v]
                           for k, v in node_list.items()})
    badge, color = tick_badge(lat, row)
    assert color in ("green", "darkorange"), (badge, color)
