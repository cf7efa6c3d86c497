"""Minimal example: offline lattice + closed-loop driving on a track without
objects or logging (the TPU build's counterpart of the reference's
main_min_example.py).

Usage:
    python examples/main_min_example.py [--track oval|<path-to-csv>]
                                        [--ticks 200] [--visual]

With ``--track oval`` (default from params/driving_task.ini) the built-in
synthetic track is used, so no data files are required.  Any reference-format
12-column LTPL CSV can be passed instead.
"""

import argparse
import os
import sys
import time

import numpy as np

TOP = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, TOP)

from graphbasedlocaltrajectoryplanner_tpu.planner.facade import GraphLTPL
from graphbasedlocaltrajectoryplanner_tpu.models.track import (
    import_globtraj_csv, make_oval_track)
from graphbasedlocaltrajectoryplanner_tpu.utils.config import read_track_name
from graphbasedlocaltrajectoryplanner_tpu.testing_tools.vdc_dummy import vdc_dummy


def resolve_track(track: str):
    """Return (globtraj, csv_path_or_None)."""
    if track == "oval":
        return make_oval_track(), None
    if os.path.isfile(track):
        return import_globtraj_csv(track), track
    raise SystemExit(f"unknown track {track!r} (not 'oval', not a file)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--track", default=None)
    ap.add_argument("--ticks", type=int, default=200)
    ap.add_argument("--visual", action="store_true")
    args = ap.parse_args()

    track = args.track or read_track_name(TOP + "/params/driving_task.ini")
    gt, csv_path = resolve_track(track)

    path_dict = {
        "globtraj_input_path": csv_path or "oval",
        "graph_store_path": TOP + "/artifacts/stored_graph.npz",
        "ltpl_offline_param_path": TOP + "/params/ltpl_config_offline.ini",
        "ltpl_online_param_path": TOP + "/params/ltpl_config_online.ini",
    }

    # "oval" (and GlobalTrajectory instances) are first-class inputs of the
    # facade — the lattice builder caches synthetic tracks by data hash just
    # like CSV tracks (models/lattice.load_or_build).
    ltpl = GraphLTPL(path_dict, visual_mode=args.visual, log_to_file=False)
    ltpl.graph_init()

    # start pose from the first reference-line point
    refline = gt.refline
    pos_est = refline[0, :]
    heading_est = float(np.arctan2(refline[1, 1] - refline[0, 1],
                                   refline[1, 0] - refline[0, 0]) - np.pi / 2)
    ltpl.set_startpos(pos_est=pos_est, heading_est=heading_est)

    traj_set = {"straight": None}
    tic = time.time()
    lap_times = []
    for tick in range(args.ticks):
        for sel_action in ["right", "left", "straight", "follow"]:
            if sel_action in traj_set:
                break
        ltpl.calc_paths(prev_action_id=sel_action, object_list=[])
        if traj_set[sel_action] is not None:
            pos_est, vel_est = vdc_dummy(
                pos_est, traj_set[sel_action][0][:, 0],
                traj_set[sel_action][0][:, 1:3],
                traj_set[sel_action][0][:, 5], time.time() - tic)
        else:
            vel_est = 0.0
        tic = time.time()
        traj_set = ltpl.calc_vel_profile(pos_est=pos_est, vel_est=vel_est)[0]
        ltpl.visual()
        if tick % 20 == 0:
            print(f"tick {tick:4d}  action={sel_action:8s}  "
                  f"v={vel_est:5.1f} m/s  set={sorted(traj_set)}")
    print("done.")


if __name__ == "__main__":
    main()
