"""Standard example: dynamic opponent + blocked zone + logging (the TPU
build's counterpart of the reference's main_std_example.py).

Usage:
    python examples/main_std_example.py --track <path-to-csv> [--ticks 300]
                                        [--visual]
"""

import argparse
import datetime
import os
import sys
import time

import numpy as np

TOP = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, TOP)

from graphbasedlocaltrajectoryplanner_tpu.planner.facade import GraphLTPL
from graphbasedlocaltrajectoryplanner_tpu.models.track import import_globtraj_csv
from graphbasedlocaltrajectoryplanner_tpu.testing_tools.vdc_dummy import vdc_dummy
from graphbasedlocaltrajectoryplanner_tpu.testing_tools.objectlist_dummy import (
    ObjectlistDummy)
from graphbasedlocaltrajectoryplanner_tpu.utils.veh_dyn import import_veh_dyn_info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--track", required=True,
                    help="path to a 12-column LTPL track CSV")
    ap.add_argument("--ticks", type=int, default=300)
    ap.add_argument("--visual", action="store_true")
    ap.add_argument("--zone", action="store_true",
                    help="activate a sample blocked zone (layers 20-22)")
    ap.add_argument("--veh-dyn",
                    default=TOP + "/inputs/veh_dyn_info/ax_max_machines.csv",
                    help="machine acceleration limit table (csv)")
    args = ap.parse_args()

    ax_max_machines = import_veh_dyn_info(
        ax_max_machines_import_path=args.veh_dyn)[1]

    path_dict = {
        "globtraj_input_path": args.track,
        "graph_store_path": TOP + "/artifacts/stored_graph_std.npz",
        "ltpl_offline_param_path": TOP + "/params/ltpl_config_offline.ini",
        "ltpl_online_param_path": TOP + "/params/ltpl_config_online.ini",
        "log_path": TOP + "/logs/graph_ltpl/",
        "graph_log_id": datetime.datetime.now().strftime("%Y_%m_%d__%H_%M_%S"),
    }

    ltpl = GraphLTPL(path_dict, visual_mode=args.visual, log_to_file=True)
    ltpl.graph_init()

    gt = import_globtraj_csv(args.track)
    refline = gt.refline
    pos_est = refline[0, :]
    heading_est = float(np.arctan2(refline[1, 1] - refline[0, 1],
                                   refline[1, 0] - refline[0, 0]) - np.pi / 2)
    ltpl.set_startpos(pos_est=pos_est, heading_est=heading_est)

    obj_dummy = ObjectlistDummy(dynamic=True, vel_scale=0.3, s0=250.0,
                                globtraj=gt)

    zones = None
    if args.zone:
        # block half the nodes of three mid-track layers
        lat = ltpl.lattice
        nil = np.asarray(lat.nodes_in_layer)
        layers, nodes = [], []
        for l in (20, 21, 22):
            for n in range(int(nil[l]) // 2):
                layers.append(l)
                nodes.append(n)
        zones = {"sample_zone": [layers, nodes,
                                 np.zeros((2, 2)), np.zeros((2, 2))]}

    traj_set = {"straight": None}
    tic = time.time()
    for tick in range(args.ticks):
        for sel_action in ["right", "left", "straight", "follow"]:
            if sel_action in traj_set:
                break
        obj_list = obj_dummy.get_objectlist()
        ltpl.calc_paths(prev_action_id=sel_action, object_list=obj_list,
                        blocked_zones=zones)
        if traj_set[sel_action] is not None:
            pos_est, vel_est = vdc_dummy(
                pos_est, traj_set[sel_action][0][:, 0],
                traj_set[sel_action][0][:, 1:3],
                traj_set[sel_action][0][:, 5], time.time() - tic)
        else:
            vel_est = 0.0
        tic = time.time()
        traj_set = ltpl.calc_vel_profile(pos_est=pos_est, vel_est=vel_est,
                                         ax_max_machines=ax_max_machines,
                                         incl_emerg_traj=True)[0]
        ltpl.log()
        ltpl.visual()
        if tick % 20 == 0:
            print(f"tick {tick:4d}  action={sel_action:8s}  "
                  f"v={vel_est:5.1f} m/s  set={sorted(traj_set)}")
    print("done — logs in", path_dict["log_path"])


if __name__ == "__main__":
    main()
