"""All-tracks validation: build the lattice and drive a short closed loop on
every shipped reference track (reference `inputs/traj_ltpl_cl/*.csv`,
`params/driving_task.ini` track_specifier options).

The reference is only ever demonstrated on one track at a time
(`main_std_example.py`); this tool substantiates multi-track support by
running the full stack — offline build, set_startpos, per-tick
calc_paths/calc_vel_profile with a dynamic opponent — on all six tracks and
reporting build time, lattice shape, tick latency, and action-set health.

Usage:
    python tools/validate_tracks.py [--ticks 40] [--tracks-dir DIR]
                                    [--report docs/tracks.md]

Runs on the forced-CPU backend (the validation concerns planner logic, not
TPU throughput; see bench.py for the hardware path).
"""

import argparse
import datetime
import glob
import os
import sys
import time

import jax

# force CPU before any op: the axon TPU plugin ignores JAX_PLATFORMS env
jax.config.update("jax_platforms", "cpu")

import numpy as np                                    # noqa: E402

TOP = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, TOP)

from graphbasedlocaltrajectoryplanner_tpu.planner.facade import GraphLTPL  # noqa: E402
from graphbasedlocaltrajectoryplanner_tpu.models.track import (            # noqa: E402
    import_globtraj_csv)
from graphbasedlocaltrajectoryplanner_tpu.testing_tools.vdc_dummy import (  # noqa: E402
    vdc_dummy)
from graphbasedlocaltrajectoryplanner_tpu.testing_tools.objectlist_dummy import (  # noqa: E402
    ObjectlistDummy)
from graphbasedlocaltrajectoryplanner_tpu.utils.veh_dyn import (           # noqa: E402
    import_veh_dyn_info)

DEFAULT_TRACKS_DIR = "/root/reference/inputs/traj_ltpl_cl"


def run_track(csv_path: str, ticks: int, store_dir: str,
              force_rebuild: bool = False) -> dict:
    name = os.path.basename(csv_path).replace("traj_ltpl_cl_", "") \
        .replace(".csv", "")
    path_dict = {
        "globtraj_input_path": csv_path,
        "graph_store_path": os.path.join(store_dir,
                                         f"validate_{name}.npz"),
        "ltpl_offline_param_path": TOP + "/params/ltpl_config_offline.ini",
        "ltpl_online_param_path": TOP + "/params/ltpl_config_online.ini",
        "log_path": TOP + "/logs/validate/",
        "graph_log_id": datetime.datetime.now().strftime(
            "%Y_%m_%d__%H_%M_%S_") + name,
    }
    if force_rebuild and os.path.isfile(path_dict["graph_store_path"]):
        os.remove(path_dict["graph_store_path"])
    ax_max_machines = import_veh_dyn_info(
        ax_max_machines_import_path=TOP
        + "/inputs/veh_dyn_info/ax_max_machines.csv")[1]

    t0 = time.perf_counter()
    ltpl = GraphLTPL(path_dict, visual_mode=False, log_to_file=False)
    ltpl.graph_init()
    t_build = time.perf_counter() - t0
    lat = ltpl.lattice

    gt = import_globtraj_csv(csv_path)
    refline = gt.refline
    pos_est = refline[0, :]
    heading_est = float(np.arctan2(refline[1, 1] - refline[0, 1],
                                   refline[1, 0] - refline[0, 0]) - np.pi / 2)
    # set_startpos returns True when OUT of track (retry semantics,
    # Graph_LTPL.set_startpos:262-296)
    ok = not ltpl.set_startpos(pos_est=pos_est, heading_est=heading_est)

    obj_dummy = ObjectlistDummy(dynamic=True, vel_scale=0.3,
                                s0=float(lat.s_rl[min(10, lat.L - 1)]),
                                globtraj=gt)

    traj_set = {"straight": None}
    n_actions = []
    tick_ms = []
    empty_sets = 0
    sim_t = 0.0
    vel_est = 0.0
    for tick in range(ticks if ok else 0):
        sel_action = next((a for a in ("right", "left", "straight", "follow")
                           if a in traj_set), None)
        if sel_action is None:
            # empty action set: recorded as a failure, stop the loop
            empty_sets += 1
            break
        obj_list = obj_dummy.get_objectlist()
        t1 = time.perf_counter()
        ltpl.calc_paths(prev_action_id=sel_action, object_list=obj_list)
        if traj_set[sel_action] is not None:
            sim_t += 0.1
            pos_est, vel_est = vdc_dummy(
                pos_est, traj_set[sel_action][0][:, 0],
                traj_set[sel_action][0][:, 1:3],
                traj_set[sel_action][0][:, 5], 0.1)
        else:
            vel_est = 0.0
        traj_set = ltpl.calc_vel_profile(
            pos_est=pos_est, vel_est=vel_est,
            ax_max_machines=ax_max_machines, incl_emerg_traj=True)[0]
        tick_ms.append((time.perf_counter() - t1) * 1e3)
        n_actions.append(len(traj_set))
        if not traj_set:
            empty_sets += 1

    return dict(
        name=name,
        start_ok=bool(ok),
        rl_points=int(refline.shape[0]),
        layers=int(lat.L), nodes=int(lat.N),
        track_len_m=float(lat.s_rl[-1]),
        closed=bool(lat.closed),
        build_s=t_build,
        ticks=ticks,
        mean_actions=float(np.mean(n_actions)) if n_actions else 0.0,
        empty_sets=empty_sets,
        tick_ms_p50=float(np.percentile(tick_ms[1:] if len(tick_ms) > 1
                                        else tick_ms, 50))
        if tick_ms else float("nan"),
        v_end=float(vel_est),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=40)
    ap.add_argument("--tracks-dir", default=DEFAULT_TRACKS_DIR)
    ap.add_argument("--report", default=None,
                    help="write a markdown results table to this path")
    ap.add_argument("--force-rebuild", action="store_true",
                    help="delete stored graphs first so the build column "
                         "reports cold offline-build times")
    args = ap.parse_args()

    store_dir = os.path.join(TOP, "artifacts")
    os.makedirs(store_dir, exist_ok=True)
    csvs = sorted(glob.glob(os.path.join(args.tracks_dir, "*.csv")))
    if not csvs:
        print(f"no track CSVs in {args.tracks_dir}", file=sys.stderr)
        sys.exit(1)

    rows = []
    for csv_path in csvs:
        print(f"=== {os.path.basename(csv_path)} ===", flush=True)
        r = run_track(csv_path, args.ticks, store_dir,
                      force_rebuild=args.force_rebuild)
        rows.append(r)
        print(f"  {r['name']}: L={r['layers']} N={r['nodes']} "
              f"len={r['track_len_m']:.0f} m closed={r['closed']} "
              f"build={r['build_s']:.1f} s  start_ok={r['start_ok']}  "
              f"actions/tick={r['mean_actions']:.2f} "
              f"empty={r['empty_sets']}  p50={r['tick_ms_p50']:.0f} ms "
              f"v_end={r['v_end']:.1f} m/s", flush=True)

    hdr = ("| track | rl pts | layers | max nodes | length | closed | "
           "build [s] | actions/tick | empty sets | end vel [m/s] |")
    sep = "|" + "---|" * 10
    lines = [hdr, sep]
    for r in rows:
        lines.append(
            f"| {r['name']} | {r['rl_points']} | {r['layers']} | "
            f"{r['nodes']} | {r['track_len_m']:.0f} m | "
            f"{'yes' if r['closed'] else 'no'} | {r['build_s']:.1f} | "
            f"{r['mean_actions']:.2f} | {r['empty_sets']} | "
            f"{r['v_end']:.1f} |")
    table = "\n".join(lines)
    print(table)

    bad = [r["name"] for r in rows
           if not r["start_ok"] or r["empty_sets"] > 0]
    if args.report:
        with open(args.report, "w") as fh:
            fh.write(
                "# Shipped-track validation\n\n"
                "Full-stack closed-loop run (offline build + "
                f"{args.ticks} online ticks with a dynamic opponent) on "
                "every reference track, `tools/validate_tracks.py` "
                "(CPU backend).\n\n" + table + "\n\n"
                "Generated "
                + datetime.date.today().isoformat() + ".\n")
    if bad:
        print(f"FAILED tracks: {bad}", file=sys.stderr)
        sys.exit(1)
    print(f"all {len(rows)} tracks ok")


if __name__ == "__main__":
    main()
