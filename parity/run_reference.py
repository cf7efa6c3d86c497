"""Run the ACTUAL reference planner (/root/reference, TUMFTM GraphLTPL)
end-to-end and record per-tick action-set trajectories as the golden fixture
for the parity harness.

The reference's third-party deps (python-igraph, trajectory_planning_helpers)
are not installable offline; parity/shims provides pure-NumPy stand-ins for
the exact API subset the reference uses (see shim module docstrings for the
documented deviations).  Everything else executed here IS the reference code,
imported unmodified from /root/reference.

Determinism: ``time.time`` is replaced by a fake clock advanced exactly
``TICK_DT`` per iteration, so the reference's calc-time moving average
(OnlineTrajectoryHandler.py:351-378) sees a constant 0.1 s and the
constant-path split t_const = min(0.1 * calc_time_safety, 0.5) = 0.2 s every
tick; the vdc dummy integrates exactly TICK_DT.  The TPU stack is replayed
later under the same clock (tests/test_reference_parity.py).

Usage:
    python parity/run_reference.py [--track monteblanco] [--ticks 200]
        [--out parity/fixtures/ref_<track>_<ticks>.npz]
        [--objects]   # add the std-example opponent + blocked zone
"""

import argparse
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference"
sys.path.insert(0, os.path.join(HERE, "shims"))
sys.path.insert(0, REF)

TICK_DT = 0.1


def sqp_online_ini() -> str:
    """Write (once) the derived online config with ``vp_type=sqp`` next to
    the fixtures and return its path — recorder and replay must drive
    their planners with the identical file."""
    src = os.path.join(REF, "params", "ltpl_config_online.ini")
    dst = os.path.join(HERE, "fixtures", "ltpl_config_online_sqp.ini")
    txt = open(src).read().replace("vp_type=fb", "vp_type=sqp")
    assert "vp_type=sqp" in txt
    with open(dst, "w") as fh:
        fh.write(txt)
    return dst


class FakeClock:
    def __init__(self, t0=1_000_000.0):
        self.t = t0

    def time(self):
        return self.t

    def advance(self, dt):
        self.t += dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--track", default="monteblanco")
    ap.add_argument("--ticks", type=int, default=200)
    ap.add_argument("--out", default=None)
    ap.add_argument("--objects", action="store_true",
                    help="std-example scenario: dummy opponent + blocked zone")
    ap.add_argument("--objects2", action="store_true",
                    help="two dynamic opponents (no zone)")
    ap.add_argument("--vp", default="fb", choices=["fb", "sqp"],
                    help="reference velocity planner (vp_type); 'sqp' "
                         "routes VpSQP through the velocity_optimization "
                         "shim (parity/shims/velocity_optimization)")
    ap.add_argument("--csv", default=None,
                    help="explicit track CSV path (e.g. a truncated/"
                         "unclosed track); --track becomes the label")
    ap.add_argument("--dyn", action="store_true",
                    help="dynamic-parameter scenario (parity/dyn_schedule):"
                         " vel_max/gg_scale sweeps, per-point local_gg, "
                         "incl_emerg_traj=True")
    ap.add_argument("--normzone", action="store_true",
                    help="deliver the blocked zone via the 'normals' "
                         "interface (ObjectListInterface.update_zone) "
                         "instead of node lists; implies the std-example "
                         "opponent")
    args = ap.parse_args()

    clock = FakeClock()
    time.time = clock.time  # must happen before graph_ltpl imports resolve

    if args.dyn and args.vp == "sqp":
        # dict local_gg -> the reference must execute its variable-friction
        # branches (see shims/velocity_optimization/src/VelQP.py docstring)
        os.environ["GLTPL_SHIM_VAR_FRICTION"] = "1"

    # the reference targets numpy<1.24 (np.object alias,
    # main_offline_callback.py:160); restore the alias for this process
    if not hasattr(np, "object"):
        np.object = object
    if not hasattr(np, "Inf"):
        np.Inf = np.inf

    import graph_ltpl  # noqa: E402  (the reference package)

    suffix = "_obj" if args.objects else ("_obj2" if args.objects2 else "")
    if args.normzone:
        suffix += "_normzone"
    if args.dyn:
        suffix += "_dyn"
    if args.vp != "fb":
        suffix += "_" + args.vp
    out = args.out or os.path.join(
        HERE, "fixtures", f"ref_{args.track}_{args.ticks}{suffix}.npz")

    online_ini = REF + "/params/ltpl_config_online.ini"
    if args.vp == "sqp":
        # derived config with the SQP planner selected (committed so the
        # replay drives the TPU handler with the identical file)
        online_ini = sqp_online_ini()

    csv_path = args.csv or (REF + "/inputs/traj_ltpl_cl/traj_ltpl_cl_"
                            + args.track + ".csv")
    path_dict = {
        "globtraj_input_path": csv_path,
        "graph_store_path": os.path.join(HERE, "fixtures",
                                         f"ref_graph_{args.track}.pckl"),
        "ltpl_offline_param_path": REF + "/params/ltpl_config_offline.ini",
        "ltpl_online_param_path": online_ini,
    }

    t0 = time.perf_counter()
    ltpl_obj = graph_ltpl.Graph_LTPL.Graph_LTPL(path_dict=path_dict,
                                                visual_mode=False,
                                                log_to_file=False)
    ltpl_obj.graph_init()
    print(f"[ref] offline graph ready ({time.perf_counter() - t0:.1f}s)")

    refline = graph_ltpl.imp_global_traj.src.import_globtraj_csv. \
        import_globtraj_csv(import_path=path_dict["globtraj_input_path"])[0]
    pos_est = refline[0, :]
    heading_est = float(np.arctan2(np.diff(refline[0:2, 1]),
                                   np.diff(refline[0:2, 0])) - np.pi / 2)
    vel_est = 0.0
    ltpl_obj.set_startpos(pos_est=pos_est, heading_est=heading_est)

    obj_list = []
    zones = None
    obj_dummy = None
    obj_dummies = []
    if args.objects2:
        # two opponents replaying the raceline at different speeds/offsets
        # (the dummy reads the track from driving_task.ini = monteblanco)
        for i, (vs, s0) in enumerate([(0.3, 150.0), (0.45, 260.0)]):
            obj_dummies.append(
                graph_ltpl.testing_tools.src.objectlist_dummy.
                ObjectlistDummy(dynamic=True, vel_scale=vs, s0=s0))
    if args.objects or args.normzone:
        obj_dummy = graph_ltpl.testing_tools.src.objectlist_dummy. \
            ObjectlistDummy(dynamic=True, vel_scale=0.3, s0=150.0)
    if args.objects:
        # hardcoded zone example (main_std_example.py:90-93, verbatim)
        zones = {"sample_zone": [
            [64, 64, 64, 64, 64, 64, 64, 65, 65, 65, 65, 65, 65, 65,
             66, 66, 66, 66, 66, 66, 66],
            [0, 1, 2, 3, 4, 5, 6, 0, 1, 2, 3, 4, 5, 6, 0, 1, 2, 3, 4, 5, 6],
            np.array([[-20.54, 227.56], [23.80, 186.64]]),
            np.array([[-23.80, 224.06], [20.17, 183.60]])]}

    sys.path.insert(0, HERE)
    import dyn_schedule as dynsch

    norm_arr = None
    if args.normzone:
        # normals-typed zone built from the RECORDING stack's graph skeleton
        # (get_zone_nodes.py:52-60 matches against graph_base.refline /
        # normvec_normalized); the array is stored in the fixture and the
        # replay feeds it verbatim to ITS normals interface
        gb = ltpl_obj._Graph_LTPL__graph_base
        norm_arr = dynsch.normzone_array(np.asarray(gb.refline),
                                         np.asarray(gb.normvec_normalized))

    record = {}
    traj_set = {"straight": None}
    for tick in range(args.ticks):
        for sel_action in ["right", "left", "straight", "follow"]:
            if sel_action in traj_set.keys():
                break

        if obj_dummy is not None:
            obj_list = obj_dummy.get_objectlist()
        elif obj_dummies:
            obj_list = []
            for i, d in enumerate(obj_dummies):
                ol = d.get_objectlist()
                for o in ol:
                    o["id"] = i + 1
                obj_list.extend(ol)

        if args.normzone:
            # deliver/remove the zone through the normals interface directly
            # (the facade's calc_paths hardcodes zone_type='nodes',
            # Graph_LTPL.py:329-332 — the vehicle's ZMQ path feeds normals
            # zones through ObjectListInterface.update_zone)
            olh = ltpl_obj._Graph_LTPL__obj_list_handler
            if tick < dynsch.NORMZONE_REMOVE_TICK:
                ltpl_obj._Graph_LTPL__obj_zone = olh.update_zone(
                    zone_id="norm_zone", zone_data=norm_arr,
                    zone_type="normals")
            elif tick == dynsch.NORMZONE_REMOVE_TICK:
                # de-register -> removal flagging
                # (ObjectListInterface.py:225-236)
                ltpl_obj._Graph_LTPL__obj_zone = olh.update_zone(
                    zone_id=None, zone_data=None)

        ltpl_obj.calc_paths(prev_action_id=sel_action, object_list=obj_list,
                            blocked_zones=zones)

        if traj_set[sel_action] is not None:
            pos_est, vel_est = graph_ltpl.testing_tools.src.vdc_dummy. \
                vdc_dummy(pos_est=pos_est,
                          last_s_course=(traj_set[sel_action][0][:, 0]),
                          last_path=(traj_set[sel_action][0][:, 1:3]),
                          last_vel_course=(traj_set[sel_action][0][:, 5]),
                          iter_time=TICK_DT)

        if args.dyn:
            # dynamic-parameter surface (parity/dyn_schedule.py): per-point
            # local_gg sized to the CURRENT path params (OTH:649-666),
            # vel_max/gg_scale sweeps, emergency entry requested
            oth = ltpl_obj._Graph_LTPL__oth
            ppar = oth._OnlineTrajectoryHandler__last_action_set_path_param
            traj_set = ltpl_obj.calc_vel_profile(
                pos_est=pos_est, vel_est=vel_est,
                vel_max=dynsch.vel_max_at(tick),
                gg_scale=dynsch.gg_scale_at(tick),
                local_gg=dynsch.local_gg_dict(ppar),
                incl_emerg_traj=True)[0]
        else:
            traj_set = ltpl_obj.calc_vel_profile(pos_est=pos_est,
                                                 vel_est=vel_est)[0]

        record[f"t{tick:04d}_pos"] = np.asarray(pos_est, float)
        record[f"t{tick:04d}_vel"] = np.float64(vel_est)
        record[f"t{tick:04d}_sel"] = np.bytes_(sel_action.encode())
        for act, trajs in traj_set.items():
            record[f"t{tick:04d}_a_{act}"] = np.asarray(trajs[0], np.float64)
        if obj_list:
            record[f"t{tick:04d}_obj"] = np.array(
                [[o["X"], o["Y"], o["theta"], o["v"], o["length"], o["id"]]
                 for o in obj_list], float)

        clock.advance(TICK_DT)
        if tick % 25 == 0:
            print(f"[ref] tick {tick:4d} v={vel_est:5.1f} "
                  f"set={sorted(traj_set)}")

    record["vp_type"] = np.bytes_(args.vp.encode())
    record["ticks"] = np.int64(args.ticks)
    record["track"] = np.bytes_(args.track.encode())
    record["tick_dt"] = np.float64(TICK_DT)
    record["with_zone"] = np.bool_(zones is not None)
    record["dyn_params"] = np.bool_(args.dyn)
    if norm_arr is not None:
        record["zone_normals"] = np.asarray(norm_arr, np.float64)
    if args.csv:
        record["csv_path"] = np.bytes_(os.path.abspath(args.csv).encode())
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **record)
    print(f"[ref] fixture written: {out}")


if __name__ == "__main__":
    main()
