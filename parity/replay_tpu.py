"""Replay a recorded reference run (parity/run_reference.py fixture) through
the TPU framework and measure per-tick trajectory deviation.

Both stacks see identical inputs: the reference's recorded pos/vel estimate
stream, the same action-selection sequence, the reference INI configs, and
the same deterministic clock (time.time faked, +0.1 s per tick) so the
calc-time feedback loops produce identical constant-path splits.

Deviation metric (the BASELINE north star is 2 cm / 0.1 m/s): for every tick
and every action present in both sets, the TPU trajectory is interpolated at
the reference trajectory's relative arc-length stations over the common
s-range; reported are the max euclidean position deviation and max velocity
deviation.

Run as a script for a full report, or call :func:`replay` from tests.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
TOP = os.path.dirname(HERE)
REF = "/root/reference"
sys.path.insert(0, TOP)

TICK_DT = 0.1


class FakeClock:
    def __init__(self, t0=1_000_000.0):
        self.t = t0

    def time(self):
        return self.t

    def advance(self, dt):
        self.t += dt


EXEC_HORIZON_M = 100.0     # near-field window: the part of the horizon the
#                            vehicle actually executes before the next
#                            replans overwrite it (~5 s at race speed)


def compare_traj(ref_traj, tpu_traj):
    """Max position [m] / velocity [m/s] deviation, TPU interpolated at the
    reference's relative-s stations over the common arc-length range.

    Returns (d_pos, d_vel, d_pos_exec, d_vel_exec, d_vel_moving,
    d_stop_m): full-horizon maxima, maxima restricted to the first
    ``EXEC_HORIZON_M`` metres, the velocity deviation restricted to
    stations where the reference still moves (>= 2 m/s), and the
    stop-position disagreement in metres (0 when neither profile stops).
    The far tail of a 300 m horizon is replanned every tick and is
    knife-edge sensitive: a warm-start split landing within ~1e-4 m of a
    trajectory row boundary can shift the plan-start layer by one, which
    moves the C2 refit's end layer and bends the last segments by a few cm
    (observed once on berlin; PARITY.md "Knife edges").  Near a
    brake-to-zero stop ``dv/ds = a/v`` diverges, so the pointwise-in-s
    velocity diff is ill-conditioned there — emergency-profile gates use
    ``d_vel_moving`` + ``d_stop_m`` instead (PARITY.md knife edges,
    'emergency stop-row cliff')."""
    s_ref = ref_traj[:, 0] - ref_traj[0, 0]
    s_tpu = tpu_traj[:, 0] - tpu_traj[0, 0]
    s_max = min(s_ref[-1], s_tpu[-1])
    m = s_ref <= s_max + 1e-9
    s_q = s_ref[m]
    x = np.interp(s_q, s_tpu, tpu_traj[:, 1])
    y = np.interp(s_q, s_tpu, tpu_traj[:, 2])
    v = np.interp(s_q, s_tpu, tpu_traj[:, 5])
    d_pos = np.hypot(x - ref_traj[m, 1], y - ref_traj[m, 2])
    d_vel = np.abs(v - ref_traj[m, 5])
    near = s_q <= EXEC_HORIZON_M
    moving = ref_traj[m, 5] >= 2.0
    d_vel_moving = float(np.max(d_vel[moving])) if moving.any() else 0.0
    # squared-velocity (specific kinetic energy) deviation: brake dynamics
    # are linear in v^2 (v^2(s) = v0^2 - 2 int a ds), so upstream profile
    # differences do NOT amplify in this space — the well-conditioned
    # metric for brake-to-zero profiles
    d_vsq = float(np.max(np.abs(v ** 2 - ref_traj[m, 5] ** 2)))

    def stop_s(s, vv):
        z = np.flatnonzero(vv <= 1e-6)
        return float(s[z[0]]) if z.size else None

    st_r = stop_s(s_ref, ref_traj[:, 5])
    st_t = stop_s(s_tpu, tpu_traj[:, 5])
    if st_r is None and st_t is None:
        d_stop = 0.0
    elif st_r is None or st_t is None:
        d_stop = float("inf")
    else:
        d_stop = abs(st_r - st_t)
    return (float(np.max(d_pos)), float(np.max(d_vel)),
            float(np.max(d_pos[near])), float(np.max(d_vel[near])),
            d_vel_moving, d_stop, d_vsq)


def replay(fixture_path, ticks=None, verbose=False, probe=None):
    """:param probe: optional callable ``probe(tick, ltpl)`` invoked after
    each tick's calc_paths+calc_vel_profile — instrumentation hook for
    forensics (parity/knife_edge_forensics.py)."""
    return _replay(fixture_path, ticks=ticks, verbose=verbose, probe=probe)


def _replay(fixture_path, ticks=None, verbose=False, probe=None):
    fix = np.load(fixture_path)
    n_ticks = int(fix["ticks"]) if ticks is None else ticks
    track = fix["track"].item().decode()

    clock = FakeClock()
    real_time = time.time
    time.time = clock.time
    try:
        from graphbasedlocaltrajectoryplanner_tpu.planner.facade import (
            GraphLTPL)

        if "csv_path" in fix.files:
            csv_path = fix["csv_path"].item().decode()
            if not os.path.isabs(csv_path) or not os.path.isfile(csv_path):
                csv_path = os.path.join(HERE, "fixtures",
                                        os.path.basename(csv_path))
        else:
            csv_path = (REF + "/inputs/traj_ltpl_cl/traj_ltpl_cl_"
                        + track + ".csv")
        vp_type = (fix["vp_type"].item().decode()
                   if "vp_type" in fix.files else "fb")
        online_ini = REF + "/params/ltpl_config_online.ini"
        if vp_type == "sqp":
            # identical derived config the recorder drove the reference
            # with (parity/run_reference.sqp_online_ini)
            online_ini = os.path.join(HERE, "fixtures",
                                      "ltpl_config_online_sqp.ini")
        path_dict = {
            "globtraj_input_path": csv_path,
            "graph_store_path": os.path.join(TOP, "artifacts",
                                             f"parity_lattice_{track}.npz"),
            "ltpl_offline_param_path": REF + "/params/ltpl_config_offline.ini",
            "ltpl_online_param_path": online_ini,
        }
        ltpl = GraphLTPL(path_dict, visual_mode=False, log_to_file=False)
        ltpl.graph_init()

        refline = np.loadtxt(path_dict["globtraj_input_path"],
                             comments="#", delimiter=";")[:, 0:2]
        pos_est = refline[0, :]
        heading_est = float(np.arctan2(refline[1, 1] - refline[0, 1],
                                       refline[1, 0] - refline[0, 0])
                            - np.pi / 2)
        ltpl.set_startpos(pos_est=pos_est, heading_est=heading_est)

        dyn_params = bool(fix["dyn_params"]) if "dyn_params" in fix.files \
            else False
        zone_normals = (np.asarray(fix["zone_normals"])
                        if "zone_normals" in fix.files else None)
        if dyn_params or zone_normals is not None:
            try:
                from parity import dyn_schedule as dynsch
            except ImportError:
                sys.path.insert(0, HERE)
                import dyn_schedule as dynsch
        if "with_zone" in fix.files:
            with_zone = bool(fix["with_zone"])
        else:       # legacy fixtures: the _obj scenario carried the zone
            with_zone = any(k.endswith("_obj") for k in fix.files)
        zones = None
        if with_zone:
            # the std-example blocked zone (main_std_example.py:90-93),
            # identical to parity/run_reference.py --objects
            zones = {"sample_zone": [
                [64, 64, 64, 64, 64, 64, 64, 65, 65, 65, 65, 65, 65, 65,
                 66, 66, 66, 66, 66, 66, 66],
                [0, 1, 2, 3, 4, 5, 6, 0, 1, 2, 3, 4, 5, 6,
                 0, 1, 2, 3, 4, 5, 6],
                np.array([[-20.54, 227.56], [23.80, 186.64]]),
                np.array([[-23.80, 224.06], [20.17, 183.60]])]}

        rows = []  # per (tick, action): d_pos, d_vel
        missing, extra = [], []
        for tick in range(n_ticks):
            sel = fix[f"t{tick:04d}_sel"].item().decode()
            obj_list = []
            okey = f"t{tick:04d}_obj"
            if okey in fix.files:
                obj_list = [{"X": r[0], "Y": r[1], "theta": r[2],
                             "v": r[3], "length": r[4], "id": int(r[5]),
                             "type": "physical"} for r in fix[okey]]
            if zone_normals is not None:
                # mirror the recorder: zone through the normals interface
                # (run_reference.py --normzone)
                if tick < dynsch.NORMZONE_REMOVE_TICK:
                    ltpl._obj_zone = ltpl._obj_list_handler.update_zone(
                        zone_id="norm_zone", zone_data=zone_normals,
                        zone_type="normals")
                elif tick == dynsch.NORMZONE_REMOVE_TICK:
                    ltpl._obj_zone = ltpl._obj_list_handler.update_zone(
                        zone_id=None, zone_data=None)
            ltpl.calc_paths(prev_action_id=sel, object_list=obj_list,
                            blocked_zones=zones)
            pos = fix[f"t{tick:04d}_pos"]
            vel = float(fix[f"t{tick:04d}_vel"])
            if dyn_params:
                traj_set = ltpl.calc_vel_profile(
                    pos_est=pos, vel_est=vel,
                    vel_max=dynsch.vel_max_at(tick),
                    gg_scale=dynsch.gg_scale_at(tick),
                    local_gg=dynsch.local_gg_dict(ltpl._oth.last_path_param),
                    incl_emerg_traj=True)[0]
            else:
                traj_set = ltpl.calc_vel_profile(pos_est=pos,
                                                 vel_est=vel)[0]

            ref_actions = {k.split("_a_")[1] for k in fix.files
                           if k.startswith(f"t{tick:04d}_a_")}
            tpu_actions = set(traj_set.keys())
            for a in sorted(ref_actions - tpu_actions):
                missing.append((tick, a))
            for a in sorted(tpu_actions - ref_actions):
                extra.append((tick, a))
            for a in sorted(ref_actions & tpu_actions):
                d_pos, d_vel, d_pos_e, d_vel_e, d_vel_mv, d_stop, d_vsq \
                    = compare_traj(fix[f"t{tick:04d}_a_{a}"],
                                   np.asarray(traj_set[a][0], float))
                rows.append((tick, a, d_pos, d_vel, d_pos_e, d_vel_e,
                             d_vel_mv, d_stop, d_vsq))
                if verbose and tick % 25 == 0:
                    print(f"tick {tick:4d} {a:9s} d_pos={d_pos*100:7.2f} cm  "
                          f"d_vel={d_vel:6.3f} m/s")
            if probe is not None:
                probe(tick, ltpl)
            clock.advance(TICK_DT)
    finally:
        time.time = real_time

    d_pos_all = np.array([r[2] for r in rows])
    d_vel_all = np.array([r[3] for r in rows])
    report = {
        "fixture": os.path.basename(str(fixture_path)),
        "ticks": n_ticks,
        "pairs_compared": len(rows),
        "actions_missing_in_tpu": missing,
        "actions_extra_in_tpu": extra,
        "max_d_pos_m": float(np.max(d_pos_all)),
        "p99_d_pos_m": float(np.percentile(d_pos_all, 99)),
        "mean_d_pos_m": float(np.mean(d_pos_all)),
        "max_d_vel_mps": float(np.max(d_vel_all)),
        "p99_d_vel_mps": float(np.percentile(d_vel_all, 99)),
        "max_d_pos_exec_m": float(np.max([r[4] for r in rows])),
        "max_d_vel_exec_mps": float(np.max([r[5] for r in rows])),
        "worst_tick": int(rows[int(np.argmax(d_pos_all))][0]),
    }
    return report, rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture",
                    default=os.path.join(HERE, "fixtures",
                                         "ref_monteblanco_200.npz"))
    ap.add_argument("--ticks", type=int, default=None)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    rep, _ = replay(args.fixture, ticks=args.ticks, verbose=True)
    print(json.dumps(rep, indent=2, default=str))
