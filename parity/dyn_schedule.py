"""Shared dynamic-parameter schedule for the parity harness (VERDICT r4
items 3/4): the recorder (run_reference.py --dyn / --normzone) and the
replay (replay_tpu.py) must drive their planners with IDENTICAL per-tick
``calc_vel_profile`` parameters and zone registrations — both import the
schedule from here.

The schedule is designed to force every reference path the constant-default
fixtures never reached:

  * ``vel_max`` drop at tick 60 while the ego runs ~30 m/s -> the fb
    brake-prefix path fires (VpForwardBackward.check_brake_prefix:86-139,
    OTH:746-760), released again at tick 100;
  * ``gg_scale`` != 1 from tick 120 (scales both fb branch limits; the old
    gg-scale is used for the brake profile per VpFB:112-116);
  * location-dependent ``local_gg`` every tick (dict form -> the per-point
    normalization branch OTH:649-666 instead of the tuple broadcast);
  * ``incl_emerg_traj=True`` every tick -> the emergency entry in the
    returned action set (Graph_LTPL.py:369, OTH:1027-1034,
    calc_brake_emergency.py:9-47).
"""

import numpy as np


def vel_max_at(tick: int) -> float:
    """Behavior-planner velocity cap; the drop forces the brake prefix.

    24 m/s, deliberately NOT 25: at 25 m/s the per-row traversal time of
    the 2.5 m step grid is exactly the 0.1 s ``delaycomp``, putting the
    ``cumsum(t_approx) <= delaycomp`` comparison (OTH.get_ref_idx:571)
    permanently ON its boundary — the two stacks' 1e-7-different profiles
    then flip ``vel_idx`` by one, which shifts the SQP m-window's
    conservative end ramp a row (observed 1.9 m/s far-tail artifacts at
    vel_max=25, same fp-inherent class as the berlin warm-start knife
    edge, parity/KNIFE_EDGE.json)."""
    if 60 <= tick < 100:
        return 24.0
    return 100.0


def gg_scale_at(tick: int) -> float:
    return 0.75 if tick >= 120 else 1.0


def local_gg_points(xy: np.ndarray) -> np.ndarray:
    """Location-dependent friction limits (ax, ay) per path point — a
    smooth field of +-1 m/s^2 around the example default of 5 m/s^2, so
    deviations between the two stacks' sub-mm path points translate to
    ~1e-5 m/s^2 gg differences (far inside the velocity budget)."""
    x, y = xy[..., 0], xy[..., 1]
    ax = 5.0 + 1.0 * np.sin(0.015 * x + 0.011 * y)
    ay = 5.0 + 1.0 * np.cos(0.013 * x - 0.009 * y)
    return np.stack([ax, ay], axis=-1)


def local_gg_dict(path_param_dict) -> dict:
    """Per-action/per-trajectory location-dependent gg arrays sized to the
    CURRENT ``last_action_set_path_param`` rows (the format OTH:649-666
    consumes), built from each stack's own planned path coordinates."""
    return {aid: [local_gg_points(np.asarray(p)[:, 0:2])
                  for p in trajs]
            for aid, trajs in path_param_dict.items()}


# -- normals-typed zone (VERDICT r4 item 4) ---------------------------------
NORMZONE_LAYERS = (64, 65, 66)   # the std-example blocked region
NORMZONE_REMOVE_TICK = 120       # zone de-registered here -> removal
#                                  flagging (ObjectListInterface.py:225-236)


def normzone_array(refline: np.ndarray, normvec: np.ndarray) -> np.ndarray:
    """Zone spec in the reference's 'normals' wire format
    (ObjectListInterface.py:173-180 column layout): the std-example region
    (layers 64-66), bounds chosen left-of-raceline like the node-typed
    sample zone.  ``refline`` / ``normvec`` must come from the RECORDING
    stack's graph so the matcher's 0.1 m^2 / 0.01 tolerance
    (get_zone_nodes.py:52-60) is exercised on real skeleton data; the
    recorded array is stored in the fixture and replayed verbatim."""
    rows = []
    for lay in NORMZONE_LAYERS:
        rows.append(np.concatenate([
            np.asarray(refline[lay], float),
            np.asarray(normvec[lay], float),
            [6.0, 1.0]]))                     # bound_l > bound_r (left side)
    return np.asarray(rows, float)
