"""End-to-end golden parity vs the ACTUAL reference planner.

The committed fixtures (parity/fixtures/ref_monteblanco_*.npz) are recorded
runs of the unmodified reference code at /root/reference, executed via the
API shims in parity/shims (see parity/run_reference.py).  These tests replay
the same input stream through the TPU stack and assert the BASELINE north
star: trajectories within 2 cm / 0.1 m/s of the reference.

The full 200-tick reports live in PARITY.md; the tests replay a prefix to
keep CI time bounded (the prefix covers launch, acceleration to >40 m/s and
— in the objects scenario — follow-mode and overtaking decisions).
"""

import os

import numpy as np
import pytest

from parity.replay_tpu import replay

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))
FIXDIR = os.path.join(os.path.dirname(HERE), "parity", "fixtures")

TOL_POS = 0.02   # m   (north star: 2 cm)
TOL_VEL = 0.1    # m/s (north star: 0.1 m/s)


def _run(fixture, ticks, full_horizon=True):
    path = os.path.join(FIXDIR, fixture)
    if not os.path.isfile(path):
        pytest.skip(f"fixture {fixture} not generated "
                    "(run parity/run_reference.py)")
    report, rows = replay(path, ticks=ticks)
    assert report["pairs_compared"] >= ticks, report
    # executed-horizon (first 100 m) deviation is gated for every fixture;
    # the full 300 m horizon additionally where no warm-start knife edge is
    # present (see PARITY.md "Knife edges")
    assert report["max_d_pos_exec_m"] < TOL_POS, report
    assert report["max_d_vel_exec_mps"] < TOL_VEL, report
    if full_horizon:
        assert report["max_d_pos_m"] < TOL_POS, report
        assert report["max_d_vel_mps"] < TOL_VEL, report
    return report


def test_reference_parity_min_scenario():
    rep = _run("ref_monteblanco_200.npz", ticks=60)
    # no objects -> action sets must match exactly
    assert rep["actions_missing_in_tpu"] == []
    assert rep["actions_extra_in_tpu"] == []


def test_reference_parity_objects_scenario():
    rep = _run("ref_monteblanco_200_obj.npz", ticks=60)
    # follow/overtake decision parity: no action may be missing; extra
    # actions (TPU offering more feasible maneuvers) are reported but the
    # shared ones must satisfy the tolerance (asserted in _run)
    assert rep["actions_missing_in_tpu"] == [], rep
    assert rep["actions_extra_in_tpu"] == [], rep


def test_reference_parity_two_opponents():
    """2-vehicle scene (VERDICT r2 item 4): follow targeting + overtake
    splits with multiple objects in the horizon."""
    rep = _run("ref_monteblanco_200_obj2.npz", ticks=60)
    assert rep["actions_missing_in_tpu"] == [], rep
    assert rep["actions_extra_in_tpu"] == [], rep


def test_reference_parity_berlin():
    """Largest shipped track (N=40 lateral nodes, variable heading).  One
    warm-start knife edge around tick ~153 shifts the plan-start layer by
    one for ~15 ticks, bending the far tail of the 300 m horizon by a few
    cm (forensics in PARITY.md) — the executed horizon stays inside the
    2 cm / 0.1 m/s budget, asserted in _run; the full-horizon deviation is
    bounded here."""
    rep = _run("ref_berlin_200.npz", ticks=60)
    assert rep["actions_missing_in_tpu"] == [], rep
    assert rep["actions_extra_in_tpu"] == [], rep


def test_reference_parity_berlin_knife_edge_bounded():
    """The documented berlin knife-edge region (ticks 140-180): executed-
    horizon parity holds through it and the far-tail artifact stays < 10 cm
    / 0.6 m/s."""
    path = os.path.join(FIXDIR, "ref_berlin_200.npz")
    if not os.path.isfile(path):
        pytest.skip("fixture not generated")
    report, rows = replay(path, ticks=180)
    assert report["max_d_pos_exec_m"] < TOL_POS, report
    assert report["max_d_vel_exec_mps"] < TOL_VEL, report
    assert report["max_d_pos_m"] < 0.10, report
    assert report["max_d_vel_mps"] < 0.6, report


@pytest.mark.parametrize("track", ["lvms", "modena", "zalazone",
                                   "millbrook"])
def test_reference_parity_all_tracks(track):
    """Golden-parity breadth (VERDICT r3 item 3): every shipped reference
    track is reference-diffed, not just self-validated.  Full-run reports:
    lvms 0.09 mm / 0.0002 m/s, modena 0.08 mm, zalazone 0.06 mm,
    millbrook 0.46 mm / 0.021 m/s over 200 ticks (PARITY.md)."""
    rep = _run(f"ref_{track}_200.npz", ticks=50)
    assert rep["actions_missing_in_tpu"] == [], rep
    assert rep["actions_extra_in_tpu"] == [], rep


def test_reference_parity_dynamic_params():
    """Dynamic-parameter surface golden (VERDICT r4 item 3): vel_max drop
    at tick 60 -> the fb brake-prefix path (VpForwardBackward.py:86-139,
    OTH:746-760), gg_scale 0.75 from tick 120, per-point local_gg dict
    (OTH:649-666) and incl_emerg_traj=True (OTH:1027-1034,
    calc_brake_emergency.py:9-47) every tick.  Replays the brake window."""
    rep = _run("ref_monteblanco_200_dyn.npz", ticks=110)
    assert rep["actions_missing_in_tpu"] == [], rep
    assert rep["actions_extra_in_tpu"] == [], rep
    # the emergency entry must be present and compared from tick 0
    assert rep["pairs_compared"] >= 2 * 110, rep


def test_reference_parity_dynamic_params_sqp():
    """SQP variant of the dynamic-parameter golden: pointwise vel_max cap
    in-QP (no brake prefix, OTH:745-760), reference variable-friction
    branches (VpSQP.py:189-211 via GLTPL_SHIM_VAR_FRICTION=1: per-point
    loc_gg + tire_end_mps2=3), gg_scale correctly IGNORED by the SQP
    planner (OTH:674-680 — this golden caught a 22 m/s divergence when
    gg_scale leaked into the TPU SQP branch).

    Gates: positions strict everywhere; velocities strict (full horizon)
    for the search actions; the emergency entry is gated in squared-
    velocity space + stop-position agreement instead of the pointwise-in-s
    velocity diff — near its brake-to-zero stop ``dv/ds = a/v`` diverges,
    so ~1e-2 m/s upstream differences read as ~0.4 m/s at the near-stop
    stations while the kinetic-energy deviation stays < 1 (m/s)^2 and the
    stop position agrees within one 2.5 m row (PARITY.md 'Knife edges',
    'emergency stop-row cliff')."""
    path = os.path.join(FIXDIR, "ref_monteblanco_200_dyn_sqp.npz")
    if not os.path.isfile(path):
        pytest.skip("fixture not generated")
    report, rows = replay(path, ticks=130)
    assert report["actions_missing_in_tpu"] == [], report
    assert report["actions_extra_in_tpu"] == [], report
    assert report["max_d_pos_m"] < TOL_POS, report
    non_em = [r for r in rows if r[1] != "emergency"]
    em = [r for r in rows if r[1] == "emergency"]
    assert max(r[3] for r in non_em) < TOL_VEL, report       # full horizon
    assert max(r[5] for r in non_em) < TOL_VEL, report       # executed
    assert max(r[8] for r in em) < 5.0, report               # (m/s)^2
    assert max(r[7] for r in em) <= 2.6, report              # stop row


def test_reference_parity_normals_zone():
    """Normals-typed zone golden (VERDICT r4 item 4): the zone delivered
    through ObjectListInterface.update_zone(zone_type='normals') end-to-end
    — normal-vector matching + inflation + node-range conversion
    (get_zone_nodes.py:38-80) — plus the zone removal flagging at tick 120
    (ObjectListInterface.py:225-236).  Replays through the removal."""
    rep = _run("ref_monteblanco_200_normzone.npz", ticks=130)
    assert rep["actions_missing_in_tpu"] == [], rep
    assert rep["actions_extra_in_tpu"] == [], rep


def test_reference_parity_sqp():
    """vp_type=sqp end-to-end golden (VERDICT r3 item 3): the reference's
    VpSQP + OTH SQP seam executed verbatim (QP core supplied to the
    reference by the velocity_optimization shim — see its docstring for
    what this does and does not prove) vs the TPU handler's fixed-m SQP
    pipeline with MPC warm starts.  Full 200-tick report: 0.10 mm /
    0.0052 m/s (PARITY.md)."""
    rep = _run("ref_monteblanco_200_sqp.npz", ticks=60)
    assert rep["actions_missing_in_tpu"] == [], rep
    assert rep["actions_extra_in_tpu"] == [], rep


def test_reference_parity_sqp_objects():
    """SQP follow mode + infeasibility ladder end-to-end: opponent +
    blocked zone with vp_type=sqp — exercises the QP follow vmax fill,
    overtake removal on inaccurate solves, and the reference's SQP-mode
    recursive-infeasibility brake (VpSQP.calc_vel_brake_em with the 1 m/s
    cap, OTH:973-984), which round 4 found diverging (36 m/s) before the
    handler's sqp backup branch was added.  Full 200-tick report:
    0.096 mm / 0.0021 m/s, zero missing/extra actions."""
    rep = _run("ref_monteblanco_200_obj_sqp.npz", ticks=60)
    assert rep["actions_missing_in_tpu"] == [], rep
    assert rep["actions_extra_in_tpu"] == [], rep


def test_reference_parity_sqp_berlin():
    """SQP on the largest shipped track (berlin, N=40, variable heading).
    The executed horizon holds the hard budget; the far tail shows the
    same warm-start knife-edge class as the fb berlin fixture (PARITY.md
    "Knife edges") and is bounded like it."""
    path = os.path.join(FIXDIR, "ref_berlin_200_sqp.npz")
    if not os.path.isfile(path):
        pytest.skip("fixture not generated")
    report, rows = replay(path, ticks=60)
    assert report["actions_missing_in_tpu"] == [], report
    assert report["actions_extra_in_tpu"] == [], report
    assert report["max_d_pos_exec_m"] < TOL_POS, report
    assert report["max_d_vel_exec_mps"] < TOL_VEL, report
    assert report["max_d_pos_m"] < 0.10, report
    assert report["max_d_vel_mps"] < 0.6, report


def test_reference_parity_unclosed_track():
    """Truncated (unclosed) track: exercises the reference's open-track
    offline branch (main_offline_callback.py:91-100), the shrinking
    horizon toward the track end and the forced-stop velocity tail."""
    rep = _run("ref_unclosed_monteblanco_220.npz", ticks=60)
    assert rep["actions_missing_in_tpu"] == [], rep
    assert rep["actions_extra_in_tpu"] == [], rep


def test_reference_parity_unclosed_forced_stop():
    """The deceleration-to-stop tail (ticks 140-220) matches: the vehicle
    brakes as the horizon collapses against the track end."""
    path = os.path.join(FIXDIR, "ref_unclosed_monteblanco_220.npz")
    if not os.path.isfile(path):
        pytest.skip("fixture not generated")
    import numpy as np
    fix = np.load(path)
    v = [float(fix[f"t{t:04d}_vel"]) for t in (140, 180, 219)]
    assert v[0] > v[1] > v[2], v     # the fixture really brakes
    report, rows = replay(path, ticks=220)
    assert report["max_d_pos_m"] < TOL_POS, report
    assert report["max_d_vel_mps"] < TOL_VEL, report
