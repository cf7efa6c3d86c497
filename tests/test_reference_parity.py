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
