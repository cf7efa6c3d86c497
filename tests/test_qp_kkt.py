"""Independent optimality checks for the ADMM QP (VERDICT r2 item 7).

``tests/test_qp.py`` validates the QP velocity planner against the fb
solver; these tests certify the QP solutions THEMSELVES: KKT residuals on
randomized feasible QPs, exact closed-form goldens where one exists, and an
adversarial genuinely-infeasible problem asserting the ``-3`` status code
that feeds the handler's backup ladder (reference VpSQP.py:238-243).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from graphbasedlocaltrajectoryplanner_tpu.ops.qp import (
    admm_qp, qp_vel_profile, qp_solver_status)

MACHINES = jnp.asarray([[0.0, 8.0], [30.0, 6.0], [80.0, 4.0]], jnp.float32)


def _random_feasible_qp(rng, n, m):
    """Random strongly-convex QP with an interior-feasible constraint set."""
    M = rng.normal(size=(n, n))
    P = M @ M.T / n + np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n)) / np.sqrt(n)
    x_feas = rng.normal(size=n)
    Ax = A @ x_feas
    slack_lo = rng.uniform(0.5, 3.0, size=m)
    slack_hi = rng.uniform(0.5, 3.0, size=m)
    return (jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
            jnp.asarray(Ax - slack_lo), jnp.asarray(Ax + slack_hi))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_admm_kkt_residuals(seed):
    """Primal feasibility, stationarity and complementary slackness hold at
    the returned solution (independently recomputed, not the solver's own
    residual bookkeeping)."""
    rng = np.random.default_rng(seed)
    n, m = 24, 36
    P, q, A, l, u = _random_feasible_qp(rng, n, m)
    x, z, res = admm_qp(P, q, A, l, u, iters=400, rho=1.0)
    x, z = np.asarray(x, np.float64), np.asarray(z, np.float64)
    Pn, qn, An = np.asarray(P, np.float64), np.asarray(q, np.float64), \
        np.asarray(A, np.float64)
    ln, un = np.asarray(l, np.float64), np.asarray(u, np.float64)

    Ax = An @ x
    # primal feasibility
    viol = np.maximum(Ax - un, 0.0) + np.maximum(ln - Ax, 0.0)
    assert viol.max() < 1e-3
    # stationarity with the solver's own duals, and complementary
    # slackness / dual signs: y_i > 0 only at the upper bound, y_i < 0
    # only at the lower bound, y_i = 0 strictly inside
    y = np.asarray(res["y"], np.float64)
    stat = np.abs(Pn @ x + qn + An.T @ y).max()
    assert stat < 1e-3
    inactive = (Ax > ln + 1e-3) & (Ax < un - 1e-3)
    if inactive.any():
        assert np.abs(y[inactive]).max() < 2e-3
    at_up = Ax >= un - 1e-3
    at_lo = Ax <= ln + 1e-3
    assert np.all(y[at_up & ~at_lo] > -2e-3)
    assert np.all(y[at_lo & ~at_up] < 2e-3)


def test_admm_box_qp_closed_form():
    """Diagonal-P box QP has the exact solution clip(-q/diag, lo, hi)."""
    rng = np.random.default_rng(3)
    n = 16
    d = rng.uniform(0.5, 3.0, size=n)
    q = rng.normal(size=n) * 2.0
    lo = np.full(n, -1.0)
    hi = np.full(n, 1.5)
    x, _, _ = admm_qp(jnp.asarray(np.diag(d)), jnp.asarray(q),
                      jnp.eye(n), jnp.asarray(lo), jnp.asarray(hi),
                      iters=400)
    x_star = np.clip(-q / d, lo, hi)
    np.testing.assert_allclose(np.asarray(x), x_star, atol=2e-4)


def test_admm_equality_qp_closed_form():
    """Equality-constrained QP (l == u) against the dense KKT solve."""
    rng = np.random.default_rng(4)
    n, m = 12, 4
    M = rng.normal(size=(n, n))
    P = M @ M.T / n + np.eye(n)
    q = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    b = rng.normal(size=m)
    K = np.block([[P, A.T], [A, np.zeros((m, m))]])
    sol = np.linalg.solve(K, np.concatenate([-q, b]))
    x, _, res = admm_qp(jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
                        jnp.asarray(b), jnp.asarray(b), iters=600,
                        rho=50.0)
    np.testing.assert_allclose(np.asarray(x), sol[:n], atol=5e-4)
    assert int(qp_solver_status(res)) == 0


def _profile_inputs(P=96, n_valid=90, kappa_amp=0.01, ds=2.5):
    idx = np.arange(P)
    kappa = kappa_amp * np.sin(idx / 7.0)
    el = np.where(idx < n_valid - 1, ds, 0.0)
    gg = np.full((P, 2), 10.0)
    return (jnp.asarray(kappa, jnp.float32), jnp.asarray(el, jnp.float32),
            jnp.asarray(gg, jnp.float32))


def test_vel_profile_kkt():
    """The produced velocity profile satisfies its own constraint set:
    caps, pinned start, and the acceleration rows (diamond friction +
    machine + drag) within solver tolerance."""
    kappa, el, gg = _profile_inputs()
    v, res = qp_vel_profile(kappa, el, gg, MACHINES, v_max=40.0,
                            v_start=20.0, v_end=10.0, end_idx=90)
    assert int(qp_solver_status(res)) == 0
    v = np.asarray(v, np.float64)
    kappa_n, el_n, gg_n = (np.asarray(kappa, np.float64),
                           np.asarray(el, np.float64),
                           np.asarray(gg, np.float64))
    active = el_n > 1e-9
    # caps
    v_lat = np.sqrt(gg_n[:, 1] / np.maximum(np.abs(kappa_n), 1e-9))
    assert np.all(v <= np.minimum(v_lat, 40.0) + 0.05)
    assert abs(v[0] - 20.0) < 1e-3
    assert v[89] <= 10.0 + 0.05
    # acceleration rows: a + c_fric v^2 <= min(ax, machine) - drag terms
    x = v ** 2
    a = (x[1:] - x[:-1]) / (2.0 * np.maximum(el_n[:-1], 1e-3))
    c_fric = gg_n[:-1, 0] * np.abs(kappa_n[:-1]) / gg_n[:-1, 1]
    ax_m = np.interp(v[:-1], np.asarray(MACHINES)[:, 0],
                     np.asarray(MACHINES)[:, 1])
    drag = 0.85 / 1000.0
    acc_lhs = a + (c_fric + drag) * x[:-1]
    dec_lhs = -a + (c_fric - drag) * x[:-1]
    tol = 0.6        # scaled-residual tolerance in m/s^2
    assert np.all(acc_lhs[active[:-1]]
                  <= np.minimum(gg_n[:-1, 0], ax_m)[active[:-1]] + tol)
    assert np.all(dec_lhs[active[:-1]] <= gg_n[:-1, 0][active[:-1]] + tol)


def test_vel_profile_tracks_relaxed_optimum():
    """Optimality spot check: where the caps are reachable the QP must sit
    ON the caps (the relaxed optimum), not below them."""
    kappa, el, gg = _profile_inputs(kappa_amp=0.004)
    v, res = qp_vel_profile(kappa, el, gg, MACHINES, v_max=25.0,
                            v_start=25.0)
    v = np.asarray(v)
    # mid-profile: lat cap > 25 everywhere at this curvature, so optimum
    # is the 25 m/s box bound
    assert np.all(v[20:70] > 25.0 - 0.05)


def test_infeasible_qp_status_minus3():
    """Adversarial infeasibility: 60 m/s pinned start, zero end velocity
    two points later with ~5 m of track — needs ~360 m/s^2 of braking.
    The status handoff must report -3 (primal infeasible), which removes
    straight/follow and triggers the handler's backup-deceleration ladder
    (VpSQP.py:415-430; tests/test_sqp_seam.py wires the consumer side)."""
    P = 8
    kappa = jnp.zeros((P,), jnp.float32)
    el = jnp.asarray(np.where(np.arange(P) < 2, 2.5, 0.0), jnp.float32)
    gg = jnp.full((P, 2), 10.0, jnp.float32)
    v, res = qp_vel_profile(kappa, el, gg, MACHINES, v_max=70.0,
                            v_start=60.0, v_end=0.0, end_idx=3)
    assert int(qp_solver_status(res)) == -3


def test_feasible_braking_not_flagged():
    """The converse guard: a hard but feasible brake must NOT be classified
    infeasible (a false -3 would needlessly drop to the backup plan)."""
    P = 96
    kappa = jnp.zeros((P,), jnp.float32)
    el = jnp.asarray(np.where(np.arange(P) < 90, 2.5, 0.0), jnp.float32)
    gg = jnp.full((P, 2), 10.0, jnp.float32)
    # 50 -> 0 over ~222 m needs ~5.6 m/s^2 — inside the 10 m/s^2 envelope
    v, res = qp_vel_profile(kappa, el, gg, MACHINES, v_max=50.0,
                            v_start=50.0, v_end=0.0, end_idx=91)
    assert int(qp_solver_status(res)) in (0, 2)
    assert float(v[0]) == pytest.approx(50.0, abs=1e-2)
    assert float(v[90]) <= 0.6
