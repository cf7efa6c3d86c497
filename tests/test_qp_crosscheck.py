"""Independent-solver cross-check of the ADMM QP core.

The SQP golden fixtures validate the VpSQP/OnlineTrajectoryHandler seam with
the repo's own ADMM injected into the reference via the parity shim — they
provide no independent evidence the QP core itself solves the optimization
correctly (r4 advisor finding on the untested OSQP seam).  This test solves
the EXACT production QP instances (``ops.qp.build_vel_qp`` matrices) with an
independent solver — OSQP when importable, else scipy ``trust-constr``
(different algorithm family, float64) — and pins the ADMM solution against
it.  Reference seam: VpSQP.py:224-236 wrapping velocity_optimization/OSQP.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from graphbasedlocaltrajectoryplanner_tpu.ops.qp import (  # noqa: E402
    admm_qp, build_vel_qp, qp_vel_profile)


def _solve_independent(P, q, A, l, u):
    """f64 solve by an unrelated solver; OSQP if available, else scipy."""
    try:
        import osqp
        from scipy import sparse
        m = osqp.OSQP()
        m.setup(P=sparse.csc_matrix(P), q=q, A=sparse.csc_matrix(A),
                l=l, u=u, eps_abs=1e-9, eps_rel=1e-9, max_iter=50000,
                polish=True, verbose=False)
        r = m.solve()
        assert r.info.status_val in (1, 2)
        return np.asarray(r.x, np.float64), "osqp"
    except ImportError:
        pass
    from scipy import optimize as sopt
    n = P.shape[0]
    res = sopt.minimize(
        lambda x: 0.5 * x @ P @ x + q @ x,
        x0=np.clip(-q, 0.0, 1.0),
        jac=lambda x: P @ x + q,
        hess=lambda x: P,
        method="trust-constr",
        constraints=[sopt.LinearConstraint(A, l, u)],
        options=dict(gtol=1e-12, xtol=1e-14, maxiter=3000))
    assert res.status in (1, 2), res.message
    return np.asarray(res.x, np.float64), "trust-constr"


def _instances():
    """Feasible track-like instances: smooth curvature so the implied
    accelerations stay inside the friction/machine bounds (an infeasible
    instance would make both solvers saturate differently and compare
    noise; infeasibility handling is pinned separately in test_qp_kkt)."""
    machines = np.array([[0.0, 5.0], [30.0, 4.0], [70.0, 2.5]], np.float32)
    for m, v_start, v_end, k_amp, waves in ((60, 20.0, 12.0, 0.015, 2),
                                            (115, 22.0, 15.0, 0.020, 3),
                                            (115, 12.0, 8.0, 0.035, 4)):
        i = np.arange(m)
        kappa = (k_amp * np.sin(2 * np.pi * waves * i / m)).astype(
            np.float32)
        el = np.full(m, 2.5, np.float32)
        gg = np.full((m, 2), 10.0, np.float32)
        yield (jnp.asarray(kappa), jnp.asarray(el), jnp.asarray(gg),
               jnp.asarray(machines), v_start, v_end)


@pytest.mark.parametrize("case", list(range(3)))
def test_admm_matches_independent_solver(case):
    """Converged-ADMM solution vs an independent solver on the exact
    production matrices.  Always asserted: the ADMM point is feasible to
    1e-6 (scaled units) and its objective is NOT WORSE than the
    independent solver's.  Where the independent solver itself converged
    (its objective within 1e-5 of ADMM's), additionally pin pointwise
    velocity agreement < 0.05 m/s.  On case 2 scipy's trust-constr stops
    at a point 0.0037 WORSE in objective than the feasible ADMM solution
    (it emits 'Singular Jacobian' warnings) — objective dominance is the
    meaningful check there, pointwise agreement is not."""
    inst = list(_instances())[case]
    kappa, el, gg, machines, v_start, v_end = inst
    m = kappa.shape[0]
    qp = build_vel_qp(kappa, el, gg, machines, 70.0, v_start,
                      v_end=v_end, end_idx=m, pin_idx=0)
    P = np.asarray(qp["P"], np.float64)
    q = np.asarray(qp["q"], np.float64)
    A = np.asarray(qp["A"], np.float64)
    l = np.asarray(qp["l"], np.float64)
    u = np.asarray(qp["u"], np.float64)
    x_ind, solver = _solve_independent(P, q, A, l, u)

    x_admm, _, res = admm_qp(qp["P"], qp["q"], qp["A"], qp["l"], qp["u"],
                             iters=2000, rho=qp["rho"], x0=qp["x0"])
    x_admm = np.asarray(x_admm, np.float64)
    # feasibility of the converged ADMM point (scaled units)
    Ax = A @ x_admm
    viol = float(np.maximum(Ax - u, 0.0).max()
                 + np.maximum(l - Ax, 0.0).max())
    assert viol < 1e-6, f"{solver}: primal violation {viol}"
    # objective dominance: a correct solver can never be worse than
    # another feasible point
    f = lambda x: 0.5 * x @ P @ x + q @ x                     # noqa: E731
    f_ind, f_admm = f(x_ind), f(x_admm)
    scale = max(1.0, abs(f_ind))
    assert f_admm <= f_ind + 1e-5 * scale, solver

    if f_ind - f_admm < 1e-5 * scale:     # oracle converged too
        s_x = float(qp["s_x"])
        x_hi = np.asarray(qp["x_hi"], np.float64)
        v_admm = np.sqrt(np.clip(x_admm * s_x, 0.0, x_hi))
        v_ind = np.sqrt(np.clip(x_ind * s_x, 0.0, x_hi))
        dv = float(np.abs(v_admm - v_ind).max())
        assert dv < 0.05, f"{solver}: max velocity diff {dv}"


@pytest.mark.parametrize("case", list(range(3)))
def test_structured_solver_matches_dense(case):
    """The banded PCR production solver (admm_vel_qp) runs the identical
    ADMM splitting as the dense admm_qp on the build_vel_qp matrices —
    iterates must agree to float32 solve tolerance."""
    from graphbasedlocaltrajectoryplanner_tpu.ops.qp import (
        _vel_qp_data, admm_vel_qp)
    kappa, el, gg, machines, v_start, v_end = list(_instances())[case]
    m = kappa.shape[0]
    kw = dict(v_end=v_end, end_idx=m, pin_idx=0)
    dense = build_vel_qp(kappa, el, gg, machines, 70.0, v_start, **kw)
    d = _vel_qp_data(kappa, el, gg, machines, 70.0, v_start, **kw)
    xd, _, resd = admm_qp(dense["P"], dense["q"], dense["A"], dense["l"],
                          dense["u"], iters=60, rho=dense["rho"],
                          x0=dense["x0"])
    xs, ress = admm_vel_qp(d, iters=60)
    assert float(jnp.abs(xd - xs).max()) < 1e-4
    assert abs(float(resd["r_prim"]) - float(ress["r_prim"])) < 1e-4


def test_production_iteration_budget_vs_converged():
    """Production paths (handler + fleet) run qp_vel_profile's default
    fixed 150-iteration budget; pin its distance from the (same-solver)
    converged solution so the budget is evidence-based: ~0.08 m/s on this
    instance, inside the 0.1 m/s behavioral budget and the OSQP-default-
    tolerance class documented above."""
    kappa, el, gg, machines, v_start, v_end = list(_instances())[1]
    m = kappa.shape[0]
    kw = dict(v_end=v_end, end_idx=m, pin_idx=0)
    v150, _ = qp_vel_profile(kappa, el, gg, machines, 70.0, v_start,
                             iters=150, **kw)
    v2k, _ = qp_vel_profile(kappa, el, gg, machines, 70.0, v_start,
                            iters=2000, **kw)
    assert float(jnp.abs(v150 - v2k).max()) < 0.15
