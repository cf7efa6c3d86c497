"""ADMM QP solver + QP velocity planner (vp_type='sqp' backend)."""

import numpy as np
import jax.numpy as jnp

from graphbasedlocaltrajectoryplanner_tpu.ops import qp as qpmod
from graphbasedlocaltrajectoryplanner_tpu.ops import velocity as velops


def test_admm_solves_box_qp():
    # min 1/2 x'Px + q'x with P diag, box constraints — analytic solution
    n = 8
    P = jnp.diag(jnp.arange(1.0, n + 1))
    q = -jnp.ones((n,))
    A = jnp.eye(n)
    l = jnp.zeros((n,))
    u = jnp.full((n,), 0.3)
    x, z, res = qpmod.admm_qp(P, q, A, l, u, iters=150)
    x_ref = np.minimum(1.0 / np.arange(1.0, n + 1), 0.3)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=2e-3)
    assert float(res["r_prim"]) < 1e-3


def _track(P=60, seed=0):
    rng = np.random.default_rng(seed)
    kappa = rng.normal(0, 0.005, P)
    kappa[20:30] = 0.03
    el = np.full(P, 2.5)
    el[50:] = 0.0       # padding
    gg = np.tile(np.array([[10.0, 10.0]]), (P, 1))
    machines = np.array([[0.0, 5.0], [100.0, 5.0]])
    return kappa, el, gg, machines


def test_qp_vel_profile_constraints():
    kappa, el, gg, machines = _track()
    v, res = qpmod.qp_vel_profile(
        jnp.asarray(kappa), jnp.asarray(el), jnp.asarray(gg),
        jnp.asarray(machines), v_max=60.0, v_start=20.0, v_end=15.0,
        end_idx=50)
    v = np.asarray(v)
    assert abs(v[0] - 20.0) < 0.5
    assert v[49] <= 15.0 + 0.5
    # lateral limit respected
    ay = v ** 2 * np.abs(kappa)
    assert np.all(ay <= 10.0 * 1.05)
    # accel within machine + tire limits (diamond model, small tolerance for
    # the fixed-iteration ADMM)
    ax = np.diff(v[:50] ** 2) / (2 * el[:49])
    assert np.all(ax <= 5.0 + 0.3)
    assert np.all(ax >= -(10.0 + 60.0 ** 2 * 0.85 / 1000.0) - 0.5)


def test_qp_close_to_fb_solver():
    kappa, el, gg, machines = _track(seed=3)
    v_qp, _ = qpmod.qp_vel_profile(
        jnp.asarray(kappa), jnp.asarray(el), jnp.asarray(gg),
        jnp.asarray(machines), v_max=60.0, v_start=15.0, v_end=10.0,
        end_idx=50)
    v_fb = velops.calc_vel_profile_fb(
        jnp.asarray(kappa), jnp.asarray(el), jnp.asarray(gg),
        jnp.asarray(machines), v_max=60.0, v_start=15.0, v_end=10.0,
        end_idx=50)
    v_qp = np.asarray(v_qp)[:50]
    v_fb = np.asarray(v_fb)[:50]
    # the QP maximizes speed subject to the same physics: profiles agree to
    # within a couple m/s over the valid range
    assert np.mean(np.abs(v_qp - v_fb)) < 2.5
    assert np.max(np.abs(v_qp - v_fb)) < 6.0
