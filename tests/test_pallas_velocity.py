"""Pallas stacked velocity-scan kernel vs the lax.scan reference
(interpret mode on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphbasedlocaltrajectoryplanner_tpu.ops import velocity as velops
from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_velocity import (
    make_fused_vel_scan)

MACHINES = jnp.asarray([[0.0, 5.0], [30.0, 4.0], [70.0, 2.0]], jnp.float32)


def _mk_rows(rng, R, T, modes):
    kappa = jnp.asarray(np.abs(rng.normal(0, 0.02, (R, T))), jnp.float32)
    ax = jnp.asarray(np.full((R, T), 10.0), jnp.float32)
    ay = jnp.asarray(np.full((R, T), 10.0), jnp.float32)
    ds = jnp.asarray(np.where(rng.random((R, T)) < 0.9, 2.5, 0.0),
                     jnp.float32)
    vlim_f = jnp.asarray(np.clip(rng.normal(40, 15, (R, T)), 3, 70),
                         jnp.float32)
    modes = jnp.asarray(modes, jnp.int32)
    vlim = jnp.where(modes[:, None] == velops.MODE_BRAKE, jnp.inf, vlim_f)
    vinit = jnp.asarray(np.clip(rng.normal(30, 10, R), 1, 60), jnp.float32)
    return kappa, ax, ay, ds, vlim, vinit, modes


@pytest.mark.parametrize("T", [100, 447])
def test_fused_matches_scan(T):
    rng = np.random.default_rng(0)
    R = 13
    modes = np.array([0, 1, 2] * 4 + [0])
    kappa, ax, ay, ds, vlim, vinit, modes = _mk_rows(rng, R, T, modes)
    ref = velops.stacked_vel_scan(kappa, ax, ay, kappa, ax, ay, ds, vlim,
                                  vinit, modes, MACHINES, 1.0, 0.85, 1000.0)
    f = make_fused_vel_scan(interpret=True)
    out = f(kappa, ax, ay, kappa, ax, ay, ds, vlim, vinit, modes,
            MACHINES, 1.0, 0.85, 1000.0)
    assert out.shape == (R, T + 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_fused_vmap_flattens_batch():
    """Under vmap the custom batching rule flattens (B, R) rows into one
    kernel launch and reproduces the per-scenario results."""
    rng = np.random.default_rng(1)
    R, T, B = 5, 64, 3
    modes = np.array([0, 1, 2, 0, 1])
    args = [_mk_rows(np.random.default_rng(10 + b), R, T, modes)
            for b in range(B)]
    f = make_fused_vel_scan(interpret=True)

    def call(a):
        kappa, ax, ay, ds, vlim, vinit, m = a
        return f(kappa, ax, ay, kappa, ax, ay, ds, vlim, vinit, m,
                 MACHINES, 1.0, 0.85, 1000.0)

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *args)
    outb = jax.vmap(call)(stacked)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(outb[b]),
                                   np.asarray(call(args[b])), atol=1e-5)


def test_dyn_model_exp_2():
    rng = np.random.default_rng(2)
    R, T = 4, 80
    modes = np.array([0, 1, 2, 0])
    kappa, ax, ay, ds, vlim, vinit, modes = _mk_rows(rng, R, T, modes)
    ref = velops.stacked_vel_scan(kappa, ax, ay, kappa, ax, ay, ds, vlim,
                                  vinit, modes, MACHINES, 2.0, 0.75, 1200.0)
    f = make_fused_vel_scan(interpret=True)
    out = f(kappa, ax, ay, kappa, ax, ay, ds, vlim, vinit, modes,
            MACHINES, 2.0, 0.75, 1200.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_assoc_matches_scan():
    """The associative-scan (Picard) formulation converges to the
    sequential recurrence."""
    rng = np.random.default_rng(3)
    R, T = 13, 200
    modes = np.array([0, 1, 2] * 4 + [0])
    kappa, ax, ay, ds, vlim, vinit, modes = _mk_rows(rng, R, T, modes)
    ref = velops.stacked_vel_scan(kappa, ax, ay, kappa, ax, ay, ds, vlim,
                                  vinit, modes, MACHINES, 1.0, 0.85, 1000.0)
    out = velops.stacked_vel_scan_assoc(
        kappa, ax, ay, kappa, ax, ay, ds, vlim, vinit, modes,
        MACHINES, 1.0, 0.85, 1000.0, sweeps=12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)


def test_brake_auto_matches_brake():
    rng = np.random.default_rng(4)
    P = 120
    kappa = jnp.asarray(np.abs(rng.normal(0, 0.02, P)), jnp.float32)
    el = jnp.asarray(np.where(np.arange(P) < 100, 2.5, 0.0), jnp.float32)
    gg = jnp.asarray(np.full((P, 2), 10.0), jnp.float32)
    ref = velops.calc_vel_profile_brake(kappa, el, gg, 40.0)
    out = velops.calc_vel_profile_brake_auto(kappa, el, gg, 40.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-4)


def test_fused_static_physics_matches():
    """The static-physics factory variant (constants folded into the
    kernel, pow specialization) matches the traced-physics kernel."""
    rng = np.random.default_rng(7)
    R, T = 13, 96
    modes = np.array([0, 1, 2] * 4 + [0])
    kappa, ax, ay, ds, vlim, vinit, modes = _mk_rows(rng, R, T, modes)
    ref = velops.stacked_vel_scan(kappa, ax, ay, kappa, ax, ay, ds, vlim,
                                  vinit, modes, MACHINES, 1.0, 0.85, 1000.0)
    f = make_fused_vel_scan(interpret=True, physics=(1.0, 0.85, 1000.0))
    out = f(kappa, ax, ay, kappa, ax, ay, ds, vlim, vinit, modes, MACHINES)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
    outb = jax.vmap(lambda k: f(k, ax, ay, k, ax, ay, ds, vlim, vinit,
                                modes, MACHINES))(jnp.stack([kappa] * 2))
    np.testing.assert_allclose(np.asarray(outb[1]), np.asarray(out),
                               atol=1e-5)


def test_fused_cgg_matches_scan():
    """Constant-gg kernel variant (gg folded into SMEM scalars) vs the
    lax.scan reference with the constants broadcast."""
    from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_velocity import (
        make_fused_vel_scan_cgg)
    rng = np.random.default_rng(4)
    R, T = 13, 447
    modes = np.array([0, 1, 2] * 4 + [0])
    kappa, ax, ay, ds, vlim, vinit, modes = _mk_rows(rng, R, T, modes)
    gg = (8.0, 9.5)
    axc = jnp.full((R, T), gg[0]); ayc = jnp.full((R, T), gg[1])
    ref = velops.stacked_vel_scan(kappa, axc, ayc, kappa, axc, ayc, ds,
                                  vlim, vinit, modes, MACHINES,
                                  1.0, 0.85, 1000.0)
    f = make_fused_vel_scan_cgg((1.0, 0.85, 1000.0), gg, interpret=True)
    out = f(kappa, kappa, ds, vlim, vinit, modes, MACHINES)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_stage_const_gg_matches_default():
    """velocity_stage_scenario(const_gg=...) must equal the streamed-gg
    path (CPU fallback exercises the same dispatch the engine uses)."""
    import numpy as _np
    from graphbasedlocaltrajectoryplanner_tpu.planner import velplan as vp
    P = 160
    rng = _np.random.default_rng(2)
    paths = []
    for sdd in range(4):
        kappa = rng.normal(0.0, 0.01, P).astype(_np.float32)
        el = _np.full((P,), 2.5, _np.float32); el[110 + 5 * sdd - 1:] = 0.0
        psi = _np.cumsum(kappa * el).astype(_np.float32)
        x = _np.cumsum(el * _np.cos(psi)); y = _np.cumsum(el * _np.sin(psi))
        paths.append(_np.column_stack([x, y, psi, kappa, el]))
    paths = _np.asarray(paths, _np.float32)
    n_valids = _np.array([110, 115, 120, 125], _np.int32)
    gg = _np.full((P, 2), 8.0, _np.float32)
    mach = _np.array([[0.0, 5.0], [100.0, 5.0]], _np.float32)
    roll_vel = _np.full((128,), 15.0, _np.float32)
    roll_cum = _np.cumsum(_np.full((128,), 3.0)).astype(_np.float32)
    args = (jnp.asarray(paths), jnp.asarray(n_valids), jnp.asarray(gg),
            jnp.zeros((P,), jnp.float32), jnp.int32(0),
            jnp.float32(20.0), jnp.float32(20.0), jnp.float32(70.0),
            jnp.asarray(mach), jnp.float32(0.1),
            jnp.asarray([28.0, 25.0, 27.0, 26.0], jnp.float32),
            jnp.zeros((4,), bool),
            jnp.float32(90.0), jnp.float32(12.0), jnp.float32(30.0),
            jnp.float32(25.0), jnp.asarray(roll_vel), jnp.asarray(roll_cum),
            jnp.float32(4.7), jnp.float32(1.25), jnp.float32(0.025),
            jnp.float32(0.2), jnp.float32(15.0), 1.0, 0.85, 1000.0)
    a = vp.velocity_stage_scenario(*args, follow_slot=1)
    b = vp.velocity_stage_scenario(*args, follow_slot=1,
                                   const_gg=(8.0, 8.0))
    np.testing.assert_allclose(np.asarray(b["trajs"]),
                               np.asarray(a["trajs"]), rtol=1e-6, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(b["vel_bound"]),
                                  np.asarray(a["vel_bound"]))
