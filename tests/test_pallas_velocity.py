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
