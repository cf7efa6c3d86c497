"""Velocity kernels vs an independent scalar NumPy solver + physics
properties (friction circle, machine limit, drag, boundary conditions)."""

import numpy as np
import jax.numpy as jnp

from graphbasedlocaltrajectoryplanner_tpu.ops import velocity as vel


# ---------------------------------------------------------------------------
# scalar reference solver (plain python loops, same physics)
# ---------------------------------------------------------------------------

def _ax_tires_np(v, k_abs, ax_max, ay_max, exp):
    ay_used = v * v * k_abs
    frac = min(max(ay_used / max(ay_max, 1e-9), 0.0), 1.0)
    rad = 1.0 - frac ** exp
    return ax_max * max(rad, 0.0) ** (1.0 / exp)


def fb_profile_np(kappa, el, gg, machines, v_max, v_start, v_end=None,
                  exp=1.0, drag=0.85, m=1000.0):
    P = len(kappa)
    k_abs = np.abs(kappa)
    v_lat = np.sqrt(gg[:, 1] / np.maximum(k_abs, 1e-9))
    v = np.minimum(v_lat, v_max)
    if v_end is not None:
        v[-1] = min(v[-1], v_end)
    v[0] = min(v[0], v_start)
    # forward
    for i in range(P - 1):
        a_t = _ax_tires_np(v[i], k_abs[i], gg[i, 0], gg[i, 1], exp)
        a_m = np.interp(v[i], machines[:, 0], machines[:, 1])
        a = min(a_t, a_m) - v[i] ** 2 * drag / m
        v[i + 1] = min(v[i + 1], np.sqrt(max(v[i] ** 2 + 2 * a * el[i], 0.0)))
    # backward (2-step refinement, mirroring the kernel)
    for i in range(P - 2, -1, -1):
        a1 = _ax_tires_np(v[i + 1], k_abs[i + 1], gg[i + 1, 0], gg[i + 1, 1], exp) \
            + v[i + 1] ** 2 * drag / m
        v_est = np.sqrt(v[i + 1] ** 2 + 2 * a1 * el[i])
        a2 = _ax_tires_np(v_est, k_abs[i], gg[i, 0], gg[i, 1], exp) \
            + v_est ** 2 * drag / m
        a = min(a1, a2)
        v[i] = min(v[i], np.sqrt(max(v[i + 1] ** 2 + 2 * a * el[i], 0.0)))
    return v


def _track(P=40, seed=0):
    rng = np.random.default_rng(seed)
    kappa = rng.normal(0, 0.01, P)
    kappa[10:15] = 0.04          # a tight corner
    el = np.full(P, 2.5)
    gg = np.tile(np.array([[10.0, 10.0]]), (P, 1))
    machines = np.array([[0.0, 5.0], [30.0, 5.0], [60.0, 3.0], [100.0, 1.0]])
    return kappa, el, gg, machines


def test_fb_matches_scalar():
    kappa, el, gg, machines = _track()
    v_jax = np.asarray(vel.calc_vel_profile_fb(
        jnp.array(kappa), jnp.array(el), jnp.array(gg), jnp.array(machines),
        v_max=70.0, v_start=20.0, v_end=15.0))
    v_np = fb_profile_np(kappa, el, gg, machines, 70.0, 20.0, 15.0)
    np.testing.assert_allclose(v_jax, v_np, rtol=1e-4, atol=1e-3)


def test_fb_respects_limits():
    kappa, el, gg, machines = _track(seed=3)
    v = np.asarray(vel.calc_vel_profile_fb(
        jnp.array(kappa), jnp.array(el), jnp.array(gg), jnp.array(machines),
        v_max=70.0, v_start=5.0, v_end=0.0))
    # lateral acceleration within ay_max (+ tolerance)
    ay = v ** 2 * np.abs(kappa)
    assert np.all(ay <= gg[:, 1] * 1.001)
    # start/end bounds
    assert v[0] <= 5.0 + 1e-5
    assert v[-1] <= 1e-5
    # longitudinal acceleration within limits (+drag headroom tolerance)
    ax = np.diff(v ** 2) / (2 * el[:-1])
    assert np.all(ax <= gg[:-1, 0] + 0.3)
    assert np.all(ax >= -(gg[:-1, 0] + np.max(v) ** 2 * 0.85 / 1000.0) - 0.3)


def test_fb_padding_noop():
    kappa, el, gg, machines = _track(seed=4)
    P = len(kappa)
    n_valid = 25
    el_pad = el.copy()
    el_pad[n_valid - 1:] = 0.0
    v = np.asarray(vel.calc_vel_profile_fb(
        jnp.array(kappa), jnp.array(el_pad), jnp.array(gg), jnp.array(machines),
        v_max=70.0, v_start=20.0, v_end=10.0, end_idx=n_valid))
    # velocity constant across padding
    np.testing.assert_allclose(v[n_valid - 1:], v[n_valid - 1], atol=1e-5)
    assert abs(v[n_valid - 1] - 10.0) < 1e-4  # v_end reached exactly at end


def test_brake_profile_monotone_to_zero():
    kappa, el, gg, _ = _track(seed=5)
    v = np.asarray(vel.calc_vel_profile_brake(
        jnp.array(kappa), jnp.array(el), jnp.array(gg), v_start=30.0))
    assert v[0] == 30.0
    assert np.all(np.diff(v) <= 1e-6)
    assert v[-1] < 1e-3  # 40 pts * 2.5 m is plenty to stop from 30 mps
    # braking at least as hard as drag-free friction limit would not exceed gg
    ax = np.diff(v ** 2) / (2 * el[:-1])
    assert np.all(ax <= 0.0 + 1e-6)


def test_ax_profile_and_convfilt():
    v = jnp.array([10.0, 12.0, 13.0, 13.0, 0.0])
    el = jnp.array([2.0, 2.0, 2.0, 0.0])
    ax = np.asarray(vel.calc_ax_profile(v, el))
    np.testing.assert_allclose(ax[:3], [(144 - 100) / 4, (169 - 144) / 4, 0.0])
    assert ax[3] == 0.0  # zero-length element -> no accel (padding)
    sig = jnp.arange(10.0)
    assert np.allclose(np.asarray(vel.conv_filt(sig, 1)), np.arange(10.0))
    f = np.asarray(vel.conv_filt(sig, 3))
    np.testing.assert_allclose(f[1:-1], np.arange(10.0)[1:-1], atol=1e-6)
    assert f[0] == 0.0 and f[-1] == 9.0  # edges kept


def _conv_filt_tph_np(signal, filt_window):
    """Scalar golden: tph.conv_filt(closed=False) semantics (tph v0.75)."""
    half = (filt_window - 1) // 2
    out = np.copy(signal)
    out[half:-half] = np.convolve(
        signal, np.ones(filt_window) / filt_window, mode="same")[half:-half]
    for i in range(1, half):
        out[i] = np.mean(signal[: i * 2 + 1])
        out[-i - 1] = np.mean(signal[-i * 2 - 1:])
    return out


def test_conv_filt_edges_match_tph():
    rng = np.random.default_rng(42)
    sig = rng.normal(size=31).astype(np.float64) * 5.0 + 20.0
    for w in (3, 5, 7):
        got = np.asarray(vel.conv_filt(jnp.array(sig), w))
        want = _conv_filt_tph_np(sig, w)
        np.testing.assert_allclose(got, want, atol=1e-6,
                                   err_msg=f"window={w}")
    import pytest
    with pytest.raises(ValueError):
        vel.conv_filt(jnp.array(sig), 4)


def test_follow_mode_basic():
    kappa, el, gg, machines = _track(seed=6)
    ctrl = {"c_p": 1.25, "k_d": 0.025, "k_p": 0.2}
    vx, too_close, ok, v_ctrl, ctrl_d = vel.calc_vel_profile_follow(
        jnp.array(kappa), jnp.array(el), jnp.array(gg), jnp.array(machines),
        v_start=20.0, v_ego=20.0, v_obj=15.0, v_max=70.0, safety_d=30.0,
        veh_length=4.7, obj_dist=60.0, opp_stop_dist=20.0, opp_vel_at=0.0,
        control_params=ctrl)
    vx = np.asarray(vx)
    assert not bool(too_close)
    assert vx.shape == kappa.shape
    assert vx[0] <= 20.0 + 1e-4
    # must brake towards the stopped-opponent point: final velocities zero
    assert vx[-1] < 1e-2


def test_follow_mode_too_close():
    kappa, el, gg, machines = _track(seed=7)
    ctrl = {"c_p": 1.25, "k_d": 0.025, "k_p": 0.2}
    _, too_close, _, _, _ = vel.calc_vel_profile_follow(
        jnp.array(kappa), jnp.array(el), jnp.array(gg), jnp.array(machines),
        v_start=20.0, v_ego=20.0, v_obj=15.0, v_max=70.0, safety_d=30.0,
        veh_length=4.7, obj_dist=10.0, opp_stop_dist=20.0, opp_vel_at=0.0,
        control_params=ctrl)
    assert bool(too_close)


def test_follow_control_vel_laws():
    ctrl = {"c_p": 1.25, "k_d": 0.025, "k_p": 0.2}
    v = float(vel.follow_control_vel(ctrl, obj_dist=50.0, control_d=42.2,
                                     v_obj=15.0, v_ego=20.0))
    expected = 15.0 - 0.2 * (42.2 - 50.0) + 0.025 * (15.0 - 20.0)
    assert abs(v - expected) < 1e-6
    ctrl_t = {"c_p": 1.15, "k_d": 0.025, "k_p": 0.2, "tan_w": 15.0}
    v2 = float(vel.follow_control_vel(ctrl_t, obj_dist=50.0, control_d=42.2,
                                      v_obj=15.0, v_ego=20.0,
                                      control_type="PDtan"))
    expected2 = 15.0 - np.tan((42.2 - 50.0) * np.pi / 2 / 15.0) * 0.2 \
        + 0.025 * (15.0 - 20.0)
    assert abs(v2 - expected2) < 1e-6
