"""Spline kernels vs the dense reference linear system (tph layout)."""

import numpy as np
import jax.numpy as jnp

from graphbasedlocaltrajectoryplanner_tpu.ops import splines as spl
from graphbasedlocaltrajectoryplanner_tpu.ops.heading import heading_to_dir


def _rand_path(n, seed=0, scale=30.0):
    rng = np.random.default_rng(seed)
    # monotone-ish wiggly path to avoid degenerate chords
    t = np.linspace(0, 1, n)
    x = t * scale + rng.normal(0, 1.0, n)
    y = 5.0 * np.sin(t * 3) + rng.normal(0, 1.0, n)
    return np.column_stack([x, y])


def test_hermite_matches_dense_two_point():
    p0 = np.array([0.0, 0.0])
    p1 = np.array([10.0, 3.0])
    psi0, psi1 = 0.3, -0.2
    cx, cy = spl.dense_calc_splines_np(np.vstack([p0, p1]), psi_s=psi0, psi_e=psi1)
    coeffs = np.asarray(spl.fit_hermite(p0, p1, psi0, psi1))
    np.testing.assert_allclose(coeffs[:, 0], cx[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(coeffs[:, 1], cy[0], rtol=1e-5, atol=1e-5)


def test_clamped_chain_matches_dense():
    path = _rand_path(8, seed=1)
    psi_s, psi_e = 0.5, -0.8
    cx, cy = spl.dense_calc_splines_np(path, psi_s=psi_s, psi_e=psi_e)
    coeffs = np.asarray(spl.fit_clamped_chain(path, psi_s, psi_e))
    np.testing.assert_allclose(coeffs[..., 0], cx, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(coeffs[..., 1], cy, rtol=1e-4, atol=1e-3)


def test_clamped_chain_with_el_lengths():
    path = _rand_path(6, seed=2)
    el = np.linalg.norm(np.diff(path, axis=0), axis=1) * 1.1  # non-euclidean
    psi_s, psi_e = 0.0, 0.3
    cx, cy = spl.dense_calc_splines_np(path, el_lengths=el, psi_s=psi_s, psi_e=psi_e)
    coeffs = np.asarray(spl.fit_clamped_chain(path, psi_s, psi_e, el_lengths=el))
    np.testing.assert_allclose(coeffs[..., 0], cx, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(coeffs[..., 1], cy, rtol=1e-4, atol=1e-3)


def test_periodic_chain_matches_dense():
    th = np.linspace(0, 2 * np.pi, 13)[:-1]
    path = np.column_stack([40 * np.cos(th), 25 * np.sin(th)])
    path += np.random.default_rng(3).normal(0, 0.3, path.shape)
    path_cl = np.vstack([path, path[0]])
    cx, cy = spl.dense_calc_splines_np(path_cl)
    coeffs = np.asarray(spl.fit_periodic_chain(path_cl))
    np.testing.assert_allclose(coeffs[..., 0], cx, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(coeffs[..., 1], cy, rtol=1e-4, atol=1e-3)


def test_eval_endpoints_and_heading():
    p0 = np.array([1.0, 2.0])
    p1 = np.array([7.0, -1.0])
    psi0, psi1 = 0.9, 0.4
    c = spl.fit_hermite(p0, p1, psi0, psi1)
    np.testing.assert_allclose(np.asarray(spl.eval_spline(c, 0.0)), p0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(spl.eval_spline(c, 1.0)), p1, atol=1e-5)
    psi_a, _ = spl.head_curv_an(c, jnp.array(0.0))
    assert abs(float(psi_a) - psi0) < 1e-5
    psi_b, _ = spl.head_curv_an(c, jnp.array(1.0))
    assert abs(float(psi_b) - psi1) < 1e-5


def test_head_curv_an_circle():
    # exact circle arc approximated by hermite: curvature should be ~1/R
    R = 50.0
    th0, th1 = 0.0, 0.25
    p0 = np.array([R * np.cos(th0), R * np.sin(th0)])
    p1 = np.array([R * np.cos(th1), R * np.sin(th1)])
    # heading tangent to circle (ccw): dir = (-sin th, cos th) -> psi with
    # dir_to_heading: psi = atan2(cos th, -sin th) - pi/2
    psi0 = np.arctan2(np.cos(th0), -np.sin(th0)) - np.pi / 2
    psi1 = np.arctan2(np.cos(th1), -np.sin(th1)) - np.pi / 2
    c = spl.fit_hermite(p0, p1, psi0, psi1)
    _, kappa = spl.head_curv_an(c, jnp.linspace(0, 1, 7))
    np.testing.assert_allclose(np.asarray(kappa), 1.0 / R, rtol=2e-2)


def test_spline_length_circle():
    R = 30.0
    psi0 = np.arctan2(1.0, 0.0) - np.pi / 2          # heading at theta=0
    th1 = 0.3
    p0 = np.array([R, 0.0])
    p1 = np.array([R * np.cos(th1), R * np.sin(th1)])
    psi1 = np.arctan2(np.cos(th1), -np.sin(th1)) - np.pi / 2
    c = spl.fit_hermite(p0, p1, psi0, psi1)
    ln = float(spl.spline_lengths(c))
    assert abs(ln - R * th1) / (R * th1) < 1e-2


def test_sample_uniform_counts_and_padding():
    p0 = np.array([0.0, 0.0])
    p1 = np.array([12.0, 0.0])
    c = spl.fit_hermite(p0, p1, 0.0, 0.0)
    pts, t, n_pts, length = spl.sample_uniform(c, 2.5, s_max=16)
    n = int(n_pts)
    assert n == int(np.ceil(float(length) / 2.5)) + 1
    # padding repeats final point
    pad = np.asarray(pts)[n - 1:]
    np.testing.assert_allclose(pad, np.broadcast_to(np.asarray(pts)[-1], pad.shape),
                               atol=1e-6)
    # uniform t over valid range
    np.testing.assert_allclose(np.asarray(t)[:n], np.linspace(0, 1, n), atol=1e-6)


def test_sample_chain_stepnum():
    path = _rand_path(5, seed=4)
    coeffs = spl.fit_clamped_chain(path, 0.0, 0.0)
    stepnum = np.array([4, 3, 5, 2])
    total = int(np.sum(stepnum - 1) + 1)
    pts, seg_idx, t = spl.sample_chain_stepnum(coeffs, stepnum, total_pts=total + 3)
    pts = np.asarray(pts)
    # node positions appear at segment boundaries
    starts = np.concatenate([[0], np.cumsum(stepnum - 1)])
    for i, s in enumerate(starts):
        np.testing.assert_allclose(pts[s], path[i], atol=1e-4)
    # padding repeats final point
    np.testing.assert_allclose(pts[total - 1:],
                               np.broadcast_to(pts[-1], pts[total - 1:].shape),
                               atol=1e-6)


def test_heading_dir_roundtrip():
    psis = np.linspace(-np.pi + 1e-3, np.pi - 1e-3, 17)
    d = np.asarray(heading_to_dir(jnp.array(psis)))
    from graphbasedlocaltrajectoryplanner_tpu.ops.heading import dir_to_heading
    back = np.asarray(dir_to_heading(jnp.array(d[:, 0]), jnp.array(d[:, 1])))
    np.testing.assert_allclose(back, psis, atol=1e-5)

