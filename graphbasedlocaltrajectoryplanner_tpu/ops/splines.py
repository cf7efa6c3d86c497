"""Cubic-spline kernels (JAX) — the TPU-native equivalent of tph
``calc_splines`` / ``interp_splines`` / ``calc_head_curv_an``.

Spline model: per segment i a parametric cubic
``x_i(t) = a0 + a1 t + a2 t^2 + a3 t^3`` with ``t in [0, 1]`` (independently
for x and y).  The reference fits these with chord-length *scaled* continuity
conditions (tph calc_splines): first/second derivative continuity across
segments holds for the arc-normalized derivative ``m_j = dx/ds`` at the shared
node.  That makes the linear system equivalent to the classic tridiagonal
system in the nodal tangents ``m_j``:

    m_i + 2 (1 + lam_i) m_{i+1} + lam_i m_{i+2}
        = 3 (dP_i / L_i + lam_i dP_{i+1} / L_{i+1}),     lam_i = L_i / L_{i+1}

with clamped boundary tangents given by the start/end headings
(``m = (cos(psi + pi/2), sin(psi + pi/2))``, tph heading convention: the
boundary derivative is ``el_length * dir`` -> unit arc tangent), or periodic
conditions ``m_0 = m_n`` for closed paths.  Solved with a Thomas scan
(O(n), jittable) instead of the reference's dense ``numpy.linalg.solve`` over
a 4n x 4n matrix.  ``tests/test_splines.py`` cross-checks against a dense
construction of the reference's linear system.

Per-segment coefficients from nodal tangents (Hermite form):
    a0 = p_i
    a1 = m_i L_i
    a2 = 3 dP_i - 2 m_i L_i - m_{i+1} L_i
    a3 = -2 dP_i + m_i L_i + m_{i+1} L_i

Reference call sites: gen_edges.py:47,88; main_online_path_gen.py:305;
OnlineTrajectoryHandler.py:244.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphbasedlocaltrajectoryplanner_tpu.ops.heading import (
    heading_to_dir, dir_to_heading, normalize_psi)


# ---------------------------------------------------------------------------
# single-segment Hermite (two-point calc_splines with heading BCs)
# ---------------------------------------------------------------------------

def fit_hermite(p0, p1, psi0, psi1):
    """Cubic segment through ``p0 -> p1`` with boundary headings.

    Equals tph ``calc_splines`` on a two-point path with ``psi_s``/``psi_e``
    set (gen_edges.py:88-92): tangent magnitude = euclidean point distance.

    Batched over leading dims.  Returns coeffs shaped ``(..., 4, 2)`` with
    ``coeffs[..., :, 0] = x`` coefficients (a0..a3) and ``[..., 1] = y``.
    """
    p0 = jnp.asarray(p0)
    p1 = jnp.asarray(p1)
    dist = jnp.linalg.norm(p1 - p0, axis=-1, keepdims=True)
    d0 = heading_to_dir(psi0) * dist
    d1 = heading_to_dir(psi1) * dist
    dp = p1 - p0
    a0 = p0
    a1 = d0
    a2 = 3.0 * dp - 2.0 * d0 - d1
    a3 = -2.0 * dp + d0 + d1
    return jnp.stack([a0, a1, a2, a3], axis=-2)


# ---------------------------------------------------------------------------
# tridiagonal solves (Thomas as lax.scan; cyclic via Sherman-Morrison)
# ---------------------------------------------------------------------------

def _thomas(lower, diag, upper, rhs):
    """Solve a tridiagonal system with the Thomas algorithm as two scans.

    ``lower[0]`` and ``upper[-1]`` are ignored.  ``rhs`` may have trailing
    dims (solved for each column).
    """
    def fwd(carry, inp):
        c_prev, d_prev = carry
        a, b, c, d = inp
        denom = b - a * c_prev
        c_new = c / denom
        d_new = (d - a * d_prev) / denom
        return (c_new, d_new), (c_new, d_new)

    # carry inits derived from the inputs (not fresh constants) so their
    # varying-manual-axes type matches inside shard_map (shard_map.html#scan-vma)
    init = (diag[0] * 0.0, rhs[0] * 0.0)
    _, (c_p, d_p) = jax.lax.scan(fwd, init, (lower, diag, upper, rhs),
                                 unroll=8)

    def bwd(x_next, inp):
        c, d = inp
        x = d - c * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, rhs[0] * 0.0, (c_p, d_p), reverse=True,
                         unroll=8)
    return xs


def _cyclic_thomas(lower, diag, upper, rhs):
    """Solve a cyclic tridiagonal system (wrap terms ``lower[0]`` coupling to
    the last unknown and ``upper[-1]`` coupling to the first) via the
    Sherman-Morrison correction on top of :func:`_thomas`."""
    n = diag.shape[0]
    alpha = lower[0]     # A[0, n-1]
    beta = upper[-1]     # A[n-1, 0]
    gamma = -diag[0]
    diag_mod = diag.at[0].add(-gamma).at[n - 1].add(-alpha * beta / gamma)
    u = jnp.zeros((n,)).at[0].set(gamma).at[n - 1].set(beta)
    y = _thomas(lower, diag_mod, upper, rhs)
    q = _thomas(lower, diag_mod, upper, u[:, None] if rhs.ndim > 1 else u)
    if rhs.ndim > 1:
        q = q[:, 0]
        v_y = y[0] + (alpha / gamma) * y[n - 1]
        v_q = q[0] + (alpha / gamma) * q[n - 1]
        return y - q[:, None] * (v_y / (1.0 + v_q))[None, :]
    v_y = y[0] + (alpha / gamma) * y[n - 1]
    v_q = q[0] + (alpha / gamma) * q[n - 1]
    return y - q * (v_y / (1.0 + v_q))


# ---------------------------------------------------------------------------
# clamped chain fit (tph calc_splines, unclosed, psi_s/psi_e given)
# ---------------------------------------------------------------------------

def _coeffs_from_tangents(points, m, seg_len):
    """Hermite coefficients per segment from nodal arc-tangents ``m``."""
    dp = points[1:] - points[:-1]
    mL0 = m[:-1] * seg_len[:, None]
    mL1 = m[1:] * seg_len[:, None]
    a0 = points[:-1]
    a1 = mL0
    a2 = 3.0 * dp - 2.0 * mL0 - mL1
    a3 = -2.0 * dp + mL0 + mL1
    return jnp.stack([a0, a1, a2, a3], axis=1)  # (n_seg, 4, 2)


def fit_clamped_chain(points, psi_s, psi_e, el_lengths=None):
    """C2 cubic chain through ``points`` with clamped boundary headings.

    Equivalent to tph ``calc_splines(path, psi_s=..., psi_e=...,
    el_lengths=...)`` (used for the online C2 re-fit through the solution
    nodes, main_online_path_gen.py:305-309).

    :param points:      (n, 2) nodes, n >= 2.
    :param psi_s/psi_e: boundary headings (0 = north convention).
    :param el_lengths:  (n-1,) chord scaling lengths; euclidean distances if
                        ``None`` (tph default ``use_dist_scaling``).
    :returns: coeffs (n-1, 4, 2).
    """
    points = jnp.asarray(points)
    n_seg = points.shape[0] - 1
    if el_lengths is None:
        seg_len = jnp.linalg.norm(points[1:] - points[:-1], axis=-1)
    else:
        seg_len = jnp.asarray(el_lengths)
    seg_len = jnp.maximum(seg_len, 1e-12)

    m0 = heading_to_dir(psi_s)
    mn = heading_to_dir(psi_e)
    if n_seg == 1:
        m = jnp.stack([m0, mn])
        return _coeffs_from_tangents(points, m, seg_len)

    # tridiagonal system for interior tangents m_1 .. m_{n-1}
    lam = seg_len[:-1] / seg_len[1:]                       # (n_seg-1,)
    dp_over_l = (points[1:] - points[:-1]) / seg_len[:, None]
    rhs = 3.0 * (dp_over_l[:-1] + lam[:, None] * dp_over_l[1:])
    # subtract known boundary tangents from first/last equations
    rhs = rhs.at[0].add(-m0)
    rhs = rhs.at[-1].add(-lam[-1] * mn)
    lower = jnp.concatenate([jnp.zeros((1,)), jnp.ones((lam.shape[0] - 1,))])
    diag = 2.0 * (1.0 + lam)
    upper = jnp.concatenate([lam[:-1], jnp.zeros((1,))])
    m_int = _thomas(lower, diag, upper, rhs)
    m = jnp.concatenate([m0[None], m_int, mn[None]], axis=0)
    return _coeffs_from_tangents(points, m, seg_len)


def fit_periodic_chain(points_closed, el_lengths=None):
    """C2 *periodic* cubic chain (closed path).

    Equivalent to tph ``calc_splines`` on a closed path (first point repeated
    at the end; gen_edges.py:46-47 raceline spline).  The periodic conditions
    of the reference (gradient/curvature closure with chord scaling) are
    exactly ``m_0 = m_n`` in arc-normalized tangents.

    :param points_closed: (n+1, 2) with ``points_closed[0] == points_closed[-1]``.
    :param el_lengths:    (n,) segment lengths (euclidean if None).
    :returns: coeffs (n, 4, 2).
    """
    points_closed = jnp.asarray(points_closed)
    n_seg = points_closed.shape[0] - 1
    if el_lengths is None:
        seg_len = jnp.linalg.norm(points_closed[1:] - points_closed[:-1], axis=-1)
    else:
        seg_len = jnp.asarray(el_lengths)
    seg_len = jnp.maximum(seg_len, 1e-12)

    # cyclic system in m_0 .. m_{n-1}: equation j couples m_{j-1}, m_j, m_{j+1}
    # with lam_j = L_{j-1}/L_j using segment indices mod n.
    prev_len = jnp.roll(seg_len, 1)                        # L_{j-1}
    lam = prev_len / seg_len
    dp_over_l = (points_closed[1:] - points_closed[:-1]) / seg_len[:, None]
    rhs = 3.0 * (jnp.roll(dp_over_l, 1, axis=0) + lam[:, None] * dp_over_l)
    lower = jnp.ones((n_seg,))
    diag = 2.0 * (1.0 + lam)
    upper = lam
    m = _cyclic_thomas(lower, diag, upper, rhs)
    m_ext = jnp.concatenate([m, m[:1]], axis=0)
    return _coeffs_from_tangents(points_closed, m_ext, seg_len)


# ---------------------------------------------------------------------------
# evaluation / sampling
# ---------------------------------------------------------------------------

def eval_spline(coeffs, t):
    """Evaluate spline segment(s) at parameter(s) t.

    ``coeffs``: (..., 4, 2); ``t``: broadcastable to (...,).  Returns (..., 2).
    """
    t = jnp.asarray(t)[..., None]
    a0, a1, a2, a3 = (coeffs[..., 0, :], coeffs[..., 1, :],
                      coeffs[..., 2, :], coeffs[..., 3, :])
    return a0 + t * (a1 + t * (a2 + t * a3))


def eval_spline_d(coeffs, t):
    """First derivative wrt t."""
    t = jnp.asarray(t)[..., None]
    a1, a2, a3 = coeffs[..., 1, :], coeffs[..., 2, :], coeffs[..., 3, :]
    return a1 + t * (2.0 * a2 + t * 3.0 * a3)


def eval_spline_dd(coeffs, t):
    """Second derivative wrt t."""
    t = jnp.asarray(t)[..., None]
    a2, a3 = coeffs[..., 2, :], coeffs[..., 3, :]
    return 2.0 * a2 + t * 6.0 * a3


def head_curv_an(coeffs, t):
    """Analytic heading + curvature at parameter(s) t (tph calc_head_curv_an).

    ``psi = atan2(y', x') - pi/2`` (0 = north), ``kappa = (x' y'' - y' x'') /
    (x'^2 + y'^2)^1.5``.
    """
    d = eval_spline_d(coeffs, t)
    dd = eval_spline_dd(coeffs, t)
    psi = dir_to_heading(d[..., 0], d[..., 1])
    denom = jnp.power(d[..., 0] ** 2 + d[..., 1] ** 2, 1.5)
    kappa = (d[..., 0] * dd[..., 1] - d[..., 1] * dd[..., 0]) / jnp.maximum(denom, 1e-12)
    return psi, kappa


def spline_lengths(coeffs, n_interp: int = 15):
    """Approximate arc length per segment by summing ``n_interp - 1`` chords
    (tph calc_spline_lengths default).  ``coeffs``: (..., 4, 2)."""
    t = jnp.linspace(0.0, 1.0, n_interp)
    t_b = jnp.broadcast_to(t, coeffs.shape[:-2] + (n_interp,))
    pts = eval_spline(coeffs[..., None, :, :], t_b)  # (..., n_interp, 2)
    d = jnp.diff(pts, axis=-2)
    return jnp.sum(jnp.linalg.norm(d, axis=-1), axis=-1)


def sample_uniform(coeffs, stepsize_approx: float, s_max: int,
                   n_interp: int = 15):
    """Sample one cubic segment ~uniformly in arc length, padded to ``s_max``.

    Mirrors tph ``interp_splines(..., stepsize_approx, incl_last_point=True)``
    on a single spline (gen_edges.py:128-131): the number of points is
    ``ceil(len / step) + 1``; for a single segment the reference's
    dist-to-parameter mapping degenerates to ``t = dist / length``, i.e.
    t-uniform sampling — replicated here (not true-arc-uniform).

    Returns (points (s_max, 2), t_values (s_max,), n_pts scalar int32,
    length scalar).  Padding repeats the end point (t = 1).
    """
    length = spline_lengths(coeffs, n_interp)
    n_pts = jnp.minimum(jnp.ceil(length / stepsize_approx).astype(jnp.int32) + 1,
                        s_max)
    n_pts = jnp.maximum(n_pts, 2)
    idx = jnp.arange(s_max)
    t_vals = jnp.minimum(idx / jnp.maximum(n_pts - 1, 1), 1.0)
    pts = eval_spline(coeffs, t_vals)
    return pts, t_vals, n_pts, length


def sample_chain_stepnum(coeffs, stepnum, total_pts: int):
    """Sample a chain of segments with a fixed number of points per segment
    (tph ``interp_splines(..., stepnum_fixed=...)``,
    main_online_path_gen.py:312-316): t uniform in [0, 1] per segment, the
    shared endpoint emitted once, final endpoint included.

    :param coeffs:    (n_seg, 4, 2).
    :param stepnum:   (n_seg,) int — points per segment *including* both ends.
    :param total_pts: static output size (>= sum(stepnum - 1) + 1); padding
                      repeats the final point.
    :returns: (points (total_pts, 2), seg_idx (total_pts,), t (total_pts,))
    """
    stepnum = jnp.asarray(stepnum, jnp.int32)
    n_seg = coeffs.shape[0]
    counts = jnp.maximum(stepnum - 1, 0)           # points emitted per segment
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
    n_total = starts[-1] + 1
    idx = jnp.arange(total_pts)
    # comparison-sum instead of searchsorted (which lowers to a slow
    # sequential loop on TPU): seg_idx = #starts[1:] <= idx
    seg_idx = jnp.sum((starts[1:][None, :] <= idx[:, None]).astype(jnp.int32),
                      axis=1)
    seg_idx = jnp.clip(seg_idx, 0, n_seg - 1)
    within = idx - starts[seg_idx]
    t = within / jnp.maximum(stepnum[seg_idx] - 1, 1)
    # past the true end: clamp to final point of last segment
    last_seg = jnp.clip(
        jnp.sum((starts[1:] <= (n_total - 1)).astype(jnp.int32)), 0, n_seg - 1)
    t = jnp.where(idx >= n_total - 1, 1.0, t)
    seg_idx = jnp.where(idx >= n_total - 1, last_seg, seg_idx)
    pts = eval_spline(coeffs[seg_idx], t)
    return pts, seg_idx, t


# ---------------------------------------------------------------------------
# dense reference construction (tests / goldens only; mirrors tph layout)
# ---------------------------------------------------------------------------

def dense_calc_splines_np(path: np.ndarray,
                          el_lengths: np.ndarray = None,
                          psi_s: float = None,
                          psi_e: float = None):
    """Dense NumPy construction of the reference linear system (tph
    calc_splines layout) used as a golden in tests.  Returns
    (coeffs_x (n,4), coeffs_y (n,4))."""
    path = np.asarray(path, float)
    closed = np.all(np.isclose(path[0], path[-1]))
    if el_lengths is None:
        el_lengths = np.sqrt(np.sum(np.diff(path, axis=0) ** 2, axis=1))
    else:
        el_lengths = np.asarray(el_lengths, float)
    if closed:
        el_lengths = np.append(el_lengths, el_lengths[0])
    scaling = el_lengths[:-1] / el_lengths[1:]

    n = path.shape[0] - 1
    M = np.zeros((4 * n, 4 * n))
    bx = np.zeros(4 * n)
    by = np.zeros(4 * n)
    tmpl = np.array([[1., 0., 0., 0., 0., 0., 0., 0.],
                     [1., 1., 1., 1., 0., 0., 0., 0.],
                     [0., 1., 2., 3., 0., -1., 0., 0.],
                     [0., 0., 2., 6., 0., 0., -2., 0.]])
    for i in range(n):
        j = 4 * i
        if i < n - 1:
            M[j:j + 4, j:j + 8] = tmpl
            M[j + 2, j + 5] *= scaling[i]
            M[j + 3, j + 6] *= scaling[i] ** 2
        else:
            M[j, j:j + 4] = [1., 0., 0., 0.]
            M[j + 1, j:j + 4] = [1., 1., 1., 1.]
        bx[j], bx[j + 1] = path[i, 0], path[i + 1, 0]
        by[j], by[j + 1] = path[i, 1], path[i + 1, 1]

    if not closed:
        M[-2, 1] = 1.0
        bx[-2] = np.cos(psi_s + np.pi / 2) * el_lengths[0]
        by[-2] = np.sin(psi_s + np.pi / 2) * el_lengths[0]
        M[-1, -4:] = [0., 1., 2., 3.]
        bx[-1] = np.cos(psi_e + np.pi / 2) * el_lengths[-1]
        by[-1] = np.sin(psi_e + np.pi / 2) * el_lengths[-1]
    else:
        M[-2, 1] = scaling[-1]
        M[-2, -3:] = [-1., -2., -3.]
        M[-1, 2] = 2.0 * scaling[-1] ** 2
        M[-1, -2:] = [-2., -6.]

    cx = np.linalg.solve(M, bx).reshape(n, 4)
    cy = np.linalg.solve(M, by).reshape(n, 4)
    return cx, cy
