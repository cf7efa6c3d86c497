import math

import numpy as np

from .calc_spline_lengths import calc_spline_lengths


def _eval(coeffs_x, coeffs_y, inds, t):
    T = np.stack([np.ones_like(t), t, t ** 2, t ** 3], axis=1)  # (P, 4)
    x = np.sum(coeffs_x[inds] * T, axis=1)
    y = np.sum(coeffs_y[inds] * T, axis=1)
    return np.column_stack((x, y))


def interp_splines(coeffs_x, coeffs_y, spline_lengths=None,
                   incl_last_point=False, stepsize_approx=None,
                   stepnum_fixed=None):
    """Sample a spline chain (tph interp_splines): either ~uniform arc-length
    spacing with ``ceil(total/stepsize)+1`` points and linear dist->t mapping
    within each segment, or a fixed number of points per segment with shared
    joints emitted once.  Returns (path, spline_inds, t_values, dists)."""
    coeffs_x = np.atleast_2d(np.asarray(coeffs_x, float))
    coeffs_y = np.atleast_2d(np.asarray(coeffs_y, float))
    n_spl = coeffs_x.shape[0]

    if stepsize_approx is not None:
        if spline_lengths is None:
            spline_lengths = calc_spline_lengths(coeffs_x, coeffs_y)
        dists_cum = np.cumsum(spline_lengths)
        no_points = math.ceil(dists_cum[-1] / stepsize_approx) + 1
        dists = np.linspace(0.0, dists_cum[-1], no_points)
        inds = np.zeros(no_points, dtype=int)
        t = np.zeros(no_points)
        for i in range(no_points - 1):
            j = int(np.argmax(dists[i] < dists_cum))
            inds[i] = j
            t[i] = (dists[i] - dists_cum[j] + spline_lengths[j]) \
                / spline_lengths[j]
        inds[-1] = n_spl - 1
        t[-1] = 1.0
    elif stepnum_fixed is not None:
        assert len(stepnum_fixed) == n_spl
        no_points = int(np.sum(np.asarray(stepnum_fixed) - 1)) + 1
        inds = np.zeros(no_points, dtype=int)
        t = np.zeros(no_points)
        k = 0
        for j, sn in enumerate(stepnum_fixed):
            seg_t = np.linspace(0.0, 1.0, int(sn))
            take = seg_t[:-1] if j < n_spl - 1 else seg_t
            m = len(take)
            inds[k:k + m] = j
            t[k:k + m] = take
            k += m
        dists = None
    else:
        raise RuntimeError("provide either stepsize_approx or stepnum_fixed")

    path = _eval(coeffs_x, coeffs_y, inds, t)
    if not incl_last_point:
        path = path[:-1]
        inds = inds[:-1]
        t = t[:-1]
        if dists is not None:
            dists = dists[:-1]
    return path, inds, t, dists
