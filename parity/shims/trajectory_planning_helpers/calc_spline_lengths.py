import numpy as np


def calc_spline_lengths(coeffs_x, coeffs_y, quickndirty=False,
                        no_interp_points=15):
    """Arc length per spline segment (tph calc_spline_lengths): chord sum
    over ``no_interp_points`` samples, or start-to-end distance if
    quickndirty."""
    coeffs_x = np.atleast_2d(coeffs_x)
    coeffs_y = np.atleast_2d(coeffs_y)
    n = coeffs_x.shape[0]
    if quickndirty:
        return np.sqrt(
            (np.sum(coeffs_x, axis=1) - coeffs_x[:, 0]) ** 2
            + (np.sum(coeffs_y, axis=1) - coeffs_y[:, 0]) ** 2)
    t = np.linspace(0.0, 1.0, no_interp_points)
    T = np.stack([np.ones_like(t), t, t ** 2, t ** 3])   # (4, P)
    lengths = np.zeros(n)
    for i in range(n):
        x = coeffs_x[i] @ T
        y = coeffs_y[i] @ T
        lengths[i] = np.sum(np.hypot(np.diff(x), np.diff(y)))
    return lengths
