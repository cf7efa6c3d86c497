import numpy as np

from .normalize_psi import normalize_psi


def calc_head_curv_an(coeffs_x, coeffs_y, ind_spls, t_spls):
    """Analytic heading + curvature along a sampled spline chain (tph
    calc_head_curv_an): psi = atan2(y', x') - pi/2 (0 = north, wrapped),
    kappa = (x' y'' - y' x'') / (x'^2 + y'^2)^1.5."""
    coeffs_x = np.atleast_2d(np.asarray(coeffs_x, float))
    coeffs_y = np.atleast_2d(np.asarray(coeffs_y, float))
    ind_spls = np.asarray(ind_spls, int)
    t = np.asarray(t_spls, float)

    cx = coeffs_x[ind_spls]
    cy = coeffs_y[ind_spls]
    x_d = cx[:, 1] + 2.0 * cx[:, 2] * t + 3.0 * cx[:, 3] * t ** 2
    y_d = cy[:, 1] + 2.0 * cy[:, 2] * t + 3.0 * cy[:, 3] * t ** 2
    x_dd = 2.0 * cx[:, 2] + 6.0 * cx[:, 3] * t
    y_dd = 2.0 * cy[:, 2] + 6.0 * cy[:, 3] * t

    psi = normalize_psi(np.arctan2(y_d, x_d) - np.pi / 2.0)
    kappa = (x_d * y_dd - y_d * x_dd) \
        / np.maximum(np.power(x_d ** 2 + y_d ** 2, 1.5), 1e-12)
    return psi, kappa
