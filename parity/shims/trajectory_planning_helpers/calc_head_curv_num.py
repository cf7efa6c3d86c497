import numpy as np

from .normalize_psi import normalize_psi


def calc_head_curv_num(path, el_lengths, is_closed,
                       stepsize_psi_preview=1.0, stepsize_psi_review=1.0,
                       stepsize_curv_preview=2.0, stepsize_curv_review=2.0,
                       calc_curv=True):
    """Numerical heading + curvature of a polyline (tph calc_head_curv_num):
    tangent at i is the chord i-review -> i+preview with step counts
    max(round(stepsize / mean(el_lengths)), 1); curvature is the wrapped
    heading difference over the curvature window divided by its summed
    element lengths.  Mirrors ops/heading.calc_head_curv_num."""
    path = np.asarray(path, float)
    el = np.asarray(el_lengths, float)
    n = path.shape[0]
    avg = float(np.mean(el))
    sp_prev = max(round(stepsize_psi_preview / avg), 1)
    sp_rev = max(round(stepsize_psi_review / avg), 1)
    sc_prev = max(round(stepsize_curv_preview / avg), 1)
    sc_rev = max(round(stepsize_curv_review / avg), 1)

    idx = np.arange(n)
    if is_closed:
        tang = path[(idx + sp_prev) % n] - path[(idx - sp_rev) % n]
        psi = normalize_psi(np.arctan2(tang[:, 1], tang[:, 0]) - np.pi / 2)
        if not calc_curv:
            return psi, None
        dpsi = normalize_psi(psi[(idx + sc_prev) % n] - psi[(idx - sc_rev) % n])
        win = sc_prev + sc_rev
        csum = np.concatenate(([0.0], np.cumsum(np.tile(el, 3))))
        start = idx + n - sc_rev
        seg_len = csum[start + win] - csum[start]
        kappa = dpsi / np.maximum(seg_len, 1e-12)
    else:
        lo = np.maximum(idx - sp_rev, 0)
        hi = np.minimum(idx + sp_prev, n - 1)
        tang = path[hi] - path[lo]
        psi = normalize_psi(np.arctan2(tang[:, 1], tang[:, 0]) - np.pi / 2)
        if not calc_curv:
            return psi, None
        lo_c = np.maximum(idx - sc_rev, 0)
        hi_c = np.minimum(idx + sc_prev, n - 1)
        dpsi = normalize_psi(psi[hi_c] - psi[lo_c])
        csum = np.concatenate(([0.0], np.cumsum(el)))
        seg_len = csum[hi_c] - csum[lo_c]
        kappa = dpsi / np.maximum(seg_len, 1e-12)
    return psi, kappa
