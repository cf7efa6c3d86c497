import numpy as np


def calc_ax_profile(vx_profile, el_lengths, eq_length_output=False):
    """Acceleration implied by a velocity profile (tph calc_ax_profile):
    ax_i = (v_{i+1}^2 - v_i^2) / (2 ds_i)."""
    vx = np.asarray(vx_profile, float)
    ds = np.asarray(el_lengths, float)[: vx.shape[0] - 1]
    ax = (vx[1:] ** 2 - vx[:-1] ** 2) / (2.0 * ds)
    if eq_length_output:
        ax = np.append(ax, 0.0)
    return ax
