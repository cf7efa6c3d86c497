"""Ideal-controller vehicle dummy — forward-integrates along the last
planned trajectory (reference testing_tools/src/vdc_dummy.py:5-58): closes
the control loop without a physics simulator."""

from __future__ import annotations

import numpy as np


def vdc_dummy(pos_est, last_s_course, last_path, last_vel_course,
              iter_time: float):
    """Integrate ``iter_time`` seconds along the trajectory.

    :returns: (new position [x, y], velocity estimate there)
    """
    if last_path.shape[0] > 2:
        d2 = ((last_path[:, 0] - pos_est[0]) ** 2
              + (last_path[:, 1] - pos_est[1]) ** 2)
        idx_nb = sorted(np.argpartition(d2, 2)[:2])
        nb_1 = last_path[idx_nb[0], :]
        dist_s = float(np.hypot(nb_1[0] - pos_est[0], nb_1[1] - pos_est[1]))
        s = dist_s + last_s_course[idx_nb[0]]
        t = 0.0
        dt = 0.001
        while t < iter_time:
            s += max(np.interp(s, last_s_course, last_vel_course) * dt, 1e-4)
            t += dt
        pos_out = [float(np.interp(s, last_s_course, last_path[:, 0])),
                   float(np.interp(s, last_s_course, last_path[:, 1]))]
        vel_est = float(np.interp(s, last_s_course, last_vel_course))
    else:
        pos_out = list(pos_est)
        vel_est = float(last_vel_course[0])
    return pos_out, vel_est
