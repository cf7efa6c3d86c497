"""``vo.src.online_qp.online_qp`` stand-in — the per-call QP solve VpSQP
dispatches to (VpSQP.py:224-236, 394-406, 496-508).

The QP core is THIS repo's dense ADMM (ops/qp.py qp_vel_profile) executed
on the CPU backend with inputs constructed EXACTLY like the TPU framework's
``velplan.velocity_kernel`` SQP path builds them for the same m-point
window — so a recorded reference run and its TPU replay share the solver
bit-for-bit and the fixture isolates the surrounding VpSQP/OTH seam logic
(see the package docstring for what this does and does not prove).

Powertrain arguments (``F_ini``, ``P_max``) are accepted and ignored; the
machine acceleration table [[100, 5]] matches the facade default both
harness sides drive with (Graph_LTPL.calc_vel_profile signature).
"""

import os
import sys

import numpy as np

# the shim runs inside the reference-recorder process whose sys.path holds
# only the shims dir + /root/reference — add the repo root for the QP core
_TOP = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))))
if _TOP not in sys.path:
    sys.path.insert(0, _TOP)

_MACHINES = np.array([[100.0, 5.0]], dtype=np.float32)
_DRAG = 0.85
_M_VEH = 1000.0


def _force_cpu_jax():
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass        # backend already initialized (caller's responsibility)
    return jax


def online_qp(velqp, v_ini, kappa, delta_s, x0_v, v_max, v_end, F_ini,
              s_glob, ax_max=None, ay_max=None, v_max_cstr=None,
              P_max=None):
    """Solve the m-point velocity QP.  Returns ``(vx, None, qp_status)``
    with the OSQP-style status codes VpSQP branches on (0 solved, 2
    inaccurate, -3 primal infeasible)."""
    jax = _force_cpu_jax()
    import jax.numpy as jnp
    from graphbasedlocaltrajectoryplanner_tpu.ops.qp import (
        qp_vel_profile, qp_solver_status)

    m = int(velqp.m)
    kappa = np.asarray(kappa, np.float32)
    delta_s = np.asarray(delta_s, np.float32)
    assert kappa.shape[0] == m and delta_s.shape[0] == m - 1, \
        (kappa.shape, delta_s.shape)
    # el carries the m-1 step lengths; the final entry only marks the row
    # active (qp_vel_profile uses el[:-1] as ds)
    el = np.append(delta_s, delta_s[-1]).astype(np.float32)
    ax = (np.full(m, velqp.sym_sc_["axmax_mps2_"], np.float32)
          if ax_max is None else np.asarray(ax_max, np.float32))
    ay = (np.full(m, velqp.sym_sc_["aymax_mps2_"], np.float32)
          if ay_max is None else np.asarray(ay_max, np.float32))
    gg = np.stack([ax, ay], axis=1)
    v_max_pt = np.asarray(v_max, np.float32)

    vx, res = qp_vel_profile(
        jnp.asarray(kappa), jnp.asarray(el), jnp.asarray(gg),
        jnp.asarray(_MACHINES), jnp.asarray(v_max_pt),
        jnp.float32(v_ini), v_end=jnp.float32(v_end), end_idx=m,
        drag_coeff=_DRAG, m_veh=_M_VEH, pin_idx=0,
        x0_v=jnp.asarray(np.asarray(x0_v, np.float32)))
    status = int(qp_solver_status(res))
    return np.asarray(vx, float), None, status
