"""OSQP-style ADMM QP solver (JAX) + the QP velocity-planning formulation.

TPU-native equivalent of the reference's optional SQP velocity planner
(``online_graph/src/VpSQP.py`` wrapping the external ``velocity_optimization``
package and the OSQP C solver, SURVEY.md section 2 component 24).  Instead of
a sparse CPU solver, the KKT system is factorized densely once per solve and
reused across all ADMM iterations — at the planner's horizon length
(~115-160 points) dense triangular solves are MXU work and batch over
actions/scenarios.

QP velocity planning in squared-speed coordinates ``x_i = v_i^2`` (standard
convex reformulation; with the diamond friction model ``dyn_model_exp = 1``
the constraints are exactly linear):

    minimize    -w_v * sum(x) + w_s/2 * ||D1 x||^2
    subject to  0 <= x_i <= min(v_max, v_lat_i)^2          (box)
                a_i + (ax_max_i |kappa_i| / ay_max_i) x_i <= ax_acc_i
                -a_i + (ax_max_i |kappa_i| / ay_max_i) x_i <= ax_dec_i
                x_0 = v_start^2,  x_{end} <= v_end^2

with ``a_i = (x_{i+1} - x_i) / (2 ds_i)`` the implied acceleration.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e12


def admm_qp(P, q, A, l, u, iters: int = 60, rho=1.0,
            sigma: float = 1e-6, alpha: float = 1.6, x0=None):
    """Solve ``min 1/2 x'Px + q'x  s.t. l <= Ax <= u`` with fixed-iteration
    ADMM (OSQP splitting).  All dense; differentiable; batchable via vmap.

    :param rho: scalar or (m,) per-constraint penalty (stiffer rows converge
                faster — OSQP uses the same mechanism for equalities).
    :returns: (x, z, residuals dict)
    """
    n = q.shape[0]
    m = l.shape[0]
    rho = jnp.broadcast_to(jnp.asarray(rho, q.dtype), (m,))
    K = P + sigma * jnp.eye(n) + (A.T * rho[None, :]) @ A
    K_cho = jax.scipy.linalg.cho_factor(K)
    # explicit inverse instead of per-iteration cho_solve: batched
    # triangular solves are sequential-substitution-bound on TPU (94% of
    # the SQP fleet tick was triangular_solve before this) — two solves
    # against the identity ONCE, then every iteration's KKT solve is an
    # MXU matmul.  K is regularized (sigma + rho-weighted A'A), so the
    # inverse is well-conditioned; KKT-residual goldens pin the accuracy
    # (tests/test_qp_kkt.py).
    K_inv = jax.scipy.linalg.cho_solve(K_cho, jnp.eye(n))

    x = jnp.zeros((n,)) if x0 is None else x0
    z = A @ x
    y = jnp.zeros((m,))

    def step(carry, _):
        x, z, y = carry
        rhs = sigma * x - q + A.T @ (rho * z - y)
        x_t = K_inv @ rhs
        z_t = A @ x_t
        x_new = alpha * x_t + (1 - alpha) * x
        z_new = jnp.clip(alpha * z_t + (1 - alpha) * z + y / rho, l, u)
        y_new = y + rho * (alpha * z_t + (1 - alpha) * z - z_new)
        return (x_new, z_new, y_new), None

    (x, z, y), _ = jax.lax.scan(step, (x, z, y), None, length=iters)
    r_prim = jnp.max(jnp.abs(A @ x - z))
    r_dual = jnp.max(jnp.abs(P @ x + q + A.T @ y))
    return x, z, dict(r_prim=r_prim, r_dual=r_dual, y=y)


@partial(jax.jit, static_argnames=("iters",))
def qp_vel_profile(kappa: jnp.ndarray,
                   el_lengths: jnp.ndarray,
                   loc_gg: jnp.ndarray,
                   ax_max_machines: jnp.ndarray,
                   v_max,
                   v_start,
                   v_end=None,
                   end_idx=None,
                   drag_coeff: float = 0.85,
                   m_veh: float = 1000.0,
                   w_smooth: float = 1e-4,
                   iters: int = 150,
                   pin_idx=0,
                   v_max_scale=None,
                   x0_v=None):
    """QP-based velocity profile with the interface of
    :func:`ops.velocity.calc_vel_profile_fb` (padding no-ops via zero element
    lengths).  ``pin_idx`` is the (traced) profile-start index where
    ``v = v_start`` is enforced exactly (a zero-length-masked prefix may
    precede it).  Returns a (P,) velocity profile.

    :param v_max: scalar or (P,) pointwise velocity cap — the pointwise form
        carries the follow-mode opponent constraint of the reference SQP
        planner (VpSQP.calc_vel_profile_follow:156-181 ``vmax_mps``).
    :param v_max_scale: scalar used for the box normalization when ``v_max``
        is pointwise (pass the behaviour-planner vel_max).
    :param x0_v: optional (P,) cross-tick warm-start velocity guess (the
        reference's MPC-shifted ``x0`` from IniSQPStatemachine,
        VpSQP.py:86,213-217); None starts from the relaxed optimum.
    """
    P_ = kappa.shape[0]
    idx = jnp.arange(P_)
    kappa_abs = jnp.abs(kappa)
    ax_max = loc_gg[..., 0]
    ay_max = loc_gg[..., 1]
    ds = jnp.maximum(el_lengths, 1e-3)
    active = el_lengths > 1e-9                       # real segments

    if end_idx is None:
        end_idx = P_
    v_max_pt = jnp.broadcast_to(jnp.asarray(v_max), (P_,))
    if v_max_scale is None:
        v_max_scale = jnp.max(v_max_pt)
    v_max = v_max_scale

    # velocity caps
    v_lat2 = ay_max / jnp.maximum(kappa_abs, 1e-9)
    x_hi = jnp.minimum(v_lat2, v_max_pt ** 2)
    if v_end is not None:
        x_hi = jnp.where(idx >= end_idx - 1, jnp.minimum(x_hi, v_end ** 2),
                         x_hi)
    pin_oh = (idx == pin_idx)
    x_hi = jnp.where(pin_oh, jnp.minimum(x_hi, v_start ** 2), x_hi)

    # machine accel at a nominal velocity (linearization point = lat cap)
    v_nom = jnp.sqrt(jnp.maximum(x_hi, 0.0))
    ax_machine = jnp.interp(v_nom, ax_max_machines[:, 0], ax_max_machines[:, 1])
    drag = drag_coeff / m_veh                        # * v^2 term
    # friction-coupling coefficient (diamond model)
    c_fric = ax_max * kappa_abs / jnp.maximum(ay_max, 1e-9)

    n = P_
    # --- scaling: work in x' = x / s with s = v_max^2 so the box is [0, 1]
    # and every constraint row has O(1) coefficients (Ruiz-lite) ------------
    s_x = jnp.maximum(v_max ** 2, 1.0)
    rows_i = jnp.arange(n - 1)
    # (x'_{i+1} - x'_i) + 2 ds (c_fric +- drag) x' <= 2 ds ax / s
    Dn = (jnp.zeros((n - 1, n))
          .at[rows_i, rows_i].set(-1.0)
          .at[rows_i, rows_i + 1].set(1.0))
    coef_acc = 2.0 * ds[:-1] * (c_fric[:-1] + drag)
    coef_dec = 2.0 * ds[:-1] * (c_fric[:-1] - drag)
    A_acc = Dn + jnp.zeros((n - 1, n)).at[rows_i, rows_i].set(coef_acc)
    A_dec = -Dn + jnp.zeros((n - 1, n)).at[rows_i, rows_i].set(coef_dec)
    u_acc = 2.0 * ds[:-1] * jnp.minimum(ax_max[:-1], ax_machine[:-1]) / s_x
    u_dec = 2.0 * ds[:-1] * ax_max[:-1] / s_x
    # deactivate constraints on padded segments
    u_acc = jnp.where(active[:-1], u_acc, _BIG)
    u_dec = jnp.where(active[:-1], u_dec, _BIG)

    A = jnp.concatenate([jnp.eye(n), A_acc, A_dec], axis=0)
    l = jnp.concatenate([jnp.zeros((n,)),
                         jnp.full((2 * (n - 1),), -_BIG)])
    x_hi_n = x_hi / s_x
    u = jnp.concatenate([x_hi_n, u_acc, u_dec])
    # pin the profile start (lower bound up to the cap; the box upper bound
    # already caps it from above)
    start_val = jnp.minimum(v_start ** 2,
                            x_hi[jnp.clip(pin_idx, 0, n - 1)]) / s_x
    l = l.at[:n].set(jnp.where(pin_oh, start_val, l[:n]))

    # objective: track the velocity caps (the relaxed optimum) as closely as
    # the dynamics allow — the strongly convex tracking formulation of the
    # reference's SQP planner (velocity_optimization); plus light smoothing
    # of the implied acceleration
    Pmat = jnp.eye(n) + w_smooth * (Dn.T @ Dn)
    q = -x_hi_n

    # stiff penalties on the dynamics rows (their bounds are tiny in scaled
    # units, so primal violations there translate to large accelerations)
    # and on the pinned start row (equality)
    rho_box = jnp.where(pin_oh, 400.0, 5.0)
    rho_vec = jnp.concatenate([rho_box, jnp.full((2 * (n - 1),), 400.0)])
    x0 = x_hi_n if x0_v is None else jnp.minimum(x0_v ** 2 / s_x, x_hi_n)
    x_n, _, res = admm_qp(Pmat, q, A, l, u, iters=iters, rho=rho_vec,
                          x0=x0)
    x = jnp.clip(x_n * s_x, 0.0, x_hi)
    # exact start pin (the ADMM satisfies it only to solver tolerance, but
    # the handler's velocity-bound check is strict, OTH:905-911)
    x = jnp.where(pin_oh, jnp.minimum(v_start ** 2, x_hi), x)
    return jnp.sqrt(jnp.maximum(x, 0.0)), res


def qp_solver_status(res: dict):
    """Map ADMM residuals to the OSQP-style status codes the reference's
    infeasibility handoff branches on (VpSQP.py:238-243, 415-430): ``-3``
    primal infeasible, ``2`` solved inaccurately, ``0`` solved.

    A fixed-iteration ADMM has no infeasibility certificate, so thresholds on
    the scaled primal residual stand in (documented deviation, PARITY.md):
    the dynamics rows operate in [0, 1]-scaled units where a residual of 1e-2
    corresponds to multi-m/s^2 constraint violation.
    """
    r = res["r_prim"]
    return jnp.where(r > 5e-2, jnp.int32(-3),
                     jnp.where(r > 5e-3, jnp.int32(2), jnp.int32(0)))
