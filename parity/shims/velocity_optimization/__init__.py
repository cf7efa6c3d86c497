"""Stand-in for the external ``velocity_optimization`` package (TUMFTM),
which the reference's optional SQP velocity planner wraps
(/root/reference/graph_ltpl/online_graph/src/VpSQP.py:7 — the reference
itself silently falls back to the fb planner when this import fails,
OnlineTrajectoryHandler.py:128-130).

Purpose: the sandbox has neither the ``velocity_optimization`` package nor
its OSQP solver, so the reference's ``vp_type=sqp`` configuration cannot
execute at all.  This shim implements the exact API surface VpSQP touches
(``VelQP``, ``IniSQPStatemachine.IniSQP``, ``online_qp``) with the QP core
supplied by THIS repo's dense ADMM solver
(graphbasedlocaltrajectoryplanner_tpu/ops/qp.py, run on the CPU backend),
so the reference's VpSQP + OnlineTrajectoryHandler SQP seam logic — m-point
window truncation/padding, follow-mode opponent vmax fill, MPC warm-start
shifting, solver-status infeasibility handoff, export assembly — executes
VERBATIM as the golden for the parity harness (parity/run_reference.py
--vp sqp).

What the resulting fixture does and does not prove (PARITY.md "SQP
golden"): it pins the TPU framework's replication of every line of the
reference's SQP *seam* end-to-end; it does NOT independently validate the
QP core itself (both sides share it by construction — the core has its own
KKT / closed-form / adversarial-infeasibility goldens in
tests/test_qp_kkt.py).

Documented deviations from the real package (none observable through
VpSQP's call surface for the recorded scenarios):
  * vehicle/solver parameters are not read from the vo params files (not
    shipped); the constants mirror the graph_ltpl example configuration
    (local gg 5.0 m/s^2, drag 0.85/1000 kg, machine limit 5.0 m/s^2) that
    both the recorder and the replay drive with,
  * the powertrain force/power constraints (``F_ini``, ``P_max``,
    ``b_var_power``) are accepted and ignored — the shared QP core models
    machine acceleration limits instead,
  * ``IniSQP`` is a plain per-(plan, action) warm-start store with the
    20 m/s cold fill (VpSQP.py:64); the real state machine's cross-action
    fallbacks are not replicated (VpSQP only ever reads the key it wrote).
"""

from . import src  # noqa: F401
