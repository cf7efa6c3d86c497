"""``vo.src.VelQP.VelQP`` stand-in: the solver-configuration object VpSQP
instantiates once (VpSQP.py:54-58) and reads ``m`` / ``sqp_stgs`` /
``sym_sc_`` from.  Constants mirror the graph_ltpl example configuration
(see package docstring).

``b_var_friction`` is env-switchable (``GLTPL_SHIM_VAR_FRICTION=1``): the
dyn-parameter fixture recorder sets it so the reference executes its
variable-friction branches (VpSQP.py:189-211, 335-359: per-point loc_gg
consumption, tire_end_mps2=3 conservative window) — the semantics the TPU
handler maps onto dict-typed ``local_gg`` — while the constant-gg fixtures
keep the package default False (loc_gg ignored, tire window = aymax)."""

import os


class VelQP:
    def __init__(self, m: int, sid: str = "PerfSQP", params_path: str = "",
                 input_path: str = "", logging_path: str = ""):
        self.m = int(m)
        self.sid = sid
        # VpSQP branches: b_var_friction=False routes the constant-friction
        # path (loc_gg ignored, tire_end_mps2 = aymax — a no-op window);
        # b_var_power=False keeps P_max constant (ignored by the shim core)
        self.sqp_stgs = {
            "b_var_friction":
                os.environ.get("GLTPL_SHIM_VAR_FRICTION", "0") == "1",
            "b_var_power": False,
            "b_print_sm": False,
        }
        # vehicle constants of the graph_ltpl example drive (local_gg
        # (5, 5), ax_max_machines [[100, 5]], drag 0.854-ish — the parity
        # harness drives both sides with the facade defaults 0.85/1000)
        self.sym_sc_ = {
            "m_t_": 1.0,             # tonnes (F_ini bookkeeping only)
            "c_res_": 0.0,           # F_ini bookkeeping only
            "axmax_mps2_": 5.0,
            "aymax_mps2_": 5.0,
            "Pmax_kW_": 270.0,       # unused (b_var_power False)
        }
