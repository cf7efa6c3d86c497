"""``vo.src.IniSQPStatemachine.IniSQP`` stand-in: the per-(plan, action)
SQP warm-start store VpSQP reads/writes (VpSQP.py:86, 214-217, 243-244,
433-434).  Cold entries return the reference's 20 m/s fill (VpSQP.py:64);
the MPC shift itself lives in VpSQP (slr plan) and is not done here."""

import numpy as np


class IniSQP:
    def __init__(self):
        self._store = {}

    def get_v0(self, plan: str, action_id: str, m: int,
               b_print_sm: bool = False) -> np.ndarray:
        v = self._store.get((plan, action_id))
        if v is None:
            return 20.0 * np.ones((m,))
        return np.array(v, float)

    def set_vx(self, plan: str, action_id: str, vx) -> None:
        self._store[(plan, action_id)] = np.array(vx, float)
