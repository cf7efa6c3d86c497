"""Vehicle-dynamics-info import (utils/veh_dyn.py) — mirrors the tph loader
used by the reference workflow (docs/source/software/content/inputs.rst)."""

import os

import numpy as np
import pytest

from graphbasedlocaltrajectoryplanner_tpu.utils.veh_dyn import import_veh_dyn_info

TOP = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIPPED = os.path.join(TOP, "inputs", "veh_dyn_info", "ax_max_machines.csv")


def test_shipped_ax_max_machines_loads():
    ggv, axm = import_veh_dyn_info(ax_max_machines_import_path=SHIPPED)
    assert ggv is None
    assert axm.ndim == 2 and axm.shape[1] == 2
    assert axm[0, 0] == 0.0
    assert np.all(np.diff(axm[:, 0]) > 0)
    assert np.all(axm[:, 1] > 0)


def test_ggv_loading(tmp_path):
    p = tmp_path / "ggv.csv"
    p.write_text("# v, ax, ay\n0.0, 10.0, 10.0\n50.0, 8.0, 9.0\n")
    ggv, axm = import_veh_dyn_info(ggv_import_path=str(p))
    assert axm is None
    assert ggv.shape == (2, 3)
    assert ggv[1, 2] == 9.0


def test_malformed_columns_raise(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("0.0, 6.0, 1.0\n10.0, 6.0, 1.0\n")
    with pytest.raises(RuntimeError, match="columns"):
        import_veh_dyn_info(ax_max_machines_import_path=str(p))


def test_non_increasing_velocity_raises(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("0.0, 6.0\n0.0, 5.0\n")
    with pytest.raises(RuntimeError, match="increasing"):
        import_veh_dyn_info(ax_max_machines_import_path=str(p))


def test_profile_responds_to_machine_limit():
    """The imported table must actually bound acceleration in the fb solver."""
    import jax.numpy as jnp
    from graphbasedlocaltrajectoryplanner_tpu.ops.velocity import (
        calc_vel_profile_fb)
    n = 32
    kappa = jnp.zeros(n)
    el = jnp.full(n, 5.0).at[-1].set(0.0)
    loc_gg = jnp.full((n, 2), 12.0)
    _, axm = import_veh_dyn_info(ax_max_machines_import_path=SHIPPED)
    lo = calc_vel_profile_fb(kappa, el, loc_gg, jnp.asarray(axm),
                             v_start=10.0, v_max=80.0)
    hi = calc_vel_profile_fb(kappa, el, loc_gg,
                             jnp.asarray([[0.0, 30.0], [100.0, 30.0]]),
                             v_start=10.0, v_max=80.0)
    assert float(lo[-1]) < float(hi[-1])
    # machine limit at low speed is 6 m/s2: first-step speed gain bounded
    v0, v1 = float(lo[0]), float(lo[1])
    assert (v1 ** 2 - v0 ** 2) / (2 * 5.0) <= 6.0 + 1e-4
