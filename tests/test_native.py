"""Native C++ host runtime vs Python/JAX implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphbasedlocaltrajectoryplanner_tpu import native
from graphbasedlocaltrajectoryplanner_tpu.models.track import variable_step_size
from graphbasedlocaltrajectoryplanner_tpu.ops import search as srch
from graphbasedlocaltrajectoryplanner_tpu.ops import velocity as velops

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_csv_loader(tmp_path):
    data = np.random.default_rng(0).normal(0, 10, (40, 12))
    p = tmp_path / "track.csv"
    with open(p, "w") as fh:
        fh.write("# comment line\n# another\n")
        for row in data:
            fh.write(";".join(f"{v:.7f}" for v in row) + "\n")
    out = native.load_csv(str(p), 12)
    np.testing.assert_allclose(out, data, atol=1e-6)
    ref = np.loadtxt(p, delimiter=";")
    np.testing.assert_allclose(out, ref, atol=1e-9)


def test_native_variable_step_size():
    rng = np.random.default_rng(1)
    kappa = rng.normal(0, 0.01, 300)
    dist = np.full(300, 3.0)
    py = variable_step_size(kappa, dist, 10.0, 30.0, 0.008)
    nat = native.variable_step_size(kappa, dist, 10.0, 30.0, 0.008)
    assert py == nat
    py2 = variable_step_size(kappa, dist, 10.0, 30.0, 0.008, force_last=True)
    nat2 = native.variable_step_size(kappa, dist, 10.0, 30.0, 0.008,
                                     force_last=True)
    assert py2 == nat2


def test_native_dp_oracle_matches_jax():
    rng = np.random.default_rng(2)
    H, N = 10, 8
    for seed in range(4):
        rng = np.random.default_rng(seed)
        w = rng.uniform(1, 10, (H, N, N)).astype(np.float32)
        w[rng.uniform(size=w.shape) < 0.3] = float(srch.INF)
        vg = rng.uniform(0, 5, (H + 1, N)).astype(np.float32)
        start = int(rng.integers(0, N))
        out = srch.search_window(jnp.asarray(w), start, jnp.asarray(vg), H,
                                 shrink_horizon=True)
        h_nat, nodes_nat, cost_nat = native.minplus_dp(w, vg, start, H)
        assert h_nat == int(out["h_eff"])
        if h_nat >= 1:
            assert abs(cost_nat - float(out["cost"])) < 1e-2
            # chains may differ on exact ties; verify cost equivalence
            c = sum(float(w[h, nodes_nat[h], nodes_nat[h + 1]])
                    for h in range(h_nat))
            c += float(vg[h_nat, nodes_nat[h_nat]])
            assert abs(c - cost_nat) < 1e-2


def test_native_fb_profile_matches_jax():
    rng = np.random.default_rng(5)
    P = 50
    kappa = rng.normal(0, 0.01, P)
    el = np.full(P, 2.5)
    gg = np.tile([[10.0, 10.0]], (P, 1))
    machines = np.array([[0.0, 5.0], [60.0, 3.0]])
    v_nat = native.fb_profile(kappa, el, gg, machines, 60.0, 15.0, v_end=10.0)
    v_jax = np.asarray(velops.calc_vel_profile_fb(
        jnp.asarray(kappa), jnp.asarray(el), jnp.asarray(gg),
        jnp.asarray(machines), 60.0, 15.0, v_end=10.0))
    np.testing.assert_allclose(v_nat, v_jax, rtol=1e-4, atol=1e-3)
