"""Batched + mesh-sharded scenario engine on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import make_oval_track
from graphbasedlocaltrajectoryplanner_tpu.models.lattice import build_lattice
from graphbasedlocaltrajectoryplanner_tpu.utils.config import OfflineConfig
from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def lat():
    return build_lattice(make_oval_track(), OfflineConfig(), md5_params="p")


def test_single_scenario_tick(lat):
    scen = sc.random_scenarios(lat, 1, seed=0, n_objects=1)
    one = jax.tree_util.tree_map(lambda x: x[0], scen)
    out = scenario = sc.scenario_tick(lat, one)
    valid = np.asarray(out["valid"])
    # an opponent ahead -> follow/left/right offered, straight off
    assert not valid[0]
    assert valid[1]            # follow always feasible on free base mask
    trajs = np.asarray(out["trajs"])
    nv = np.asarray(out["n_valid"])
    for slot in range(4):
        if not valid[slot]:
            continue
        t = trajs[slot][:int(nv[slot])]
        assert np.all(np.isfinite(t))
        # velocities bounded, lateral acceleration within the 10 m/s2 gg
        ay = t[:, 5] ** 2 * np.abs(t[:, 4])
        assert np.all(t[:, 5] <= 70.0 + 1e-3)
        assert np.all(ay <= 10.0 * 1.1 + 0.3)


def test_free_track_scenario(lat):
    scen = sc.random_scenarios(lat, 1, seed=1, n_objects=0)
    one = jax.tree_util.tree_map(lambda x: x[0], scen)
    out = sc.scenario_tick(lat, one)
    valid = np.asarray(out["valid"])
    assert valid[0] and not valid[1] and not valid[2] and not valid[3]


def test_batched_tick(lat):
    B = 16
    scen = sc.random_scenarios(lat, B, seed=2, n_objects=1)
    tick = sc.make_batched_tick(lat)
    out = tick(scen)
    assert out["trajs"].shape[0] == B
    assert np.asarray(out["valid"]).any(axis=1).all()   # every scenario plans


def test_sharded_tick_8dev(lat):
    devs = jax.devices()
    assert len(devs) == 8, "conftest must provide 8 virtual devices"
    mesh = jax.sharding.Mesh(np.array(devs), axis_names=("dp",))
    B = 16
    scen = sc.random_scenarios(lat, B, seed=3, n_objects=1)
    spec = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
    scen_sharded = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec), scen)
    tick = sc.make_sharded_tick(lat, mesh)
    res, stats = tick(scen_sharded)
    assert res["trajs"].shape[0] == B
    assert np.isfinite(float(stats["fleet_min_cost"]))
    assert int(stats["fleet_actions"]) >= B

    # sharded results match the unsharded batched engine
    tick_ref = sc.make_batched_tick(lat)
    ref = tick_ref(scen)
    np.testing.assert_allclose(np.asarray(res["cost"]),
                               np.asarray(ref["cost"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res["trajs"]),
                               np.asarray(ref["trajs"]), atol=1e-4)
