"""Per-scenario zone masks in the batched engine (VERDICT r2 item 6).

Every fleet member can carry its own blocked zones: a (B, L, N) mask batch
must reproduce per-scenario ``scenario_tick`` runs with the matching
individual (L, N) mask — through the XLA path, the fused Pallas window DP
(interpret mode), and the mesh-sharded tick.
"""

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
    return build_lattice(make_oval_track(), OfflineConfig(), md5_params="pz")


def _zones(lat, B, seed=0):
    """B distinct zone masks, each blocking most of a different layer a few
    steps ahead of the scenario's start."""
    rng = np.random.default_rng(seed)
    zb = np.zeros((B, lat.L, lat.N), bool)
    scen = sc.random_scenarios(lat, B, seed=seed, n_objects=0)
    sl = np.asarray(scen.start_layer)
    nil = np.asarray(lat.nodes_in_layer)
    rl = np.asarray(lat.rl_idx)
    for b in range(B):
        lay = int((sl[b] + 2 + rng.integers(0, 3)) % lat.L)
        # block the raceline node and its neighbours (forces a detour),
        # keep the outer nodes open (stays feasible)
        for n in range(int(nil[lay])):
            if abs(n - int(rl[lay])) <= 1:
                zb[b, lay, n] = True
    return scen, jnp.asarray(zb)


def test_batched_zones_match_individual(lat):
    B = 4
    scen, zb = _zones(lat, B)
    tick = sc.make_batched_tick(lat, zone_block=zb)
    out = tick(scen)
    for b in range(B):
        one = jax.tree_util.tree_map(lambda x: x[b], scen)
        ref = sc.scenario_tick(lat, one, zone_block=zb[b])
        np.testing.assert_array_equal(np.asarray(out["valid"][b]),
                                      np.asarray(ref["valid"]))
        np.testing.assert_allclose(np.asarray(out["trajs"][b]),
                                   np.asarray(ref["trajs"]),
                                   rtol=1e-5, atol=1e-4)
    # the zones actually bit: some scenario must differ from the
    # zone-free plan
    free = sc.make_batched_tick(lat)(scen)
    assert not np.allclose(np.asarray(out["trajs"]),
                           np.asarray(free["trajs"]))


def test_pallas_window_per_scenario_zones(lat):
    """fused_window_dp with a (B, L, N) zone batch == per-scenario scan
    kernels (interpret mode)."""
    from graphbasedlocaltrajectoryplanner_tpu.planner import pathgen as pg
    B = 3
    scen, zb = _zones(lat, B, seed=1)
    obs = jax.vmap(lambda s: sc._select_obstacle(lat, s))(scen)
    wlf = jnp.array([0.0, 0.5, 0.8], jnp.float32)
    from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_window import (
        fused_window_dp)
    pre = jax.vmap(
        lambda s, o: pg.window_prelude(
            lat, s.start_layer, s.obj_pos, s.obj_radius, s.obj_active,
            o["obs_layer"], o["obs_node"], o["obs_found"]))(scen, obs)
    best, bp = fused_window_dp(
        lat.w, zb, scen.start_layer, scen.start_node,
        pre["slab_layers"], pre["hit_slab"], pre["p_obs"], pre["in_win"],
        obs["obs_node"], scen.last_nodes, wlf,
        closed=bool(lat.closed), h_max=int(lat.H_max), interpret=True)
    for b in range(B):
        one = jax.tree_util.tree_map(lambda x: x[b], scen)
        o1 = {k: v[b] for k, v in obs.items()}
        ref = pg.plan_window_kernel(
            lat, one.start_layer, one.start_node, zb[b], one.obj_pos,
            one.obj_radius, one.obj_active, o1["obs_layer"], o1["obs_node"],
            o1["obs_found"], one.last_nodes, wlf, n_last=sc.N_LAST)
        np.testing.assert_allclose(np.asarray(best[b]),
                                   np.asarray(ref["best"]), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(bp[b][1:]),
                                      np.asarray(ref["bp"][1:]))


def test_sharded_tick_per_scenario_zones(lat):
    devs = jax.devices()
    assert len(devs) == 8
    mesh = jax.sharding.Mesh(np.array(devs), axis_names=("dp",))
    B = 8
    scen, zb = _zones(lat, B, seed=2)
    spec = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
    scen_s = jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), scen)
    zb_s = jax.device_put(zb, spec)
    tick = sc.make_sharded_tick(lat, mesh, zone_block=zb_s)
    res, stats = tick(scen_s)
    ref = sc.make_batched_tick(lat, zone_block=zb)(scen)
    np.testing.assert_array_equal(np.asarray(res["valid"]),
                                  np.asarray(ref["valid"]))
    np.testing.assert_allclose(np.asarray(res["trajs"]),
                               np.asarray(ref["trajs"]), atol=1e-5)
