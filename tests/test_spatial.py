"""Layer-sharded (mp-axis) window DP vs the single-device scan kernel on
the virtual 8-device CPU mesh."""

from dataclasses import replace as dataclasses_replace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import make_oval_track
from graphbasedlocaltrajectoryplanner_tpu.models.lattice import build_lattice
from graphbasedlocaltrajectoryplanner_tpu.utils.config import OfflineConfig
from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc
from graphbasedlocaltrajectoryplanner_tpu.parallel.spatial import (
    spatial_window_dp)
from graphbasedlocaltrajectoryplanner_tpu.planner import pathgen as pg
from graphbasedlocaltrajectoryplanner_tpu.ops.search import FEAS_THRESH

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def lat():
    return build_lattice(make_oval_track(), OfflineConfig(), md5_params="sp")


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) == 8, "conftest must provide 8 virtual devices"
    return jax.sharding.Mesh(np.array(devs), axis_names=("mp",))


def _scen_args(lat, seed, n_objects):
    scen = sc.random_scenarios(lat, 1, seed=seed, n_objects=n_objects)
    one = jax.tree_util.tree_map(lambda x: x[0], scen)
    obs = sc._select_obstacle(lat, one)
    zone_block = jnp.zeros((lat.L, lat.N), bool)
    wlf = jnp.array([0.0, 0.5, 0.8], jnp.float32)
    return one, obs, zone_block, wlf


@pytest.mark.parametrize("n_objects", [0, 1])
def test_spatial_matches_scan(lat, mesh, n_objects):
    one, obs, zone_block, wlf = _scen_args(lat, seed=3, n_objects=n_objects)
    args = (one.start_layer, one.start_node, zone_block,
            one.obj_pos, one.obj_radius, one.obj_active,
            obs["obs_layer"], obs["obs_node"], obs["obs_found"],
            one.last_nodes, wlf)
    ref = pg.plan_window_kernel(lat, *args, n_last=sc.N_LAST)
    out = spatial_window_dp(lat, mesh, *args, n_last=sc.N_LAST)

    ref_best = np.asarray(ref["best"])
    out_best = np.asarray(out["best"])
    feas = ref_best < float(FEAS_THRESH)
    # frontier values agree up to float re-association on feasible entries
    np.testing.assert_allclose(out_best[feas], ref_best[feas],
                               rtol=1e-4, atol=1e-3)
    assert np.array_equal(feas, np.asarray(out_best) < float(FEAS_THRESH))
    np.testing.assert_array_equal(np.asarray(out["win_layers"]),
                                  np.asarray(ref["win_layers"]))

    # backtraced chains are identical at every feasible horizon
    h_goal = int(ref["h_goal"])
    for slot in range(4):
        for h_eff in (1, max(1, h_goal // 2), h_goal):
            n_ref, c_ref = pg.backtrace_slot(
                ref["best"][slot], ref["bp"][slot], ref["vg"][slot],
                jnp.int32(h_eff))
            n_out, c_out = pg.backtrace_slot(
                out["best"][slot], out["bp"][slot], out["vg"][slot],
                jnp.int32(h_eff))
            if float(c_ref) >= float(FEAS_THRESH):
                assert float(c_out) >= float(FEAS_THRESH)
                continue
            np.testing.assert_array_equal(np.asarray(n_out),
                                          np.asarray(n_ref))
            np.testing.assert_allclose(float(c_out), float(c_ref),
                                       rtol=1e-4, atol=1e-3)


def test_spatial_zone_blocking(lat, mesh):
    """Zones blocked in the sharded DP exactly as in the scan kernel."""
    one, obs, zone_block, wlf = _scen_args(lat, seed=5, n_objects=0)
    zb = np.zeros((lat.L, lat.N), bool)
    lay = (int(one.start_layer) + 3) % lat.L
    zb[lay, :] = True       # block a full layer 3 steps ahead
    zb[lay, int(lat.rl_idx[lay])] = False   # except the raceline node
    zone_block = jnp.asarray(zb)
    args = (one.start_layer, one.start_node, zone_block,
            one.obj_pos, one.obj_radius, one.obj_active,
            obs["obs_layer"], obs["obs_node"], obs["obs_found"],
            one.last_nodes, wlf)
    ref = pg.plan_window_kernel(lat, *args, n_last=sc.N_LAST)
    out = spatial_window_dp(lat, mesh, *args, n_last=sc.N_LAST)
    h_goal = int(ref["h_goal"])
    n_ref, c_ref = pg.backtrace_slot(ref["best"][0], ref["bp"][0],
                                     ref["vg"][0], jnp.int32(h_goal))
    n_out, c_out = pg.backtrace_slot(out["best"][0], out["bp"][0],
                                     out["vg"][0], jnp.int32(h_goal))
    np.testing.assert_array_equal(np.asarray(n_out), np.asarray(n_ref))
    # the chain passes through the forced raceline node at the blocked layer
    assert int(np.asarray(n_ref)[3]) == int(lat.rl_idx[lay])


def test_dp_mp_composed_mesh(lat):
    """Composed 2-D (dp, mp) mesh (VERDICT r3 item 4): scenarios shard over
    4 dp devices while each scenario's window DP splits over 2 mp devices
    (spatial_dp_shard inside the sharded tick).  Results must match the
    plain single-device batched tick: identical valid sets and node-exact
    trajectories up to float re-association of the min-plus compose."""
    devs = jax.devices()
    mesh2 = jax.sharding.Mesh(np.array(devs).reshape(4, 2), ("dp", "mp"))
    scen = sc.random_scenarios(lat, 8, seed=9, n_objects=1)

    ref = sc.make_batched_tick(lat, use_pallas=False)(scen)
    tick_sp = sc.make_sharded_tick(lat, mesh2, use_pallas=False,
                                   spatial_axis="mp")
    spec = jax.sharding.NamedSharding(mesh2,
                                      jax.sharding.PartitionSpec("dp"))
    scen_sh = jax.tree_util.tree_map(lambda x: jax.device_put(x, spec),
                                     scen)
    res, stats = tick_sp(scen_sh)

    np.testing.assert_array_equal(np.asarray(res["valid"]),
                                  np.asarray(ref["valid"]))
    np.testing.assert_array_equal(np.asarray(res["n_valid"]),
                                  np.asarray(ref["n_valid"]))
    np.testing.assert_allclose(np.asarray(res["cost"]),
                               np.asarray(ref["cost"]), rtol=1e-4)
    v = np.asarray(ref["valid"])
    nvr = np.asarray(ref["n_valid"])
    for b in range(8):
        for s in range(sc.N_OUT):
            if not v[b, s]:
                continue
            n = int(nvr[b, s])
            np.testing.assert_allclose(
                np.asarray(res["trajs"])[b, s, :n],
                np.asarray(ref["trajs"])[b, s, :n],
                atol=1e-3, err_msg=f"scenario {b} slot {s}")
    # fleet stats reduce over dp only (mp-replicated results must not
    # double-count)
    n_valid_total = int(v.sum())
    assert int(stats["fleet_actions"]) == n_valid_total


def test_dp_mp_composed_per_scenario_zones(lat):
    """Composed (dp, mp) mesh with PER-SCENARIO zone masks: the spatial
    window DP must consume each fleet member's own zone table (the r2
    per-scenario-zones semantics compose with the r4 2-D mesh)."""
    devs = jax.devices()
    mesh2 = jax.sharding.Mesh(np.array(devs).reshape(4, 2), ("dp", "mp"))
    scen = sc.random_scenarios(lat, 8, seed=13, n_objects=0)
    rng = np.random.default_rng(4)
    zb = np.zeros((8, lat.L, lat.N), bool)
    for b in range(4, 8):       # half the fleet gets a blocked layer
        lay = int((int(scen.start_layer[b]) + 4) % lat.L)
        zb[b, lay, : lat.N // 2] = True
    zone_block = jnp.asarray(zb)

    ref = sc.make_batched_tick(lat, use_pallas=False,
                               zone_block=zone_block)(scen)
    tick_sp = sc.make_sharded_tick(lat, mesh2, use_pallas=False,
                                   spatial_axis="mp", zone_block=zone_block)
    spec = jax.sharding.NamedSharding(mesh2,
                                      jax.sharding.PartitionSpec("dp"))
    scen_sh = jax.tree_util.tree_map(lambda x: jax.device_put(x, spec),
                                     scen)
    res, stats = tick_sp(scen_sh)
    np.testing.assert_array_equal(np.asarray(res["valid"]),
                                  np.asarray(ref["valid"]))
    np.testing.assert_allclose(np.asarray(res["cost"]),
                               np.asarray(ref["cost"]), rtol=1e-4)
    # the zones really bit: zoned and unzoned fleet halves diverge
    assert not np.allclose(np.asarray(ref["cost"][:4]),
                           np.asarray(ref["cost"][4:]))


def test_spatial_unclosed_track_end(mesh):
    """Open-track lattice with the window crossing the track end: the
    spatial DP's off-end INF masking (_local_masked_slabs open branch) and
    its interaction with the padded-identity tail steps must reproduce the
    scan kernel, including the all-INF frontier beyond the last layer."""
    from tests.test_unclosed_track import make_strip_track
    lat_o = build_lattice(make_strip_track(), OfflineConfig(),
                          md5_params="sp-open")
    assert not lat_o.closed
    # start close enough to the end that start_layer + H overruns L - 1
    scen = sc.random_scenarios(lat_o, 1, seed=11, n_objects=0,
                               steady_state=False)
    one = jax.tree_util.tree_map(lambda x: x[0], scen)
    start_layer = jnp.int32(lat_o.L - max(4, lat_o.H_max // 3))
    one = jax.tree_util.tree_map(lambda x: x, one)
    one = dataclasses_replace(one, start_layer=start_layer,
                              start_node=lat_o.rl_idx[start_layer])
    obs = sc._select_obstacle(lat_o, one)
    zone_block = jnp.zeros((lat_o.L, lat_o.N), bool)
    wlf = jnp.array([0.0, 0.5, 0.8], jnp.float32)
    args = (one.start_layer, one.start_node, zone_block,
            one.obj_pos, one.obj_radius, one.obj_active,
            obs["obs_layer"], obs["obs_node"], obs["obs_found"],
            one.last_nodes, wlf)
    ref = pg.plan_window_kernel(lat_o, *args, n_last=sc.N_LAST)
    out = spatial_window_dp(lat_o, mesh, *args, n_last=sc.N_LAST)

    ref_best = np.asarray(ref["best"])
    out_best = np.asarray(out["best"])
    feas = ref_best < float(FEAS_THRESH)
    # beyond the track end every frontier entry must be infeasible in BOTH
    assert np.array_equal(feas, out_best < float(FEAS_THRESH))
    assert feas.any() and not feas.all()      # the end really truncates
    np.testing.assert_allclose(out_best[feas], ref_best[feas],
                               rtol=1e-4, atol=1e-3)
    h_goal = int(ref["h_goal"])
    assert h_goal < lat_o.H_max               # clamped by the open end
    for slot in (0, 1):
        n_ref, c_ref = pg.backtrace_slot(ref["best"][slot], ref["bp"][slot],
                                         ref["vg"][slot], jnp.int32(h_goal))
        n_out, c_out = pg.backtrace_slot(out["best"][slot], out["bp"][slot],
                                         out["vg"][slot], jnp.int32(h_goal))
        if float(c_ref) >= float(FEAS_THRESH):
            assert float(c_out) >= float(FEAS_THRESH)
            continue
        np.testing.assert_array_equal(np.asarray(n_out), np.asarray(n_ref))
        np.testing.assert_allclose(float(c_out), float(c_ref), rtol=1e-4)


def test_spatial_matches_scan_monteblanco(mesh):
    """Real-track lattice (L=128, H=29 -> uneven 4-step chunks on 8
    devices) with an opponent: the sharded DP must reproduce the scan
    kernel's chains through the padded-identity tail steps."""
    from graphbasedlocaltrajectoryplanner_tpu.models.track import (
        import_globtraj_csv)
    import os
    csv = "/root/reference/inputs/traj_ltpl_cl/traj_ltpl_cl_monteblanco.csv"
    if not os.path.isfile(csv):
        pytest.skip("reference track unavailable")
    lat_mb = build_lattice(import_globtraj_csv(csv), OfflineConfig(),
                           md5_params="spmb")
    one, obs, zone_block, wlf = _scen_args(lat_mb, seed=7, n_objects=1)
    args = (one.start_layer, one.start_node, zone_block,
            one.obj_pos, one.obj_radius, one.obj_active,
            obs["obs_layer"], obs["obs_node"], obs["obs_found"],
            one.last_nodes, wlf)
    ref = pg.plan_window_kernel(lat_mb, *args, n_last=sc.N_LAST)
    out = spatial_window_dp(lat_mb, mesh, *args, n_last=sc.N_LAST)
    h_goal = int(ref["h_goal"])
    for slot in (0, 1):
        n_ref, c_ref = pg.backtrace_slot(ref["best"][slot], ref["bp"][slot],
                                         ref["vg"][slot], jnp.int32(h_goal))
        n_out, c_out = pg.backtrace_slot(out["best"][slot], out["bp"][slot],
                                         out["vg"][slot], jnp.int32(h_goal))
        if float(c_ref) >= float(FEAS_THRESH):
            assert float(c_out) >= float(FEAS_THRESH)
            continue
        np.testing.assert_array_equal(np.asarray(n_out), np.asarray(n_ref))
        np.testing.assert_allclose(float(c_out), float(c_ref), rtol=1e-4)
