"""Pallas fused window DP (ops/pallas_window.py) vs the XLA scan kernel
(planner/pathgen.plan_window_kernel) — exact frontier/backpointer parity.
Runs in interpreter mode on the CPU test backend."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import make_oval_track
from graphbasedlocaltrajectoryplanner_tpu.models import lattice as latmod
from graphbasedlocaltrajectoryplanner_tpu.utils.config import OfflineConfig
from graphbasedlocaltrajectoryplanner_tpu.planner import pathgen as pg
from graphbasedlocaltrajectoryplanner_tpu.ops import collision as col
from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_window import (
    fused_window_dp)


@pytest.fixture(scope="module")
def lat():
    gt = make_oval_track()
    return latmod.build_lattice(gt, OfflineConfig(min_plan_horizon=200.0),
                                md5_params="plw")


def _scenarios(lat, B, seed=0, with_zone=False, with_last=False):
    rng = np.random.default_rng(seed)
    L, N = lat.L, lat.N
    rl = np.asarray(lat.rl_idx)
    nil = np.asarray(lat.nodes_in_layer)
    node_pos = np.asarray(lat.node_pos)
    O = 3
    rows = []
    for b in range(B):
        sl = int(rng.integers(0, L))
        sn = int(rl[sl])
        obj_pos = np.zeros((O, 2), np.float32)
        obj_act = np.zeros((O,), bool)
        for k in range(O):
            la = int((sl + rng.integers(3, 10)) % L)
            obj_pos[k] = node_pos[la, int(rng.integers(0, nil[la]))]
            obj_act[k] = bool(rng.random() < 0.8)
        rows.append((sl, sn, obj_pos, obj_act))
    zone = np.zeros((L, N), bool)
    if with_zone:
        zone[5:8, : N // 2] = True
    return rows, zone


def _run_pair(lat, rows, zone, last_nodes, w_fac, n_last):
    outs_ref, pre_list = [], []
    obs_list = []
    for sl, sn, obj_pos, obj_act in rows:
        obj_rad = np.full((obj_pos.shape[0],), 2.5, np.float32)
        obj_layer = col.object_layers(lat.refline, jnp.asarray(obj_pos))
        h_goal = lat.h_goal_for_start[sl]
        obs_idx, _, obs_found = col.closest_object(
            obj_layer, jnp.asarray(obj_act), jnp.int32(sl), h_goal, lat.L)
        obs_layer = obj_layer[obs_idx]
        d2 = jnp.sum((lat.node_pos[obs_layer]
                      - jnp.asarray(obj_pos)[obs_idx]) ** 2, axis=-1)
        d2 = jnp.where(lat.node_valid[obs_layer], d2, jnp.inf)
        obs_node = jnp.argmin(d2).astype(jnp.int32)
        out = pg.plan_window_kernel(
            lat, jnp.int32(sl), jnp.int32(sn), jnp.asarray(zone),
            jnp.asarray(obj_pos), jnp.asarray(obj_rad), jnp.asarray(obj_act),
            obs_layer, obs_node, obs_found,
            jnp.asarray(last_nodes, jnp.int32),
            jnp.asarray(w_fac, jnp.float32), n_last=n_last)
        outs_ref.append(out)
        pre = pg.window_prelude(lat, jnp.int32(sl), jnp.asarray(obj_pos),
                                jnp.asarray(obj_rad), jnp.asarray(obj_act),
                                obs_layer, obs_node, obs_found)
        pre_list.append(pre)
        obs_list.append(int(obs_node))

    B = len(rows)
    best_p, bp_p = fused_window_dp(
        lat.w, jnp.asarray(zone),
        jnp.asarray([r[0] for r in rows], jnp.int32),
        jnp.asarray([r[1] for r in rows], jnp.int32),
        jnp.stack([p["slab_layers"] for p in pre_list]),
        jnp.stack([p["hit_slab"] for p in pre_list]),
        jnp.stack([p["p_obs"] for p in pre_list]),
        jnp.stack([p["in_win"] for p in pre_list]),
        jnp.asarray(obs_list, jnp.int32),
        jnp.tile(jnp.asarray(last_nodes, jnp.int32)[None, :], (B, 1)),
        jnp.asarray(w_fac, jnp.float32),
        closed=bool(lat.closed), h_max=int(lat.H_max), interpret=True)
    return outs_ref, np.asarray(best_p), np.asarray(bp_p)


def test_matches_scan_kernel_no_extras(lat):
    rows, zone = _scenarios(lat, B=3, seed=1)
    outs, best_p, bp_p = _run_pair(lat, rows, zone,
                                   last_nodes=[-1, -1], w_fac=[1.0],
                                   n_last=2)
    for b, out in enumerate(outs):
        np.testing.assert_allclose(best_p[b], np.asarray(out["best"]),
                                   rtol=0, atol=0, err_msg=f"b={b}")
        np.testing.assert_array_equal(bp_p[b], np.asarray(out["bp"]))


@pytest.mark.slow
def test_batched_tick_pallas_path_matches(lat):
    """make_batched_tick(use_pallas=True) (interpreter on CPU) produces the
    same trajectories/action sets as the XLA scan path."""
    from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc
    scen = sc.random_scenarios(lat, batch=3, seed=5, n_objects=1)
    ref = sc.make_batched_tick(lat, use_pallas=False)(scen)
    got = sc.make_batched_tick(lat, use_pallas=True)(scen)
    np.testing.assert_array_equal(np.asarray(got["valid"]),
                                  np.asarray(ref["valid"]))
    np.testing.assert_array_equal(np.asarray(got["h_eff"]),
                                  np.asarray(ref["h_eff"]))
    np.testing.assert_allclose(np.asarray(got["cost"]),
                               np.asarray(ref["cost"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got["trajs"]),
                               np.asarray(ref["trajs"]), rtol=1e-5,
                               atol=1e-4)


def test_matches_with_zone_and_discount(lat):
    rows, zone = _scenarios(lat, B=2, seed=3, with_zone=True)
    sl = rows[0][0]
    rl = np.asarray(lat.rl_idx)
    last = [int(rl[sl]), int(rl[(sl + 1) % lat.L]), int(rl[(sl + 2) % lat.L])]
    outs, best_p, bp_p = _run_pair(lat, rows, zone,
                                   last_nodes=last, w_fac=[0.3, 0.6],
                                   n_last=3)
    for b, out in enumerate(outs):
        np.testing.assert_allclose(best_p[b], np.asarray(out["best"]),
                                   rtol=0, atol=0, err_msg=f"b={b}")
        np.testing.assert_array_equal(bp_p[b], np.asarray(out["bp"]))
