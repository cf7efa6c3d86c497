"""Batched scenario planning engine — the throughput path of the framework.

One *scenario* = (ego start node + velocity, opponent configuration).  A
full action-set replan per scenario runs entirely in one fused jitted
function (``scenario_tick``): masked 4-slot min-plus DP, per-slot horizon
selection with the follow->left/right shrink coupling, C2-refit path
assembly, and velocity profiles — no host round-trips.  Batch thousands of
scenarios with ``jax.vmap`` on one chip; scale across a device mesh with
``make_sharded_tick`` (scenario data-parallel over the ``dp`` axis, window
layers sharded over the ``mp`` axis for the collision kernel with an
``all_gather`` over ICI, fleet statistics reduced with ``psum``/``pmin``).

The reference has no counterpart (single-process loop) — this is the
idiomatic TPU mapping identified in SURVEY.md section 2 ("Parallelism &
distributed-communication components").
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from graphbasedlocaltrajectoryplanner_tpu.models.lattice import Lattice
from graphbasedlocaltrajectoryplanner_tpu.planner import pathgen as pg
from graphbasedlocaltrajectoryplanner_tpu.planner import velplan as vp
from graphbasedlocaltrajectoryplanner_tpu.ops import search as srch
from graphbasedlocaltrajectoryplanner_tpu.ops import collision as col
from graphbasedlocaltrajectoryplanner_tpu.ops import velocity as velops
from graphbasedlocaltrajectoryplanner_tpu.ops import projection as proj

O_PAD = 4


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Scenario:
    """Per-scenario planning inputs (pytree; batch by stacking leaves)."""
    start_layer: jnp.ndarray     # int32
    start_node: jnp.ndarray      # int32
    vel_plan: jnp.ndarray        # f32 — current planned velocity
    vel_est: jnp.ndarray         # f32
    obj_pos: jnp.ndarray         # (O_PAD, 2)
    obj_radius: jnp.ndarray      # (O_PAD,)
    obj_vel: jnp.ndarray         # (O_PAD,)
    obj_active: jnp.ndarray      # (O_PAD,) bool


def random_scenarios(lat: Lattice, batch: int, seed: int = 0,
                     n_objects: int = 1, vel: float = 30.0) -> Scenario:
    """Generate a batch of scenarios: ego on random raceline layers, the
    opponents on random on-track nodes ahead."""
    rng = np.random.default_rng(seed)
    L = lat.L
    rl = np.asarray(lat.rl_idx)
    node_pos = np.asarray(lat.node_pos)
    nil = np.asarray(lat.nodes_in_layer)

    start_layer = rng.integers(0, L, batch).astype(np.int32)
    start_node = rl[start_layer].astype(np.int32)
    obj_pos = np.zeros((batch, O_PAD, 2), np.float32)
    obj_rad = np.zeros((batch, O_PAD), np.float32)
    obj_vel = np.zeros((batch, O_PAD), np.float32)
    obj_act = np.zeros((batch, O_PAD), bool)
    for b in range(batch):
        for k in range(min(n_objects, O_PAD)):
            la = int((start_layer[b] + rng.integers(5, 15)) % L)
            nn = int(rng.integers(0, nil[la]))
            obj_pos[b, k] = node_pos[la, nn]
            obj_rad[b, k] = 2.5
            obj_vel[b, k] = vel * 0.5
            obj_act[b, k] = True
    return Scenario(
        start_layer=jnp.asarray(start_layer),
        start_node=jnp.asarray(start_node),
        vel_plan=jnp.full((batch,), vel, jnp.float32),
        vel_est=jnp.full((batch,), vel, jnp.float32),
        obj_pos=jnp.asarray(obj_pos),
        obj_radius=jnp.asarray(obj_rad),
        obj_vel=jnp.asarray(obj_vel),
        obj_active=jnp.asarray(obj_act),
    )


def _select_obstacle(lat: Lattice, scen: Scenario):
    """Closest object -> obstacle node (gen_local_node_template.py:164-213),
    per scenario."""
    obj_layer = col.object_layers(lat.refline, scen.obj_pos)
    h_goal = lat.h_goal_for_start[scen.start_layer]
    obs_idx, _, obs_found = col.closest_object(
        obj_layer, scen.obj_active, scen.start_layer, h_goal, lat.L)
    obs_layer = obj_layer[obs_idx]
    d2 = jnp.sum((lat.node_pos[obs_layer] - scen.obj_pos[obs_idx]) ** 2,
                 axis=-1)
    d2 = jnp.where(lat.node_valid[obs_layer], d2, jnp.inf)
    obs_node = jnp.argmin(d2).astype(jnp.int32)
    return dict(obs_idx=obs_idx, obs_layer=obs_layer, obs_node=obs_node,
                obs_found=obs_found)


def scenario_tick(lat: Lattice, scen: Scenario,
                  vel_max: float = 70.0,
                  gg_lim=(10.0, 10.0),
                  safety_d: float = 30.0,
                  machines: jnp.ndarray = None,
                  p_max: int = None,
                  dyn_model_exp: float = 1.0,
                  drag_coeff: float = 0.85,
                  m_veh: float = 1000.0,
                  precomputed: dict = None):
    """One full action-set replan for a single scenario (jit/vmap-able).

    Action logic (steady-state subset of main_online_path_gen.py:124-174):
    an opponent in the horizon yields {follow, left, right}; a free track
    yields {straight}.  Returns dict(trajs (4, P, 7), valid (4,),
    cost (4,), h_eff (4,)).

    :param precomputed: optional ``dict(obs=..., window=...)`` with the
        obstacle selection and DP results already computed (the Pallas
        batched path, :func:`make_batched_tick`); None computes them here
        via the XLA scan kernel.
    """
    if machines is None:
        machines = jnp.array([[0.0, 5.0], [100.0, 5.0]], jnp.float32)
    if p_max is None:
        p_max = int(np.ceil((lat.H_max * (lat.S - 1) + 1) / 64.0) * 64)
    L, N, H = lat.L, lat.N, lat.H_max

    if precomputed is None:
        with jax.named_scope("gltpl.object_selection"):
            obs = _select_obstacle(lat, scen)
        zone_block = jnp.zeros((L, N), bool)
        with jax.named_scope("gltpl.plan_window"):
            out = pg.plan_window_kernel(
                lat, scen.start_layer, scen.start_node, zone_block,
                scen.obj_pos, scen.obj_radius, scen.obj_active,
                obs["obs_layer"], obs["obs_node"], obs["obs_found"],
                jnp.full((2,), -1, jnp.int32), jnp.ones((1,), jnp.float32),
                n_last=2)
    else:
        obs = precomputed["obs"]
        out = precomputed["window"]
    obs_idx, obs_found = obs["obs_idx"], obs["obs_found"]
    h_goal = out["h_goal"]

    feas = pg.feasibility_vectors(out["best"], out["vg"])     # (4, H+1)

    # horizon per slot: straight & follow shrink; left/right use follow's
    hs = jnp.arange(H + 1)

    def shrink_select(fv):
        ok = fv & (hs >= 1) & (hs <= h_goal)
        return jnp.max(jnp.where(ok, hs, 0)).astype(jnp.int32)

    h_straight = shrink_select(feas[pg.SLOT_STRAIGHT])
    h_follow = shrink_select(feas[pg.SLOT_FOLLOW])
    h_lr = h_follow
    h_left = jnp.where((h_lr >= 1) & feas[pg.SLOT_LEFT, h_lr], h_lr, 0)
    h_right = jnp.where((h_lr >= 1) & feas[pg.SLOT_RIGHT, h_lr], h_lr, 0)
    h_all = jnp.stack([h_straight, h_follow, h_left, h_right])

    # which slots are part of the action set
    slot_on = jnp.where(obs_found,
                        jnp.array([False, True, True, True]),
                        jnp.array([True, False, False, False]))
    valid = slot_on & (h_all >= 1)
    h_safe = jnp.maximum(h_all, 1)

    def run_slot(slot, h_eff):
        nodes, cost = pg.backtrace_slot(out["best"][slot], out["bp"][slot],
                                        out["vg"][slot], h_eff)
        psi_s = lat.node_psi[scen.start_layer, scen.start_node]
        res = pg.assemble_action_kernel(lat, out["win_layers"], nodes,
                                        h_eff, psi_s, p_max=p_max)
        return res, cost

    with jax.named_scope("gltpl.backtrace_assemble"):
        res_all, cost_all = jax.vmap(run_slot)(jnp.arange(4), h_safe)

    # velocity profiles per slot
    gg = jnp.broadcast_to(jnp.asarray(gg_lim, jnp.float32), (p_max, 2))
    c_obj_pos = scen.obj_pos[obs_idx]
    c_obj_vel = scen.obj_vel[obs_idx]
    opp_stop_dist, roll_vel, _, roll_cum = vp.opponent_summary(
        lat.glob_rl, lat.glob_el, c_obj_pos, c_obj_vel,
        dyn_model_exp, drag_coeff, m_veh)

    with jax.named_scope("gltpl.velocity"):
        # raceline end velocity per slot (OTH:860-867: goal-layer raceline
        # velocity as the planning target)
        v_rl = lat.vel_rl[out["win_layers"][h_safe]]        # (4,)
        # object distance along the FOLLOW slot's path (only consumer)
        path_f = res_all["path"][pg.SLOT_FOLLOW]
        s_obj, _ = proj.get_s_coord(path_f[:, 0:2], c_obj_pos,
                                    jnp.cumsum(path_f[:, 4]))
        obj_dist = jnp.where(obs_found, s_obj, 0.0)
        o = vp.velocity_stage_scenario(
            res_all["path"], res_all["n_valid"], gg,
            scen.vel_plan, scen.vel_est, jnp.float32(vel_max),
            machines, jnp.float32(0.1), v_rl,
            obj_dist, c_obj_vel, jnp.float32(safety_d),
            opp_stop_dist, roll_vel, roll_cum,
            jnp.float32(lat.veh_length),
            jnp.float32(1.25), jnp.float32(0.025), jnp.float32(0.2),
            jnp.float32(15.0), dyn_model_exp, drag_coeff, m_veh,
            follow_slot=pg.SLOT_FOLLOW)
        trajs = o["trajs"]
    return dict(trajs=trajs, valid=valid, cost=cost_all, h_eff=h_all,
                n_valid=res_all["n_valid"])


def _batched_window(lat: Lattice, scen: Scenario, samples_t=None):
    """Batched obstacle selection + fused Pallas window DP + per-scenario
    vg/window metadata — the TPU fast path for the search stage.

    :param samples_t: pre-transposed sample table (pallas_collision.
        build_samples_t), routing the slab hit masks through the streaming
        Pallas kernel; None falls back to the XLA gather formulation."""
    from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_window import (
        fused_window_dp)
    B = scen.start_layer.shape[0]
    zone_block = jnp.zeros((lat.L, lat.N), bool)

    obs = jax.vmap(lambda s: _select_obstacle(lat, s))(scen)
    if samples_t is not None:
        from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_collision \
            import hit_slab_pallas
        pre = jax.vmap(
            lambda s, o: pg.window_meta(
                lat, s.start_layer, s.obj_pos, s.obj_radius, s.obj_active,
                o["obs_layer"], o["obs_node"], o["obs_found"]))(scen, obs)
        with jax.named_scope("gltpl.hit_slab_pallas"):
            hit_slab = hit_slab_pallas(
                samples_t, pre["slab_layers"], scen.obj_pos,
                pre["ref2"], pre["obj_app"])
    else:
        pre = jax.vmap(
            lambda s, o: pg.window_prelude(
                lat, s.start_layer, s.obj_pos, s.obj_radius, s.obj_active,
                o["obs_layer"], o["obs_node"], o["obs_found"]))(scen, obs)
        hit_slab = pre["hit_slab"]
    with jax.named_scope("gltpl.plan_window_pallas"):
        best, bp = fused_window_dp(
            lat.w, zone_block, scen.start_layer, scen.start_node,
            pre["slab_layers"], hit_slab, pre["p_obs"],
            pre["in_win"], obs["obs_node"],
            jnp.full((B, 2), -1, jnp.int32), jnp.ones((1,), jnp.float32),
            closed=bool(lat.closed), h_max=int(lat.H_max))
    vg = jax.vmap(
        lambda wl, p, iw, on: pg.window_vg(lat, wl, zone_block, p, iw, on))(
        pre["win_layers"], pre["p_obs"], pre["in_win"], obs["obs_node"])
    window = dict(best=best, bp=bp, vg=vg, win_layers=pre["win_layers"],
                  h_goal=pre["h_goal"])
    return obs, window


def make_batched_tick(lat: Lattice, use_pallas: bool = None, **kw):
    """vmap-over-scenarios tick, jitted once (single chip).

    :param use_pallas: route the window DP through the fused Pallas kernel
        (ops/pallas_window.py).  Default: on for TPU backends, off for CPU
        (where the kernel would run in the slow interpreter)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    samples_t = None
    if use_pallas:
        from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_collision \
            import build_samples_t
        samples_t = build_samples_t(lat.samples_xy)

    def tick(scen):
        # batch size is static at trace time: small batches stay on the XLA
        # scan path (the Pallas kernel's grid overhead dominates below ~2
        # blocks and single-replan latency matters for the 100 ms budget)
        if use_pallas and scen.start_layer.shape[0] >= 64:
            obs, window = _batched_window(lat, scen, samples_t)
            return jax.vmap(
                lambda s, o, w: scenario_tick(
                    lat, s, precomputed=dict(obs=o, window=w), **kw))(
                scen, obs, window)
        return jax.vmap(lambda s: scenario_tick(lat, s, **kw))(scen)
    return jax.jit(tick)


def make_sharded_tick(lat: Lattice, mesh: jax.sharding.Mesh,
                      use_pallas: bool = None, **kw):
    """Mesh-sharded tick: scenarios data-parallel over the ``dp`` axis with
    fleet statistics reduced over ICI collectives (``pmin``/``psum``) —
    replacing what would be NCCL allreduce elsewhere (SURVEY.md section 5,
    "Distributed communication backend").

    :returns: jitted fn scen(batch sharded over dp) ->
        (results with batch axis, stats dict of fleet reductions)
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    samples_t = None
    if use_pallas:
        from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_collision \
            import build_samples_t
        samples_t = build_samples_t(lat.samples_xy)

    def shard_body(scen):
        # runs per (dp, mp) shard; scen leaves carry the local dp slice
        if use_pallas:
            obs, window = _batched_window(lat, scen, samples_t)
            res = jax.vmap(
                lambda s, o, w: scenario_tick(
                    lat, s, precomputed=dict(obs=o, window=w), **kw))(
                scen, obs, window)
        else:
            res = jax.vmap(lambda s: scenario_tick(lat, s, **kw))(scen)
        # fleet statistics: genuine cross-device collectives over dp
        cost = jnp.where(res["valid"], res["cost"], jnp.inf)
        best_local = jnp.min(cost)
        n_valid_actions = jnp.sum(res["valid"].astype(jnp.int32))
        stats = dict(
            fleet_min_cost=jax.lax.pmin(best_local, axis_name="dp"),
            fleet_actions=jax.lax.psum(n_valid_actions, axis_name="dp"),
        )
        return res, stats

    shmapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec("dp"),),
        out_specs=(jax.sharding.PartitionSpec("dp"),
                   jax.sharding.PartitionSpec()),
        # scan carries start from replicated constants; skip the
        # varying-manual-axes consistency check
        check_vma=False,
    )
    return jax.jit(shmapped)
