"""Batched scenario planning engine — the throughput path of the framework.

One *scenario* = (ego start node + velocity, opponent configuration).  A
full action-set replan per scenario runs entirely in one fused jitted
function (``scenario_tick``): masked 4-slot min-plus DP, per-slot horizon
selection with the follow->left/right shrink coupling, C2-refit path
assembly, and velocity profiles — no host round-trips.  Batch thousands of
scenarios with ``jax.vmap`` on one chip; scale across a device mesh with
``make_sharded_tick`` (scenario data-parallel over the ``dp`` axis, fleet
statistics reduced with ``psum``/``pmin``).  The orthogonal ``mp`` axis —
window LAYERS sharded across devices with a cost-frontier ``all_gather``
over ICI — lives in ``parallel/spatial.py`` (two-phase blocked min-plus
scan); scenario-DP remains the default decomposition for the shipped
tracks (see PARITY.md "Parallel decompositions").

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
from graphbasedlocaltrajectoryplanner_tpu.ops import collision as col
from graphbasedlocaltrajectoryplanner_tpu.ops import projection as proj
from graphbasedlocaltrajectoryplanner_tpu.ops import dynshift

# padded collision slots (vehicles + their prediction points) — matches
# the handler's capacity (planner/handler.py O_PAD; arbitrary object lists,
# ObjectListInterface.py:75-153).  random_scenarios can narrow it per batch
# for workloads with known-few objects (shapes are static per jit).
O_PAD = 16
# constant-path-segment pad length: the stored previous-path prefix spans
# from the layer cut (<= ~3 layers behind, OTH:703-731) to the warm-start
# node (t_const <= 0.5 s ahead, OTH:374-378) — ~3*(S-1) + a few rows
C_PAD = 64
# w_last_edges window chain length (3 factors + terminal node; handler.N_LAST)
N_LAST = 4
# output action slots (emergency appended to the 4 search slots)
SLOT_EMERGENCY = 4
N_OUT = 5


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Scenario:
    """Per-scenario planning inputs (pytree; batch by stacking leaves).

    The constant-path fields carry the warm-start state of the reference's
    per-tick loop (OTH:351-414): ``const_path`` is the exclusive prefix of
    the previously planned (stored) trajectory up to (not including) the
    plan start node — the reference's ``const_path_seg[:-1]`` (OTH:415) —
    with the final row's element length reaching the start node (OTH:429-473
    reassembly).  ``cut_idx`` is the position-cut row within that prefix:
    exported trajectories and velocity planning start there
    (OTH.calc_vel_profile:703-731), while the object-vs-const-segment checks
    span the whole prefix like the reference.  ``warm`` flags that a
    previous solution exists (const_path_seg is not None), which selects the
    previous-path seam heading even when the prefix is empty
    (main_online_path_gen.py:300-303).  ``last_nodes`` is the previous
    solution's window node chain used for the ``w_last_edges`` discount;
    ``last_action_lr`` is the previously selected action when it was an
    overtake (SLOT_LEFT / SLOT_RIGHT, else -1) for the ongoing-overtake
    branch of the action-set decision tree (main_online_path_gen.py:128-142).
    """
    start_layer: jnp.ndarray     # int32
    start_node: jnp.ndarray      # int32
    vel_plan: jnp.ndarray        # f32 — current planned velocity
    vel_est: jnp.ndarray         # f32
    obj_pos: jnp.ndarray         # (O_PAD, 2)
    obj_radius: jnp.ndarray      # (O_PAD,)
    obj_vel: jnp.ndarray         # (O_PAD,)
    obj_active: jnp.ndarray      # (O_PAD,) bool
    obj_owner: jnp.ndarray       # (O_PAD,) int32 — owning-vehicle index per
    #                              slot (vehicle slot first, then its
    #                              prediction points; -1 = empty slot)
    pos_est: jnp.ndarray         # (2,) f32 ego position seen by path
    #                              planning (OTH pos_est at calc_paths time)
    pos_cut: jnp.ndarray         # (2,) f32 ego position at the velocity cut
    #                              (get_ref_idx pos_est — one tick fresher in
    #                              the reference loop; equals pos_est when a
    #                              scenario is a single consistent snapshot)
    const_path: jnp.ndarray      # (C_PAD, 5) f32 [x y psi kappa el]
    const_n: jnp.ndarray         # int32 — valid const rows (0 = none)
    cut_idx: jnp.ndarray         # int32 — position-cut row (<= const_n)
    warm: jnp.ndarray            # bool — a previous solution exists
    psi_start: jnp.ndarray       # f32 — previous path heading AT the start
    #                              node (refit seam heading, OTH prev[loc])
    vel_course: jnp.ndarray      # (C_PAD,) f32 committed delay-comp course
    c_len: jnp.ndarray           # int32 — true vel_course length
    last_nodes: jnp.ndarray      # (N_LAST,) int32 window node chain (-1 pad)
    last_action_lr: jnp.ndarray  # int32 — SLOT_LEFT/SLOT_RIGHT or -1


def random_scenarios(lat: Lattice, batch: int, seed: int = 0,
                     n_objects: int = 1, vel: float = 30.0,
                     steady_state: bool = True, o_pad: int = None,
                     n_pred: int = 1) -> Scenario:
    """Generate a batch of scenarios: ego on random raceline layers, the
    opponents on random on-track nodes ahead, each carrying ``n_pred``
    constant-velocity prediction points (the handler default is one 200 ms
    CV point, planner/objects.process_object_list).

    ``steady_state=True`` fills the warm-start state the way a running
    planner would (const-path prefix = tail of the raceline edge into the
    start node, previous-solution chain on the raceline) so benchmarks
    measure the full-semantics tick including const-path splicing and the
    w_last discount.

    :param o_pad: collision-slot capacity (static shape per compiled
        batch).  ``None`` sizes it to the slots this batch actually needs
        (min 4); pass :data:`O_PAD` (= the handler's 16) for
        arbitrary-object-list capacity."""
    rng = np.random.default_rng(seed)
    if o_pad is None:
        need = max(1, n_objects) * (1 + n_pred)
        o_pad = max(4, -(-need // 4) * 4)
    L = lat.L
    rl = np.asarray(lat.rl_idx)
    node_pos = np.asarray(lat.node_pos)
    node_psi = np.asarray(lat.node_psi)
    nil = np.asarray(lat.nodes_in_layer)

    start_layer = rng.integers(0, L, batch).astype(np.int32)
    start_node = rl[start_layer].astype(np.int32)
    obj_pos = np.zeros((batch, o_pad, 2), np.float32)
    obj_rad = np.zeros((batch, o_pad), np.float32)
    obj_vel = np.zeros((batch, o_pad), np.float32)
    obj_act = np.zeros((batch, o_pad), bool)
    obj_owner = np.full((batch, o_pad), -1, np.int32)
    for b in range(batch):
        k = 0
        for i in range(n_objects):
            if k >= o_pad:
                break
            la = int((start_layer[b] + rng.integers(5, 15)) % L)
            nn = int(rng.integers(0, nil[la]))
            v = vel * float(rng.uniform(0.4, 0.6))
            psi = float(node_psi[la, nn])
            obj_pos[b, k] = node_pos[la, nn]
            obj_rad[b, k] = 2.5
            obj_vel[b, k] = v
            obj_act[b, k] = True
            obj_owner[b, k] = i
            k += 1
            # CV prediction points (vehicles_to_arrays slot layout)
            for j in range(n_pred):
                if k >= o_pad:
                    break
                dt = 0.2 * (j + 1)
                obj_pos[b, k] = (obj_pos[b, k - 1 - j]
                                 + np.array([-np.sin(psi), np.cos(psi)])
                                 * v * dt)
                obj_rad[b, k] = 2.5
                obj_vel[b, k] = v
                obj_act[b, k] = True
                obj_owner[b, k] = i
                k += 1
    pos_est = node_pos[start_layer, start_node].astype(np.float32)
    const_path = np.zeros((batch, C_PAD, 5), np.float32)
    const_n = np.zeros(batch, np.int32)
    psi_start = np.zeros(batch, np.float32)
    vel_course = np.zeros((batch, C_PAD), np.float32)
    c_len = np.zeros(batch, np.int32)
    last_nodes = np.full((batch, N_LAST), -1, np.int32)
    last_lr = np.full(batch, -1, np.int32)
    node_psi = np.asarray(lat.node_psi)
    psi_start[:] = node_psi[start_layer, start_node]
    if steady_state:
        samples = np.asarray(lat.samples_xy)        # (L, N, N, S, 2)
        S = lat.S
        prev_layer = (start_layer - 1) % L
        n_const = min(C_PAD, max(2, S // 2))
        for b in range(batch):
            pl_, sn = int(prev_layer[b]), int(start_node[b])
            pn = int(rl[pl_])
            pts = samples[pl_, pn, sn]              # (S, 2) prev rl edge
            seg = pts[S - n_const:]                 # last points incl. node
            el = np.hypot(*(np.diff(seg, axis=0).T))
            # exclusive prefix: rows up to (not incl.) the start node; the
            # final row's el is the seam to the start node (OTH reassembly)
            const_path[b, :n_const - 1, 0:2] = seg[:-1]
            d = np.diff(seg, axis=0)
            const_path[b, :n_const - 1, 2] = \
                np.arctan2(d[:, 1], d[:, 0]) - np.pi / 2.0
            const_path[b, :n_const - 1, 4] = el
            const_n[b] = n_const - 1
            pos_est[b] = seg[0]
            # committed delay-comp course over the const rows
            vel_course[b, :n_const - 1] = vel
            c_len[b] = n_const - 1
            # previous solution ahead on the raceline
            for i in range(N_LAST):
                last_nodes[b, i] = rl[(start_layer[b] + i) % L]
    return Scenario(
        start_layer=jnp.asarray(start_layer),
        start_node=jnp.asarray(start_node),
        vel_plan=jnp.full((batch,), vel, jnp.float32),
        vel_est=jnp.full((batch,), vel, jnp.float32),
        obj_pos=jnp.asarray(obj_pos),
        obj_radius=jnp.asarray(obj_rad),
        obj_vel=jnp.asarray(obj_vel),
        obj_active=jnp.asarray(obj_act),
        obj_owner=jnp.asarray(obj_owner),
        pos_est=jnp.asarray(pos_est),
        pos_cut=jnp.asarray(pos_est),
        const_path=jnp.asarray(const_path),
        const_n=jnp.asarray(const_n),
        cut_idx=jnp.zeros(batch, jnp.int32),
        warm=jnp.asarray(const_n > 0),
        psi_start=jnp.asarray(psi_start),
        vel_course=jnp.asarray(vel_course),
        c_len=jnp.asarray(c_len),
        last_nodes=jnp.asarray(last_nodes),
        last_action_lr=jnp.asarray(last_lr),
    )


def vehicle_slots(obj_active, obj_owner):
    """Mask of slots that are a vehicle position (not a prediction point):
    the first active slot of each owner (vehicles_to_arrays layout)."""
    lead = jnp.concatenate([jnp.ones((1,), bool),
                            obj_owner[1:] != obj_owner[:-1]])
    return obj_active & (obj_owner >= 0) & lead


def _select_obstacle(lat: Lattice, scen: Scenario):
    """Closest object -> obstacle node (gen_local_node_template.py:164-213;
    handler._online_path_gen:353-380), per scenario.

    Reference semantics: each vehicle's layer is keyed on its LAST
    prediction point (the reference overwrites ``obj_layer`` per point in
    its loop), the closest vehicle by forward layer distance wins (first
    vehicle on ties), and the obstacle node is the node nearest the
    vehicle *position* within that keyed layer."""
    O = scen.obj_pos.shape[0]
    sl = jnp.arange(O)
    owner = scen.obj_owner
    obj_layer = col.object_layers(lat.refline, scen.obj_pos)
    h_goal = lat.h_goal_for_start[scen.start_layer]
    fwd = col.layer_dist_mod(scen.start_layer, obj_layer, lat.L)
    # keyed slot per owner = last active slot carrying that owner
    later_same = (owner[None, :] == owner[:, None]) \
        & (sl[None, :] > sl[:, None]) & scen.obj_active[None, :]
    is_key = scen.obj_active & (owner >= 0) & ~jnp.any(later_same, axis=1)
    ok = is_key & (fwd <= h_goal)
    fwd_masked = jnp.where(ok, fwd, lat.L + 1)
    key_slot = jnp.argmin(fwd_masked).astype(jnp.int32)
    obs_found = jnp.any(ok)
    # gather-free scalar/row lookups (per-scenario gathers are latency-
    # bound under vmap): comparison-sums for the scalars, an exact one-hot
    # layer select for the node table
    key_owner = jnp.sum(jnp.where(sl == key_slot, owner, 0))
    first = (owner == key_owner) & scen.obj_active
    obs_idx = jnp.argmax(first).astype(jnp.int32)
    obs_layer = jnp.sum(jnp.where(sl == key_slot, obj_layer, 0))
    oh_l = (jnp.arange(lat.L) == obs_layer).astype(lat.node_pos.dtype)
    npos = (oh_l @ lat.node_pos.reshape(lat.L, -1)).reshape(lat.N, 2)
    nval = (oh_l @ lat.node_valid.astype(lat.node_pos.dtype)) > 0.5
    opos = jnp.sum(jnp.where(sl[:, None] == obs_idx, scen.obj_pos, 0.0),
                   axis=0)
    d2 = jnp.sum((npos - opos) ** 2, axis=-1)
    d2 = jnp.where(nval, d2, jnp.inf)
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
                  zone_block: jnp.ndarray = None,
                  w_last_factors: jnp.ndarray = None,
                  incl_emergency: bool = True,
                  precomputed: dict = None,
                  until: str = None,
                  vp_backend: str = "fb",
                  filt_window: int = 1,
                  sqp_x0: jnp.ndarray = None,
                  tire_end_idx: int = 0,
                  tire_end_mps2: float = 5.0,
                  sqp_m: int = None,
                  sqp_step: float = 2.5):
    """One full action-set replan for a single scenario (jit/vmap-able).

    Implements the reference's complete per-tick semantics in-graph:

      * zone node blocking + w_last_edges previous-solution discount
        (gen_local_node_template.py:43-162) in the masked 4-slot DP,
      * the full action-set decision tree (main_online_path_gen.py:124-174):
        object in/beside the constant path segment -> follow + ongoing-
        overtake or default-filter left/right; object in horizon -> follow +
        node-split left/right; free track -> straight,
      * reduced-horizon relabeling (follow -> straight, overtakes dropped)
        when the obstacle leaves the shrunk range
        (main_online_path_gen.py:222-243),
      * constant-path-segment splicing onto every exported trajectory
        (OTH:429-473) and velocity planning over the spliced path,
      * an emergency-brake trajectory on the base action (OTH:1027-1034).

    Output slots: [straight, follow, left, right, emergency].
    Returns dict(trajs (5, C_PAD + P, 7), valid (5,), cost (5,),
    h_eff (5,), n_valid (5,)).

    :param precomputed: optional ``dict(obs=..., window=...)`` with the
        obstacle selection and DP results already computed (the Pallas
        batched path, :func:`make_batched_tick`); None computes them here
        via the XLA scan kernel.
    :param until: staging cutoff for the per-stage profiler
        (parallel/profiling.py): ``"assembly"`` returns right after the
        const-path splice, skipping velocity + emergency.  None (default)
        runs the full tick.
    :param vp_backend: velocity-planner backend, "fb" or "sqp" — the
        reference's ``vp_type`` config seam (OTH:124-156) honored at fleet
        scale (velplan.velocity_stage_scenario).
    :param filt_window: odd moving-average window for the fb velocity
        smoothing (ltpl_config_online.ini SMOOTHING filt_window_width).
    :param sqp_x0: optional (4, C_PAD + p_max) SQP warm-start profiles.
    """
    if machines is None:
        machines = jnp.array([[0.0, 5.0], [100.0, 5.0]], jnp.float32)
    if p_max is None:
        p_max = int(np.ceil((lat.H_max * (lat.S - 1) + 1) / 64.0) * 64)
    if zone_block is None:
        zone_block = jnp.zeros((lat.L, lat.N), bool)
    if w_last_factors is None:
        # reference default w_last_edges (ltpl_config_online.ini COST)
        w_last_factors = jnp.array([0.0, 0.5, 0.8], jnp.float32)
    L, N, H = lat.L, lat.N, lat.H_max

    if precomputed is None:
        with jax.named_scope("gltpl.object_selection"):
            obs = _select_obstacle(lat, scen)
        with jax.named_scope("gltpl.plan_window"):
            out = pg.plan_window_kernel(
                lat, scen.start_layer, scen.start_node, zone_block,
                scen.obj_pos, scen.obj_radius, scen.obj_active,
                obs["obs_layer"], obs["obs_node"], obs["obs_found"],
                scen.last_nodes, w_last_factors, n_last=N_LAST)
    else:
        obs = precomputed["obs"]
        out = precomputed["window"]
    obs_idx, obs_found = obs["obs_idx"], obs["obs_found"]
    h_goal = out["h_goal"]

    # ---- object vs constant path segment (main_online_path_gen:76-122) ----
    with jax.named_scope("gltpl.const_path_objects"):
        # const_path is the exclusive prefix; the reference's const_path_seg
        # additionally carries the start-node row, so its ">= 2 rows" check
        # is const_n >= 1 here
        have_const = scen.const_n >= 1
        s_start, _ = proj.get_s_coord(lat.raceline, scen.pos_est, lat.s_rl,
                                      closed=True)
        start_pos = lat.node_pos[scen.start_layer, scen.start_node]
        s_end, _ = proj.get_s_coord(lat.raceline, start_pos, lat.s_rl,
                                    closed=True)
        s_objs = jax.vmap(
            lambda p: proj.get_s_coord(lat.raceline, p, lat.s_rl,
                                       closed=True)[0])(scen.obj_pos)
        in_seg = jnp.where(
            s_start <= s_end,
            (s_objs >= s_start) & (s_objs <= s_end),
            (s_objs > s_start) | (s_objs < s_end))
        # the reference iterates obj_veh (vehicle positions), not the
        # flattened prediction points — gate on the vehicle slots
        in_seg = in_seg & vehicle_slots(scen.obj_active, scen.obj_owner) \
            & have_const
        obj_besides = jnp.any(in_seg)
        # intersection of const rows with in-seg objects (no discretization
        # inflation, main_online_path_gen.py:118-122); the reference's
        # const_path_seg includes the start-node row (OTH:415 slice +1), so
        # test the start node position as well
        crow = jnp.arange(C_PAD)
        cvalid = crow < scen.const_n
        d2 = jnp.sum((scen.const_path[None, :, 0:2]
                      - scen.obj_pos[:, None, :]) ** 2, axis=-1)
        ref2c = (scen.obj_radius + lat.veh_width / 2.0) ** 2
        d2s = jnp.sum((start_pos[None, :] - scen.obj_pos) ** 2, axis=-1)
        hit_const = jnp.any((d2 <= ref2c[:, None]) & cvalid[None, :], axis=1) \
            | (d2s <= ref2c)
        obj_in_const = jnp.any(in_seg & hit_const)
        # closest in-seg object overrides the follow target
        track_len = lat.s_rl[-1]
        obj_dist_c = jnp.where(s_objs < s_start,
                               s_objs + track_len - s_start,
                               s_objs - s_start)
        obj_dist_c = jnp.where(in_seg, obj_dist_c, jnp.inf)
        c_idx = jnp.argmin(obj_dist_c).astype(jnp.int32)
        follow_obj_idx = jnp.where(obj_besides, c_idx, obs_idx)

    # ---- action-set decision tree (main_online_path_gen:124-174) ----------
    case_a = obj_in_const | obj_besides
    case_b = (~case_a) & obs_found
    case_c = (~case_a) & (~obs_found)

    feas = pg.feasibility_vectors(out["best"], out["vg"])     # (4, H+1)
    hs = jnp.arange(H + 1)

    def shrink_select(fv):
        ok = fv & (hs >= 1) & (hs <= h_goal)
        return jnp.max(jnp.where(ok, hs, 0)).astype(jnp.int32)

    h_straight = shrink_select(feas[pg.SLOT_STRAIGHT])
    h_follow = shrink_select(feas[pg.SLOT_FOLLOW])
    # overtake actions never shrink on their own; they inherit follow's
    # (shared mod_action_set_goal_layer, main_online_path_gen.py:187-220)
    h_lr = h_follow
    h_left = jnp.where((h_lr >= 1) & feas[pg.SLOT_LEFT, h_lr], h_lr, 0)
    h_right = jnp.where((h_lr >= 1) & feas[pg.SLOT_RIGHT, h_lr], h_lr, 0)
    # case A extras run the default-filter (straight-slot) search at the
    # follow-shrunk horizon, without further shrink
    h_a_extra = jnp.where((h_lr >= 1) & feas[pg.SLOT_STRAIGHT, h_lr], h_lr, 0)

    # reduced-horizon relabeling (main_online_path_gen:222-243): when the
    # horizon shrank and the (template-)closest obstacle fell out of the
    # shrunk range, follow is renamed straight and overtakes are dropped
    p_obs_w = jnp.mod(obs["obs_layer"] - scen.start_layer, L)
    reduced = (h_follow != h_goal) | \
        ((not lat.closed) & (jnp.mod(scen.start_layer + h_goal, L) == L - 1))
    obj_in_mod = p_obs_w <= h_follow
    relabel = reduced & (~obj_in_const) & obs_found & (~obj_in_mod)

    # per-output-slot source DP slot + horizon + validity
    ongoing = case_a & (~obj_in_const) & \
        ((scen.last_action_lr == pg.SLOT_LEFT)
         | (scen.last_action_lr == pg.SLOT_RIGHT))
    lr_both = case_a & (~obj_in_const) & (~ongoing)

    v_straight = (case_c & (h_straight >= 1)) | \
        ((case_a | case_b) & relabel & (h_follow >= 1))
    v_follow = (case_a | case_b) & (~relabel) & (h_follow >= 1)
    v_left = (~relabel) & (
        (case_b & (h_left >= 1))
        | (lr_both & (h_a_extra >= 1))
        | (ongoing & (scen.last_action_lr == pg.SLOT_LEFT)
           & (h_a_extra >= 1)))
    v_right = (~relabel) & (
        (case_b & (h_right >= 1))
        | (lr_both & (h_a_extra >= 1))
        | (ongoing & (scen.last_action_lr == pg.SLOT_RIGHT)
           & (h_a_extra >= 1)))

    src_straight = jnp.where(relabel, pg.SLOT_FOLLOW, pg.SLOT_STRAIGHT)
    src_left = jnp.where(case_a, pg.SLOT_STRAIGHT, pg.SLOT_LEFT)
    src_right = jnp.where(case_a, pg.SLOT_STRAIGHT, pg.SLOT_RIGHT)
    h_out_straight = jnp.where(relabel, h_follow, h_straight)
    h_out_left = jnp.where(case_a, h_a_extra, h_left)
    h_out_right = jnp.where(case_a, h_a_extra, h_right)

    src4 = jnp.stack([src_straight, jnp.int32(pg.SLOT_FOLLOW),
                      src_left, src_right])
    h4 = jnp.stack([h_out_straight, h_follow, h_out_left, h_out_right])
    valid4 = jnp.stack([v_straight, v_follow, v_left, v_right])
    h_safe = jnp.maximum(h4, 1)

    if until == "decide":
        return dict(src=src4, h_eff=h4, valid=valid4)

    # ---- backtrace + assembly per output slot ------------------------------
    with jax.named_scope("gltpl.backtrace"):
        # goal costs via ONE tiny combined (source-slot, horizon) one-hot
        # contraction — only the backpointer tables need the full per-slot
        # selection (the walk reads every row); the walk itself is the
        # Pallas lane-parallel kernel on TPU (ops/pallas_backtrace.py)
        from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_backtrace \
            import make_backtrace_walk
        Hp1 = H + 1
        ohs = (src4[:, None] == jnp.arange(pg.N_SLOTS)[None, :])
        oh_h = (h_safe[:, None] == jnp.arange(Hp1)[None, :])
        oh2 = (ohs[:, :, None] & oh_h[:, None, :]) \
            .reshape(pg.N_SLOTS, pg.N_SLOTS * Hp1).astype(out["best"].dtype)
        bv = (out["best"] + out["vg"]).reshape(pg.N_SLOTS * Hp1, N)
        goal_tot = oh2 @ bv                              # (4, N) exact select
        goal_node = jnp.argmin(goal_tot, axis=-1).astype(jnp.int32)
        cost_all = jnp.sum(
            jnp.where(jnp.arange(N)[None, :] == goal_node[:, None],
                      goal_tot, 0.0), axis=1)
        # int32 einsum lowers to a slow strided loop fusion (r5 trace:
        # 0.17 ms at 90 GB/s); backpointers are node ids < N — exact in
        # bf16 while N <= 256 (8 mantissa bits), so a DEFAULT MXU dot
        # selects them exactly; wider lattices keep the exact int path
        if N <= 256:
            bp_sel = jnp.einsum(
                'ks,shn->khn', ohs.astype(jnp.bfloat16),
                out["bp"].astype(jnp.bfloat16),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32).astype(jnp.int32)
        else:
            bp_sel = jnp.einsum('ks,shn->khn', ohs.astype(jnp.int32),
                                out["bp"]).astype(jnp.int32)
        nodes4 = make_backtrace_walk()(bp_sel, goal_node, h_safe)
        end_nodes = jnp.take_along_axis(nodes4, h_safe[:, None],
                                        axis=1)[:, 0]

    def run_slot(nodes, h_eff):
        # start heading: previous-path heading AT the start node when a
        # const segment exists (the reference's const_path_seg includes the
        # start-node row, so psi_s = const_path_seg[-1, 2] is the heading at
        # the start node; main_online_path_gen:300-303); else the stored
        # first-sample heading of the first edge (raceline edges reuse the
        # periodic raceline spline, handler._first_edge_heading)
        is_rl = (scen.start_node == lat.rl_idx[scen.start_layer]) \
            & (nodes[1] == lat.rl_idx[jnp.mod(scen.start_layer + 1, L)])
        d_rl = lat.raceline_coeffs[scen.start_layer, 1]
        psi_rl = jnp.arctan2(d_rl[1], d_rl[0]) - jnp.pi / 2.0
        psi_cold = jnp.where(is_rl, psi_rl,
                             lat.node_psi[scen.start_layer, scen.start_node])
        psi_s = jnp.where(scen.warm, scen.psi_start, psi_cold)
        return pg.assemble_action_kernel(lat, out["win_layers"], nodes,
                                         h_eff, psi_s, p_max=p_max)

    with jax.named_scope("gltpl.assemble"):
        res_all = jax.vmap(run_slot)(nodes4, h_safe)

    # ---- constant-path splice (OTH:429-473 + cut at position OTH:703-731) --
    with jax.named_scope("gltpl.const_splice"):
        P_full = C_PAD + p_max
        idxf = jnp.arange(P_full)
        # exported row i = spliced[cut_idx + i]: the remaining const rows
        # (cut..const_n-1) followed by the freshly planned path.  Both row
        # shifts are bounded by C_PAD, so they run as static barrel-shift
        # ladders (ops/dynshift.py) — a vmapped dynamic_slice lowers to a
        # sequential while-loop + gathers on this backend (~10 ms/tick at
        # batch 1024 in the r3 profiler trace)
        cn = scen.const_n - scen.cut_idx
        const_up = dynshift.shift_rows_up(scen.const_path, scen.cut_idx,
                                          C_PAD)
        const_rows = jnp.concatenate(
            [const_up, jnp.zeros((P_full - C_PAD, 5))], axis=0)
        # new path shifted down by cn: row i reads path[i - cn]
        new_ext = jnp.concatenate(
            [res_all["path"], jnp.zeros((4, P_full - p_max, 5))], axis=1)
        new_rows = dynshift.shift_rows_down(new_ext, cn, C_PAD)
        paths_full = jnp.where((idxf < cn)[None, :, None],
                               const_rows[None, :, :], new_rows)
        n_valid_full = res_all["n_valid"] + cn
        # freeze rows beyond the spliced length at the final real row (the
        # repeated-end-sample padding invariant the velocity scans and the
        # follow-path projection rely on; zero rows from the slice tails
        # would alias position (0, 0))
        # last real row via comparison-sum (a per-(scenario, slot) row
        # gather is latency-bound under vmap)
        at_last = (idxf[None, :]
                   == jnp.clip(n_valid_full - 1, 0, P_full - 1)[:, None])
        last_row = jnp.sum(
            jnp.where(at_last[:, :, None], paths_full, 0.0), axis=1,
            keepdims=True)
        paths_full = jnp.where(
            (idxf[None, :] >= n_valid_full[:, None])[:, :, None],
            last_row, paths_full)
        # padding rows carry zero element length
        paths_full = paths_full.at[:, :, 4].set(
            jnp.where(idxf[None, :] >= n_valid_full[:, None] - 1, 0.0,
                      paths_full[:, :, 4]))

    if until == "assembly":
        return dict(paths=paths_full, n_valid=n_valid_full, cost=cost_all,
                    h_eff=h4, valid=valid4)

    # ---- velocity stage over the spliced paths -----------------------------
    gg = jnp.broadcast_to(jnp.asarray(gg_lim, jnp.float32), (P_full, 2))
    slot_ids = jnp.arange(scen.obj_pos.shape[0])
    c_obj_pos = jnp.sum(
        jnp.where(slot_ids[:, None] == follow_obj_idx, scen.obj_pos, 0.0),
        axis=0)
    c_obj_vel = jnp.sum(jnp.where(slot_ids == follow_obj_idx,
                                  scen.obj_vel, 0.0))
    follow_target = obs_found | obj_besides
    opp_stop_dist, roll_vel, _, roll_cum = vp.opponent_summary(
        lat.glob_rl, lat.glob_el, c_obj_pos, c_obj_vel,
        dyn_model_exp, drag_coeff, m_veh)

    with jax.named_scope("gltpl.velocity"):
        # raceline end velocity per slot, reduced by the end node's lateral
        # displacement from the raceline (OTH:838-867); table rows via
        # comparison-sums instead of per-scenario gathers
        end_layers = jnp.sum(
            jnp.where(jnp.arange(H + 1)[None, :] == h_safe[:, None],
                      out["win_layers"][None, :], 0), axis=1)      # (4,)
        at_end = jnp.arange(L)[None, :] == end_layers[:, None]     # (4, L)
        v_rl = jnp.sum(jnp.where(at_end, lat.vel_rl[None, :], 0.0), axis=1)
        rl_end = jnp.sum(jnp.where(at_end, lat.rl_idx[None, :], 0), axis=1)
        rl_off = jnp.abs(end_nodes - rl_end).astype(
            jnp.float32) * lat.lat_offset
        v_end_rl4 = v_rl - jnp.minimum(
            v_rl * lat.vel_decrease_lat * rl_off, v_rl)
        # reduced-horizon flag per output slot (main_online_path_gen:223-225)
        open_goal_end = (not lat.closed) & \
            (jnp.mod(scen.start_layer + h_goal, L) == L - 1)
        red4 = (h4 != h_goal) | open_goal_end
        # object distance along the FOLLOW slot's spliced path, relative to
        # the ego projection (OTH:762-785)
        path_f = paths_full[pg.SLOT_FOLLOW]
        # leading-zero s array: the reference's get_s_coord prepends 0 when
        # handed a bare cumsum (get_s_coord.py:60-63 / hostmath:51-52)
        s_arr_f = jnp.concatenate([jnp.zeros((1,)),
                                   jnp.cumsum(path_f[:-1, 4])])
        s_obj, _ = proj.get_s_coord(path_f[:, 0:2], c_obj_pos, s_arr_f)
        s_ego, _ = proj.get_s_coord(path_f[:, 0:2], scen.pos_cut, s_arr_f)
        obj_dist = jnp.where(follow_target, s_obj - s_ego, 0.0)
        # committed delay-compensation velocity course over the const rows
        vc_full = jnp.zeros((P_full,), jnp.float32)
        vc_full = vc_full.at[:C_PAD].set(scen.vel_course)
        o = vp.velocity_stage_scenario(
            paths_full, n_valid_full, gg, vc_full, scen.c_len,
            scen.vel_plan, scen.vel_est, jnp.float32(vel_max),
            machines, jnp.float32(0.1), v_end_rl4, red4,
            obj_dist, c_obj_vel, jnp.float32(safety_d),
            opp_stop_dist, roll_vel, roll_cum,
            jnp.float32(lat.veh_length),
            jnp.float32(1.25), jnp.float32(0.025), jnp.float32(0.2),
            jnp.float32(15.0), dyn_model_exp, drag_coeff, m_veh,
            follow_slot=pg.SLOT_FOLLOW,
            filt_window=filt_window,
            vp_backend=vp_backend,
            sqp_x0=sqp_x0,
            veh_turn=jnp.float32(lat.veh_turn),
            tire_end_idx=tire_end_idx,
            tire_end_mps2=tire_end_mps2,
            sqp_m=sqp_m,
            sqp_step=sqp_step,
            const_gg=(float(gg_lim[0]), float(gg_lim[1])))
        trajs4 = o["trajs"]
        # broken velocity constraints remove overtake actions; follow /
        # straight are always retained (no backup state in the batched
        # engine — the stateful brake-on-backup ladder lives in the
        # OnlineHandler, OTH:943-1015)
        valid4 = valid4 & (o["vel_bound"] | (jnp.arange(4) < 2))

    # ---- emergency-brake trajectory (OTH:1027-1034) -------------------------
    # base action = first key of the final set in reference insertion order:
    # follow when an object case is active (or its relabeled straight),
    # else straight — both map to the same output path here
    em_base = jnp.where(case_c | relabel, 0, 1).astype(jnp.int32)
    if incl_emergency:
        with jax.named_scope("gltpl.emergency"):
            # brake-to-stop on the base trajectory with the reference's
            # hardcoded emergency vehicle constants (calc_brake_emergency.py)
            # — em_base is 0 or 1 only, so a 2-way select beats the
            # latency-bound per-scenario row gather under vmap
            is0 = em_base == 0

            def pick(x):
                return jnp.where(is0, x[0], x[1])
            base_traj = pick(trajs4)                        # (P_full, 7)
            traj_em = vp.emergency_kernel(base_traj, gg)
        trajs = jnp.concatenate([trajs4, traj_em[None]], axis=0)
        valid = jnp.concatenate([valid4, pick(valid4)[None]])
        cost5 = jnp.concatenate([cost_all, pick(cost_all)[None]])
        h5 = jnp.concatenate([h4, pick(h4)[None]])
        nv5 = jnp.concatenate([n_valid_full, pick(n_valid_full)[None]])
    else:
        trajs, valid, cost5, h5, nv5 = (trajs4, valid4, cost_all, h4,
                                        n_valid_full)
    res = dict(trajs=trajs, valid=valid, cost=cost5, h_eff=h5,
               n_valid=nv5, case_a=case_a, relabel=relabel,
               em_base=em_base)
    if vp_backend == "sqp":
        # raw per-slot SQP profiles + solver statuses for cross-tick
        # warm-start stores (the handler's sqp_state; VpSQP.py:244,433-434)
        res["qp_status"] = o["qp_status"]
        res["vx_sqp"] = o["vx_sqp"]
    return res


def _batched_window(lat: Lattice, scen: Scenario, samples_t=None,
                    zone_block=None, w_last_factors=None):
    """Batched obstacle selection + fused Pallas window DP + per-scenario
    vg/window metadata — the TPU fast path for the search stage.

    :param samples_t: pre-transposed sample table (pallas_collision.
        build_samples_t), routing the slab hit masks through the streaming
        Pallas kernel; None falls back to the XLA gather formulation."""
    from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_window import (
        fused_window_dp)
    B = scen.start_layer.shape[0]
    if zone_block is None:
        zone_block = jnp.zeros((lat.L, lat.N), bool)
    if w_last_factors is None:
        w_last_factors = jnp.array([0.0, 0.5, 0.8], jnp.float32)

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
            scen.last_nodes, w_last_factors,
            closed=bool(lat.closed), h_max=int(lat.H_max))
    if zone_block.ndim == 3:        # per-scenario zones
        vg = jax.vmap(
            lambda wl, zb, p, iw, on: pg.window_vg(lat, wl, zb, p, iw, on))(
            pre["win_layers"], zone_block, pre["p_obs"], pre["in_win"],
            obs["obs_node"])
    else:
        vg = jax.vmap(
            lambda wl, p, iw, on: pg.window_vg(lat, wl, zone_block, p, iw,
                                               on))(
            pre["win_layers"], pre["p_obs"], pre["in_win"], obs["obs_node"])
    window = dict(best=best, bp=bp, vg=vg, win_layers=pre["win_layers"],
                  h_goal=pre["h_goal"])
    return obs, window


def make_batched_tick(lat: Lattice, use_pallas: bool = None,
                      zone_block=None, **kw):
    """vmap-over-scenarios tick, jitted once (single chip).

    :param use_pallas: route the window DP through the fused Pallas kernel
        (ops/pallas_window.py).  Default: on for TPU backends, off for CPU
        (where the kernel would run in the slow interpreter).
    :param zone_block: ``(L, N)`` shared zone mask, or ``(B, L, N)`` for
        per-scenario zones (different blocked zones per fleet member —
        VERDICT r2 item 6; reference semantics per mask:
        gen_local_node_template.py:43-99)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    samples_t = None
    if use_pallas:
        from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_collision \
            import build_samples_t
        samples_t = build_samples_t(lat.samples_xy)
    per_scen_zones = zone_block is not None and zone_block.ndim == 3

    def tick(scen):
        # batch size is static at trace time: small batches stay on the XLA
        # scan path (the Pallas kernel's grid overhead dominates below ~2
        # blocks and single-replan latency matters for the 100 ms budget)
        if use_pallas and scen.start_layer.shape[0] >= 64:
            obs, window = _batched_window(lat, scen, samples_t,
                                          zone_block=zone_block)
            return jax.vmap(
                lambda s, o, w: scenario_tick(
                    lat, s, precomputed=dict(obs=o, window=w), **kw))(
                scen, obs, window)
        if per_scen_zones:
            return jax.vmap(lambda s, zb: scenario_tick(
                lat, s, zone_block=zb, **kw))(scen, zone_block)
        return jax.vmap(lambda s: scenario_tick(
            lat, s, zone_block=zone_block, **kw))(scen)
    return jax.jit(tick)


def make_sharded_tick(lat: Lattice, mesh: jax.sharding.Mesh,
                      use_pallas: bool = None, zone_block=None,
                      spatial_axis: str = None, **kw):
    """Mesh-sharded tick: scenarios data-parallel over the mesh axes with
    fleet statistics reduced over XLA collectives (``pmin``/``psum``) —
    replacing what would be NCCL allreduce elsewhere (SURVEY.md section 5,
    "Distributed communication backend").

    Single-host meshes use one ``dp`` axis (collectives ride ICI).
    Multi-host meshes from :func:`parallel.distributed.make_dist_mesh`
    add an outer ``dcn`` axis (one row per process); the batch shards over
    ``(dcn, dp)`` and the fleet reductions cross hosts over DCN.

    :param spatial_axis: name of a mesh axis to run the window DP
        layer-sharded over (``parallel.spatial.spatial_dp_shard``) — the
        composed 2-D ``(dp, mp)`` decomposition (VERDICT r3 item 4):
        scenarios shard over the remaining axes, each scenario's window
        steps split over ``spatial_axis`` with the frontier all_gather on
        ICI, and the rest of the tick runs mp-replicated.  None (default)
        keeps every axis scenario-data-parallel.
    :returns: jitted fn scen(batch sharded over the non-spatial mesh axes)
        -> (results with batch axis, stats dict of fleet reductions)
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    samples_t = None
    if use_pallas and spatial_axis is None:
        from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_collision \
            import build_samples_t
        samples_t = build_samples_t(lat.samples_xy)

    axes = tuple(mesh.axis_names)
    data_axes = tuple(a for a in axes if a != spatial_axis)
    if spatial_axis is not None and spatial_axis not in axes:
        raise ValueError(f"mesh has no axis {spatial_axis!r}")
    per_scen_zones = zone_block is not None and zone_block.ndim == 3

    def shard_body(scen, zb):
        # runs per mesh shard; scen leaves (and per-scenario zones when
        # given) carry the local batch slice
        if spatial_axis is not None:
            from graphbasedlocaltrajectoryplanner_tpu.parallel.spatial \
                import spatial_dp_shard
            D = mesh.shape[spatial_axis]

            def one(s, z):
                if z is None:
                    z = jnp.zeros((lat.L, lat.N), bool)
                obs = _select_obstacle(lat, s)
                window = spatial_dp_shard(
                    lat, s.start_layer, s.start_node, z,
                    s.obj_pos, s.obj_radius, s.obj_active,
                    obs["obs_layer"], obs["obs_node"], obs["obs_found"],
                    s.last_nodes,
                    kw.get("w_last_factors",
                           jnp.array([0.0, 0.5, 0.8], jnp.float32)),
                    n_last=N_LAST, axis_name=spatial_axis, D=D)
                return scenario_tick(lat, s,
                                     precomputed=dict(obs=obs,
                                                      window=window), **kw)
            if per_scen_zones:
                res = jax.vmap(one)(scen, zb)
            else:
                res = jax.vmap(lambda s: one(s, zb))(scen)
        elif use_pallas:
            obs, window = _batched_window(lat, scen, samples_t,
                                          zone_block=zb)
            res = jax.vmap(
                lambda s, o, w: scenario_tick(
                    lat, s, precomputed=dict(obs=o, window=w), **kw))(
                scen, obs, window)
        elif per_scen_zones:
            res = jax.vmap(lambda s, z: scenario_tick(
                lat, s, zone_block=z, **kw))(scen, zb)
        else:
            res = jax.vmap(lambda s: scenario_tick(
                lat, s, zone_block=zb, **kw))(scen)
        # fleet statistics: genuine cross-device (and cross-host, when a
        # dcn axis is present) collectives.  Sums reduce over the DATA
        # axes only — results are replicated over a spatial axis and would
        # double-count; the min is replication-safe either way.
        cost = jnp.where(res["valid"], res["cost"], jnp.inf)
        best_local = jnp.min(cost)
        n_valid_actions = jnp.sum(res["valid"].astype(jnp.int32))
        # fleet_actions sums over the DATA axes only; with a spatial-only
        # mesh the batch is fully replicated per device, so the local count
        # already IS the fleet count — a psum over the spatial axis would
        # overcount by its size (r4 advisor finding)
        stats = dict(
            fleet_min_cost=jax.lax.pmin(best_local, axis_name=axes),
            fleet_actions=(jax.lax.psum(n_valid_actions,
                                        axis_name=data_axes)
                           if data_axes else n_valid_actions),
        )
        return res, stats

    P = jax.sharding.PartitionSpec
    scen_spec = P(data_axes if data_axes else None)
    if per_scen_zones:
        shmapped = jax.shard_map(
            shard_body, mesh=mesh,
            in_specs=(scen_spec, scen_spec),
            out_specs=(scen_spec, P()))
        return jax.jit(lambda scen: shmapped(scen, zone_block))
    body = lambda scen: shard_body(scen, zone_block)
    shmapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(scen_spec,),
        out_specs=(scen_spec, P()))
    return jax.jit(shmapped)
