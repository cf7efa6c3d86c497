"""Per-tick path generation kernels (jitted) — the TPU-native core of
``main_online_path_gen`` + ``gen_local_node_template`` (reference
graph_ltpl/online_graph/src/).

One fused kernel computes, for all four action slots simultaneously
(straight / follow / left / right):

  * the masked cost window ``(4, H, N, N)`` — zones block nodes for every
    slot; object-intersecting edges are blocked for straight/left/right but
    *not* for follow (the reference's "planning_range" vs "default" filters,
    gen_local_node_template.py:215-220, main_online_path_gen.py:128-174);
    left/right additionally split the obstacle layer at the closest node
    (main_online_path_gen.py:144-170)
  * previous-solution cost discounting ``w_last_edges``
    (gen_local_node_template.py:154-162)
  * the min-plus DP frontiers + backpointers for every slot.

Horizon-shrink coupling between slots (shared ``mod_action_set_goal_layer``,
main_online_path_gen.py:187-220) is resolved by the caller from the returned
feasibility vectors; backtrace + C2-refit assembly run as separate jitted
kernels per selected action.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from graphbasedlocaltrajectoryplanner_tpu.models.lattice import Lattice
from graphbasedlocaltrajectoryplanner_tpu.ops import splines as spl
from graphbasedlocaltrajectoryplanner_tpu.ops import collision as col
from graphbasedlocaltrajectoryplanner_tpu.ops import search as srch
from graphbasedlocaltrajectoryplanner_tpu.ops.search import INF
from graphbasedlocaltrajectoryplanner_tpu.ops.heading import (
    heading_to_dir, dir_to_heading)

# action slot order (fixed); mapping to the reference's primitive names
SLOT_STRAIGHT, SLOT_FOLLOW, SLOT_LEFT, SLOT_RIGHT = 0, 1, 2, 3
N_SLOTS = 4


def window_meta(lat: Lattice, start_layer, obj_pos, obj_radius,
                obj_active, obs_layer, obs_node, obs_found):
    """Per-scenario window metadata (everything in :func:`window_prelude`
    except the slab hit masks themselves): object applicability + inflated
    radii for the hit test, slab layer indices, overtake split position,
    window layers."""
    L, N, H = lat.L, lat.N, lat.H_max
    h_goal = lat.h_goal_for_start[start_layer]
    win_layers = jnp.mod(start_layer + jnp.arange(H + 1), L)

    obj_layer = col.object_layers(lat.refline, obj_pos)
    fwd = col.layer_dist_mod(start_layer, obj_layer, L)
    in_range = (fwd <= h_goal + 1) | (fwd >= L - 1)
    obj_app = obj_active & in_range
    ref2 = (obj_radius + lat.veh_width / 2.0) ** 2 \
        + lat.sampled_resolution ** 2 / 4.0

    # an object only affects edges starting in layers {obj_layer-1,
    # obj_layer} (GraphBase.py:614-621)
    slab_layers = jnp.stack([jnp.mod(obj_layer - 1, L), obj_layer], axis=1)
    p_obs = jnp.mod(obs_layer - start_layer, L)
    in_win = obs_found & (p_obs <= H)
    return dict(h_goal=h_goal, win_layers=win_layers,
                slab_layers=slab_layers, obj_app=obj_app, ref2=ref2,
                p_obs=p_obs, in_win=in_win)


def window_prelude(lat: Lattice, start_layer, obj_pos, obj_radius,
                   obj_active, obs_layer, obs_node, obs_found):
    """Per-scenario window/mask precomputation shared by the XLA scan DP
    (:func:`plan_window_kernel`) and the Pallas fused DP
    (ops/pallas_window.py): object slab hit masks, overtake split position,
    window layers.  (The batched engine computes the hit masks with the
    streaming Pallas kernel ops/pallas_collision.py instead — identical
    numerics, pinned in tests/test_pallas_collision.py.)"""
    pre = window_meta(lat, start_layer, obj_pos, obj_radius, obj_active,
                      obs_layer, obs_node, obs_found)
    # two (N, N, S) distance tests per object
    slab_samples = lat.samples_xy[pre["slab_layers"]]   # (O, 2, N, N, S, 2)
    d2_slab = jnp.sum(
        (slab_samples - obj_pos[:, None, None, None, None, :]) ** 2, axis=-1)
    pre["hit_slab"] = (jnp.min(d2_slab, axis=-1)
                       <= pre["ref2"][:, None, None, None]) \
        & pre["obj_app"][:, None, None, None]           # (O, 2, N, N)
    return pre


def window_vg(lat: Lattice, win_layers, zone_block, p_obs, in_win, obs_node):
    """Per-slot virtual-goal cost vectors over the window (zone/overtake-
    blocked nodes cannot be goals)."""
    N, H = lat.N, lat.H_max
    node_ids = jnp.arange(N)
    blk_left = node_ids >= obs_node
    blk_right = node_ids < obs_node
    zb_win = zone_block[win_layers]
    vg_win = jnp.where(zb_win, INF, lat.vg_cost[win_layers])   # (H+1, N)
    at_obs = in_win & (jnp.arange(H + 1) == p_obs)[:, None]
    return jnp.stack([vg_win, vg_win,
                      jnp.where(at_obs & blk_left[None, :], INF, vg_win),
                      jnp.where(at_obs & blk_right[None, :], INF, vg_win)])


@partial(jax.jit, static_argnames=("n_last",))
def plan_window_kernel(lat: Lattice,
                       start_layer,
                       start_node,
                       zone_block,         # (L, N) bool
                       obj_pos,            # (O, 2) vehicles + prediction pts
                       obj_radius,         # (O,)
                       obj_active,         # (O,) bool
                       obs_layer,          # scalar int32 — closest object layer
                       obs_node,           # scalar int32 — closest node to it
                       obs_found,          # scalar bool
                       last_nodes,         # (n_last,) int32 window-node chain
                       w_last_factors,     # (n_last - 1,) cost factors
                       n_last: int):
    """Masked 4-slot DP with per-step fused mask construction.

    Memory-lean formulation: the DP runs as one ``lax.scan`` over window
    steps; each step gathers only that layer's (N, N) cost slab and
    (N, N, S, 2) edge samples, applies zone / object / overtake / discount
    masks in registers and performs the min-plus relaxation for all four
    action slots — nothing of size (H, N, N) is ever materialized, which is
    what lets thousands of scenarios batch on one chip (see bench.py).

    :returns: dict with ``best (4, H+1, N)``, ``bp (4, H+1, N)``,
        ``vg (4, H+1, N)``, ``win_layers (H+1,)``, ``h_goal``.
    """
    L, N, H = lat.L, lat.N, lat.H_max
    node_ids = jnp.arange(N)

    pre = window_prelude(lat, start_layer, obj_pos, obj_radius, obj_active,
                         obs_layer, obs_node, obs_found)
    h_goal = pre["h_goal"]
    win_layers = pre["win_layers"]
    slab_layers = pre["slab_layers"]
    hit_slab = pre["hit_slab"]
    p_obs = pre["p_obs"]
    in_win = pre["in_win"]
    blk_left = node_ids >= obs_node            # (N,) blocked for 'left'
    blk_right = node_ids < obs_node

    best0 = jnp.full((N_SLOTS, N), INF).at[:, start_node].set(0.0)

    def step(best, h):
        layer = win_layers[h]
        nxt = jnp.mod(layer + 1, L)
        w = lat.w[layer]                        # (N, N)
        if not lat.closed:
            w = jnp.where(start_layer + h >= L - 1, INF, w)
        # zones block nodes in every slot
        w = jnp.where(zone_block[layer][:, None] | zone_block[nxt][None, :],
                      INF, w)
        # previous-solution discount (shared base)
        a = last_nodes[jnp.clip(h, 0, n_last - 1)]
        b = last_nodes[jnp.clip(h + 1, 0, n_last - 1)]
        fac = w_last_factors[jnp.clip(h, 0, n_last - 2)]
        apply = (h < n_last - 1) & (a >= 0) & (b >= 0)
        # masked multiply instead of a 1-element scatter (batched scatters
        # lower poorly on TPU under vmap)
        at_ab = (node_ids[:, None] == a) & (node_ids[None, :] == b)
        w = jnp.where(at_ab & apply & (w < srch.FEAS_THRESH), w * fac, w)
        # object blocking for this step: select the precomputed slab masks
        is_m1 = (slab_layers[:, 0] == layer)[:, None, None]
        is_0 = (slab_layers[:, 1] == layer)[:, None, None]
        blocked = jnp.any((is_m1 & hit_slab[:, 0]) | (is_0 & hit_slab[:, 1]),
                          axis=0)
        w_def = jnp.where(blocked, INF, w)
        # overtake splits: block nodes entering (step p_obs-1) or leaving
        # (step p_obs) the obstacle layer
        into = in_win & (h == p_obs - 1)
        outof = in_win & (h == p_obs)
        w_left = jnp.where((into & blk_left[None, :])
                           | (outof & blk_left[:, None]), INF, w_def)
        w_right = jnp.where((into & blk_right[None, :])
                            | (outof & blk_right[:, None]), INF, w_def)
        w4 = jnp.stack([w_def, w, w_left, w_right])      # (4, N, N)
        tot = best[:, :, None] + w4
        best_next = jnp.minimum(jnp.min(tot, axis=1), INF)
        bp_next = jnp.argmin(tot, axis=1).astype(jnp.int32)
        return best_next, (best_next, bp_next)

    _, (best_t, bp_t) = jax.lax.scan(step, best0, jnp.arange(H))
    best = jnp.concatenate([best0[None], best_t], axis=0)      # (H+1, 4, N)
    best = jnp.moveaxis(best, 1, 0)                            # (4, H+1, N)
    bp = jnp.concatenate([jnp.full((1, N_SLOTS, N), -1, jnp.int32), bp_t],
                         axis=0)
    bp = jnp.moveaxis(bp, 1, 0)

    vg_all = window_vg(lat, win_layers, zone_block, p_obs, in_win, obs_node)
    return dict(best=best, bp=bp, vg=vg_all, win_layers=win_layers,
                h_goal=h_goal)


@partial(jax.jit, static_argnames=("n_last",))
def plan_window_dense(lat: Lattice,
                      start_layer,
                      start_node,
                      zone_block,         # (L, N) bool
                      obj_pos,            # (O, 2) vehicles + prediction pts
                      obj_radius,         # (O,)
                      obj_active,         # (O,) bool
                      obs_layer,          # scalar int32 — closest object layer
                      obs_node,           # scalar int32 — closest node to it
                      obs_found,          # scalar bool
                      last_nodes,         # (n_last,) int32 window-node chain
                      w_last_factors,     # (n_last - 1,) cost factors
                      n_last: int):
    """Dense (materialized-window) variant of :func:`plan_window_kernel` —
    reference implementation for tests; additionally returns the masked
    ``w_all (4, H, N, N)`` and object ``blocked (H, N, N)`` tensors.
    """
    L, N, H = lat.L, lat.N, lat.H_max
    h_goal = lat.h_goal_for_start[start_layer]

    win_layers = jnp.mod(start_layer + jnp.arange(H + 1), L)
    w_win = lat.w[win_layers[:H]]                       # (H, N, N)
    if not lat.closed:
        # no wrap on unclosed tracks: steps past the last layer are invalid
        invalid_step = (start_layer + jnp.arange(H)) >= (L - 1)
        w_win = jnp.where(invalid_step[:, None, None], INF, w_win)

    # --- zone node blocking (all slots; "overtaking_zones" base filter) ---
    zb_win = zone_block[win_layers]                     # (H+1, N)
    w_base = jnp.where(zb_win[:H, :, None], INF, w_win)
    w_base = jnp.where(zb_win[1:, None, :], INF, w_base)

    # --- previous-solution discount (applies to the shared base, i.e. all
    # slots, since "default" is built from "planning_range" after the
    # discount) ---
    for i in range(n_last - 1):
        a = last_nodes[i]
        b = last_nodes[i + 1]
        ok = (a >= 0) & (b >= 0)
        cur = w_base[i, a, b]
        w_base = w_base.at[i, a, b].set(
            jnp.where(ok & (cur < srch.FEAS_THRESH), cur * w_last_factors[i], cur))

    # --- object edge blocking (slots straight/left/right only) ---
    obj_layer = col.object_layers(lat.refline, obj_pos)
    samples_win = lat.samples_xy[win_layers[:H]]        # (H, N, N, S, 2)
    blocked = col.edge_block_mask(
        samples_win, win_layers[:H], obj_pos, obj_radius, obj_layer,
        obj_active, start_layer, h_goal, L,
        lat.veh_width, lat.sampled_resolution)
    w_default = jnp.where(blocked, INF, w_base)

    # --- overtake split masks (left: keep nodes < obs_node; right: keep
    # nodes >= obs_node at the obstacle layer) ---
    p_obs = jnp.mod(obs_layer - start_layer, L)         # window position
    in_win = obs_found & (p_obs <= H)
    node_ids = jnp.arange(N)
    at_obs = (jnp.arange(H + 1) == p_obs)[:, None] & in_win  # (H+1, 1)
    block_left = at_obs & (node_ids[None, :] >= obs_node)    # (H+1, N)
    block_right = at_obs & (node_ids[None, :] < obs_node)

    def apply_node_block(w, nb):
        w = jnp.where(nb[:H, :, None], INF, w)
        return jnp.where(nb[1:, None, :], INF, w)

    w_left = apply_node_block(w_default, block_left)
    w_right = apply_node_block(w_default, block_right)

    w_all = jnp.stack([w_default, w_base, w_left, w_right])   # (4, H, N, N)

    # --- virtual-goal costs per slot (zone/overtake-blocked nodes cannot be
    # goals either) ---
    vg_win = lat.vg_cost[win_layers]                    # (H+1, N)
    vg_win = jnp.where(zb_win, INF, vg_win)
    vg_all = jnp.stack([vg_win, vg_win,
                        jnp.where(block_left, INF, vg_win),
                        jnp.where(block_right, INF, vg_win)])

    best, bp = jax.vmap(srch.minplus_scan, in_axes=(0, None))(w_all, start_node)
    return dict(best=best, bp=bp, vg=vg_all, win_layers=win_layers,
                blocked=blocked, obj_layer=obj_layer, h_goal=h_goal,
                w_all=w_all)


@jax.jit
def feasibility_vectors(best, vg):
    """Per-slot feasibility of ending at window layer h (any goal node)."""
    goal_tot = best + vg                                # (4, H+1, N)
    return jnp.min(goal_tot, axis=-1) < srch.FEAS_THRESH


@jax.jit
def backtrace_slot(best, bp, vg, h_eff):
    """Goal argmin + backtrace for one slot at a fixed effective horizon."""
    goal_tot = best[h_eff] + vg[h_eff]
    goal_node = jnp.argmin(goal_tot).astype(jnp.int32)
    nodes = srch.backtrace(bp, h_eff, goal_node)
    return nodes, goal_tot[goal_node]


# ---------------------------------------------------------------------------
# path assembly: fuse edge samples, C2 re-fit through nodes, resample
# (main_online_path_gen.py:260-322)
# ---------------------------------------------------------------------------

def _fit_clamped_chain_padded(points, el, psi_s, psi_e, n_seg, H):
    """Clamped C2 chain fit with a traced segment count ``n_seg <= H``.

    Padding convention: equations for interior nodes at or beyond the true
    end are replaced by identities pinning the tangent to the end heading,
    which realizes the clamped boundary at the *true* end while keeping the
    tridiagonal system at static size.
    """
    seg_len = jnp.maximum(el, 1e-9)
    m0 = heading_to_dir(psi_s)
    mn = heading_to_dir(psi_e)

    # equations j = 0 .. H-2 for unknowns u_j = m_{j+1}
    lam = seg_len[:-1] / seg_len[1:]                    # (H-1,)
    dp_over_l = (points[1:] - points[:-1]) / seg_len[:, None]
    rhs = 3.0 * (dp_over_l[:-1] + lam[:, None] * dp_over_l[1:])
    rhs = rhs.at[0].add(-m0)
    lower = jnp.concatenate([jnp.zeros((1,)), jnp.ones((lam.shape[0] - 1,))])
    diag = 2.0 * (1.0 + lam)
    upper = lam
    # pin u_j = mn for j >= n_seg - 1 (the clamped end tangent + padding)
    j = jnp.arange(lam.shape[0])
    pin = j >= (n_seg - 1)
    lower = jnp.where(pin, 0.0, lower)
    diag = jnp.where(pin, 1.0, diag)
    upper = jnp.where(pin, 0.0, upper)
    rhs = jnp.where(pin[:, None], mn[None, :], rhs)
    # the last real equation must not couple forward into a pinned row with
    # its original lam (it still does — Thomas handles it since the pinned
    # row below resolves u_{n_seg-1} = mn exactly)
    u = spl._thomas(lower, diag, upper, rhs)            # (H-1, 2)
    m = jnp.concatenate([m0[None], u, mn[None]], axis=0)
    m = jnp.where((jnp.arange(H + 1) >= n_seg)[:, None], mn[None, :], m)
    m = m.at[0].set(m0)
    return spl._coeffs_from_tangents(points, m, seg_len)


def packed_edge_table(lat: Lattice):
    """Per-edge assembly data packed into ONE ``(L, N, N, 10)`` table:
    ``[npts, len, coeffs_0..7]``.

    The chain walk of :func:`assemble_action_kernel` needs 2 scalars + 8
    Hermite coefficients per visited edge (the stored per-sample element
    lengths are recomputed from the coefficients — same formula as the
    offline table build); gathers on this backend are latency-bound **per
    index** with near-free row width (tools/asm_profile_r3.py: one packed
    row costs the same ~2.6 ms at batch 4k as a single int column, while
    separate per-table gathers cost ~6.4 ms) — so everything is fetched
    with a single gather.  Cheap to (re)build in-graph: it is
    loop-invariant in ``lat`` and hoisted out of the scenario vmap by XLA.

    Coefficient rows reproduce :meth:`Lattice.edge_coeffs` (raceline edges
    reuse the periodic raceline spline, gen_edges.py:82-86); their ``a0``
    column doubles as the exact start-node position of each edge.
    """
    L, N = lat.L, lat.N
    l2 = jnp.mod(jnp.arange(L) + 1, L)
    her = spl.fit_hermite(
        jnp.broadcast_to(lat.node_pos[:, :, None, :], (L, N, N, 2)),
        jnp.broadcast_to(lat.node_pos[l2][:, None, :, :], (L, N, N, 2)),
        jnp.broadcast_to(lat.node_psi[:, :, None], (L, N, N)),
        jnp.broadcast_to(lat.node_psi[l2][:, None, :], (L, N, N)))
    is_rl = (jnp.arange(N)[None, :, None] == lat.rl_idx[:, None, None]) \
        & (jnp.arange(N)[None, None, :] == lat.rl_idx[l2][:, None, None])
    coeffs = jnp.where(is_rl[..., None, None],
                       lat.raceline_coeffs[:, None, None], her)
    return jnp.concatenate(
        [lat.edge_npts[..., None].astype(jnp.float32),
         lat.edge_len[..., None],
         coeffs.reshape(L, N, N, 8)], axis=-1)


@partial(jax.jit, static_argnames=("p_max",))
def assemble_action_kernel(lat: Lattice,
                           win_layers,       # (H+1,)
                           nodes,            # (H+1,) window node chain (-1 pad)
                           h_eff,            # scalar int32 >= 1
                           psi_s,            # start heading for the re-fit
                           p_max: int):
    """Fuse the chosen node chain into one C2 path (jitted, fixed size).

    Mirrors main_online_path_gen.py:260-322: per-edge sample counts determine
    the fused index layout (shared endpoints deduplicated), element lengths
    come from the *pre-refit* stored edge samples, then one curvature-
    continuous spline through the node positions (clamped headings, chord
    lengths = stored edge lengths) is re-sampled with the same per-segment
    counts and supplies the final x, y, psi, kappa.

    :returns: dict(path (p_max, 5) [x y psi kappa el], n_valid scalar,
                   node_idx (H+1,), coeffs (H, 8), length scalar)
    """
    H = lat.H_max
    nsafe = jnp.clip(nodes, 0, lat.N - 1)
    seg_active = jnp.arange(H) < h_eff

    # ONE packed row gather fetches npts + len + el samples + Hermite
    # coefficients for every chain edge (see packed_edge_table: gathers are
    # per-index latency-bound on this backend, row width is free).  Row H
    # (the degenerate edge (l_H, n_H, n_H)) is fetched only for its a0
    # column = the exact end-node position.
    packed = packed_edge_table(lat)
    m_all = nsafe[jnp.clip(jnp.arange(H + 1) + 1, 0, H)]
    rows_e = packed[win_layers, nsafe, m_all]           # (H+1, 10)
    npts_e = jnp.where(seg_active, rows_e[:H, 0].astype(jnp.int32), 1)
    len_e = jnp.where(seg_active, rows_e[:H, 1], 1.0)
    ecoeffs = rows_e[:, 2:10]                           # (H+1, 8)

    node_idx = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(npts_e - 1).astype(jnp.int32)])
    n_valid = node_idx[h_eff] + 1

    # chain node positions = the a0 coefficient of each edge (exact node
    # positions); pad with the last real node repeated
    chain_pos = ecoeffs[:, 0:2]                         # (H+1, 2)
    oh_end = (jnp.arange(H + 1) == h_eff).astype(chain_pos.dtype)
    end_pos = oh_end @ chain_pos
    chain_pos = jnp.where((jnp.arange(H + 1) > h_eff)[:, None], end_pos,
                          chain_pos)

    # end heading: analytic heading at t=1 of the last active edge
    last = h_eff - 1
    oh_last = (jnp.arange(H + 1) == last).astype(ecoeffs.dtype)
    c_last = (oh_last @ ecoeffs).reshape(4, 2)
    psi_e, _ = spl.head_curv_an(c_last, jnp.float32(1.0))

    coeffs = _fit_clamped_chain_padded(chain_pos, len_e, psi_s, psi_e,
                                       h_eff, H)        # (H, 4, 2)

    # --- sample the refit chain with per-segment point counts -------------
    # one-hot segment selection + a SINGLE per-point polynomial evaluation:
    # the per-point "gather" of every per-segment table is ONE one-hot
    # matmul over a concatenated (H, 8+2+8) table (MXU-friendly; plain
    # coeffs[seg_id] gathers lower poorly under vmap, and separate
    # reductions per table each re-walk the (p_max, H) one-hot)
    idxp = jnp.arange(p_max)

    seg_id = jnp.sum((node_idx[1:][None, :] <= idxp[:, None])
                     .astype(jnp.int32), axis=1)
    seg_id = jnp.clip(seg_id, 0, H - 1)
    # float tables through the MXU exactly: the coefficients must not round
    # (bf16 passes would corrupt them beyond the 2 cm parity budget); the
    # int columns (node_idx < p_max, npts <= S) are exact in f32
    table = jnp.concatenate(
        [coeffs.reshape(H, 8),
         node_idx[:H, None].astype(coeffs.dtype),
         npts_e[:, None].astype(coeffs.dtype),
         ecoeffs[:H]], axis=1)                          # (H, 8+2+8)
    # ONE exact f32 dot, TRANSPOSED: rows_T = table' oh' gives the
    # (18, p_max) coefficient-major product the per-point evaluation
    # consumes row-by-row.  Two r5 trace findings drive this shape: the
    # select is HBM-bandwidth-bound, not MXU-bound — a single HIGHEST dot
    # (6 MXU passes) materializes ONE product where the previous bf16x3
    # split (3 passes) materialized three partials plus their combining
    # add (3 x 0.23 ms + 0.60 ms at batch 1024); and the point-major
    # (p_max, 18) form forced a 113 MB relayout copy + slice pass
    # (0.40 + 0.29 ms) to feed the coefficient-major consumers.
    oh_T = (jnp.arange(H)[:, None] == seg_id[None, :]).astype(coeffs.dtype)
    rows_T = jnp.matmul(table.T, oh_T,
                        precision=jax.lax.Precision.HIGHEST)  # (18, p_max)
    start_p = rows_T[8].astype(jnp.int32)
    npts_p = rows_T[9].astype(jnp.int32)

    within = (idxp - start_p).astype(jnp.float32)
    t = jnp.clip(within / jnp.maximum(npts_p - 1, 1), 0.0, 1.0)
    # inline cubic evaluation from the coefficient rows — the exact
    # arithmetic of spl.eval_spline / eval_spline_d / eval_spline_dd /
    # head_curv_an, component-wise (same ops, same order: bitwise equal)
    ax0, ay0, ax1, ay1, ax2, ay2, ax3, ay3 = (rows_T[i] for i in range(8))
    px = ax0 + t * (ax1 + t * (ax2 + t * ax3))
    py = ay0 + t * (ay1 + t * (ay2 + t * ay3))
    dx = ax1 + t * (2.0 * ax2 + t * 3.0 * ax3)
    dy = ay1 + t * (2.0 * ay2 + t * 3.0 * ay3)
    ddx = 2.0 * ax2 + t * 6.0 * ax3
    ddy = 2.0 * ay2 + t * 6.0 * ay3
    psi = dir_to_heading(dx, dy)
    denom = jnp.power(dx ** 2 + dy ** 2, 1.5)
    kappa = (dx * ddy - dy * ddx) / jnp.maximum(denom, 1e-12)
    # per-point element length of the PRE-refit stored edge: recomputed from
    # the edge coefficients with the exact offline-table formula
    # (models/lattice._build_edges: |eval(c, t_{i+1}) - eval(c, t_i)|,
    # t_i = min(i / (npts - 1), 1))
    t2 = jnp.clip((within + 1.0) / jnp.maximum(npts_p - 1, 1), 0.0, 1.0)
    ex0, ey0, ex1, ey1, ex2, ey2, ex3, ey3 = (rows_T[10 + i]
                                              for i in range(8))
    dxe = (ex0 + t2 * (ex1 + t2 * (ex2 + t2 * ex3))
           - (ex0 + t * (ex1 + t * (ex2 + t * ex3))))
    dye = (ey0 + t2 * (ey1 + t2 * (ey2 + t2 * ey3))
           - (ey0 + t * (ey1 + t * (ey2 + t * ey3))))
    el = jnp.sqrt(dxe * dxe + dye * dye)
    el = jnp.where(idxp >= n_valid - 1, 0.0, el)

    path = jnp.stack([px, py, psi, kappa, el], axis=1)
    # final point: evaluate the refit spline's last *real* segment at t=1
    # (the generic sampler lands on a degenerate padded segment there);
    # padding rows freeze at the same final-point values, so one select
    # covers the final row AND the repeated-end padding
    c_fin = (oh_last[:H] @ coeffs.reshape(H, 8)).reshape(4, 2)
    psi_f, kappa_f = spl.head_curv_an(c_fin, jnp.float32(1.0))
    pt_f = spl.eval_spline(c_fin, jnp.float32(1.0))
    fin = jnp.stack([pt_f[0], pt_f[1], psi_f, kappa_f, jnp.float32(0.0)])
    path = jnp.where((jnp.arange(p_max) >= n_valid - 1)[:, None],
                     fin[None, :], path)

    coeffs_flat = jnp.concatenate([coeffs[..., 0], coeffs[..., 1]], axis=-1)
    return dict(path=path, n_valid=n_valid, node_idx=node_idx,
                coeffs=coeffs_flat, length=jnp.sum(jnp.where(seg_active, len_e, 0.0)))
