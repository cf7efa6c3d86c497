"""Spatial (window-layer-axis) device parallelism for the masked window DP.

This is the survey-mandated "long-context analogue" (SURVEY.md section 2
"Parallelism" / section 5): the planning window's layer axis is the
structural equivalent of sequence length, and the min-plus DP along it is
associative — ``best_{h+1} = best_h (min-plus) M_h`` where ``M_h`` is the
masked (N, N) cost slab of window step h.  That makes the DP a classic
two-phase blocked scan over a device mesh axis ``mp``:

  phase 1  every device builds the masked slabs for ITS contiguous chunk of
           window steps (zones / object hits / overtake splits / w_last
           discount — all layer-local work) and min-plus-composes them into
           one (4, N, N) chunk transfer matrix;
  phase 2  the per-device transfer matrices are exchanged with ONE
           ``all_gather`` over ICI (the cost-frontier halo exchange — D x
           4 x N^2 floats), each device composes the prefix to obtain the
           exact frontier entering its chunk, then re-runs its local steps
           from that frontier to recover per-layer costs AND argmin
           backpointers.

Work per device is O(H/D * N^3) for the chunk products + O(H/D * N^2) for
the re-run, vs O(H * N^2) sequential — the N^3/N^2 overhead factor is the
usual price of parallel scans and is paid only on the ``mp`` axis, which
exists for lattices whose window depth H (track length / layer spacing)
outgrows a single chip's latency budget.  For the shipped tracks (H <= 32)
the scenario-data-parallel ``dp`` axis of ``parallel/scenario.py`` remains
the preferred decomposition; see PARITY.md "Parallel decompositions".

Numerics: min-plus composition re-associates the per-edge cost additions,
so frontier values can differ from the sequential scan by float-addition
reassociation (~1e-4 relative); the backtraced node chains are pinned
identical on the test lattices (tests/test_spatial.py).

Reference counterpart: none (single-process loop); this parallelizes the
same search semantics as ``planner/pathgen.plan_window_kernel``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from graphbasedlocaltrajectoryplanner_tpu.models.lattice import Lattice
from graphbasedlocaltrajectoryplanner_tpu.planner import pathgen as pg
from graphbasedlocaltrajectoryplanner_tpu.ops.search import INF, FEAS_THRESH


def _local_masked_slabs(lat: Lattice, hs, start_layer, zone_block,
                        slab_layers, hit_slab, p_obs, in_win, obs_node,
                        last_nodes, w_last_factors, n_last: int):
    """Masked 4-slot cost slabs for window steps ``hs`` (vectorized copy of
    ``pathgen.plan_window_kernel``'s per-step mask construction).

    :returns: (4, len(hs), N, N).
    """
    L, N = lat.L, lat.N
    node_ids = jnp.arange(N)
    layers = jnp.mod(start_layer + hs, L)                 # (Hd,)
    nxts = jnp.mod(layers + 1, L)

    w = lat.w[layers]                                     # (Hd, N, N)
    if not lat.closed:
        w = jnp.where((start_layer + hs >= L - 1)[:, None, None], INF, w)
    w = jnp.where(zone_block[layers][:, :, None]
                  | zone_block[nxts][:, None, :], INF, w)
    # previous-solution discount
    a = last_nodes[jnp.clip(hs, 0, n_last - 1)]           # (Hd,)
    b = last_nodes[jnp.clip(hs + 1, 0, n_last - 1)]
    fac = w_last_factors[jnp.clip(hs, 0, n_last - 2)]
    apply = (hs < n_last - 1) & (a >= 0) & (b >= 0)
    at_ab = (node_ids[None, :, None] == a[:, None, None]) \
        & (node_ids[None, None, :] == b[:, None, None])
    w = jnp.where(at_ab & apply[:, None, None] & (w < FEAS_THRESH),
                  w * fac[:, None, None], w)
    # object slab blocking (straight/left/right slots)
    is_m1 = slab_layers[:, 0][None, :] == layers[:, None]     # (Hd, O)
    is_0 = slab_layers[:, 1][None, :] == layers[:, None]
    blocked = jnp.any(
        (is_m1[:, :, None, None] & hit_slab[None, :, 0])
        | (is_0[:, :, None, None] & hit_slab[None, :, 1]), axis=1)
    w_def = jnp.where(blocked, INF, w)
    # overtake splits at the obstacle layer
    blk_left = node_ids >= obs_node
    blk_right = node_ids < obs_node
    into = in_win & (hs == p_obs - 1)                     # (Hd,)
    outof = in_win & (hs == p_obs)
    w_left = jnp.where((into[:, None, None] & blk_left[None, None, :])
                       | (outof[:, None, None] & blk_left[None, :, None]),
                       INF, w_def)
    w_right = jnp.where((into[:, None, None] & blk_right[None, None, :])
                        | (outof[:, None, None] & blk_right[None, :, None]),
                        INF, w_def)
    return jnp.stack([w_def, w, w_left, w_right])         # (4, Hd, N, N)


def _minplus_mm(A, B):
    """(..., N, N) min-plus matrix product, saturated at INF."""
    return jnp.minimum(jnp.min(A[..., :, :, None] + B[..., None, :, :],
                               axis=-2), INF)


def spatial_dp_shard(lat: Lattice, start_layer, start_node, zone_block,
                     obj_pos, obj_radius, obj_active,
                     obs_layer, obs_node, obs_found,
                     last_nodes, w_last_factors, n_last: int = 4,
                     axis_name: str = "mp", D: int = 1):
    """Two-phase window DP body for ONE scenario, to be called INSIDE a
    ``shard_map`` over mesh axis ``axis_name`` (``D`` devices).  Each caller
    derives its contiguous chunk of window steps from ``axis_index``,
    composes the chunk transfer matrix, exchanges it with ONE
    ``all_gather``, re-runs its chunk from the exact incoming frontier, and
    finally all_gathers the per-chunk frontiers so the returned dict is the
    FULL, mp-replicated equivalent of ``pathgen.plan_window_kernel`` —
    which lets the rest of the tick (backtrace / assembly / velocity)
    compose with scenario-``dp`` sharding on a 2-D ``(dp, mp)`` mesh
    (tests/test_spatial.py::test_dp_mp_composed_mesh).

    vmap over scenarios inside the shard_map for a batched ``dp`` shard.
    """
    L, N, H = lat.L, lat.N, lat.H_max
    Hd = -(-H // D)                                       # ceil

    pre = pg.window_meta(lat, start_layer, obj_pos, obj_radius, obj_active,
                         obs_layer, obs_node, obs_found)
    # hit masks (object slab distance tests) — replicated; the per-layer
    # mask application happens on this device's chunk only
    slab_samples = lat.samples_xy[pre["slab_layers"]]
    d2_slab = jnp.sum(
        (slab_samples - obj_pos[:, None, None, None, None, :]) ** 2, axis=-1)
    hit_slab = (jnp.min(d2_slab, axis=-1)
                <= pre["ref2"][:, None, None, None]) \
        & pre["obj_app"][:, None, None, None]

    i = jax.lax.axis_index(axis_name)
    hs_loc = i * Hd + jnp.arange(Hd)                      # (Hd,)

    w4 = _local_masked_slabs(
        lat, hs_loc, start_layer, zone_block, pre["slab_layers"],
        hit_slab, pre["p_obs"], pre["in_win"], obs_node,
        last_nodes, w_last_factors, n_last)
    # steps beyond H: min-plus identity (diagonal 0, else INF)
    eye = jnp.arange(N)[:, None] == jnp.arange(N)[None, :]
    ident = jnp.where(eye, 0.0, INF)
    w4 = jnp.where((hs_loc >= H)[None, :, None, None],
                   ident[None, None], w4)

    # phase 1: chunk transfer matrix (init derived from inputs so the
    # scan carry's varying-axes type is consistent under shard_map)
    P0 = ident[None] + 0.0 * w4[:, 0]

    def prod(Pm, w):
        return _minplus_mm(Pm, w), None
    P_loc, _ = jax.lax.scan(prod, P0, jnp.moveaxis(w4, 1, 0))

    # phase 2: frontier halo exchange + prefix composition
    Pg = jax.lax.all_gather(P_loc, axis_name)             # (D, 4, N, N)
    f0 = jnp.where(jnp.arange(N) == start_node, 0.0, INF)[None, :] \
        + 0.0 * P_loc[:, 0]                               # (4, N)

    def compose(f, j):
        fj = jnp.minimum(jnp.min(f[:, :, None] + Pg[j], axis=1), INF)
        return jnp.where(j < i, fj, f), None
    f, _ = jax.lax.scan(compose, f0, jnp.arange(D))

    # local re-run from the exact frontier: costs + backpointers
    def step(best, w):
        tot = best[:, :, None] + w
        best_next = jnp.minimum(jnp.min(tot, axis=1), INF)
        bp_next = jnp.argmin(tot, axis=1).astype(jnp.int32)
        return best_next, (best_next, bp_next)
    _, (best_t, bp_t) = jax.lax.scan(step, f, jnp.moveaxis(w4, 1, 0))
    # (Hd, 4, N) chunks -> full (4, H, N), replicated over the mp axis.
    # Scatter-into-slot + psum rather than all_gather: psum PROVES the
    # result replicated to shard_map's vma checker (an all_gather output
    # is not statically known replicated), so the composed (dp, mp) tick
    # can emit these under out_specs that drop the mp axis.
    Hpad = D * Hd
    buf_b = jax.lax.dynamic_update_slice(
        jnp.zeros((Hpad, 4, N), best_t.dtype), best_t, (i * Hd, 0, 0))
    buf_p = jax.lax.dynamic_update_slice(
        jnp.zeros((Hpad, 4, N), bp_t.dtype), bp_t, (i * Hd, 0, 0))
    best_all = jax.lax.psum(buf_b, axis_name)
    bp_all = jax.lax.psum(buf_p, axis_name)
    best_full = jnp.moveaxis(best_all, 0, 1)[:, :H]
    bp_full = jnp.moveaxis(bp_all, 0, 1)[:, :H]

    best0 = jnp.full((4, 1, N), INF).at[:, 0, start_node].set(0.0)
    best = jnp.concatenate([best0, best_full], axis=1)
    bp = jnp.concatenate([jnp.full((4, 1, N), -1, jnp.int32),
                          bp_full], axis=1)
    win_layers = pre["win_layers"]
    vg = pg.window_vg(lat, win_layers, zone_block, pre["p_obs"],
                      pre["in_win"], obs_node)
    return dict(best=best, bp=bp, vg=vg, win_layers=win_layers,
                h_goal=pre["h_goal"])


def spatial_window_dp(lat: Lattice, mesh: jax.sharding.Mesh,
                      start_layer, start_node, zone_block,
                      obj_pos, obj_radius, obj_active,
                      obs_layer, obs_node, obs_found,
                      last_nodes, w_last_factors, n_last: int = 4):
    """Window DP with the window-step axis sharded over the mesh's ``mp``
    axis.  Same inputs/outputs as ``pathgen.plan_window_kernel`` (one
    scenario; batch with an outer ``dp`` mesh axis if desired — see
    ``parallel.scenario.make_sharded_tick(spatial_axis="mp")`` for the
    composed 2-D form).

    :returns: dict(best (4, H+1, N), bp (4, H+1, N), vg, win_layers, h_goal).
    """
    D = mesh.shape["mp"]
    P = jax.sharding.PartitionSpec

    def body(sl, sn, zb, op, orad, oact, ol, on, of, ln, wf):
        return spatial_dp_shard(lat, sl, sn, zb, op, orad, oact, ol, on,
                                of, ln, wf, n_last=n_last,
                                axis_name="mp", D=D)

    shmapped = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(),) * 11,
        out_specs=jax.tree_util.tree_map(lambda _: P(), dict(
            best=0, bp=0, vg=0, win_layers=0, h_goal=0)))
    return shmapped(start_layer, start_node, zone_block, obj_pos,
                    obj_radius, obj_active, obs_layer, obs_node, obs_found,
                    last_nodes, w_last_factors)
