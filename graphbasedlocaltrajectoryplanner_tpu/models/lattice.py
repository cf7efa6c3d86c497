"""Offline lattice construction — dense-tensor replacement of the
reference's GraphBase + offline pipeline (SURVEY.md section 2 components
2, 4, 5, 6, 7).

The lattice over a track with L layers and at most N lateral nodes per layer
is held as dense tensors:

  * ``node_pos (L, N, 2)``, ``node_psi (L, N)``, ``node_valid (L, N)``
  * edge tensors over ``(L, N, N)``: an entry ``[l, n, m]`` describes the
    spline edge from node n of layer l to node m of layer (l+1) mod L —
    offline cost ``w`` (INF when absent), validity, chord length, sample
    count and the sampled xy points ``samples_xy (L, N, N, S, 2)`` used for
    collision masking and path assembly
  * virtual-goal cost ``vg_cost (L, N)`` (GraphBase.add_node:188-194)
  * precomputed planning-horizon tables ``end_layer_for_start`` /
    ``h_goal_for_start`` (gen_local_node_template.py:101-147)

Build pipeline (host NumPy, vectorized — replaces the reference's
minutes-long Python loops; see ``build_lattice``):
  import -> variable step size -> node skeleton -> vectorized Hermite fan-out
  -> sampling + curvature kill -> reachability prune (mask fixed point)
  -> offline cost -> artifact save (npz + md5 key).
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from graphbasedlocaltrajectoryplanner_tpu.models.track import (
    GlobalTrajectory, import_globtraj_csv, variable_step_size)
from graphbasedlocaltrajectoryplanner_tpu.utils.config import OfflineConfig
from graphbasedlocaltrajectoryplanner_tpu.ops import splines as spl
from graphbasedlocaltrajectoryplanner_tpu.ops.heading import normalize_psi
from graphbasedlocaltrajectoryplanner_tpu.ops.search import INF

# virt_goal_n=False goal-scan rank scale: dominates every real path cost
# (< ~1e7 on shipped tracks) while N * SCALE stays far below FEAS_THRESH.
GOAL_RANK_SCALE = 1e12

LOG = logging.getLogger("local_trajectory_logger")

VERSION = 1.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Lattice:
    """Dense lattice tensors (pytree of device arrays + static metadata)."""
    # nodes
    node_pos: jnp.ndarray        # (L, N, 2)
    node_psi: jnp.ndarray        # (L, N)
    node_valid: jnp.ndarray      # (L, N) bool
    rl_idx: jnp.ndarray          # (L,) int32 raceline node index per layer
    nodes_in_layer: jnp.ndarray  # (L,) int32
    # edges (l, n -> l+1 mod L, m)
    w: jnp.ndarray               # (L, N, N) offline cost, INF if absent
    edge_valid: jnp.ndarray      # (L, N, N) bool
    edge_len: jnp.ndarray        # (L, N, N) chord length over samples
    edge_npts: jnp.ndarray       # (L, N, N) int32 sample count
    samples_xy: jnp.ndarray      # (L, N, N, S, 2)
    samples_el: jnp.ndarray      # (L, N, N, S) inter-sample element lengths
    #                              (last column 0) — precomputed so the hot
    #                              assembly kernel gathers (H, S) floats
    #                              instead of (H, S, 2) xy + diff + norm
    # goal / horizon
    vg_cost: jnp.ndarray         # (L, N) virtual-goal lateral cost (INF invalid)
    end_layer_for_start: jnp.ndarray  # (L,) int32
    h_goal_for_start: jnp.ndarray     # (L,) int32
    # track data (downsampled to layers)
    refline: jnp.ndarray         # (L, 2)
    normvec: jnp.ndarray         # (L, 2)
    alpha: jnp.ndarray           # (L,)
    s_rl: jnp.ndarray            # (L,)
    vel_rl: jnp.ndarray          # (L,)
    raceline: jnp.ndarray        # (L, 2)
    track_width_right: jnp.ndarray  # (L,)
    track_width_left: jnp.ndarray   # (L,)
    raceline_coeffs: jnp.ndarray    # (L, 4, 2) periodic raceline spline
    # fine global raceline (independent of layer discretization):
    # columns s, x, y, kappa, vel  (+ element lengths)
    glob_rl: jnp.ndarray         # (F, 5)
    glob_el: jnp.ndarray         # (F,)
    # static metadata
    L: int = dataclasses.field(metadata=dict(static=True))
    N: int = dataclasses.field(metadata=dict(static=True))
    S: int = dataclasses.field(metadata=dict(static=True))
    H_max: int = dataclasses.field(metadata=dict(static=True))
    closed: bool = dataclasses.field(metadata=dict(static=True))
    lat_resolution: float = dataclasses.field(metadata=dict(static=True))
    lat_offset: float = dataclasses.field(metadata=dict(static=True))
    sampled_resolution: float = dataclasses.field(metadata=dict(static=True))
    veh_width: float = dataclasses.field(metadata=dict(static=True))
    veh_length: float = dataclasses.field(metadata=dict(static=True))
    veh_turn: float = dataclasses.field(metadata=dict(static=True))
    vel_decrease_lat: float = dataclasses.field(metadata=dict(static=True))
    virt_goal_cost: float = dataclasses.field(metadata=dict(static=True))
    md5_params: str = dataclasses.field(metadata=dict(static=True))
    graph_id: str = dataclasses.field(metadata=dict(static=True))

    def edge_coeffs(self, l, n, m):
        """Hermite coefficients of edge (l, n) -> (l+1, m), reconstructed on
        the fly (raceline edges reuse the periodic raceline spline segment,
        gen_edges.py:82-86)."""
        l2 = jnp.mod(l + 1, self.L)
        her = spl.fit_hermite(self.node_pos[l, n], self.node_pos[l2, m],
                              self.node_psi[l, n], self.node_psi[l2, m])
        is_rl = (n == self.rl_idx[l]) & (m == self.rl_idx[l2])
        return jnp.where(is_rl, self.raceline_coeffs[l], her)


# ---------------------------------------------------------------------------
# node skeleton (gen_node_skeleton.py)
# ---------------------------------------------------------------------------

def _calc_head_curv_num_np(path, el_lengths, is_closed):
    """Host shim over ops.heading.calc_head_curv_num."""
    from graphbasedlocaltrajectoryplanner_tpu.ops.heading import calc_head_curv_num
    psi, kappa = calc_head_curv_num(jnp.asarray(path), jnp.asarray(el_lengths),
                                    is_closed)
    return np.asarray(psi), np.asarray(kappa)


def _interp_heading(psi_a, psi_b, num):
    """linspace between two headings along the short way with +-pi wrap
    (gen_node_skeleton.py:133-150)."""
    if num <= 0:
        return np.zeros((0,))
    if abs(psi_a - psi_b) < np.pi:
        return np.linspace(psi_a, psi_b, num=num)
    pa = psi_a + 2 * np.pi * (psi_a < 0)
    pb = psi_b + 2 * np.pi * (psi_b < 0)
    return np.asarray(normalize_psi(jnp.asarray(np.linspace(pa, pb, num=num))))


def build_node_skeleton(refline, normvec, alpha, width_right, width_left,
                        length_raceline, cfg: OfflineConfig, closed: bool):
    """Spread lateral nodes on every layer normal (gen_node_skeleton.py).

    :returns: (node_alpha (L, N), node_psi (L, N), node_valid (L, N),
               rl_idx (L,), nodes_in_layer (L,))  [N = padded max]
    """
    L = refline.shape[0]
    raceline = refline + normvec * alpha[:, None]
    closed_idx = None if closed else -1

    psi_rl, _ = _calc_head_curv_num_np(raceline,
                                       np.asarray(length_raceline[:closed_idx]),
                                       closed)
    if cfg.variable_heading:
        bound_r = refline + normvec * width_right[:, None]
        bound_l = refline - normvec * width_left[:, None]
        d_l = np.diff(np.vstack([bound_l, bound_l[:1]]), axis=0)
        len_bl = np.hypot(d_l[:, 0], d_l[:, 1])
        d_r = np.diff(np.vstack([bound_r, bound_r[:1]]), axis=0)
        len_br = np.hypot(d_r[:, 0], d_r[:, 1])
        psi_bl, _ = _calc_head_curv_num_np(bound_l, len_bl[:closed_idx], closed)
        psi_br, _ = _calc_head_curv_num_np(bound_r, len_br[:closed_idx], closed)

    half_w = cfg.veh_width / 2.0
    margin_left = np.min(width_left - half_w + alpha)
    margin_right = np.min(width_right - half_w - alpha)
    if margin_left < 0.0 or margin_right < 0.0:
        max_w = cfg.veh_width + min(margin_left, margin_right) * 2
        raise ValueError(
            "Provided raceline holds points outside the safety margin! "
            f"Maximum possible vehicle width is {max_w:.3f} m — reduce "
            "'veh_width' or adapt the race line.")

    rl_idx = np.floor((width_left - half_w + alpha) / cfg.lat_resolution).astype(np.int32)
    alphas_per_layer = []
    psis_per_layer = []
    for i in range(L):
        s0 = alpha[i] - rl_idx[i] * cfg.lat_resolution
        a = np.arange(s0, width_right[i] - half_w, cfg.lat_resolution)
        if cfg.variable_heading:
            p1 = _interp_heading(psi_bl[i], psi_rl[i], rl_idx[i] + 1)[:-1]
            p2 = _interp_heading(psi_rl[i], psi_br[i], len(a) - rl_idx[i])
            p = np.concatenate([p1, p2])
        else:
            p = np.full(len(a), psi_rl[i])
        alphas_per_layer.append(a)
        psis_per_layer.append(p)

    nodes_in_layer = np.array([len(a) for a in alphas_per_layer], np.int32)
    N = int(np.max(nodes_in_layer))
    N_pad = max(8, int(np.ceil(N / 8)) * 8)

    node_alpha = np.zeros((L, N_pad))
    node_psi = np.zeros((L, N_pad))
    node_valid = np.zeros((L, N_pad), bool)
    for i in range(L):
        k = nodes_in_layer[i]
        node_alpha[i, :k] = alphas_per_layer[i]
        node_psi[i, :k] = psis_per_layer[i]
        node_valid[i, :k] = True
    return node_alpha, node_psi, node_valid, rl_idx, nodes_in_layer


# ---------------------------------------------------------------------------
# edge generation (gen_edges.py) — vectorized over (L, N, N)
# ---------------------------------------------------------------------------

def _build_edges(node_pos, node_psi, node_valid, rl_idx, nodes_in_layer,
                 vel_rl, raceline_coeffs, cfg: OfflineConfig, closed: bool):
    L, N, _ = node_pos.shape
    nxt = (np.arange(L) + 1) % L

    # fan-out window (gen_edges.py:66-81)
    n_idx = np.arange(N)
    end_ref = rl_idx[nxt][:, None] + n_idx[None, :] - rl_idx[:, None]  # (L,N)
    ref_clip = np.clip(end_ref, 0, nodes_in_layer[nxt][:, None] - 1)
    p_start = node_pos                                    # (L,N,2)
    p_ref = node_pos[nxt[:, None], ref_clip]              # (L,N,2)
    dist = np.linalg.norm(p_ref - p_start, axis=-1)
    lat_steps = np.floor(dist * cfg.lat_offset / cfg.lat_resolution + 0.5).astype(np.int32)

    m_idx = np.arange(N)[None, None, :]
    lo = np.maximum(0, end_ref - lat_steps)[:, :, None]
    hi = np.minimum(nodes_in_layer[nxt][:, None] - 1, end_ref + lat_steps)[:, :, None]
    in_fan = (m_idx >= lo) & (m_idx <= hi)
    valid = in_fan & node_valid[:, :, None] & node_valid[nxt][:, None, :]
    if not closed:
        valid[L - 1] = False

    # hermite coefficients for all candidate edges — FLOAT64 numpy (the
    # reference builds its graph in f64; f32 edge costs differ by up to
    # ~3e-4 relative, enough to flip near-optimal DP argmins whose hidden
    # tail bleeds past the export cut — observed as ~4-8 cm deviations on
    # berlin before this change; stored tensors are cast to f32 at the end)
    p0 = np.asarray(node_pos, np.float64)[:, :, None, :]  # (L,N,1,2)
    p1 = np.asarray(node_pos, np.float64)[nxt][:, None, :, :]
    psi0 = np.asarray(node_psi, np.float64)[:, :, None]
    psi1 = np.asarray(node_psi, np.float64)[nxt][:, None, :]
    dist = np.linalg.norm(p1 - p0, axis=-1, keepdims=True)
    d0 = np.stack([-np.sin(psi0), np.cos(psi0)], axis=-1) * dist
    d1 = np.stack([-np.sin(psi1), np.cos(psi1)], axis=-1) * dist
    dp = p1 - p0
    coeffs = np.stack([np.broadcast_to(p0, dp.shape), d0,
                       3.0 * dp - 2.0 * d0 - d1,
                       -2.0 * dp + d0 + d1], axis=-2)     # (L,N,N,4,2)
    # raceline edges reuse the periodic raceline spline (gen_edges.py:82-86)
    is_rl_edge = ((n_idx[None, :, None] == rl_idx[:, None, None])
                  & (m_idx == rl_idx[nxt][:, None, None]))
    coeffs = np.where(is_rl_edge[..., None, None],
                      np.asarray(raceline_coeffs,
                                 np.float64)[:, None, None, :, :], coeffs)

    def _eval(c, t):
        t = t[..., None]
        return (c[..., 0, :] + t * (c[..., 1, :]
                + t * (c[..., 2, :] + t * c[..., 3, :])))

    def _kappa(c, t):
        t = t[..., None]
        d = c[..., 1, :] + t * (2.0 * c[..., 2, :] + t * 3.0 * c[..., 3, :])
        dd = 2.0 * c[..., 2, :] + t * 6.0 * c[..., 3, :]
        denom = np.power(d[..., 0] ** 2 + d[..., 1] ** 2, 1.5)
        return (d[..., 0] * dd[..., 1] - d[..., 1] * dd[..., 0]) \
            / np.maximum(denom, 1e-12)

    # sampling: n_pts per edge from 15-pt approx length (sample_uniform)
    t15 = np.linspace(0.0, 1.0, 15)
    pts15 = _eval(coeffs[:, :, :, None, :, :], t15[None, None, None, :])
    lengths15 = np.sum(np.linalg.norm(np.diff(pts15, axis=3), axis=-1),
                       axis=-1)                           # (L,N,N)
    n_pts = np.ceil(lengths15 / cfg.stepsize_approx).astype(np.int64) + 1
    n_pts = np.maximum(n_pts, 2)
    S = int(np.max(np.where(valid, n_pts, 2)))

    t_idx = np.arange(S)
    t_vals = np.minimum(t_idx[None, None, None, :]
                        / np.maximum(n_pts[..., None] - 1, 1), 1.0)
    samples = _eval(coeffs[:, :, :, None, :, :], t_vals)  # (L,N,N,S,2)
    kappa_s = _kappa(coeffs[:, :, :, None, :, :], t_vals)

    # edge chord length over its own samples (GraphBase.add_edge:425-429)
    seg = np.linalg.norm(np.diff(samples, axis=3), axis=-1)  # (L,N,N,S-1)
    seg_valid = t_idx[None, None, None, 1:] <= (n_pts[..., None] - 1)
    edge_len = np.sum(np.where(seg_valid, seg, 0.0), axis=-1)

    # curvature kill (gen_edges.py:139-157): vehicle turn radius and
    # min-race-speed corner radius; raceline-to-raceline edges always kept
    kappa_abs_max = np.max(np.abs(kappa_s), axis=-1)
    vel_lim = np.asarray(vel_rl)[:, None, None] * cfg.min_vel_race
    min_turn = vel_lim ** 2 / 10.0
    kappa_ok = (kappa_abs_max <= 1.0 / cfg.veh_turn) & \
               (kappa_abs_max <= 1.0 / np.maximum(min_turn, 1e-12))
    keep = kappa_ok | is_rl_edge
    valid = np.asarray(valid & keep)

    # edge_len / kappa_s stay float64 — the offline cost must be computed
    # at reference precision; storage casts to f32 happen in build_lattice
    return (valid, np.asarray(coeffs), np.asarray(samples, np.float32),
            np.asarray(n_pts, np.int32), edge_len, kappa_s,
            np.asarray(is_rl_edge), S)


def _prune(valid: np.ndarray, closed: bool) -> np.ndarray:
    """Reachability prune: iteratively drop edges of nodes without parents or
    children (prune_graph.py:28-67; start/end layers exempt if unclosed)."""
    L = valid.shape[0]
    valid = valid.copy()
    while True:
        has_child = valid.any(axis=2)                    # (L, N) node (l, n)
        has_parent = np.roll(valid.any(axis=1), 1, axis=0)  # parents of (l, m)
        if not closed:
            has_parent[0] = True                          # start layer exempt
            has_child[L - 1] = True                       # end layer exempt
        # edges out of parent-less nodes and into child-less nodes die
        bad_out = valid & ~has_parent[:, :, None]
        bad_in = valid & ~np.roll(has_child, -1, axis=0)[:, None, :]
        removed = bad_out | bad_in
        if not removed.any():
            return valid
        valid &= ~removed


def _offline_cost(valid, kappa_s, n_pts, edge_len, rl_idx, cfg: OfflineConfig):
    """Per-edge offline cost (gen_offline_cost.py:53-70)."""
    L, N, _, S = kappa_s.shape
    t_idx = np.arange(S)
    sample_ok = t_idx[None, None, None, :] < n_pts[..., None]
    k = np.where(sample_ok, kappa_s, 0.0)
    mean_abs = np.sum(np.abs(k), axis=-1) / np.maximum(n_pts, 1)
    k_for_ext = np.where(sample_ok, kappa_s, np.nan)
    with np.errstate(invalid="ignore"):
        k_max = np.nanmax(k_for_ext, axis=-1)
        k_min = np.nanmin(k_for_ext, axis=-1)
    peak = np.abs(k_max - k_min)

    cost = cfg.w_curv_avg * mean_abs ** 2 * edge_len
    cost += cfg.w_curv_peak * peak ** 2 * edge_len
    cost += cfg.w_length * edge_len
    nxt = (np.arange(L) + 1) % L
    lat_dist = np.abs(rl_idx[nxt][:, None, None]
                      - np.arange(N)[None, None, :]) * cfg.lat_resolution
    cost += np.minimum(cfg.w_raceline * edge_len * lat_dist,
                       cfg.w_raceline_sat * edge_len)
    return np.where(valid, cost, float(INF)).astype(np.float32)


# ---------------------------------------------------------------------------
# main builder (main_offline_callback.py)
# ---------------------------------------------------------------------------

def build_lattice(gt: GlobalTrajectory, cfg: OfflineConfig,
                  md5_params: str = "", graph_id: str = "tpu0") -> Lattice:
    s_fine = np.concatenate([[0.0], np.cumsum(gt.el_lengths)])
    raceline_fine = gt.raceline
    closed = bool(np.hypot(raceline_fine[0, 0] - raceline_fine[-1, 0],
                           raceline_fine[0, 1] - raceline_fine[-1, 1])
                  < cfg.closure_detection_dist)

    # fine global raceline (s, x, y, kappa, vel) — closed duplicate appended
    rl_params = np.column_stack([raceline_fine, gt.kappa_rl, gt.vel_rl])
    if closed:
        glob_rl = np.column_stack([s_fine, np.vstack([rl_params, rl_params[:1]])])
    else:
        glob_rl = np.column_stack([s_fine[:-1], rl_params])
    glob_el = np.diff(glob_rl[:, 0])
    glob_el = np.append(glob_el, 0.0)

    idx = variable_step_size(gt.kappa_rl, gt.el_lengths,
                             d_curve=cfg.lon_curve_step,
                             d_straight=cfg.lon_straight_step,
                             curve_th=cfg.curve_thr,
                             force_last=not closed)
    refline = gt.refline[idx]
    width_right = gt.width_right[idx]
    width_left = gt.width_left[idx]
    normvec = gt.normvec[idx]
    alpha = gt.alpha[idx]
    vel_rl = gt.vel_rl[idx]
    s_rl = s_fine[idx]
    length_rl = [float(np.sum(gt.el_lengths[a:b]))
                 for a, b in zip(idx[:-1], idx[1:])] + [0.0]

    # f64 through the geometric build (headings / raceline spline / edge
    # fan-out): the reference builds its graph at float64, and f32 noise in
    # node headings (~1e-7 rad) perturbs edge curvatures enough (~6e-8) to
    # flip near-optimal DP argmins online (observed on berlin, PARITY.md)
    with jax.enable_x64():
        node_alpha, node_psi, node_valid, rl_idx, nodes_in_layer = \
            build_node_skeleton(refline, normvec, alpha, width_right,
                                width_left, length_rl, cfg, closed)
        raceline = refline + normvec * alpha[:, None]
        raceline_coeffs = np.asarray(
            spl.fit_periodic_chain(
                jnp.asarray(np.vstack([raceline, raceline[:1]]),
                            jnp.float64)))
    L, N = node_alpha.shape
    node_pos = refline[:, None, :] + normvec[:, None, :] * node_alpha[..., None]

    valid, coeffs, samples, n_pts, edge_len, kappa_s, is_rl_edge, S = \
        _build_edges(node_pos, node_psi, node_valid, rl_idx, nodes_in_layer,
                     vel_rl, raceline_coeffs, cfg, closed)
    valid = _prune(valid, closed)
    w = _offline_cost(valid, kappa_s, n_pts, edge_len, rl_idx, cfg)

    # virtual goal cost (GraphBase.add_node:188).  With virt_goal_n=False the
    # reference instead scans goal nodes iteratively — raceline node first,
    # then decreasing indices to 0, then increasing (GraphBase.
    # search_graph_layer:897-927) — and keeps the FIRST feasible one.  That
    # order is a total rank per node, so "first feasible in scan order"
    # == argmin(best + rank * BIG) with BIG >> any path cost: the selection
    # stays a single weighted argmin over the DP frontier.  (Reported path
    # cost then includes the rank bias; the reference never propagates the
    # search cost either, see GraphBase.search_graph return contract.)
    n_ar = np.arange(N)[None, :]
    if cfg.virt_goal_n:
        vg = np.abs(rl_idx[:, None] - n_ar) \
            * cfg.lat_resolution * cfg.w_virt_goal
    else:
        rank = np.where(n_ar <= rl_idx[:, None], rl_idx[:, None] - n_ar, n_ar)
        vg = rank.astype(np.float64) * GOAL_RANK_SCALE
    vg_cost = np.where(node_valid, vg, float(INF)).astype(np.float32)

    # planning horizon tables (gen_local_node_template.py:101-147)
    end_layer = np.zeros(L, np.int32)
    for start in range(L):
        if cfg.plan_horizon_mode == "distance":
            des = s_rl[start] + cfg.min_plan_horizon
            if des > s_rl[-1]:
                des = des - s_rl[-1] if closed else s_rl[-1]
            end_layer[start] = int(np.searchsorted(s_rl, des, side="left"))
        elif cfg.plan_horizon_mode == "layers":
            if closed:
                end_layer[start] = (start + int(cfg.min_plan_horizon)) % L
            else:
                # reference uses max() here (gen_local_node_template.py:133),
                # which always yields the last layer — we use the evidently
                # intended min() clamp instead
                end_layer[start] = min(start + int(cfg.min_plan_horizon), L - 1)
        else:
            raise ValueError(f"unsupported plan_horizon_mode "
                             f"{cfg.plan_horizon_mode!r}")
    h_goal = np.mod(end_layer - np.arange(L), L).astype(np.int32)
    h_goal = np.where(h_goal == 0, L - 1 if closed else 0, h_goal)
    H_max = int(np.max(h_goal))

    return Lattice(
        node_pos=jnp.asarray(node_pos, jnp.float32),
        node_psi=jnp.asarray(node_psi, jnp.float32),
        node_valid=jnp.asarray(node_valid),
        rl_idx=jnp.asarray(rl_idx, jnp.int32),
        nodes_in_layer=jnp.asarray(nodes_in_layer, jnp.int32),
        w=jnp.asarray(w),
        edge_valid=jnp.asarray(valid),
        edge_len=jnp.asarray(edge_len),
        edge_npts=jnp.asarray(n_pts),
        samples_xy=jnp.asarray(samples),
        samples_el=jnp.asarray(_samples_el_table(np.asarray(samples))),
        vg_cost=jnp.asarray(vg_cost),
        end_layer_for_start=jnp.asarray(end_layer),
        h_goal_for_start=jnp.asarray(h_goal),
        refline=jnp.asarray(refline, jnp.float32),
        normvec=jnp.asarray(normvec, jnp.float32),
        alpha=jnp.asarray(alpha, jnp.float32),
        s_rl=jnp.asarray(s_rl, jnp.float32),
        vel_rl=jnp.asarray(vel_rl, jnp.float32),
        raceline=jnp.asarray(raceline, jnp.float32),
        track_width_right=jnp.asarray(width_right, jnp.float32),
        track_width_left=jnp.asarray(width_left, jnp.float32),
        raceline_coeffs=jnp.asarray(raceline_coeffs, jnp.float32),
        glob_rl=jnp.asarray(glob_rl, jnp.float32),
        glob_el=jnp.asarray(glob_el, jnp.float32),
        L=L, N=N, S=S, H_max=H_max, closed=closed,
        lat_resolution=cfg.lat_resolution,
        lat_offset=cfg.lat_offset,
        sampled_resolution=cfg.stepsize_approx,
        veh_width=cfg.veh_width,
        veh_length=cfg.veh_length,
        veh_turn=cfg.veh_turn,
        vel_decrease_lat=cfg.vel_decrease_lat,
        virt_goal_cost=cfg.w_virt_goal,
        md5_params=md5_params,
        graph_id=graph_id,
    )


# ---------------------------------------------------------------------------
# artifact store (main_offline_callback.py:56-74, 183-196 — md5-keyed cache)
# ---------------------------------------------------------------------------

_ARRAY_FIELDS = [f.name for f in dataclasses.fields(Lattice)
                 if not f.metadata.get("static", False)]
_META_FIELDS = [f.name for f in dataclasses.fields(Lattice)
                if f.metadata.get("static", False)]


def _samples_el_table(samples: np.ndarray) -> np.ndarray:
    """(L, N, N, S) inter-sample element lengths (last column 0)."""
    d = np.linalg.norm(np.diff(samples, axis=3), axis=-1)
    return np.concatenate(
        [d, np.zeros(d.shape[:3] + (1,), d.dtype)], axis=3).astype(np.float32)


def save_lattice(lat: Lattice, path: str) -> None:
    arrays = {k: np.asarray(getattr(lat, k)) for k in _ARRAY_FIELDS}
    meta = {f"meta_{k}": np.asarray(getattr(lat, k)) for k in _META_FIELDS}
    meta["meta_VERSION"] = np.asarray(VERSION)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays, **meta)


def load_lattice(path: str) -> Optional[Lattice]:
    if not os.path.isfile(path):
        return None
    try:
        z = np.load(path, allow_pickle=False)
    except Exception:
        return None
    if float(z.get("meta_VERSION", -1)) != VERSION:
        LOG.warning("lattice artifact version mismatch — rebuilding")
        return None
    kwargs = {}
    for k in _ARRAY_FIELDS:
        if k == "samples_el" and k not in z:
            # derived table absent in older artifacts — backfill
            kwargs[k] = jnp.asarray(_samples_el_table(z["samples_xy"]))
            continue
        kwargs[k] = jnp.asarray(z[k])
    for k in _META_FIELDS:
        v = z[f"meta_{k}"][()]
        if isinstance(v, np.generic):
            v = v.item()
        if isinstance(v, bytes):
            v = v.decode()
        kwargs[k] = v
    return Lattice(**kwargs)


def load_or_build(globtraj, cfg_path: str, store_path: str,
                  force_recalc: bool = False, graph_id: str = "tpu0"):
    """md5-keyed load-or-rebuild (main_offline_callback.py:56-74).

    ``globtraj`` may be a CSV path, the name of a built-in synthetic track
    (currently ``"oval"``), or a :class:`GlobalTrajectory` instance — the
    cache key covers the track data in every case, so synthetic tracks are
    first-class citizens of the facade (no CSV file required).
    """
    import hashlib

    from graphbasedlocaltrajectoryplanner_tpu.models.track import (
        GlobalTrajectory, make_oval_track)
    from graphbasedlocaltrajectoryplanner_tpu.utils.config import md5_file

    gt = None
    if isinstance(globtraj, GlobalTrajectory):
        gt = globtraj
    elif globtraj == "oval":
        gt = make_oval_track()
    if gt is not None:
        h = hashlib.md5()
        for f in dataclasses.fields(gt):
            h.update(np.ascontiguousarray(getattr(gt, f.name)).tobytes())
        md5 = h.hexdigest() + md5_file(cfg_path)
    else:
        md5 = md5_file(globtraj) + md5_file(cfg_path)
    if not force_recalc:
        lat = load_lattice(store_path)
        if lat is not None and lat.md5_params == md5:
            LOG.debug("loaded lattice from %s", store_path)
            return lat, False
    cfg = OfflineConfig.from_ini(cfg_path)
    if gt is None:
        gt = import_globtraj_csv(globtraj)
    lat = build_lattice(gt, cfg, md5_params=md5, graph_id=graph_id)
    save_lattice(lat, store_path)
    return lat, True
