"""Devtool (historical, round-3 optimization campaign): ablation timings
inside the assembly stage.

The probe formulations below are frozen snapshots of the round-3-START
production code (they drove the packed-gather / Pallas-backtrace /
barrel-shift redesigns recorded in CLAUDE.md); the production kernels have
since moved on, so treat the numbers as methodology, not current truth —
re-measure with parallel/profiling.stage_timings_trace.

Breaks the ``assembly`` stage of parallel/profiling.stage_timings into its
constituents on the real backend — backtrace, C2 chain fit, resampling,
const splice — plus micro-variants of the resampling formulation, to locate
the 16 ms (48% share, BENCH_r02) before optimizing.
"""

import argparse
import json
import os
import sys
import time

TOP = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, TOP)


def _time(fn, *a, iters=20):
    import jax
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(TOP, "artifacts", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from graphbasedlocaltrajectoryplanner_tpu.models.lattice import (
        load_lattice)
    from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc
    from graphbasedlocaltrajectoryplanner_tpu.planner import pathgen as pg
    from graphbasedlocaltrajectoryplanner_tpu.ops import splines as spl

    lat = load_lattice(os.path.join(TOP, "artifacts",
                                    "monteblanco_lattice.npz"))
    scen = sc.random_scenarios(lat, batch=args.batch, seed=0, n_objects=1)
    from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_collision import (
        build_samples_t)
    use_pallas = jax.default_backend() not in ("cpu",)
    samples_t = build_samples_t(lat.samples_xy) if use_pallas else None

    f_win = jax.jit(lambda s: sc._batched_window(lat, s, samples_t))
    t_win, (obs, window) = _time(f_win, scen, iters=args.iters)

    dec = jax.jit(jax.vmap(lambda s, o, w: sc.scenario_tick(
        lat, s, precomputed=dict(obs=o, window=w), until="decide")))
    _, d = _time(dec, scen, obs, window, iters=2)
    src4, h4 = d["src"], jnp.maximum(d["h_eff"], 1)

    rep = {"window_ms": t_win * 1e3}
    p_max = int(np.ceil((lat.H_max * (lat.S - 1) + 1) / 64.0) * 64)
    H = lat.H_max

    # ---- backtrace only --------------------------------------------------
    def backtrace_all(w, s4, h4_):
        def per_scen(wi, si, hi):
            return jax.vmap(lambda s, h: pg.backtrace_slot(
                wi["best"][s], wi["bp"][s], wi["vg"][s], h))(si, hi)
        return jax.vmap(per_scen)(w, s4, h4_)
    t_bt, (nodes_all, cost_all) = _time(jax.jit(backtrace_all), window,
                                        src4, h4, iters=args.iters)
    rep["backtrace_ms"] = t_bt * 1e3

    # psi_s per scenario-slot (cheap; reuse straight heading for all)
    psi_s = jnp.broadcast_to(scen.psi_start[:, None], src4.shape)

    # ---- full assemble kernel -------------------------------------------
    def asm_full(wl, nodes, h, ps):
        return jax.vmap(jax.vmap(
            lambda n, hh, p, w: pg.assemble_action_kernel(
                lat, w, n, hh, p, p_max=p_max),
            in_axes=(0, 0, 0, None)))(nodes, h, ps, wl)
    t_asm, res_all = _time(jax.jit(asm_full), window["win_layers"],
                           nodes_all, h4, psi_s, iters=args.iters)
    rep["assemble_full_ms"] = t_asm * 1e3

    # ---- fit only (gathers + tridiagonal chain fit) ---------------------
    def fit_only(wl, nodes, h, ps):
        def one(n, hh, p, w):
            nsafe = jnp.clip(n, 0, lat.N - 1)
            l_h, n_h, m_h = w[:H], nsafe[:H], nsafe[1:]
            seg_active = jnp.arange(H) < hh
            npts_e = jnp.where(seg_active, lat.edge_npts[l_h, n_h, m_h], 1)
            len_e = jnp.where(seg_active, lat.edge_len[l_h, n_h, m_h], 1.0)
            chain_pos = lat.node_pos[w, nsafe]
            end_pos = chain_pos[hh]
            chain_pos = jnp.where((jnp.arange(H + 1) > hh)[:, None], end_pos,
                                  chain_pos)
            last = hh - 1
            c_last = lat.edge_coeffs(l_h[last], n_h[last], m_h[last])
            psi_e, _ = spl.head_curv_an(c_last, jnp.float32(1.0))
            coeffs = pg._fit_clamped_chain_padded(chain_pos, len_e, p,
                                                  psi_e, hh, H)
            seg_el = lat.samples_el[l_h, n_h, m_h]
            return coeffs, npts_e, len_e, seg_el
        return jax.vmap(jax.vmap(one, in_axes=(0, 0, 0, None)))(
            nodes, h, ps, wl)
    t_fit, fit_out = _time(jax.jit(fit_only), window["win_layers"],
                           nodes_all, h4, psi_s, iters=args.iters)
    rep["fit_only_ms"] = t_fit * 1e3

    coeffs_all, npts_all, len_all, seg_el_all = fit_out

    # ---- sample variants (coeffs precomputed) ---------------------------
    def node_layout(npts_e, hh):
        node_idx = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                    jnp.cumsum(npts_e - 1).astype(jnp.int32)])
        return node_idx, node_idx[hh] + 1

    def sample_onehot_hi(coeffs, npts_e, seg_el, hh):
        # production formulation: HIGHEST-precision one-hot matmul
        node_idx, n_valid = node_layout(npts_e, hh)
        idxp = jnp.arange(p_max)
        S = lat.S
        seg_id = jnp.sum((node_idx[1:][None, :] <= idxp[:, None])
                         .astype(jnp.int32), axis=1)
        seg_id = jnp.clip(seg_id, 0, H - 1)
        oh = (seg_id[:, None] == jnp.arange(H)[None, :]).astype(coeffs.dtype)
        table = jnp.concatenate(
            [coeffs.reshape(H, 8), seg_el,
             node_idx[:H, None].astype(coeffs.dtype),
             npts_e[:, None].astype(coeffs.dtype)], axis=1)
        rows = jnp.matmul(oh, table, precision=jax.lax.Precision.HIGHEST)
        c_p = rows[:, :8].reshape(p_max, 4, 2)
        el_rows = rows[:, 8:8 + S]
        start_p = rows[:, 8 + S].astype(jnp.int32)
        npts_p = rows[:, 8 + S + 1].astype(jnp.int32)
        within = (idxp - start_p).astype(jnp.float32)
        t = jnp.clip(within / jnp.maximum(npts_p - 1, 1), 0.0, 1.0)
        pts = spl.eval_spline(c_p, t)
        psi, kappa = spl.head_curv_an(c_p, t)
        el = jnp.sum(jnp.where(within[:, None] == jnp.arange(S)[None, :],
                               el_rows, 0.0), axis=1)
        return pts, psi, kappa, el, n_valid

    def sample_gather(coeffs, npts_e, seg_el, hh):
        # plain row gather
        node_idx, n_valid = node_layout(npts_e, hh)
        idxp = jnp.arange(p_max)
        seg_id = jnp.sum((node_idx[1:][None, :] <= idxp[:, None])
                         .astype(jnp.int32), axis=1)
        seg_id = jnp.clip(seg_id, 0, H - 1)
        c_p = coeffs[seg_id]
        start_p = node_idx[seg_id]
        npts_p = npts_e[seg_id]
        within = (idxp - start_p).astype(jnp.float32)
        t = jnp.clip(within / jnp.maximum(npts_p - 1, 1), 0.0, 1.0)
        pts = spl.eval_spline(c_p, t)
        psi, kappa = spl.head_curv_an(c_p, t)
        el = seg_el[seg_id, jnp.clip(within.astype(jnp.int32), 0, lat.S - 1)]
        return pts, psi, kappa, el, n_valid

    def sample_poly_direct(coeffs, npts_e, seg_el, hh):
        # no per-point table at all: evaluate ALL (H, S) per-segment sample
        # positions from static t-grids, then scatter... (upper bound probe:
        # eval on the (H, S) grid then one reshape-style select)
        node_idx, n_valid = node_layout(npts_e, hh)
        S = lat.S
        tg = jnp.arange(S)[None, :] / jnp.maximum(npts_e[:, None] - 1, 1)
        tg = jnp.clip(tg, 0.0, 1.0)
        pts = spl.eval_spline(coeffs[:, None, :, :], tg)     # (H, S, 2)
        psi, kappa = spl.head_curv_an(coeffs[:, None, :, :], tg)
        idxp = jnp.arange(p_max)
        seg_id = jnp.sum((node_idx[1:][None, :] <= idxp[:, None])
                         .astype(jnp.int32), axis=1)
        seg_id = jnp.clip(seg_id, 0, H - 1)
        within = jnp.clip(idxp - node_idx[seg_id], 0, S - 1)
        return (pts[seg_id, within], psi[seg_id, within],
                kappa[seg_id, within], seg_el[seg_id, within], n_valid)

    for name, fn in [("sample_onehot_hi", sample_onehot_hi),
                     ("sample_gather", sample_gather),
                     ("sample_poly_direct", sample_poly_direct)]:
        f = jax.jit(jax.vmap(jax.vmap(fn)))
        t, _ = _time(f, coeffs_all, npts_all, seg_el_all, h4,
                     iters=args.iters)
        rep[name + "_ms"] = t * 1e3

    # ---- fit internals: gathers vs tridiagonal solve --------------------
    def gathers_only(wl, nodes, h):
        def one(n, hh, w):
            nsafe = jnp.clip(n, 0, lat.N - 1)
            l_h, n_h, m_h = w[:H], nsafe[:H], nsafe[1:]
            npts_e = lat.edge_npts[l_h, n_h, m_h]
            len_e = lat.edge_len[l_h, n_h, m_h]
            seg_el = lat.samples_el[l_h, n_h, m_h]
            chain_pos = lat.node_pos[w, nsafe]
            last = hh - 1
            c_last = lat.edge_coeffs(l_h[last], n_h[last], m_h[last])
            return npts_e, len_e, seg_el, chain_pos, c_last
        return jax.vmap(jax.vmap(one, in_axes=(0, 0, None)))(nodes, h, wl)
    t_g, gout = _time(jax.jit(gathers_only), window["win_layers"],
                      nodes_all, h4, iters=args.iters)
    rep["fit_gathers_ms"] = t_g * 1e3

    def thomas_only(chain_pos, len_e, h, ps, c_last):
        def one(cp, le, hh, p, cl):
            psi_e, _ = spl.head_curv_an(cl, jnp.float32(1.0))
            return pg._fit_clamped_chain_padded(cp, le, p, psi_e, hh, H)
        return jax.vmap(jax.vmap(one))(chain_pos, len_e, h, ps, c_last)
    _, _, _, chain_all, clast_all = gout
    t_t, _ = _time(jax.jit(thomas_only), chain_all,
                   jnp.maximum(len_all, 1e-9), h4, psi_s, clast_all,
                   iters=args.iters)
    rep["fit_thomas_ms"] = t_t * 1e3

    # ---- gather variants -------------------------------------------------
    # individual tables
    def g_npts(wl, nodes):
        def one(n, w):
            ns = jnp.clip(n, 0, lat.N - 1)
            return lat.edge_npts[w[:H], ns[:H], ns[1:]]
        return jax.vmap(jax.vmap(one, in_axes=(0, None)))(nodes, wl)
    def g_el(wl, nodes):
        def one(n, w):
            ns = jnp.clip(n, 0, lat.N - 1)
            return lat.samples_el[w[:H], ns[:H], ns[1:]]
        return jax.vmap(jax.vmap(one, in_axes=(0, None)))(nodes, wl)
    def g_pos(wl, nodes):
        def one(n, w):
            ns = jnp.clip(n, 0, lat.N - 1)
            return lat.node_pos[w, ns]
        return jax.vmap(jax.vmap(one, in_axes=(0, None)))(nodes, wl)
    for nm, fn in [("g_npts", g_npts), ("g_el", g_el), ("g_pos", g_pos)]:
        t, _ = _time(jax.jit(fn), window["win_layers"], nodes_all,
                     iters=args.iters)
        rep[nm + "_ms"] = t * 1e3

    # packed big table, one row-gather for everything
    packed = jnp.concatenate(
        [lat.edge_npts.astype(jnp.float32)[..., None],
         lat.edge_len[..., None], lat.samples_el], axis=-1)  # (L,N,N,16)
    def g_packed(wl, nodes):
        def one(n, w):
            ns = jnp.clip(n, 0, lat.N - 1)
            return packed[w[:H], ns[:H], ns[1:]]
        return jax.vmap(jax.vmap(one, in_axes=(0, None)))(nodes, wl)
    t, _ = _time(jax.jit(g_packed), window["win_layers"], nodes_all,
                 iters=args.iters)
    rep["g_packed_ms"] = t * 1e3

    # flat linear index + take
    packed_flat = packed.reshape(-1, packed.shape[-1])
    def g_flat(wl, nodes):
        def one(n, w):
            ns = jnp.clip(n, 0, lat.N - 1)
            li = (w[:H] * lat.N + ns[:H]) * lat.N + ns[1:]
            return jnp.take(packed_flat, li, axis=0)
        return jax.vmap(jax.vmap(one, in_axes=(0, None)))(nodes, wl)
    t, _ = _time(jax.jit(g_flat), window["win_layers"], nodes_all,
                 iters=args.iters)
    rep["g_flat_ms"] = t * 1e3

    # flat scalar index into fully-flat table (single scalar per (b,a,h,c))
    flat1 = packed.reshape(-1)
    C = packed.shape[-1]
    def g_flat1(wl, nodes):
        def one(n, w):
            ns = jnp.clip(n, 0, lat.N - 1)
            li = ((w[:H] * lat.N + ns[:H]) * lat.N + ns[1:]) * C
            return flat1[li[:, None] + jnp.arange(C)[None, :]]
        return jax.vmap(jax.vmap(one, in_axes=(0, None)))(nodes, wl)
    t, _ = _time(jax.jit(g_flat1), window["win_layers"], nodes_all,
                 iters=args.iters)
    rep["g_flat1_ms"] = t * 1e3

    # ---- backtrace one-hot variant --------------------------------------
    def backtrace_onehot(w, s4, h4_):
        def per(bp, vg, best, s, hh):
            # select slot via one-hot over 4 (bp is (4, H+1, N))
            ohs = (jnp.arange(4) == s).astype(jnp.int32)
            bp_s = jnp.einsum('a,ahn->hn', ohs, bp)
            ohh = (jnp.arange(H + 1) == hh).astype(best.dtype)
            goal_tot = jnp.einsum('h,ahn->an', ohh, best + vg)
            gt_s = jnp.einsum('a,an->n', ohs.astype(best.dtype), goal_tot)
            goal_node = jnp.argmin(gt_s).astype(jnp.int32)

            def step(oh_above, h):
                node_h = jnp.sum(bp_s[jnp.clip(h + 1, 0, H)] * oh_above)
                node_h = jnp.where(h == hh, goal_node,
                                   jnp.where(h > hh, -1, node_h))
                oh_new = (jnp.arange(lat.N) == node_h).astype(jnp.int32)
                carry = jnp.where(h <= hh, oh_new, oh_above)
                return carry, node_h
            oh0 = (jnp.arange(lat.N) == goal_node).astype(jnp.int32)
            _, nodes_rev = jax.lax.scan(step, oh0,
                                        jnp.arange(H, -1, -1), unroll=8)
            return nodes_rev[::-1], gt_s[goal_node]
        return jax.vmap(jax.vmap(per, in_axes=(None, None, None, 0, 0)))(
            w["bp"], w["vg"], w["best"], s4, h4_)
    t_bto, bto = _time(jax.jit(backtrace_onehot), window, src4, h4,
                       iters=args.iters)
    rep["backtrace_onehot_ms"] = t_bto * 1e3
    import numpy as _np
    same = _np.array_equal(_np.asarray(nodes_all), _np.asarray(bto[0]))
    rep["backtrace_onehot_match"] = float(same)

    # ---- const splice (production path, via until="assembly" delta) -----
    asm_stage = jax.jit(jax.vmap(lambda s, o, w: sc.scenario_tick(
        lat, s, precomputed=dict(obs=o, window=w), until="assembly")))
    t_stage, _ = _time(asm_stage, scen, obs, window, iters=args.iters)
    rep["assembly_stage_total_ms"] = t_stage * 1e3

    print(json.dumps({k: round(v, 3) for k, v in rep.items()}, indent=1))


if __name__ == "__main__":
    main()
