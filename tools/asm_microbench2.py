"""Finer-grained microbench: sub-pieces of chain fit, sampling, velocity.

Complements tools/asm_microbench.py with piece-level attribution so
optimization targets the true cost (gathers vs sequential scans vs matmul).
"""

import os
import sys
import time

import numpy as np

TOP = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, TOP)


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(TOP, "artifacts", "jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc
    from graphbasedlocaltrajectoryplanner_tpu.planner import pathgen as pg
    from graphbasedlocaltrajectoryplanner_tpu.ops import splines as spl
    from graphbasedlocaltrajectoryplanner_tpu.ops import velocity as velops

    lat = bench._lattice()
    B = int(os.environ.get("MB_BATCH", "1024"))
    R = 4  # slots
    H, N, L, S = lat.H_max, lat.N, lat.L, lat.S
    p_max = int(np.ceil((H * (S - 1) + 1) / 64.0) * 64)
    P_full = sc.C_PAD + p_max
    rng = np.random.default_rng(0)

    def timeit(name, fn, *a, iters=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:34s} {dt*1e3:8.3f} ms", flush=True)
        return out

    # synthetic chains (B, R, H+1) on valid nodes
    nil = np.asarray(lat.nodes_in_layer)
    sl = rng.integers(0, L, (B, R)).astype(np.int32)
    wl = (sl[..., None] + np.arange(H + 1)[None, None, :]) % L
    nodes = np.minimum(rng.integers(0, 8, (B, R, H + 1)),
                       nil[wl] - 1).astype(np.int32)
    h_eff = np.full((B, R), H, np.int32)
    wl_j = jnp.asarray(wl)
    nodes_j = jnp.asarray(nodes)
    h_j = jnp.asarray(h_eff)
    psi_j = jnp.zeros((B, R), jnp.float32)

    # --- piece 1: per-edge row gathers -----------------------------------
    def gathers(wl, nodes):
        def one(wl_, nd):
            ns = jnp.clip(nd, 0, N - 1)
            l_h, n_h, m_h = wl_[:H], ns[:H], ns[1:]
            return (lat.edge_npts[l_h, n_h, m_h],
                    lat.edge_len[l_h, n_h, m_h],
                    lat.samples_el[l_h, n_h, m_h],
                    lat.node_pos[wl_, ns])
        return jax.vmap(jax.vmap(one))(wl, nodes)
    timeit("edge row gathers", jax.jit(gathers), wl_j, nodes_j)

    # --- piece 2: Thomas solve alone -------------------------------------
    lower = jnp.ones((B, R, H - 1))
    diag = jnp.full((B, R, H - 1), 4.0)
    upper = jnp.ones((B, R, H - 1))
    rhs = jnp.asarray(rng.normal(size=(B, R, H - 1, 2)), jnp.float32)
    timeit("thomas (B,4) vmapped",
           jax.jit(jax.vmap(jax.vmap(spl._thomas))), lower, diag, upper, rhs)

    # --- piece 3: full chain fit ------------------------------------------
    def fit(wl, nodes, h, psi):
        def one(wl_, nd, hh, ps):
            ns = jnp.clip(nd, 0, N - 1)
            l_h, n_h, m_h = wl_[:H], ns[:H], ns[1:]
            seg_active = jnp.arange(H) < hh
            len_e = jnp.where(seg_active, lat.edge_len[l_h, n_h, m_h], 1.0)
            chain_pos = lat.node_pos[wl_, ns]
            end_pos = chain_pos[hh]
            chain_pos = jnp.where((jnp.arange(H + 1) > hh)[:, None],
                                  end_pos, chain_pos)
            c_last = lat.edge_coeffs(l_h[hh - 1], n_h[hh - 1], m_h[hh - 1])
            psi_e, _ = spl.head_curv_an(c_last, jnp.float32(1.0))
            return pg._fit_clamped_chain_padded(chain_pos, len_e, ps, psi_e,
                                                hh, H)
        return jax.vmap(jax.vmap(one))(wl, nodes, h, psi)
    coeffs = timeit("chain fit (gathers+thomas)", jax.jit(fit),
                    wl_j, nodes_j, h_j, psi_j)

    # --- piece 4: one-hot sampling matmul alone ---------------------------
    node_idx = jnp.asarray(
        np.cumsum(np.full((B, R, H), S - 1), axis=-1) - (S - 1)
    ).astype(jnp.int32)
    table = jnp.asarray(rng.normal(size=(B, R, H, 8 + S + 2)), jnp.float32)

    # NOTE: avoid searchsorted on this backend — use the compare-sum
    def sample_mm2(node_idx, table):
        def one(ni, tb):
            idxp = jnp.arange(p_max)
            seg_id = jnp.sum((ni[None, :] <= idxp[:, None]).astype(jnp.int32),
                             axis=1) - 1
            seg_id = jnp.clip(seg_id, 0, H - 1)
            oh = (seg_id[:, None] == jnp.arange(H)[None, :]).astype(tb.dtype)
            return jnp.matmul(oh, tb, precision=jax.lax.Precision.HIGHEST)
        return jax.vmap(jax.vmap(one))(node_idx, table)
    rows = timeit("one-hot sample matmul HIGHEST", jax.jit(sample_mm2),
                  node_idx, table)

    def sample_take(node_idx, table):
        def one(ni, tb):
            idxp = jnp.arange(p_max)
            seg_id = jnp.sum((ni[None, :] <= idxp[:, None]).astype(jnp.int32),
                             axis=1) - 1
            seg_id = jnp.clip(seg_id, 0, H - 1)
            return jnp.take(tb, seg_id, axis=0)
        return jax.vmap(jax.vmap(one))(node_idx, table)
    timeit("row gather sample (take)", jax.jit(sample_take), node_idx, table)

    # --- piece 5: poly eval alone -----------------------------------------
    c_p = jnp.asarray(rng.normal(size=(B, R, p_max, 4, 2)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B, R, p_max)), jnp.float32)

    def evals(c_p, t):
        pts = spl.eval_spline(c_p, t)
        psi, kappa = spl.head_curv_an(c_p, t)
        return pts, psi, kappa
    timeit("poly eval (pts+psi+kappa)", jax.jit(evals), c_p, t)

    # --- piece 6: velocity stacked scans at several unrolls ---------------
    rows_n = 6
    T = P_full - 1
    k1 = jnp.asarray(np.abs(rng.normal(size=(B, rows_n, T))) * 0.01,
                     jnp.float32)
    ds = jnp.full((B, rows_n, T), 2.5, jnp.float32)
    vl = jnp.full((B, rows_n, T), 70.0, jnp.float32)
    vi = jnp.full((B, rows_n), 30.0, jnp.float32)
    gcol = jnp.full((B, rows_n, T), 10.0, jnp.float32)
    mode = jnp.zeros((B, rows_n), jnp.int32)
    machines = jnp.array([[0.0, 5.0], [100.0, 5.0]], jnp.float32)

    for unroll in (16, 48, 112):
        fn = jax.jit(jax.vmap(
            lambda a, b, c, d, e, f: velops.stacked_vel_scan(
                a, b, b, a, b, b, c, d, e, f,
                machines, 1.0, 0.85, 1000.0, unroll=unroll)))
        timeit(f"stacked_vel_scan unroll={unroll}", fn,
               k1, gcol, ds, vl, vi, mode)


if __name__ == "__main__":
    main()
