"""Microbenchmark the sub-parts of the path-assembly stage on TPU.

Times (batch x 4 slots, production shapes) each piece of
``planner/pathgen.assemble_action_kernel`` in isolation to direct
optimization of the dominant stage (assembly ~49% of the tick at batch
1024, artifacts/BENCH_DETAILS.json).
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

    lat = bench._lattice()
    B = int(os.environ.get("MB_BATCH", "1024"))
    scen = sc.random_scenarios(lat, batch=B, seed=0, n_objects=1)
    from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_collision import (
        build_samples_t)
    samples_t = build_samples_t(lat.samples_xy)

    f_win = jax.jit(lambda s: sc._batched_window(lat, s, samples_t))
    obs, window = f_win(scen)
    jax.block_until_ready((obs, window))

    H, N, L, S = lat.H_max, lat.N, lat.L, lat.S
    p_max = int(np.ceil((H * (S - 1) + 1) / 64.0) * 64)

    def timeit(name, fn, *a, iters=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:28s} {dt*1e3:8.3f} ms")
        return out

    # decision tree -> src/h per slot (cheap, host of the assembly inputs)
    f_dec = jax.jit(lambda s, o, w: jax.vmap(
        lambda x, y, z: sc.scenario_tick(
            lat, x, precomputed=dict(obs=y, window=z), until="decide"))(
        s, o, w))
    dec = timeit("decide", f_dec, scen, obs, window)
    src4, h4 = dec["src"], jnp.maximum(dec["h_eff"], 1)

    # 1. backtrace alone (4 slots x B)
    def bt(s, o, w, src, h):
        def one(x, y, z, sr, hh):
            return jax.vmap(lambda s_, h_: pg.backtrace_slot(
                z["best"][s_], z["bp"][s_], z["vg"][s_], h_))(sr, hh)
        return jax.vmap(one)(s, o, w, src, h)
    f_bt = jax.jit(bt)
    nodes_all, cost_all = timeit("backtrace x4", f_bt, scen, obs, window,
                                 src4, h4)

    # 2. chain fit alone (tridiagonal Thomas + coeffs)
    def fit_one(wl, nodes, h_eff, psi_s):
        nsafe = jnp.clip(nodes, 0, N - 1)
        l_h, n_h, m_h = wl[:H], nsafe[:H], nsafe[1:]
        seg_active = jnp.arange(H) < h_eff
        len_e = jnp.where(seg_active, lat.edge_len[l_h, n_h, m_h], 1.0)
        chain_pos = lat.node_pos[wl, nsafe]
        end_pos = chain_pos[h_eff]
        chain_pos = jnp.where((jnp.arange(H + 1) > h_eff)[:, None], end_pos,
                              chain_pos)
        c_last = lat.edge_coeffs(l_h[h_eff - 1], n_h[h_eff - 1],
                                 m_h[h_eff - 1])
        psi_e, _ = spl.head_curv_an(c_last, jnp.float32(1.0))
        return pg._fit_clamped_chain_padded(chain_pos, len_e, psi_s, psi_e,
                                            h_eff, H)

    def fit(s, w, nodes, h):
        def one(s_, w_, nd, hh):
            return jax.vmap(lambda nd_, h_: fit_one(
                w_["win_layers"], nd_, h_, s_.psi_start))(nd, hh)
        return jax.vmap(one)(s, w, nodes, h)
    f_fit = jax.jit(fit)
    coeffs_all = timeit("chain fit x4", f_fit, scen, window, nodes_all, h4)

    # 3. full assembly (fit + one-hot sampling) for comparison
    def asm(s, w, nodes, h):
        def one(s_, w_, nd, hh):
            return jax.vmap(lambda nd_, h_: pg.assemble_action_kernel(
                lat, w_["win_layers"], nd_, h_, s_.psi_start,
                p_max=p_max)["path"])(nd, hh)
        return jax.vmap(one)(s, w, nodes, h)
    f_asm = jax.jit(asm)
    timeit("assemble x4 (fit+sample)", f_asm, scen, window, nodes_all, h4)

    # 4. until=assembly (adds const splice) for the cumulative number
    f_upto = jax.jit(lambda s, o, w: jax.vmap(
        lambda x, y, z: sc.scenario_tick(
            lat, x, precomputed=dict(obs=y, window=z),
            until="assembly"))(s, o, w))
    timeit("tick until=assembly", f_upto, scen, obs, window)

    f_full = jax.jit(lambda s, o, w: jax.vmap(
        lambda x, y, z: sc.scenario_tick(
            lat, x, precomputed=dict(obs=y, window=z)))(s, o, w))
    timeit("tick full", f_full, scen, obs, window)


if __name__ == "__main__":
    main()
