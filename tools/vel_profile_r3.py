"""Devtool (historical, round-3 optimization campaign): ablation timings
inside the velocity stage.

Frozen snapshot probes (methodology record; the opponent-summary and scan
formulations measured here were redesigned in response) — re-measure with
parallel/profiling.stage_timings_trace.

Times the Pallas stacked-scan launches at production shapes in isolation,
plus the non-scan parts of the stage (opponent summary, path projections,
emergency) to locate the stage cost.
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
    from graphbasedlocaltrajectoryplanner_tpu.planner import velplan as vp
    from graphbasedlocaltrajectoryplanner_tpu.ops import velocity as velops
    from graphbasedlocaltrajectoryplanner_tpu.ops import projection as proj

    lat = load_lattice(os.path.join(TOP, "artifacts",
                                    "monteblanco_lattice.npz"))
    scen = sc.random_scenarios(lat, batch=args.batch, seed=0, n_objects=1)
    from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_collision import (
        build_samples_t)
    samples_t = build_samples_t(lat.samples_xy) \
        if jax.default_backend() != "cpu" else None

    f_win = jax.jit(lambda s: sc._batched_window(lat, s, samples_t))
    _, (obs, window) = _time(f_win, scen, iters=3)
    asm = jax.jit(jax.vmap(lambda s, o, w: sc.scenario_tick(
        lat, s, precomputed=dict(obs=o, window=w), until="assembly")))
    t_asm, asm_out = _time(asm, scen, obs, window, iters=args.iters)
    full = jax.jit(jax.vmap(lambda s, o, w: sc.scenario_tick(
        lat, s, precomputed=dict(obs=o, window=w))))
    t_full, _ = _time(full, scen, obs, window, iters=args.iters)

    rep = {"assembly_cum_ms": t_asm * 1e3, "full_cum_ms": t_full * 1e3,
           "velocity_delta_ms": (t_full - t_asm) * 1e3}

    B = args.batch
    P_full = asm_out["paths"].shape[2]
    T = P_full - 1

    # ---- raw pallas launches at production level shapes ------------------
    rng = np.random.default_rng(0)
    machines = jnp.asarray([[0.0, 5.0], [100.0, 5.0]], jnp.float32)
    for R_per in (1, 4, 6):
        R = B * R_per
        mk = lambda: jnp.asarray(rng.uniform(0, 1, (R, T)), jnp.float32)
        kap, ds = mk() * 0.02, mk() * 2.5
        gga = jnp.full((R, T), 10.0)
        vl = jnp.full((R, T), 50.0)
        vi = jnp.full((R,), 30.0)
        md = jnp.zeros((R,), jnp.int32)
        f = jax.jit(lambda *a: velops.stacked_vel_scan_auto(
            *a, machines, 1.0, 0.85, 1000.0))
        t, _ = _time(f, kap, gga, gga, kap, gga, gga, ds, vl, vi, md,
                     iters=args.iters)
        rep[f"pallas_lvl_R{R_per}_ms"] = t * 1e3

    # ---- non-scan pieces --------------------------------------------------
    paths = asm_out["paths"]                     # (B, 4, P_full, 5)

    def opp(s):
        return vp.opponent_summary(lat.glob_rl, lat.glob_el,
                                   s.obj_pos[0], s.obj_vel[0],
                                   1.0, 0.85, 1000.0)
    t, _ = _time(jax.jit(jax.vmap(opp)), scen, iters=args.iters)
    rep["opponent_summary_ms"] = t * 1e3

    def proj_f(p, s):
        path_f = p[1]
        s_arr = jnp.concatenate([jnp.zeros((1,)),
                                 jnp.cumsum(path_f[:-1, 4])])
        s_obj, _ = proj.get_s_coord(path_f[:, 0:2], s.obj_pos[0], s_arr)
        s_ego, _ = proj.get_s_coord(path_f[:, 0:2], s.pos_cut, s_arr)
        return s_obj, s_ego
    t, _ = _time(jax.jit(jax.vmap(proj_f)), paths, scen, iters=args.iters)
    rep["follow_projections_ms"] = t * 1e3

    def emerg(p):
        gg = jnp.full((P_full, 2), 10.0)
        s_arr = jnp.concatenate([jnp.zeros((1,)),
                                 jnp.cumsum(p[1][:-1, 4])])
        traj = jnp.column_stack([s_arr, p[1][:, 0], p[1][:, 1],
                                 p[1][:, 2], p[1][:, 3],
                                 jnp.full((P_full,), 30.0),
                                 jnp.zeros((P_full,))])
        return vp.emergency_kernel(traj, gg)
    t, _ = _time(jax.jit(jax.vmap(emerg)), paths, iters=args.iters)
    rep["emergency_ms"] = t * 1e3

    print(json.dumps({k: round(v, 3) for k, v in rep.items()}, indent=1))


if __name__ == "__main__":
    main()
