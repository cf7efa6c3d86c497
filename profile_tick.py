"""Profiling harness — the framework's tracing subsystem (SURVEY.md §5
"Tracing / profiling": the reference only has wall-clock moving averages,
OnlineTrajectoryHandler.py:351-366; here we add real device profiling).

Captures a JAX/XLA profiler trace of the batched scenario tick (phases are
``jax.named_scope``-annotated in parallel/scenario.py: object_selection,
plan_window, backtrace_assemble, velocity) and prints a host-side stage
breakdown by timing progressively larger jitted prefixes of the tick.

Usage:
    python profile_tick.py [--batch 1024] [--iters 5] [--no-trace] [--cpu]

The trace lands in artifacts/profile/<ts>/ — open with TensorBoard's
profile plugin or xprof.
"""

import argparse
import os
import time

REFERENCE_TRACK = "/root/reference/inputs/traj_ltpl_cl/traj_ltpl_cl_monteblanco.csv"
TOP = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no-trace", action="store_true",
                    help="skip the profiler trace, just print stage timings")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(TOP, "artifacts", "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from graphbasedlocaltrajectoryplanner_tpu.models.lattice import (
        load_lattice, build_lattice, save_lattice)
    from graphbasedlocaltrajectoryplanner_tpu.models.track import (
        import_globtraj_csv, make_oval_track)
    from graphbasedlocaltrajectoryplanner_tpu.utils.config import OfflineConfig
    from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc
    from graphbasedlocaltrajectoryplanner_tpu.planner import pathgen as pg

    cache = os.path.join(TOP, "artifacts", "monteblanco_lattice.npz")
    lat = load_lattice(cache)
    if lat is None:
        gt = (import_globtraj_csv(REFERENCE_TRACK)
              if os.path.isfile(REFERENCE_TRACK) else make_oval_track())
        lat = build_lattice(gt, OfflineConfig(), md5_params="bench")
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        save_lattice(lat, cache)

    scen = sc.random_scenarios(lat, batch=args.batch, seed=0, n_objects=1)

    # ---- stage breakdown: jit progressively larger prefixes --------------
    def search_only(s):
        zone_block = jnp.zeros((lat.L, lat.N), bool)
        out = pg.plan_window_kernel(
            lat, s.start_layer, s.start_node, zone_block,
            s.obj_pos, s.obj_radius, s.obj_active,
            s.start_layer, jnp.int32(0), jnp.bool_(False),
            jnp.full((2,), -1, jnp.int32), jnp.ones((1,), jnp.float32),
            n_last=2)
        return out["best"], out["vg"]

    stages = {
        "search (plan_window DP)": jax.jit(jax.vmap(search_only)),
        "full tick": sc.make_batched_tick(lat),
    }
    print(f"devices={jax.devices()}  batch={args.batch}")
    timings = {}
    for name, fn in stages.items():
        out = fn(scen)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(scen)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        timings[name] = dt
        print(f"  {name:28s} {dt * 1e3:8.2f} ms/iter "
              f"({args.batch / dt:,.0f} replans/s)")
    rest = timings["full tick"] - timings["search (plan_window DP)"]
    print(f"  {'assembly+velocity (rest)':28s} {rest * 1e3:8.2f} ms/iter")

    # ---- device trace -----------------------------------------------------
    if not args.no_trace:
        trace_dir = os.path.join(TOP, "artifacts", "profile",
                                 time.strftime("%Y%m%d_%H%M%S"))
        os.makedirs(trace_dir, exist_ok=True)
        tick = stages["full tick"]
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                out = tick(scen)
            jax.block_until_ready(out)
        print(f"trace written to {trace_dir} "
              "(named scopes: gltpl.object_selection / gltpl.plan_window / "
              "gltpl.backtrace_assemble / gltpl.velocity)")


if __name__ == "__main__":
    main()
