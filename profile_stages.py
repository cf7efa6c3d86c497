"""Devtool: per-stage timing + roofline of the batched scenario tick
(production kernels via parallel/profiling.py — companion to
profile_tick.py; bench.py emits the same breakdown into
artifacts/BENCH_DETAILS.json)."""

import argparse
import json
import os

TOP = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lattice",
                    default=os.path.join(TOP, "artifacts",
                                         "monteblanco_lattice.npz"))
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(TOP, "artifacts", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from graphbasedlocaltrajectoryplanner_tpu.models.lattice import (
        load_lattice)
    from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc
    from graphbasedlocaltrajectoryplanner_tpu.parallel.profiling import (
        stage_timings, stage_timings_trace)

    lat = load_lattice(args.lattice)
    if lat is None:
        raise SystemExit(f"could not load lattice from {args.lattice} "
                         "(run bench.py once to build it)")
    scen = sc.random_scenarios(lat, batch=args.batch, seed=0, n_objects=1)
    rep = (stage_timings_trace(lat, scen, iters=min(args.iters, 5))
           or stage_timings(lat, scen, iters=args.iters))
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
