"""Devtool: fine-grained scope attribution of the ASSEMBLY stage — the
largest stage of the fb tick after the r4 window-DP work (4.1 ms of the
9.0 ms batch-1024 device tick).  Splits the coarse 'assembly' bucket of
parallel/profiling.stage_timings_trace into its named scopes (backtrace /
assemble / const_splice) plus everything else per scope, to direct the
next optimization.

Run on the TPU: python profile_assembly.py  [--batch 1024]
Writes artifacts/ASSEMBLY_PROFILE.json.
"""

import argparse
import glob
import gzip
import json
import os
import tempfile

ROOT = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, "artifacts", "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from graphbasedlocaltrajectoryplanner_tpu.models.lattice import (
        load_lattice)
    from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc

    lat = load_lattice(os.path.join(ROOT, "artifacts",
                                    "monteblanco_lattice.npz"))
    scen = sc.random_scenarios(lat, batch=args.batch, seed=0, n_objects=1)
    tick = sc.make_batched_tick(lat)
    out = tick(scen)
    jax.block_until_ready(out)

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(args.iters):
                out = tick(scen)
            jax.block_until_ready(out)
        files = glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                          recursive=True)
        with gzip.open(files[0]) as fh:
            tr = json.load(fh)

    by_scope = {}
    ops = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e or "args" not in e:
            continue
        nm = e["args"].get("tf_op") or e["args"].get("long_name") or ""
        if "jit(tick)" not in nm:
            continue
        scope = "other"
        for s in ("gltpl.backtrace", "gltpl.assemble", "gltpl.const_splice",
                  "gltpl.plan_window_pallas", "gltpl.hit_slab_pallas",
                  "gltpl.object_selection", "gltpl.const_path_objects",
                  "gltpl.velocity", "gltpl.emergency"):
            if s in nm:
                scope = s
                break
        by_scope[scope] = by_scope.get(scope, 0.0) + e["dur"]
        if scope in ("gltpl.assemble", "gltpl.backtrace",
                     "gltpl.const_splice"):
            op = e.get("name", "?")
            ops[f"{scope}:{op}"] = ops.get(f"{scope}:{op}", 0.0) + e["dur"]

    ms = {k: round(v / args.iters / 1e3, 3)
          for k, v in sorted(by_scope.items(), key=lambda kv: -kv[1])}
    top_ops = dict(sorted(ops.items(), key=lambda kv: -kv[1])[:25])
    top_ops = {k: round(v / args.iters / 1e3, 3) for k, v in top_ops.items()}
    rep = dict(batch=args.batch, scope_ms=ms, top_assembly_ops_ms=top_ops)
    with open(os.path.join(ROOT, "artifacts", "ASSEMBLY_PROFILE.json"),
              "w") as fh:
        json.dump(rep, fh, indent=1)
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main()
