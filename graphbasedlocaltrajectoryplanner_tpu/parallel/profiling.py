"""Per-stage timing + roofline accounting for the batched scenario tick.

Uses the PRODUCTION kernels via :func:`scenario._batched_window` and the
``until="assembly"`` staging cutoff of :func:`scenario.scenario_tick` — no
re-implemented stage logic that could drift (round-1 advisor finding).

Consumed by ``bench.py`` (stage dict + roofline in BENCH_DETAILS.json) and
the ``profile_stages.py`` devtool.
"""

from __future__ import annotations

import os
import time

import numpy as np

from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc


def _time(fn, *a, iters=10):
    """Median of 3 timing windows: the tunneled dev chip occasionally
    returns early from block_until_ready, and a single window then
    reports a bogus (near-zero) time — medians reject one such window
    (CLAUDE.md: use medians, never minima)."""
    import jax
    out = fn(*a)
    jax.block_until_ready(out)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        dts.append(time.perf_counter() - t0)
    return float(np.median(dts)) / iters, out


SCOPE_TO_STAGE = (
    ("gltpl.plan_window_pallas", "window"),
    ("gltpl.hit_slab_pallas", "window"),
    ("gltpl.object_selection", "window"),
    ("gltpl.plan_window", "window"),
    ("gltpl.const_path_objects", "window"),
    ("gltpl.backtrace", "assembly"),
    ("gltpl.assemble", "assembly"),
    ("gltpl.const_splice", "assembly"),
    ("gltpl.velocity", "velocity"),
    ("gltpl.emergency", "velocity"),
)


def stage_timings_trace(lat, scen, iters: int = 3, use_pallas: bool = None):
    """Per-stage attribution from a device profiler trace of the REAL fused
    tick (named scopes in parallel/scenario.py), replacing the cumulative-
    prefix timing whose separately-jitted stage cuts stopped matching the
    production program once XLA began scheduling across the cut points.

    Sums device op durations by scope prefix; ops outside any named scope
    are reported as ``other``.  Returns None when no trace events can be
    captured on this backend.
    """
    import glob
    import gzip
    import json as _json
    import tempfile

    import jax

    tick = sc.make_batched_tick(lat, use_pallas=use_pallas)
    out = tick(scen)
    jax.block_until_ready(out)
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(iters):
                out = tick(scen)
            jax.block_until_ready(out)
        files = glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                          recursive=True)
        if not files:
            return None
        with gzip.open(files[0]) as fh:
            tr = _json.load(fh)

    stage_us = {"window": 0.0, "assembly": 0.0, "velocity": 0.0,
                "other": 0.0}
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e or "args" not in e:
            continue
        nm = e["args"].get("tf_op") or e["args"].get("long_name") or ""
        if not nm.startswith("jit(tick)"):
            continue
        stage = "other"
        for scope, st in SCOPE_TO_STAGE:
            if scope in nm:
                stage = st
                break
        stage_us[stage] += e["dur"]
    total = sum(stage_us.values())
    if total <= 0:
        return None
    ms = {k: v / iters / 1e3 for k, v in stage_us.items()}
    return dict(stage_ms={k: round(v, 3) for k, v in ms.items()},
                stage_share={k: round(v / (total / iters / 1e3), 3)
                             for k, v in ms.items()},
                total_ms=round(total / iters / 1e3, 3),
                method="profiler-trace scope attribution")


def stage_timings(lat, scen, iters: int = 10, use_pallas: bool = None,
                  p_max: int = None):
    """Time the three pipeline stages of the batched tick on the current
    backend and derive a roofline-style account.

    Stages (cumulative variants; deltas reported):
      1. ``window``    — obstacle selection + collision masks + fused 4-slot
                         window DP + vg vectors (``_batched_window``).
      2. ``assembly``  — + backtrace, C2-refit path assembly, const splice
                         (``scenario_tick(until="assembly")``).
      3. ``velocity``  — + velocity scans, follow law, emergency kernel
                         (full tick).

    :returns: dict with per-stage ms, shares, and roofline estimates.
    """
    import jax

    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    samples_t = None
    if use_pallas:
        from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_collision \
            import build_samples_t
        samples_t = build_samples_t(lat.samples_xy)
    if p_max is None:
        p_max = int(np.ceil((lat.H_max * (lat.S - 1) + 1) / 64.0) * 64)
    B = int(scen.start_layer.shape[0])

    f_win = jax.jit(lambda s: sc._batched_window(lat, s, samples_t))
    t_win, (obs, window) = _time(f_win, scen, iters=iters)

    def upto_asm(s, o, w):
        return jax.vmap(lambda x, y, z: sc.scenario_tick(
            lat, x, precomputed=dict(obs=y, window=z),
            until="assembly"))(s, o, w)

    def full(s, o, w):
        return jax.vmap(lambda x, y, z: sc.scenario_tick(
            lat, x, precomputed=dict(obs=y, window=z)))(s, o, w)

    t_asm_c, _ = _time(jax.jit(upto_asm), scen, obs, window, iters=iters)
    t_full_c, _ = _time(jax.jit(full), scen, obs, window, iters=iters)

    ms = dict(window=t_win * 1e3,
              assembly=max(t_asm_c * 1e3, 0.0),
              velocity=max((t_full_c - t_asm_c) * 1e3, 0.0))
    total = t_win * 1e3 + t_full_c * 1e3

    # ---- roofline-style accounting ------------------------------------
    L, N, H, S = lat.L, lat.N, lat.H_max, lat.S
    P_full = sc.C_PAD + p_max
    # window DP touches the (H, N, N) cost slab for 4 slots per scenario
    # (the Pallas kernel keeps lat.w VMEM-resident; this is the logical
    # traffic the DP consumes)
    dp_bytes = B * 4 * H * N * N * 4
    # velocity: 4 stacked scan levels over P_full sequential steps; the
    # per-step state is tiny -> latency-bound, so report ns/step
    vel_steps = 4 * P_full
    # assembly: one-hot layer gathers + C2 tridiagonal + resample matmuls,
    # ~(H x N) selects over S-sample edges per slot
    asm_flops = B * 4 * (H * N * S * 2 + p_max * 8)

    roofline = dict(
        batch=B,
        p_full=int(P_full),
        window_logical_gb_per_s=dp_bytes / max(t_win, 1e-9) / 1e9,
        velocity_sequential_steps=int(vel_steps),
        velocity_ns_per_step=(ms["velocity"] * 1e6) / max(vel_steps, 1),
        assembly_gflops_per_s=asm_flops / max(t_asm_c, 1e-9) / 1e9,
        note=("velocity is latency-bound (sequential scan steps, "
              "4 stacked levels x P_full); window is bandwidth-bound on "
              "the cost slab; assembly is MXU work"),
    )
    shares = {k: v / max(total, 1e-9) for k, v in ms.items()}
    return dict(stage_ms={k: round(v, 3) for k, v in ms.items()},
                stage_share={k: round(v, 3) for k, v in shares.items()},
                total_ms=round(total, 3), roofline=roofline)
