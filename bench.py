"""Benchmark: full action-set replans/sec/chip on the Monteblanco track.

One replan = everything the reference does per 100 ms tick (path search for
every action primitive + velocity profiles) — here as the fused batched
scenario engine.  The baseline is the reference's real-time budget of
10 replans/sec (params/ltpl_config_online.ini:87 calc_time_warn_threshold =
0.1 s per iteration on the vehicle CPU); BASELINE.json's north star asks for
>= 1000 replans/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_TRACK = "/root/reference/inputs/traj_ltpl_cl/traj_ltpl_cl_monteblanco.csv"
BASELINE_REPLANS_PER_SEC = 10.0       # reference 100 ms budget
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "artifacts", "monteblanco_lattice.npz")


def _lattice():
    from graphbasedlocaltrajectoryplanner_tpu.models.lattice import (
        load_lattice, build_lattice, save_lattice)
    from graphbasedlocaltrajectoryplanner_tpu.models.track import (
        import_globtraj_csv, make_oval_track)
    from graphbasedlocaltrajectoryplanner_tpu.utils.config import OfflineConfig

    lat = load_lattice(CACHE)
    if lat is not None:
        return lat
    if os.path.isfile(REFERENCE_TRACK):
        gt = import_globtraj_csv(REFERENCE_TRACK)
    else:
        gt = make_oval_track()
    lat = build_lattice(gt, OfflineConfig(), md5_params="bench")
    save_lattice(lat, CACHE)
    return lat


def main():
    import jax
    # persistent compile cache: amortize the large-graph compiles across runs
    cache_dir = os.path.join(os.path.dirname(CACHE), "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc

    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    lat = _lattice()
    scen = sc.random_scenarios(lat, batch=batch, seed=0, n_objects=1)
    tick = sc.make_batched_tick(lat)

    # warm up (compile + tunnel)
    out = tick(scen)
    jax.block_until_ready(out)

    # median of 3 timing windows: the tunneled dev chip shows ~10%
    # run-to-run clock variance AND occasional bogus windows where
    # block_until_ready returns early (a min would amplify those)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = tick(scen)
        jax.block_until_ready(out)
        dts.append(time.perf_counter() - t0)
    replans_per_sec = batch * iters / float(np.median(dts))

    # single-replan latency (the 100 ms real-time budget view): fused tick
    # at batch 1, per-call blocking
    details = {"batch": batch, "throughput_replans_per_sec": replans_per_sec}
    try:
        scen1 = sc.random_scenarios(lat, batch=1, seed=1, n_objects=1)
        tick1 = sc.make_batched_tick(lat)
        jax.block_until_ready(tick1(scen1))
        lats = []
        for _ in range(30):
            t0 = time.perf_counter()
            jax.block_until_ready(tick1(scen1))
            lats.append(time.perf_counter() - t0)
        # single-replan (batch-1) latency vs the reference's per-replan
        # 100 ms budget (ltpl_config_online.ini:84-87).  Wall latency on
        # this dev harness is dominated by the remote-tunnel round trip
        # (~25 ms/call); the device-compute time is reported separately.
        details["single_replan_latency_ms_p50"] = \
            float(np.percentile(lats, 50) * 1e3)
        details["single_replan_latency_ms_p99"] = \
            float(np.percentile(lats, 99) * 1e3)
        details["single_replan_budget_ms"] = 100.0
        try:
            from graphbasedlocaltrajectoryplanner_tpu.parallel.profiling \
                import stage_timings_trace
            st1 = stage_timings_trace(lat, scen1, iters=5)
            if st1:
                details["single_replan_device_compute_ms"] = st1["total_ms"]
        except Exception:
            pass
    except Exception as e:            # pragma: no cover
        details["latency_error"] = str(e)

    # multi-opponent throughput (VERDICT r2 item 5): 3 vehicles + their CV
    # prediction points per scenario, at the handler-parity full collision
    # capacity (O_PAD = 16 slots; collision-slot capacity is a static
    # per-batch shape — the 1-opponent headline runs at its natural o_pad=4)
    details["collision_slots_headline"] = int(scen.obj_pos.shape[1])
    try:
        scen3 = sc.random_scenarios(lat, batch=batch, seed=2, n_objects=3,
                                    n_pred=1, o_pad=sc.O_PAD)
        tick3 = sc.make_batched_tick(lat)
        jax.block_until_ready(tick3(scen3))
        n3 = max(iters // 2, 5)
        dts3 = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n3):
                out3 = tick3(scen3)
            jax.block_until_ready(out3)
            dts3.append(time.perf_counter() - t0)
        details["multi_opponent_3veh_o16_replans_per_sec"] = \
            batch * n3 / float(np.median(dts3))
    except Exception as e:            # pragma: no cover
        details["multi_opponent_error"] = str(e)

    # batch-scaling curve (VERDICT r4 item 5): throughput vs batch size up
    # to 8k scenarios/chip — makes the "4k+ scenarios on one chip" claim a
    # measured row and locates the saturation point.  Each batch shape is
    # its own XLA program (persistent cache amortizes across runs); set
    # BENCH_SWEEP=0 to skip.
    if os.environ.get("BENCH_SWEEP", "1") == "1":
        sweep = {}
        tick_sw = sc.make_batched_tick(lat)
        for b in (256, 1024, 2048, 4096, 8192):
            # one retry per size: the remote-compile service is
            # occasionally degraded for single requests (CLAUDE.md) —
            # a transient failure must not abort the sweep
            for attempt in (0, 1):
                try:
                    scb = sc.random_scenarios(lat, batch=b, seed=5,
                                              n_objects=1)
                    jax.block_until_ready(tick_sw(scb))
                    nb = max(3, min(iters, 32768 // b))
                    # median of 3 windows: occasional bogus windows where
                    # block_until_ready returns early would otherwise
                    # produce absurd rates (observed 48M replans/s)
                    # physical floor: a fused tick is never faster than
                    # ~2 ms wall at batch >= 256 (device compute alone is
                    # > 5 ms at 1024) — windows under the floor are the
                    # early-return pathology (observed: all three windows
                    # bogus at batch 8192 -> "105M replans/s"); re-measure
                    # them instead of letting the median pass garbage
                    dts_b = []
                    floor_s = nb * 2e-3
                    for _ in range(3):
                        for _retry in range(4):
                            t0 = time.perf_counter()
                            for _ in range(nb):
                                outb = tick_sw(scb)
                            jax.block_until_ready(outb)
                            dt = time.perf_counter() - t0
                            if dt >= floor_s:
                                break
                        dts_b.append(dt)
                    med = float(np.median(dts_b))
                    if med < floor_s:
                        sweep[str(b)] = ("unreliable: timing windows "
                                         "under the physical floor")
                    else:
                        sweep[str(b)] = round(b * nb / med, 1)
                    break
                except Exception as e:        # pragma: no cover
                    sweep[str(b)] = (f"failed: {type(e).__name__}: "
                                     f"{str(e)[:120]}")
        details["batch_sweep_replans_per_sec"] = sweep
        numeric = {int(k): v for k, v in sweep.items()
                   if isinstance(v, float)}
        if numeric:
            b_best = max(numeric, key=numeric.get)
            details["batch_sweep_note"] = (
                f"peak {numeric[b_best]:.0f} replans/s at batch {b_best}; "
                "largest successful batch "
                f"{max(numeric)} ({numeric[max(numeric)]:.0f} replans/s)")
            try:
                # window-DP logical bandwidth at the peak batch (the cost
                # slab the DP consumes per tick vs the tick's window time)
                from graphbasedlocaltrajectoryplanner_tpu.parallel.profiling \
                    import stage_timings_trace
                scp = sc.random_scenarios(lat, batch=b_best, seed=5,
                                          n_objects=1)
                stp = stage_timings_trace(lat, scp, iters=3)
                if stp:
                    dp_gb = (b_best * 4 * lat.H_max * lat.N * lat.N * 4
                             / 1e9)
                    details["window_dp_gb_per_s_at_peak_batch"] = round(
                        dp_gb / (stp["stage_ms"]["window"] / 1e3), 1)
            except Exception:                 # pragma: no cover
                pass

    # fleet-scale SQP velocity backend (VERDICT r3 item 2): the batched
    # engine honoring vp_type=sqp — 5 dense m-point ADMM QP solves per
    # scenario on the MXU (ops/qp.py; m = the reference's
    # nmbr_export_points)
    try:
        tick_sqp = sc.make_batched_tick(lat, vp_backend="sqp", sqp_m=115)
        scen_q = sc.random_scenarios(lat, batch=batch, seed=3, n_objects=1)
        jax.block_until_ready(tick_sqp(scen_q))
        # iters//2 (10 ticks/window): the SQP point showed a 39-49k
        # run-to-run band at 5 ticks/window (per-window host overhead,
        # not device variance — the trace stage totals are stable)
        nq = max(iters // 2, 5)
        dtsq = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(nq):
                outq = tick_sqp(scen_q)
            jax.block_until_ready(outq)
            dtsq.append(time.perf_counter() - t0)
        details["sqp_backend_replans_per_sec"] = \
            batch * nq / float(np.median(dtsq))
        # SQP stage attribution (VERDICT r4 item 1): named-scope trace of
        # the SQP tick (window/assembly/qp_setup/qp_factor/qp_iters/...)
        # — the table that located the 52x gap (dense K_inv matvecs) and
        # now documents the banded-PCR profile
        try:
            import sys as _sys2
            _sys2.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from profile_sqp import trace_attribution
            details["sqp_stages"] = trace_attribution(tick_sqp, scen_q,
                                                      iters=3)
        except Exception as e:        # pragma: no cover
            details["sqp_stages_error"] = str(e)
    except Exception as e:            # pragma: no cover
        details["sqp_backend_error"] = str(e)

    # per-stage breakdown (profiler-trace scope attribution; falls back to
    # the cumulative-prefix timing where no trace can be captured) + the
    # roofline-style account (VERDICT r3 item 1: both views are published —
    # trace ms for attribution, roofline for distance-from-hardware-bound)
    try:
        from graphbasedlocaltrajectoryplanner_tpu.parallel.profiling import (
            stage_timings, stage_timings_trace)
        cum = stage_timings(lat, scen, iters=10)
        details["stages"] = (stage_timings_trace(lat, scen, iters=3)
                             or cum)
        roof = cum.get("roofline")
        if roof and details["stages"].get("method", "").startswith(
                "profiler-trace"):
            # rate fields re-derived from the trace-attributed stage times
            # (the cumulative-prefix cuts are the fallback measurement;
            # their deltas have degenerated to 0 on bogus timing windows)
            st = details["stages"]["stage_ms"]
            if st.get("window"):
                roof["window_logical_gb_per_s"] = round(
                    roof["window_logical_gb_per_s"]
                    * (cum["stage_ms"]["window"] / st["window"]), 2)
            if st.get("velocity"):
                roof["velocity_ns_per_step"] = round(
                    st["velocity"] * 1e6
                    / max(roof["velocity_sequential_steps"], 1), 1)
        details["stages"]["roofline"] = roof
    except Exception as e:            # pragma: no cover
        details["stages_error"] = str(e)

    # recurring on-hardware Pallas/XLA + cross-backend parity gate
    # (VERDICT r3 item 5): every kernel compiled on this backend vs its XLA
    # formulation, plus the full tick vs a forced-CPU oracle subprocess;
    # full report in artifacts/PALLAS_PARITY.json
    try:
        import sys as _sys
        _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.pallas_parity import run as parity_run
        prep = parity_run(batch=128, lat=lat)
        details["pallas_parity_ok"] = bool(prep["ok"])
        if "end_to_end" in prep:
            details["cross_backend_max_dxy_m"] = \
                prep["end_to_end"].get("max_dxy_m")
        if "end_to_end_sqp" in prep:
            details["cross_backend_sqp_max_dxy_m"] = \
                prep["end_to_end_sqp"].get("max_dxy_m")
            details["cross_backend_sqp_max_dv_mps"] = \
                prep["end_to_end_sqp"].get("max_dv_mps")
    except Exception as e:            # pragma: no cover
        details["pallas_parity_error"] = str(e)

    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    with open(os.path.join(os.path.dirname(CACHE), "BENCH_DETAILS.json"),
              "w") as fh:
        json.dump(details, fh, indent=1)
    print(json.dumps({
        "metric": "full_action_set_replans_per_sec_per_chip",
        "value": round(replans_per_sec, 1),
        "unit": "replans/s",
        "vs_baseline": round(replans_per_sec / BASELINE_REPLANS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
