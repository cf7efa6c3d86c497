"""On-hardware Pallas <-> XLA parity gate (VERDICT r3 item 5).

CI runs every Pallas kernel in interpret mode on the forced-CPU test
backend (tests/test_pallas_*.py); a Mosaic LOWERING regression on real TPU
would ship silently — the bench would still print a (wrong) number.  This
script runs the four production kernels COMPILED on the current backend
against their XLA formulations and writes a recurring artifact,
``artifacts/PALLAS_PARITY.json``.  ``bench.py`` invokes it every run.

Checks (production entry points, not re-implementations):
  * fused_window_dp (ops/pallas_window.py)  vs  pathgen.plan_window_kernel
  * hit_slab_pallas (ops/pallas_collision)  vs  pathgen.window_prelude
  * fused velocity scan (ops/pallas_velocity) vs velocity.stacked_vel_scan
  * backtrace kernel (ops/pallas_backtrace) vs search.backtrace walk

Exit code 0 iff every gate holds.  Run standalone:
    python tools/pallas_parity.py [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

TOP = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, TOP)
OUT = os.path.join(TOP, "artifacts", "PALLAS_PARITY.json")


def check_window_collision(lat, batch):
    """Window DP + collision slab kernels on a random scenario batch."""
    import jax
    import jax.numpy as jnp
    from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc
    from graphbasedlocaltrajectoryplanner_tpu.planner import pathgen as pg
    from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_window import (
        fused_window_dp)
    from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_collision import (
        build_samples_t, hit_slab_pallas)

    scen = sc.random_scenarios(lat, batch=batch, seed=11, n_objects=2)
    obs = jax.jit(jax.vmap(lambda s: sc._select_obstacle(lat, s)))(scen)
    pre = jax.jit(jax.vmap(
        lambda s, o: pg.window_prelude(
            lat, s.start_layer, s.obj_pos, s.obj_radius, s.obj_active,
            o["obs_layer"], o["obs_node"], o["obs_found"])))(scen, obs)

    # collision: streaming Pallas slab kernel vs the XLA gather masks
    samples_t = build_samples_t(lat.samples_xy)
    hit_p = jax.jit(hit_slab_pallas)(
        samples_t, pre["slab_layers"], scen.obj_pos, pre["ref2"],
        pre["obj_app"])
    hit_mismatch = int(np.sum(np.asarray(hit_p) != np.asarray(
        pre["hit_slab"])))

    # window DP: fused Mosaic kernel vs the vmapped XLA scan kernel
    zone = jnp.zeros((lat.L, lat.N), bool)
    wlf = jnp.array([0.0, 0.5, 0.8], jnp.float32)
    best_p, bp_p = jax.jit(lambda: fused_window_dp(
        lat.w, zone, scen.start_layer, scen.start_node,
        pre["slab_layers"], pre["hit_slab"], pre["p_obs"], pre["in_win"],
        obs["obs_node"], scen.last_nodes, wlf,
        closed=bool(lat.closed), h_max=int(lat.H_max),
        interpret=False))()
    ref = jax.jit(jax.vmap(lambda s, o: pg.plan_window_kernel(
        lat, s.start_layer, s.start_node, zone, s.obj_pos, s.obj_radius,
        s.obj_active, o["obs_layer"], o["obs_node"], o["obs_found"],
        s.last_nodes, wlf, n_last=sc.N_LAST)))(scen, obs)
    best_r = np.asarray(ref["best"])
    bp_r = np.asarray(ref["bp"])
    d_best = np.abs(np.asarray(best_p) - best_r)
    rel = d_best / np.maximum(np.abs(best_r), 1.0)
    finite = best_r < 1e29
    max_d_best = float(d_best[finite].max()) if finite.any() else 0.0
    # frontier values may differ by a few f32 ulp: the Mosaic MXU computes
    # f32 dots as multi-pass bf16 products whose partial-sum rounding
    # differs from XLA's fused path; backpointers/argmins must still agree
    # exactly (a tie flip would show up as bp_mismatches)
    max_rel = float(rel[finite].max()) if finite.any() else 0.0
    inf_agree = bool(np.array_equal(finite, np.asarray(best_p) < 1e29))
    bp_mismatch = int(np.sum(np.asarray(bp_p) != bp_r))
    return dict(
        window=dict(max_abs_diff_best=max_d_best,
                    max_rel_diff_best=max_rel,
                    infeasible_sets_equal=inf_agree,
                    bp_mismatches=bp_mismatch,
                    n=int(best_r.size),
                    ok=bool(max_rel <= 1e-6 and inf_agree
                            and bp_mismatch == 0)),
        collision=dict(mismatches=hit_mismatch,
                       n=int(np.asarray(hit_p).size),
                       ok=bool(hit_mismatch == 0)),
    )


def check_velocity():
    import jax.numpy as jnp
    from graphbasedlocaltrajectoryplanner_tpu.ops import velocity as velops
    from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_velocity import (
        make_fused_vel_scan)
    rng = np.random.default_rng(5)
    R, T = 16, 447
    machines = jnp.asarray([[0.0, 5.0], [30.0, 4.0], [70.0, 2.0]],
                           jnp.float32)
    modes = np.resize([0, 1, 2], R)
    kappa = jnp.asarray(np.abs(rng.normal(0, 0.02, (R, T))), jnp.float32)
    gg = jnp.asarray(np.full((R, T), 10.0), jnp.float32)
    ds = jnp.asarray(np.where(rng.random((R, T)) < 0.9, 2.5, 0.0),
                     jnp.float32)
    vlim = jnp.asarray(np.clip(rng.normal(40, 15, (R, T)), 3, 70),
                       jnp.float32)
    vlim = jnp.where(jnp.asarray(modes)[:, None] == velops.MODE_BRAKE,
                     jnp.inf, vlim)
    vinit = jnp.asarray(np.clip(rng.normal(30, 10, R), 1, 60), jnp.float32)
    modes = jnp.asarray(modes, jnp.int32)
    ref = velops.stacked_vel_scan(kappa, gg, gg, kappa, gg, gg, ds, vlim,
                                  vinit, modes, machines, 1.0, 0.85, 1000.0)
    out = make_fused_vel_scan(interpret=False)(
        kappa, gg, gg, kappa, gg, gg, ds, vlim, vinit, modes,
        machines, 1.0, 0.85, 1000.0)
    d = float(np.max(np.abs(np.asarray(out) - np.asarray(ref))))
    # constant-gg Mosaic variant (the batched engine's production path)
    from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_velocity import (
        make_fused_vel_scan_cgg)
    out_c = make_fused_vel_scan_cgg((1.0, 0.85, 1000.0), (10.0, 10.0),
                                    interpret=False)(
        kappa, kappa, ds, vlim, vinit, modes, machines)
    d_c = float(np.max(np.abs(np.asarray(out_c) - np.asarray(ref))))
    return dict(max_abs_diff=d, max_abs_diff_cgg=d_c,
                n=int(np.asarray(ref).size),
                ok=bool(d <= 2e-3 and d_c <= 2e-3))


def check_backtrace():
    import jax.numpy as jnp
    from graphbasedlocaltrajectoryplanner_tpu.ops import search as srch
    from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_backtrace import (
        make_backtrace_goal)
    rng = np.random.default_rng(7)
    R, Hp1, N = 16, 30, 32
    best = jnp.asarray(rng.uniform(0, 100, (R, Hp1, N)), jnp.float32)
    bp = jnp.asarray(rng.integers(0, N, (R, Hp1, N)), jnp.int32)
    bp = bp.at[:, 0, :].set(-1)
    vg = jnp.asarray(rng.uniform(0, 10, (R, Hp1, N)), jnp.float32)
    h_eff = jnp.asarray(rng.integers(1, Hp1, (R,)), jnp.int32)
    nodes, cost = make_backtrace_goal(interpret=False)(best, bp, vg, h_eff)
    mism = 0
    for r in range(R):
        goal_tot = np.asarray(best[r, int(h_eff[r])] + vg[r, int(h_eff[r])])
        goal = int(np.argmin(goal_tot))
        n_ref = np.asarray(srch.backtrace(bp[r], h_eff[r], jnp.int32(goal)))
        mism += int(np.sum(np.asarray(nodes[r]) != n_ref))
        mism += int(float(cost[r]) != goal_tot[goal])
    return dict(mismatches=mism, n=int(R * Hp1), ok=bool(mism == 0))


_E2E_ORACLE = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from graphbasedlocaltrajectoryplanner_tpu.models.lattice import load_lattice
from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc
lat = load_lattice({lat_path!r})
scen = sc.random_scenarios(lat, batch={batch}, seed=42, n_objects=1)
tick = sc.make_batched_tick(lat, use_pallas=False, **{tick_kw!r})
out = tick(scen)
np.savez({out_path!r}, trajs=np.asarray(out["trajs"]),
         valid=np.asarray(out["valid"]), nv=np.asarray(out["n_valid"]))
"""


def check_end_to_end(lat, batch: int = 8, tick_kw: dict = None,
                     bar_dxy: float = 2e-3, bar_dv: float = 2e-2):
    """Full-tick cross-backend gate: the compiled tick on THIS backend vs a
    forced-CPU oracle subprocess, compared on every valid trajectory.

    This is what caught the 1.5 m / 7 m/s hardware-only corruption of r4:
    XLA:TPU's default bf16 matmul precision rounded the assembly's one-hot
    coefficient selections — invisible to the CPU-forced test suite and to
    the per-kernel gates above (the XLA reference ran on the same rounded
    backend).  Gate (fb): 2 mm / 0.02 m/s, two orders inside the
    2 cm / 0.1 m/s behavioral-parity budget.  The SQP-backend variant
    (``tick_kw=dict(vp_backend="sqp", ...)``, VERDICT r4 item 2) uses a
    velocity bar sized to ADMM fixed-iteration tolerance: 60 firmly
    nonexpansive iterations keep cross-backend rounding contained but not
    at scan-exactness level.

    The CALLER's lattice is serialized for the oracle (r4 advisor: keying
    on the artifacts cache silently checked a stale lattice when bench
    passed its own)."""
    import subprocess
    import sys as _sys
    import tempfile

    import jax
    from graphbasedlocaltrajectoryplanner_tpu.models.lattice import (
        save_lattice)
    from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc

    tick_kw = tick_kw or {}
    with tempfile.TemporaryDirectory() as td:
        out_path = os.path.join(td, "oracle.npz")
        lat_path = os.path.join(td, "lattice.npz")
        save_lattice(lat, lat_path)
        code = _E2E_ORACLE.format(lat_path=lat_path, batch=batch,
                                  out_path=out_path, tick_kw=tick_kw)
        r = subprocess.run([_sys.executable, "-c", code], cwd=TOP,
                           capture_output=True, text=True, timeout=900,
                           env=dict(os.environ, JAX_PLATFORMS="cpu"))
        if r.returncode != 0:
            return dict(ok=False, error="oracle subprocess failed",
                        stderr=r.stderr[-500:])
        ref = np.load(out_path)

    scen = sc.random_scenarios(lat, batch=batch, seed=42, n_objects=1)
    out = jax.jit(sc.make_batched_tick(lat, **tick_kw))(scen)
    t = np.asarray(out["trajs"])
    valid_equal = bool(np.array_equal(np.asarray(out["valid"]),
                                      ref["valid"]))
    nv_equal = bool(np.array_equal(np.asarray(out["n_valid"]), ref["nv"]))
    dxy = dv = 0.0
    for b in range(batch):
        for s in range(ref["valid"].shape[1]):
            if not ref["valid"][b, s]:
                continue
            n = int(ref["nv"][b, s])
            dxy = max(dxy, float(np.abs(
                t[b, s, :n, 1:3] - ref["trajs"][b, s, :n, 1:3]).max()))
            dv = max(dv, float(np.abs(
                t[b, s, :n, 5] - ref["trajs"][b, s, :n, 5]).max()))
    return dict(max_dxy_m=dxy, max_dv_mps=dv, valid_sets_equal=valid_equal,
                n_valid_equal=nv_equal, bar_dxy=bar_dxy, bar_dv=bar_dv,
                ok=bool(valid_equal and nv_equal
                        and dxy <= bar_dxy and dv <= bar_dv))


def run(batch: int = 128, lat=None):
    """Run all gates; returns the report dict (also written to OUT)."""
    import jax
    cache = os.path.join(TOP, "artifacts", "monteblanco_lattice.npz")
    if lat is None:
        from graphbasedlocaltrajectoryplanner_tpu.models.track import (
            import_globtraj_csv, make_oval_track)
        from graphbasedlocaltrajectoryplanner_tpu.models.lattice import (
            load_lattice, build_lattice, save_lattice)
        from graphbasedlocaltrajectoryplanner_tpu.utils.config import (
            OfflineConfig)
        lat = load_lattice(cache)
        if lat is None:
            csv = ("/root/reference/inputs/traj_ltpl_cl/"
                   "traj_ltpl_cl_monteblanco.csv")
            gt = (import_globtraj_csv(csv) if os.path.isfile(csv)
                  else make_oval_track())
            lat = build_lattice(gt, OfflineConfig(), md5_params="bench")
            save_lattice(lat, cache)

    report = dict(backend=jax.default_backend(), batch=batch)
    report.update(check_window_collision(lat, batch))
    report["velocity"] = check_velocity()
    report["backtrace"] = check_backtrace()
    # full-tick cross-backend gates on the CALLER's lattice — fb and the
    # SQP backend (VERDICT r4 item 2: every shipped backend gets the
    # hardware-vs-CPU-oracle diff)
    report["end_to_end"] = check_end_to_end(lat)
    report["end_to_end_sqp"] = check_end_to_end(
        lat, tick_kw=dict(vp_backend="sqp", sqp_m=115),
        bar_dxy=2e-3, bar_dv=5e-2)
    report["ok"] = all(report[k]["ok"] for k in
                       ("window", "collision", "velocity", "backtrace",
                        "end_to_end", "end_to_end_sqp") if k in report)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(report, fh, indent=1)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()
    report = run(batch=args.batch)
    print(json.dumps(report, indent=1))
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
