"""Devtool: per-stage timing of the batched scenario tick (companion to
profile_tick.py).  NOTE: asm_only below intentionally simplifies the
production slot logic (omits the left/right h_lr feasibility gating of
scenario.py) — it isolates backtrace+assembly cost, it is not the product
path.  Use bench.py for end-to-end numbers."""
import argparse
import os
import time

import numpy as np
import jax, jax.numpy as jnp

TOP = os.path.dirname(os.path.abspath(__file__))
jax.config.update("jax_compilation_cache_dir", os.path.join(TOP, "artifacts/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from graphbasedlocaltrajectoryplanner_tpu.models.lattice import load_lattice
from graphbasedlocaltrajectoryplanner_tpu.parallel import scenario as sc
from graphbasedlocaltrajectoryplanner_tpu.planner import pathgen as pg
from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_collision import build_samples_t, hit_slab_pallas
from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_window import fused_window_dp

_ap = argparse.ArgumentParser()
_ap.add_argument("--lattice", default=os.path.join(TOP, "artifacts/monteblanco_lattice.npz"))
lat = load_lattice(_ap.parse_args().lattice)
B = 1024
scen = sc.random_scenarios(lat, batch=B, seed=0, n_objects=1)
samples_t = build_samples_t(lat.samples_xy)

def timeit(name, fn, *a, iters=10):
    out = fn(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/iters*1e3
    print(f"{name:28s} {dt:7.2f} ms")
    return out

# stage 1: obstacle selection + meta
f_obs = jax.jit(lambda s: jax.vmap(lambda x: sc._select_obstacle(lat, x))(s))
obs = timeit("obstacle_selection", f_obs, scen)

f_meta = jax.jit(lambda s, o: jax.vmap(lambda x, y: pg.window_meta(
    lat, x.start_layer, x.obj_pos, x.obj_radius, x.obj_active,
    y["obs_layer"], y["obs_node"], y["obs_found"]))(s, o))
pre = timeit("window_meta", f_meta, scen, obs)

f_hit = jax.jit(lambda s, p: hit_slab_pallas(samples_t, p["slab_layers"], s.obj_pos, p["ref2"], p["obj_app"]))
hit = timeit("hit_slab_pallas", f_hit, scen, pre)

zone = jnp.zeros((lat.L, lat.N), bool)
f_dp = jax.jit(lambda s, p, h, o: fused_window_dp(
    lat.w, zone, s.start_layer, s.start_node, p["slab_layers"], h,
    p["p_obs"], p["in_win"], o["obs_node"],
    jnp.full((B,2),-1,jnp.int32), jnp.ones((1,),jnp.float32),
    closed=bool(lat.closed), h_max=int(lat.H_max)))
dpout = timeit("fused_window_dp", f_dp, scen, pre, hit, obs)

f_vg = jax.jit(lambda p, o: jax.vmap(lambda wl, pp, iw, on: pg.window_vg(lat, wl, zone, pp, iw, on))(
    p["win_layers"], p["p_obs"], p["in_win"], o["obs_node"]))
vg = timeit("window_vg", f_vg, pre, obs)

# full precomputed-path tick minus precompute
def tick_rest(s, o, w):
    return jax.vmap(lambda x, y, z: sc.scenario_tick(lat, x, precomputed=dict(obs=y, window=z)))(s, o, w)
window = dict(best=dpout[0], bp=dpout[1], vg=vg, win_layers=pre["win_layers"], h_goal=pre["h_goal"])
f_rest = jax.jit(tick_rest)
rest = timeit("rest (backtrace+asm+vel)", f_rest, scen, obs, window)

# isolate velocity: run scenario up to assembly only
p_max = int(np.ceil((lat.H_max*(lat.S-1)+1)/64.0)*64)
def asm_only(s, o, w):
    def one(s1, o1, w1):
        feas = pg.feasibility_vectors(w1["best"], w1["vg"])
        hs = jnp.arange(lat.H_max+1)
        h_goal = w1["h_goal"]
        def shrink(fv):
            ok = fv & (hs>=1)&(hs<=h_goal)
            return jnp.max(jnp.where(ok,hs,0)).astype(jnp.int32)
        h_st = shrink(feas[0]); h_f = shrink(feas[1])
        h_all = jnp.stack([h_st,h_f,h_f,h_f])
        h_safe = jnp.maximum(h_all,1)
        def run_slot(slot, h_eff):
            nodes, cost = pg.backtrace_slot(w1["best"][slot], w1["bp"][slot], w1["vg"][slot], h_eff)
            psi_s = lat.node_psi[s1.start_layer, s1.start_node]
            return pg.assemble_action_kernel(lat, w1["win_layers"], nodes, h_eff, psi_s, p_max=p_max), cost
        res, cost = jax.vmap(run_slot)(jnp.arange(4), h_safe)
        return res["path"], res["n_valid"], cost
    return jax.vmap(one)(s, o, w)
f_asm = jax.jit(asm_only)
timeit("backtrace+assembly only", f_asm, scen, obs, window)
