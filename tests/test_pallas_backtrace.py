"""Pallas backtrace kernel vs the scan walk (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from graphbasedlocaltrajectoryplanner_tpu.ops import search as srch
from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_backtrace import (
    make_backtrace_goal)
from graphbasedlocaltrajectoryplanner_tpu.ops.search import INF


def _random_dp(rng, R, Hp1, N):
    """Random feasible DP tensors: costs + consistent backpointers."""
    best = jnp.asarray(rng.uniform(0, 100, (R, Hp1, N)), jnp.float32)
    bp = jnp.asarray(rng.integers(0, N, (R, Hp1, N)), jnp.int32)
    bp = bp.at[:, 0, :].set(-1)
    vg = jnp.asarray(rng.uniform(0, 10, (R, Hp1, N)), jnp.float32)
    h_eff = jnp.asarray(rng.integers(1, Hp1, (R,)), jnp.int32)
    return best, bp, vg, h_eff


def test_backtrace_kernel_matches_scan():
    rng = np.random.default_rng(0)
    R, Hp1, N = 9, 30, 32
    best, bp, vg, h_eff = _random_dp(rng, R, Hp1, N)
    ref_bt = make_backtrace_goal(interpret=True)
    nodes, cost = ref_bt(best, bp, vg, h_eff)
    for r in range(R):
        goal_tot = np.asarray(best[r, int(h_eff[r])] + vg[r, int(h_eff[r])])
        goal = int(np.argmin(goal_tot))
        n_ref = np.asarray(srch.backtrace(bp[r], h_eff[r], jnp.int32(goal)))
        np.testing.assert_array_equal(np.asarray(nodes[r]), n_ref)
        assert float(cost[r]) == goal_tot[goal]


def test_backtrace_kernel_infeasible_cost_passthrough():
    """INF-saturated goal rows keep their cost (the caller's validity logic
    branches on it) and still produce a well-formed chain."""
    rng = np.random.default_rng(1)
    R, Hp1, N = 4, 12, 16
    best, bp, vg, h_eff = _random_dp(rng, R, Hp1, N)
    best = best.at[2].set(INF)
    bt = make_backtrace_goal(interpret=True)
    nodes, cost = bt(best, bp, vg, h_eff)
    assert float(cost[2]) >= float(srch.FEAS_THRESH)
    assert nodes.shape == (R, Hp1)


def test_backtrace_vmap_flattens():
    rng = np.random.default_rng(2)
    B, R, Hp1, N = 3, 4, 30, 32
    args = [_random_dp(np.random.default_rng(5 + b), R, Hp1, N)
            for b in range(B)]
    bt = make_backtrace_goal(interpret=True)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *args)
    nb, cb = jax.vmap(lambda a: bt(*a))(stacked)
    for b in range(B):
        n1, c1 = bt(*args[b])
        np.testing.assert_array_equal(np.asarray(nb[b]), np.asarray(n1))
        np.testing.assert_allclose(np.asarray(cb[b]), np.asarray(c1))
