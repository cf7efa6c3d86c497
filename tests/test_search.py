"""Min-plus DP search vs scalar Dijkstra golden; horizon-shrink semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from graphbasedlocaltrajectoryplanner_tpu.ops import search as srch

INF = float(srch.INF)


def _random_window(H=8, N=6, seed=0, p_edge=0.7):
    rng = np.random.default_rng(seed)
    w = rng.uniform(1.0, 10.0, (H, N, N)).astype(np.float32)
    mask = rng.uniform(size=(H, N, N)) < p_edge
    w = np.where(mask, w, INF)
    vg = rng.uniform(0.0, 5.0, (H + 1, N)).astype(np.float32)
    return w, vg


def test_dp_matches_dijkstra():
    for seed in range(5):
        w, vg = _random_window(seed=seed)
        start = seed % 6
        h_goal = 8
        out = srch.search_window(jnp.array(w), start, jnp.array(vg),
                                 h_goal, shrink_horizon=True)
        nodes_ref, cost_ref = srch.dijkstra_window_np(w, start, vg, h_goal)
        nodes = np.asarray(out["nodes"])
        if nodes_ref is None:
            # DP may still shrink the horizon; check exact-h infeasibility
            out2 = srch.search_window(jnp.array(w), start, jnp.array(vg),
                                      h_goal, shrink_horizon=False)
            assert not bool(out2["feasible"])
        else:
            assert bool(out["feasible"])
            assert int(out["h_eff"]) == h_goal
            assert abs(float(out["cost"]) - cost_ref) < 1e-3
            # note: equal-cost ties may differ in node identity; compare cost
            # along the DP path instead of node-by-node equality
            c = 0.0
            for h in range(h_goal):
                c += float(w[h, nodes[h], nodes[h + 1]])
            c += float(vg[h_goal, nodes[h_goal]])
            assert abs(c - cost_ref) < 1e-3


def test_dp_shrinks_horizon():
    w, vg = _random_window(H=6, N=4, seed=1, p_edge=1.0)
    # cut all edges at step 4 -> only h <= 4 feasible
    w[4, :, :] = INF
    out = srch.search_window(jnp.array(w), 0, jnp.array(vg), 6,
                             shrink_horizon=True)
    assert bool(out["feasible"])
    assert int(out["h_eff"]) == 4
    nodes = np.asarray(out["nodes"])
    assert np.all(nodes[:5] >= 0) and np.all(nodes[5:] == -1)
    # without shrink: infeasible
    out2 = srch.search_window(jnp.array(w), 0, jnp.array(vg), 6,
                              shrink_horizon=False)
    assert not bool(out2["feasible"])
    assert int(out2["h_eff"]) == 0


def test_dp_blocked_start():
    w, vg = _random_window(H=4, N=4, seed=2, p_edge=1.0)
    w[0, 2, :] = INF  # start node 2 has no children
    out = srch.search_window(jnp.array(w), 2, jnp.array(vg), 4,
                             shrink_horizon=True)
    assert not bool(out["feasible"])


def test_dp_batched_vmap():
    ws, vgs, starts = [], [], []
    for s in range(4):
        w, vg = _random_window(seed=10 + s, p_edge=1.0)
        ws.append(w)
        vgs.append(vg)
        starts.append(s)
    f = jax.vmap(lambda w, s, v: srch.search_window(w, s, v, 8, True))
    out = f(jnp.array(np.stack(ws)), jnp.array(starts, jnp.int32),
            jnp.array(np.stack(vgs)))
    for i in range(4):
        ref_nodes, ref_cost = srch.dijkstra_window_np(ws[i], starts[i], vgs[i], 8)
        assert abs(float(out["cost"][i]) - ref_cost) < 1e-3


def test_backtrace_path_consistency():
    w, vg = _random_window(H=10, N=8, seed=3, p_edge=0.5)
    out = srch.search_window(jnp.array(w), 1, jnp.array(vg), 10, True)
    if bool(out["feasible"]):
        nodes = np.asarray(out["nodes"])
        h_eff = int(out["h_eff"])
        # every consecutive pair is a real edge
        for h in range(h_eff):
            assert w[h, nodes[h], nodes[h + 1]] < 1e29


def _iterative_goal_scan_np(feasible_nodes, rl_idx, n_nodes):
    """Scalar golden for GraphBase.search_graph_layer:897-927 with
    virt_goal_n=False: scan raceline node, then decreasing indices to 0,
    then increasing; return first feasible node (or -1)."""
    order = list(range(rl_idx, -1, -1)) + list(range(rl_idx + 1, n_nodes))
    for n in order:
        if feasible_nodes[n]:
            return n
    return -1


def test_virt_goal_n_false_rank_selection():
    """The rank-scaled vg_cost used for virt_goal_n=False reproduces the
    reference's iterative goal scan exactly (models/lattice.py vg branch)."""
    from graphbasedlocaltrajectoryplanner_tpu.models.lattice import (
        GOAL_RANK_SCALE)

    N, H = 9, 5
    rng = np.random.default_rng(7)
    for trial in range(20):
        rl = int(rng.integers(0, N))
        n_ar = np.arange(N)
        rank = np.where(n_ar <= rl, rl - n_ar, n_ar)
        # random node validity at the goal layer (sometimes raceline blocked)
        valid = rng.uniform(size=N) < 0.6
        vg_row = np.where(valid, rank * GOAL_RANK_SCALE, INF).astype(np.float32)
        vg = np.full((H + 1, N), INF, np.float32)
        vg[H] = vg_row
        # fully connected window so DP reaches every valid goal node
        w = rng.uniform(1.0, 10.0, (H, N, N)).astype(np.float32)
        out = srch.search_window(jnp.array(w), 0, jnp.array(vg), H,
                                 shrink_horizon=False)
        want = _iterative_goal_scan_np(valid, rl, N)
        if want < 0:
            assert not bool(out["feasible"])
        else:
            assert bool(out["feasible"])
            assert int(out["goal_node"]) == want, (trial, rl, valid)
