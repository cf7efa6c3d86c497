"""Layer-wise min-plus DP search (JAX) — the TPU-native replacement of the
reference's igraph Dijkstra (``GraphBase.search_graph`` /
``search_graph_layer``, GraphBase.py:802-929).

The lattice is a DAG layered along track progress s: every edge goes from
layer l to layer l+1 (mod L).  The cost-optimal path from a start node to
*every* node of *every* layer within the planning horizon is therefore a
single scan of relaxation steps

    best[h+1, m] = min_n best[h, n] + W[h, n, m]

with argmin backpointers — one (N, N) "min-plus matmul" per layer step,
batched over actions and scenarios.  This yields for free what the reference
obtains with repeated Dijkstra invocations:

  * the virtual-goal-node trick (GraphBase.py:174-194, 887-894) becomes a
    final weighted argmin ``min_n best[h_goal, n] + vg_cost[h_goal, n]``
    where ``vg_cost`` is the lateral-offset cost to the virtual node;
  * the horizon-shrink retry loop on infeasibility
    (main_online_path_gen.py:203-220) becomes "pick the largest feasible
    h <= h_goal" over the already-computed DP frontiers — no retries.

Infeasibility is encoded with a large finite cost (``INF``) instead of +inf
so that arithmetic stays NaN-free on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.float32(1e30)
# costs at or above this threshold mean "unreachable"
FEAS_THRESH = jnp.float32(1e29)


def minplus_scan(w_window: jnp.ndarray, start_node):
    """Run the min-plus DP from ``start_node`` over a window of layers.

    :param w_window:   (H, N, N) edge costs; ``w_window[h, n, m]`` is the cost
                       of the edge from node n of window-layer h to node m of
                       window-layer h+1 (>= INF if absent/blocked).
    :param start_node: int32 node index within window-layer 0.
    :returns: (best (H+1, N) cost-to-reach, bp (H+1, N) int32 backpointers
              into the previous layer; bp[0] = -1).
    """
    H, N, _ = w_window.shape
    best0 = jnp.full((N,), INF).at[start_node].set(0.0)

    def step(best, w):
        tot = best[:, None] + w                     # (N, N)
        best_next = jnp.min(tot, axis=0)
        bp_next = jnp.argmin(tot, axis=0).astype(jnp.int32)
        # keep unreachable entries saturated (avoid INF + cost overflow drift)
        best_next = jnp.minimum(best_next, INF)
        return best_next, (best_next, bp_next)

    _, (best_tail, bp_tail) = jax.lax.scan(step, best0, w_window,
                                           unroll=4)
    best = jnp.concatenate([best0[None], best_tail], axis=0)
    bp = jnp.concatenate([jnp.full((1, N), -1, jnp.int32), bp_tail], axis=0)
    return best, bp


def select_goal(best: jnp.ndarray, vg_cost: jnp.ndarray, h_goal,
                shrink_horizon):
    """Goal-layer/node selection with optional horizon shrink.

    :param best:      (H+1, N) DP frontier costs.
    :param vg_cost:   (H+1, N) virtual-goal lateral cost per window layer
                      (>= INF for invalid/padded nodes).
    :param h_goal:    requested horizon (int32, 1..H).
    :param shrink_horizon: bool — if True (straight/follow semantics,
                      main_online_path_gen.py:203-220) fall back to the
                      largest feasible h <= h_goal; if False (left/right)
                      only h_goal itself is considered.
    :returns: (h_eff int32, goal_node int32, total_cost, feasible bool).
              ``h_eff = 0`` and ``feasible = False`` if no horizon works.
    """
    Hp1, N = best.shape
    goal_tot = best + vg_cost                        # (H+1, N)
    layer_min = jnp.min(goal_tot, axis=1)            # (H+1,)
    hs = jnp.arange(Hp1)
    feas = (layer_min < FEAS_THRESH) & (hs >= 1) & (hs <= h_goal)
    h_shrunk = jnp.max(jnp.where(feas, hs, 0))
    h_exact = jnp.where(feas[jnp.clip(h_goal, 0, Hp1 - 1)], h_goal, 0)
    h_eff = jnp.where(shrink_horizon, h_shrunk, h_exact)
    feasible = h_eff >= 1
    goal_node = jnp.argmin(goal_tot[h_eff]).astype(jnp.int32)
    return h_eff, goal_node, goal_tot[h_eff, goal_node], feasible


def backtrace(bp: jnp.ndarray, h_eff, goal_node):
    """Recover the node chain from backpointers.

    Sequential walk as an unrolled scan.  (A log-depth pointer-doubling
    formulation was measured 50x SLOWER on the current TPU backend — the
    per-level (H+1, N) jump-table gathers lower far worse than H dependent
    scalar-row gathers, so the scan stays.)

    :param bp:        (H+1, N) backpointers from :func:`minplus_scan`.
    :param h_eff:     effective horizon (int32).
    :param goal_node: node index at window-layer ``h_eff``.
    :returns: nodes (H+1,) int32 — node index per window layer for
              h <= h_eff, -1 beyond.
    """
    Hp1 = bp.shape[0]

    def step(node_above, h):
        node_h = jnp.where(
            h > h_eff, jnp.int32(-1),
            jnp.where(h == h_eff, goal_node,
                      bp[jnp.clip(h + 1, 0, Hp1 - 1),
                         jnp.clip(node_above, 0, None)]))
        carry = jnp.where(h <= h_eff, node_h, node_above)
        return carry, node_h

    _, nodes_rev = jax.lax.scan(step, goal_node,
                                jnp.arange(Hp1 - 1, -1, -1), unroll=8)
    return nodes_rev[::-1]


def search_window(w_window, start_node, vg_cost, h_goal, shrink_horizon):
    """Full search: DP + goal selection + backtrace (single action).

    Batch over actions/scenarios with ``jax.vmap``.
    Returns dict(nodes (H+1,), h_eff, goal_node, cost, feasible).
    """
    best, bp = minplus_scan(w_window, start_node)
    h_eff, goal_node, cost, feasible = select_goal(best, vg_cost, h_goal,
                                                   shrink_horizon)
    nodes = backtrace(bp, h_eff, goal_node)
    nodes = nodes.at[0].set(jnp.where(feasible, start_node, -1))
    return dict(nodes=nodes, h_eff=h_eff, goal_node=goal_node, cost=cost,
                feasible=feasible)


# ---------------------------------------------------------------------------
# scalar reference (tests): Dijkstra on the same window tensor
# ---------------------------------------------------------------------------

def dijkstra_window_np(w_window, start_node, vg_cost, h_goal):
    """Plain-python Dijkstra over the layered window graph + virtual goal
    node at layer ``h_goal`` — golden for :func:`search_window` (equivalent
    to igraph ``get_shortest_paths`` with the virtual-goal construction)."""
    import heapq
    import numpy as np

    H, N, _ = w_window.shape
    INF_ = float(np.inf)
    dist = {(0, start_node): 0.0}
    prev = {}
    pq = [(0.0, (0, start_node))]
    while pq:
        d, (h, n) = heapq.heappop(pq)
        if d > dist.get((h, n), INF_):
            continue
        if h < h_goal:
            for m in range(N):
                w = float(w_window[h, n, m])
                if w >= 1e29:
                    continue
                nd = d + w
                if nd < dist.get((h + 1, m), INF_):
                    dist[(h + 1, m)] = nd
                    prev[(h + 1, m)] = n
                    heapq.heappush(pq, (nd, (h + 1, m)))
    # virtual goal
    best_n, best_c = -1, INF_
    for n in range(N):
        c = dist.get((h_goal, n), INF_) + float(vg_cost[h_goal, n])
        if c < best_c:
            best_c, best_n = c, n
    if best_n < 0 or best_c >= 1e29:
        return None, None
    nodes = [best_n]
    for h in range(h_goal, 0, -1):
        nodes.append(prev[(h, nodes[-1])])
    return list(reversed(nodes)), best_c
