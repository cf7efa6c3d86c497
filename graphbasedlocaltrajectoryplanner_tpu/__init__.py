"""gltpl-tpu: a TPU-native graph-based local trajectory planner.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TUMFTM/GraphBasedLocalTrajectoryPlanner (reference: /root/reference):
an action-set local trajectory planner for autonomous race cars that returns,
for each feasible action primitive (straight / follow / left / right /
emergency), the globally cost-optimal trajectory on a spatial lattice graph.

Design stance (not a port):
  * the igraph object graph, named vertices, induced-subgraph filters and
    Dijkstra of the reference (graph_ltpl/data_objects/GraphBase.py) are
    replaced by dense ``(layer, node, node)`` edge tensors, boolean masks and
    a layer-wise min-plus DP scan (the lattice is a DAG layered along s);
  * the trajectory_planning_helpers numerics (splines, heading/curvature,
    forward-backward velocity solver) are implemented natively as batched JAX
    kernels;
  * scale-out is via ``jax.vmap`` over scenarios on one chip and
    ``jax.shard_map`` over a device mesh across chips/hosts.

Public API mirrors the reference facade (graph_ltpl/Graph_LTPL.py):
``GraphLTPL(path_dict).graph_init() / set_startpos() / calc_paths() /
calc_vel_profile() / log() / visual()``.
"""

__version__ = "0.1.0"

# XLA:TPU computes f32 dots in bf16 by DEFAULT, which silently corrupts the
# geometric selection matmuls (one-hot coefficient/position selects in path
# assembly) by up to meters — measured 1.5 m / 7 m/s end-to-end deviation vs
# the CPU oracle before this was pinned (tools/pallas_parity.py gates it).
# A planner whose behavioral budget is 2 cm must default to exact f32; the
# hot kernels opt back into speed EXPLICITLY via exact bf16x3-split one-hot
# selections (ops/pallas_window.split3_bf16) or bf16 0/1 contractions.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")


def __getattr__(name):
    # lazy to keep `import ...ops.splines` cheap and cycle-free
    if name == "GraphLTPL":
        from graphbasedlocaltrajectoryplanner_tpu.planner.facade import GraphLTPL
        return GraphLTPL
    raise AttributeError(name)
