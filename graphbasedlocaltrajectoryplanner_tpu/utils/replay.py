"""Log replay + validation — the institutionalized version of the
reference's ``visualize_graph_log.py`` RECALC_VALIDATION
(visualize_graph_log.py:60, 209-234): re-execute the online search from
logged inputs and diff the resulting node chains against the logged ones.

Used as a regression harness: a lap driven by the planner is logged to
``*_data.csv``; ``replay_validate`` re-runs the path search for every tick
against the archived lattice and reports
  * edge consistency — every logged consecutive node pair is a valid edge,
  * optimality — the recomputed DP optimum matches the logged chain
    (modulo the constant warm-start prefix, which depends on timing).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from graphbasedlocaltrajectoryplanner_tpu.models.lattice import Lattice
from graphbasedlocaltrajectoryplanner_tpu.planner import pathgen as pg
from graphbasedlocaltrajectoryplanner_tpu.planner import objects as objmod
from graphbasedlocaltrajectoryplanner_tpu.utils.logging import read_data_log


@dataclasses.dataclass
class ReplayReport:
    ticks: int = 0
    actions_checked: int = 0
    edge_violations: int = 0
    node_mismatches: int = 0        # informational: held-path divergences
    node_mismatch_failures: int = 0  # mismatches w_last discounting CANNOT
    #                                  explain by cost accounting -> gate
    details: list = dataclasses.field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.edge_violations == 0 \
            and self.node_mismatch_failures == 0


def replay_validate(data_csv: str, lat: Lattice,
                    check_optimality: bool = True,
                    w_last_edges=(0.0, 0.5, 0.8),
                    cost_tol: float = 1e-3) -> ReplayReport:
    """Validate a logged lap.  A recomputed-optimum mismatch FAILS the run
    unless w_last_edges discounting can account for it: the logged chain's
    undiscounted cost may exceed the fresh optimum by at most the discount
    shavings on its first ``len(w_last_edges)`` edges (the live run
    multiplied exactly those edge weights by the factors), i.e.

        cost(logged) - cost(optimal) <= sum_i w_edge_i * (1 - fac_i) + tol.

    Anything beyond that bound cannot be a legitimate warm-start hold and
    counts as ``node_mismatch_failures`` (gate; ``ok`` turns False)."""
    rows = read_data_log(data_csv)
    rep = ReplayReport()
    for row in rows:
        rep.ticks += 1
        validate_row(lat, row, rep, check_optimality=check_optimality,
                     w_last_edges=w_last_edges, cost_tol=cost_tol)
    return rep


def validate_row(lat: Lattice, row: dict, rep: ReplayReport = None,
                 check_optimality: bool = True,
                 w_last_edges=(0.0, 0.5, 0.8),
                 cost_tol: float = 1e-3) -> ReplayReport:
    """Validate a single logged tick (the per-scrub re-validation of the
    reference viewer, visualize_graph_log.py:209-234).  Accumulates into
    ``rep`` when given, else returns a fresh single-tick report."""
    if rep is None:
        rep = ReplayReport(ticks=1)
    ev = np.asarray(lat.edge_valid)
    w_np = np.asarray(lat.w)
    L = lat.L
    nodes_list = row.get("nodes_list") or {}
    start_node = row.get("start_node")
    obj_veh_raw = row.get("obj_veh") or []

    for action, chains in nodes_list.items():
        for chain in chains:
            # drop virtual/None prefix entries (initial pose spline)
            chain = [c for c in chain if c[0] is not None]
            if len(chain) < 2:
                continue
            rep.actions_checked += 1
            # 1) edge consistency in the archived lattice
            bad = 0
            for a, b in zip(chain[:-1], chain[1:]):
                la, na = int(a[0]), int(a[1])
                lb, nb = int(b[0]), int(b[1])
                if (la + 1) % L != lb or not ev[la, na, nb]:
                    bad += 1
            if bad:
                rep.edge_violations += bad
                rep.details.append(
                    dict(tick=rep.ticks, action=action,
                         kind="invalid_edge", count=bad))

    # 2) optimality re-check for the straight action on object-free ticks
    if (check_optimality and start_node is not None
            and not obj_veh_raw and "straight" in nodes_list
            and nodes_list["straight"]):
        chain = [c for c in nodes_list["straight"][0]
                 if c[0] is not None]
        if len(chain) < 3:
            return rep
        # the search started at start_node — compare the suffix
        try:
            k = chain.index([int(start_node[0]), int(start_node[1])])
        except ValueError:
            return rep
        suffix = chain[k:]
        if len(suffix) < 2:
            return rep
        out = pg.plan_window_kernel(
            lat, jnp.int32(start_node[0]), jnp.int32(start_node[1]),
            jnp.zeros((lat.L, lat.N), bool),
            jnp.zeros((4, 2), jnp.float32), jnp.zeros((4,), jnp.float32),
            jnp.zeros((4,), bool), jnp.int32(0), jnp.int32(0), False,
            jnp.full((2,), -1, jnp.int32), jnp.ones((1,), jnp.float32),
            n_last=2)
        h_eff = len(suffix) - 1
        if h_eff > lat.H_max:
            return rep
        nodes, cost_opt = pg.backtrace_slot(out["best"][pg.SLOT_STRAIGHT],
                                            out["bp"][pg.SLOT_STRAIGHT],
                                            out["vg"][pg.SLOT_STRAIGHT],
                                            jnp.int32(h_eff))
        nodes = np.asarray(nodes)[:h_eff + 1]
        logged = np.array([c[1] for c in suffix])
        mism = int(np.sum(nodes != logged))
        if mism:
            rep.node_mismatches += mism
            # cost accounting: is the divergence explainable as a
            # w_last_edges warm-start hold?
            vg = np.asarray(out["vg"][pg.SLOT_STRAIGHT])
            layers = [(int(start_node[0]) + i) % L
                      for i in range(h_eff + 1)]
            edge_w = [float(w_np[layers[i], int(suffix[i][1]),
                                 int(suffix[i + 1][1])])
                      for i in range(h_eff)]
            cost_logged = float(np.sum(edge_w)) \
                + float(vg[h_eff, int(suffix[-1][1])])
            explained = sum(
                edge_w[i] * (1.0 - w_last_edges[i])
                for i in range(min(len(w_last_edges), h_eff)))
            excess = cost_logged - float(cost_opt)
            hard = excess > explained + cost_tol
            if hard:
                rep.node_mismatch_failures += 1
            rep.details.append(dict(
                tick=rep.ticks, action="straight", kind="node_mismatch",
                count=mism, excess_cost=excess,
                w_last_explainable=explained, gate_failure=hard))
    return rep
