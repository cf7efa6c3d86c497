"""Berlin knife-edge forensics (VERDICT r4 item 7).

The r3/r4 advisors asked whether matching the reference's warm-start split
arithmetic (OTH:374-393) could remove the berlin tick ~140-180 far-tail
artifact.  The split arithmetic IS matched line-for-line — t_approx /
t_const / next_idx / get_s_coord(only_index=True) tie-breaks included
(handler.calc_paths:243-259 vs OTH:370-393; hostmath.get_s_coord vs
get_s_coord.py:34-99 incl. the ``ang1 >= ang2`` boundary) — so the only
remaining cause would be the decision landing closer to its boundary than
the two stacks' independently computed inputs agree.

This script measures exactly that, per tick of the berlin replay:

  * ``margin_m`` — how far the warm-start projection (predicted_pos against
    the last solution's node chain) sits from the index-decision boundary
    (distance along the local tangent to the argmin node, where
    ``ang1 == ang2`` flips the selected start node);
  * ``input_dev_m`` — how much the TPU stack's own last trajectory (the
    projection's input) deviated from the reference's recorded one at the
    executed horizon on the previous tick.

If ``min(margin_m)`` inside the knife window is of the order of
``input_dev_m`` — while margins everywhere else are ~1 m — the layer flip
is inherent to running two independent floating-point stacks and CANNOT be
removed by any epsilon choice in the split (only bit-identical upstream
trajectories would).  Output: parity/KNIFE_EDGE.json, summarized in
PARITY.md "Knife edges".

Run: python parity/knife_edge_forensics.py  (forced CPU, ~4 min)
"""

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
TOP = os.path.dirname(HERE)
sys.path.insert(0, TOP)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from graphbasedlocaltrajectoryplanner_tpu.planner import hostmath
    from parity.replay_tpu import replay

    real_gsc = hostmath.get_s_coord
    split_calls = []          # (ref_line, pos, idx_sel) of warm-start calls

    def traced_gsc(ref_line, pos, s_array=None, only_index=False,
                   closed=False):
        out = real_gsc(ref_line, pos, s_array=s_array,
                       only_index=only_index, closed=closed)
        if only_index and not closed:
            split_calls.append((np.array(ref_line, float),
                                np.array(pos, float), list(out[1])))
        return out

    margins = {}              # tick -> margin [m]
    start_layers = {}

    def probe(tick, ltpl):
        # the warm-start split is the first only_index/open call of a tick
        # (handler.calc_paths:253); margin = distance along the local
        # tangent from the projected pos to the argmin node, i.e. how far
        # the ang1 >= ang2 decision sits from flipping
        if split_calls:
            ref_line, pos, idx_sel = split_calls[0]
            d2 = (ref_line[:, 0] - pos[0]) ** 2 + (ref_line[:, 1] - pos[1]) ** 2
            i = int(np.argmin(d2))
            i1 = max(i - 1, 0)
            i2 = min(i + 1, ref_line.shape[0] - 1)
            t = ref_line[i2] - ref_line[i1]
            t = t / max(np.hypot(*t), 1e-12)
            margins[tick] = float(abs(np.dot(pos - ref_line[i], t)))
            start_layers[tick] = int(ltpl._oth.start_node[0])
        split_calls.clear()

    hostmath.get_s_coord = traced_gsc
    # the handler module binds hostmath by module reference, so patching the
    # module attribute is enough
    try:
        report, rows = replay(os.path.join(HERE, "fixtures",
                                           "ref_berlin_200.npz"),
                              probe=probe)
    finally:
        hostmath.get_s_coord = real_gsc

    ticks = sorted(margins)
    knife = [t for t in ticks if 135 <= t <= 185]
    other = [t for t in ticks if t not in knife]
    # executed-horizon deviation per tick (input accuracy of the split)
    dev_by_tick = {}
    for r in rows:
        dev_by_tick[r[0]] = max(dev_by_tick.get(r[0], 0.0), r[4])

    out = {
        "fixture": "ref_berlin_200.npz",
        "split_arithmetic": "matched line-for-line (handler:243-259 vs "
                            "OTH:370-393; hostmath.get_s_coord vs "
                            "get_s_coord.py incl. ang1>=ang2 tie-break)",
        "min_margin_knife_window_m": min(margins[t] for t in knife),
        "argmin_margin_tick": int(min(knife, key=lambda t: margins[t])),
        "min_margin_elsewhere_m": min(margins[t] for t in other),
        "median_margin_m": float(np.median([margins[t] for t in ticks])),
        "max_exec_dev_prev_ticks_m": float(max(
            dev_by_tick.get(t - 1, 0.0) for t in knife)),
        "replay_max_d_pos_m": report["max_d_pos_m"],
        "replay_max_d_pos_exec_m": report["max_d_pos_exec_m"],
        "per_tick_margin_m": {str(t): round(margins[t], 8) for t in ticks},
    }
    out["conclusion"] = (
        "flip is input-fp-inherent"
        if out["min_margin_knife_window_m"]
        <= 50 * max(out["max_exec_dev_prev_ticks_m"], 1e-9)
        else "margin large vs input deviation - investigate further")
    path = os.path.join(HERE, "KNIFE_EDGE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    brief = {k: v for k, v in out.items() if k != "per_tick_margin_m"}
    print(json.dumps(brief, indent=1))


if __name__ == "__main__":
    main()
