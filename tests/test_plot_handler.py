"""Live PlotHandler features (reference visualization/src/PlotHandler.py):
cost-colored edge rendering, legend-pick toggles, hover node inspection,
timeline axes, oriented vehicle footprints.  Headless (Agg)."""

import matplotlib
matplotlib.use("Agg")

import numpy as np
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import make_oval_track
from graphbasedlocaltrajectoryplanner_tpu.models import lattice as latmod
from graphbasedlocaltrajectoryplanner_tpu.utils.config import OfflineConfig
from graphbasedlocaltrajectoryplanner_tpu.visualization.plot_handler import (
    PlotHandler)
from graphbasedlocaltrajectoryplanner_tpu.planner.objects import VehObject


@pytest.fixture(scope="module")
def lat():
    gt = make_oval_track()
    return latmod.build_lattice(gt, OfflineConfig(), md5_params="plt")


def _count_linecollections(ax):
    from matplotlib.collections import LineCollection
    return [c for c in ax.collections if isinstance(c, LineCollection)]


def test_cost_colored_edges_single_artist(lat):
    ph = PlotHandler(include_timeline=False)
    ph.plot_lattice(lat, plot_edges=True, cost_dep_color=True,
                    plot_normals=True)
    lcs = _count_linecollections(ph._ax)
    # normals + edges — each ONE artist, not one per edge like the reference
    assert len(lcs) == 2
    edge_lc = [c for c in lcs if c.get_label() == "Edges"][0]
    n_edges = int(np.asarray(lat.edge_valid).sum())
    assert len(edge_lc.get_segments()) == n_edges
    colors = edge_lc.get_colors()
    assert colors.shape[0] == n_edges
    # green->red ramp: r + g == 1 within clip
    assert np.all(colors[:, 0] >= 0.0) and np.all(colors[:, 1] <= 1.0)
    assert np.all(colors[:, 2] == 0.0)
    ph._plt.close("all")


def test_legend_pick_toggles_visibility(lat):
    ph = PlotHandler(include_timeline=False)
    ph.plot_lattice(lat, plot_edges=True)
    leg_line, orig = next(iter(ph._legend_map.items()))
    assert orig.get_visible()

    class _Ev:
        artist = leg_line
    ph._onpick(_Ev())
    assert not orig.get_visible()
    ph._onpick(_Ev())
    assert orig.get_visible()
    ph._plt.close("all")


def test_hover_annotates_nearest_node(lat):
    ph = PlotHandler(include_timeline=False)
    ph.plot_lattice(lat)
    target = ph._node_pos_flat[7]

    class _Ev:
        inaxes = ph._ax
        xdata = float(target[0]) + 0.2
        ydata = float(target[1]) + 0.2
    ph._onhover(_Ev())
    assert ph._hover_ann.get_visible()
    l, n = ph._node_idx_flat[7]
    text = ph._hover_ann.get_text()
    assert f"Layer ID: {l}" in text and f"Node ID: {n}" in text
    # edge-cost inspection (reference PlotHandler.py:823-849): one cost line
    # per outgoing edge, and the child polylines highlighted
    ev = np.asarray(lat.edge_valid)
    n_children = int(ev[l, n].sum())
    assert text.count("k_av2") == n_children
    xs = ph._hover_edges.get_xdata()
    assert len(xs) == n_children * (lat.S + 1)   # S samples + None breaks

    class _Far:
        inaxes = ph._ax
        xdata = float(target[0]) + 500.0
        ydata = float(target[1]) + 500.0
    ph._onhover(_Far())
    assert not ph._hover_ann.get_visible()
    ph._plt.close("all")


def test_timeline_and_vehicle_footprint(lat, tmp_path):
    ph = PlotHandler(include_timeline=True)
    ph.plot_lattice(lat)
    traj = np.zeros((20, 7), np.float32)
    traj[:, 0] = np.linspace(0.0, 50.0, 20)     # s
    traj[:, 5] = 12.0                           # vx
    obj = VehObject(id_in=1, pos_in=[5.0, 2.0], psi_in=0.3, radius_in=2.0,
                    vel_in=10.0, prediction_in=None)
    for tick in range(3):
        ph.update_tick(trajectories=[traj[:, 1:3]], obj_veh=[obj],
                       pos_est=(0.0, 0.0), action_id="straight",
                       action_set={"straight": [traj],
                                   "follow": [traj] if tick > 0 else []})
    assert ph._ax_time is not None
    xs, _ = ph._time_scatter["straight"]
    assert xs == [0, 1, 2]
    xs_f, _ = ph._time_scatter["follow"]
    assert xs_f == [1, 2]
    # course axis shows the selected trajectory's velocity
    ydata = ph._ax_course.lines[0].get_ydata()
    assert np.allclose(ydata, 12.0)
    # oriented footprint: polygon + circle per vehicle
    from matplotlib.patches import Polygon, Circle
    polys = [a for a in ph._obj_artists if isinstance(a, Polygon)]
    circs = [a for a in ph._obj_artists if isinstance(a, Circle)]
    assert len(polys) == 1 and len(circs) == 1
    out = tmp_path / "frame.png"
    ph.save(str(out))
    assert out.stat().st_size > 10_000
    ph._plt.close("all")


def test_edge_hover_info_costs_match_lattice(lat):
    from graphbasedlocaltrajectoryplanner_tpu.visualization.plot_handler \
        import edge_hover_info
    tables = dict(ev=np.asarray(lat.edge_valid), w=np.asarray(lat.w),
                  samples=np.asarray(lat.samples_xy),
                  psi=np.asarray(lat.node_psi), L=lat.L)
    l, n = 3, int(np.asarray(lat.rl_idx)[3])
    text, xs, ys = edge_hover_info(tables, l, n)
    children = np.nonzero(tables["ev"][l, n])[0]
    assert len(text.splitlines()) == len(children)
    for line, m in zip(text.splitlines(), children):
        assert line.startswith(f"[{n}-{m}]:")
        cost = float(line.split(":")[1].split("(")[0])
        assert abs(cost - float(tables["w"][l, n, m])) < 5e-3
