"""Offline lattice build invariants (oval synthetic track + artifact IO)."""

import numpy as np
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import (
    make_oval_track, variable_step_size)
from graphbasedlocaltrajectoryplanner_tpu.models import lattice as latmod
from graphbasedlocaltrajectoryplanner_tpu.utils.config import OfflineConfig


@pytest.fixture(scope="module")
def oval_lattice():
    gt = make_oval_track()
    return latmod.build_lattice(gt, OfflineConfig(), md5_params="test")


def test_variable_step_size_spacing():
    kappa = np.zeros(200)
    kappa[80:120] = 0.02                     # a curve
    dist = np.full(200, 3.0)
    idx = variable_step_size(kappa, dist, d_curve=10.0, d_straight=30.0,
                             curve_th=0.008)
    idx = np.array(idx)
    assert idx[0] == 0
    gaps = np.diff(idx) * 3.0
    # straights: ~30 m spacing; curve region: ~10 m spacing
    in_curve = (idx[:-1] >= 80) & (idx[:-1] < 120)
    assert np.all(gaps[in_curve] <= 13.0)
    assert np.any(gaps[~in_curve] >= 27.0)


def test_raceline_chain_valid(oval_lattice):
    lat = oval_lattice
    ev = np.asarray(lat.edge_valid)
    rl = np.asarray(lat.rl_idx)
    L = lat.L
    for l in range(L):
        assert ev[l, rl[l], rl[(l + 1) % L]], f"raceline edge missing at {l}"


def test_nodes_on_track(oval_lattice):
    lat = oval_lattice
    pos = np.asarray(lat.node_pos)
    valid = np.asarray(lat.node_valid)
    refl = np.asarray(lat.refline)
    nv = np.asarray(lat.normvec)
    wr = np.asarray(lat.track_width_right)
    wl = np.asarray(lat.track_width_left)
    for l in range(lat.L):
        lateral = (pos[l, valid[l]] - refl[l]) @ nv[l]
        assert np.all(lateral <= wr[l] - lat.veh_width / 2 + 1e-6)
        assert np.all(lateral >= -(wl[l] - lat.veh_width / 2) - 1e-6)


def test_raceline_node_position(oval_lattice):
    lat = oval_lattice
    pos = np.asarray(lat.node_pos)
    rl_pts = np.asarray(lat.raceline)
    rl = np.asarray(lat.rl_idx)
    for l in range(lat.L):
        np.testing.assert_allclose(pos[l, rl[l]], rl_pts[l], atol=1e-4)


def test_pruned_graph_connected(oval_lattice):
    lat = oval_lattice
    ev = np.asarray(lat.edge_valid)
    L = lat.L
    has_child = ev.any(axis=2)
    has_parent = np.roll(ev.any(axis=1), 1, axis=0)
    # every node participating in an edge has both parents and children
    active = has_child | np.roll(ev.any(axis=1), 1, axis=0)
    assert np.all(~active | (has_child & has_parent))


def test_edge_samples_hit_node_positions(oval_lattice):
    lat = oval_lattice
    ev = np.asarray(lat.edge_valid)
    pos = np.asarray(lat.node_pos)
    samples = np.asarray(lat.samples_xy)
    npts = np.asarray(lat.edge_npts)
    L = lat.L
    ls, ns, ms = np.nonzero(ev)
    pick = np.random.default_rng(0).choice(len(ls), 50, replace=False)
    for i in pick:
        l, n, m = ls[i], ns[i], ms[i]
        np.testing.assert_allclose(samples[l, n, m, 0], pos[l, n], atol=1e-4)
        k = npts[l, n, m]
        np.testing.assert_allclose(samples[l, n, m, k - 1],
                                   pos[(l + 1) % L, m], atol=1e-3)


def test_vg_cost_zero_on_raceline(oval_lattice):
    lat = oval_lattice
    vg = np.asarray(lat.vg_cost)
    rl = np.asarray(lat.rl_idx)
    for l in range(lat.L):
        assert vg[l, rl[l]] == 0.0
        # one node over costs lat_res * w_virt_goal
        nxt = rl[l] + 1
        if nxt < int(np.asarray(lat.nodes_in_layer)[l]):
            assert abs(vg[l, nxt] - lat.lat_resolution * lat.virt_goal_cost) < 1e-3


def test_horizon_table_distance_mode(oval_lattice):
    lat = oval_lattice
    s = np.asarray(lat.s_rl)
    end = np.asarray(lat.end_layer_for_start)
    h = np.asarray(lat.h_goal_for_start)
    L = lat.L
    for start in range(0, L, 7):
        dist = s[end[start]] - s[start]
        if dist < 0:
            dist += s[-1]
        assert dist >= 300.0 - 35.0   # at least horizon minus one layer gap
        assert h[start] == (end[start] - start) % L


def test_curvature_kill(oval_lattice):
    # every valid edge respects the vehicle turn radius
    lat = oval_lattice
    import jax.numpy as jnp
    from graphbasedlocaltrajectoryplanner_tpu.ops import splines as spl
    ev = np.asarray(lat.edge_valid)
    rl = np.asarray(lat.rl_idx)
    ls, ns, ms = np.nonzero(ev)
    rng = np.random.default_rng(1)
    pick = rng.choice(len(ls), 40, replace=False)
    for i in pick:
        l, n, m = int(ls[i]), int(ns[i]), int(ms[i])
        if n == rl[l] and m == rl[(l + 1) % lat.L]:
            continue  # raceline edges always kept
        c = lat.edge_coeffs(l, n, m)
        _, kappa = spl.head_curv_an(c, jnp.linspace(0, 1, 10))
        assert np.max(np.abs(np.asarray(kappa))) <= 1 / lat.veh_turn + 1e-3


def test_artifact_roundtrip(tmp_path, oval_lattice):
    lat = oval_lattice
    p = str(tmp_path / "lat.npz")
    latmod.save_lattice(lat, p)
    lat2 = latmod.load_lattice(p)
    assert lat2 is not None
    assert lat2.L == lat.L and lat2.N == lat.N and lat2.S == lat.S
    assert lat2.md5_params == "test"
    assert lat2.closed == lat.closed
    np.testing.assert_allclose(np.asarray(lat2.w), np.asarray(lat.w))
    np.testing.assert_array_equal(np.asarray(lat2.edge_valid),
                                  np.asarray(lat.edge_valid))
