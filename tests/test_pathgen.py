"""Online path-generation kernels on the oval lattice: action-slot masks,
DP feasibility, assembly geometry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import make_oval_track
from graphbasedlocaltrajectoryplanner_tpu.models.lattice import build_lattice
from graphbasedlocaltrajectoryplanner_tpu.utils.config import OfflineConfig
from graphbasedlocaltrajectoryplanner_tpu.planner import pathgen as pg

O_PAD = 4


@pytest.fixture(scope="module")
def lat():
    return build_lattice(make_oval_track(), OfflineConfig(), md5_params="t")


def _no_objects():
    return (jnp.zeros((O_PAD, 2)), jnp.zeros((O_PAD,)),
            jnp.zeros((O_PAD,), bool))


def _plan(lat, start_layer, start_node, obj=None, zone=None,
          obs=(0, 0, False), last=None, dense=False):
    opos, orad, oact = obj if obj is not None else _no_objects()
    zb = zone if zone is not None else jnp.zeros((lat.L, lat.N), bool)
    if last is None:
        last_nodes = jnp.full((4,), -1, jnp.int32)
        w_fac = jnp.ones((3,))
    else:
        last_nodes, w_fac = last
    fn = pg.plan_window_dense if dense else pg.plan_window_kernel
    return fn(
        lat, jnp.int32(start_layer), jnp.int32(start_node), zb,
        opos, orad, oact, jnp.int32(obs[0]), jnp.int32(obs[1]),
        jnp.bool_(obs[2]), last_nodes, w_fac, n_last=4)


def test_scan_matches_dense(lat):
    rl = np.asarray(lat.rl_idx)
    raceline = np.asarray(lat.raceline)
    obs_l = 6
    opos = np.zeros((O_PAD, 2), np.float32)
    opos[0] = raceline[obs_l]
    opos[1] = raceline[obs_l] + 1.0
    orad = np.full(O_PAD, 2.5, np.float32)
    oact = np.zeros(O_PAD, bool)
    oact[:2] = True
    zone = np.zeros((lat.L, lat.N), bool)
    zone[12, :4] = True
    last_nodes = jnp.array([rl[0], rl[1], rl[2] + 1, -1], jnp.int32)
    w_fac = jnp.array([0.1, 0.5, 0.8])
    kw = dict(obj=(jnp.array(opos), jnp.array(orad), jnp.array(oact)),
              zone=jnp.array(zone), obs=(obs_l, int(rl[obs_l]), True),
              last=(last_nodes, w_fac))
    a = _plan(lat, 0, int(rl[0]), **kw)
    b = _plan(lat, 0, int(rl[0]), dense=True, **kw)
    np.testing.assert_allclose(np.asarray(a["best"]), np.asarray(b["best"]),
                               rtol=1e-5)
    fa = np.asarray(pg.feasibility_vectors(a["best"], a["vg"]))
    fb = np.asarray(pg.feasibility_vectors(b["best"], b["vg"]))
    np.testing.assert_array_equal(fa, fb)
    np.testing.assert_allclose(np.asarray(a["vg"]), np.asarray(b["vg"]))


def test_straight_follows_raceline_when_free(lat):
    rl = np.asarray(lat.rl_idx)
    out = _plan(lat, 0, int(rl[0]))
    feas = np.asarray(pg.feasibility_vectors(out["best"], out["vg"]))
    h_goal = int(out["h_goal"])
    assert feas[pg.SLOT_STRAIGHT, h_goal]
    nodes, cost = pg.backtrace_slot(out["best"][0], out["bp"][0], out["vg"][0],
                                    jnp.int32(h_goal))
    nodes = np.asarray(nodes)
    win = np.asarray(out["win_layers"])
    # free track from the raceline: optimal path stays on (or near) raceline
    for h in range(h_goal + 1):
        assert abs(int(nodes[h]) - rl[win[h]]) <= 1


def test_assembly_geometry(lat):
    rl = np.asarray(lat.rl_idx)
    out = _plan(lat, 0, int(rl[0]))
    h_goal = int(out["h_goal"])
    nodes, _ = pg.backtrace_slot(out["best"][0], out["bp"][0], out["vg"][0],
                                 jnp.int32(h_goal))
    psi_s = float(np.asarray(lat.node_psi)[0, rl[0]])
    P = 256
    res = pg.assemble_action_kernel(lat, out["win_layers"], nodes,
                                    jnp.int32(h_goal), jnp.float32(psi_s),
                                    p_max=P)
    path = np.asarray(res["path"])
    n_valid = int(res["n_valid"])
    node_idx = np.asarray(res["node_idx"])
    assert 2 < n_valid <= P
    # node positions appear at node_idx entries
    pos = np.asarray(lat.node_pos)
    win = np.asarray(out["win_layers"])
    nd = np.asarray(nodes)
    for h in range(0, h_goal + 1, 3):
        np.testing.assert_allclose(path[node_idx[h], :2], pos[win[h], nd[h]],
                                   atol=0.35)  # refit may deviate slightly
    # element lengths: positive within path, zero at/after end
    assert np.all(path[:n_valid - 1, 4] > 0.1)
    assert np.all(path[n_valid - 1:, 4] == 0.0)
    # consecutive points spaced ~stepsize
    d = np.linalg.norm(np.diff(path[:n_valid, :2], axis=0), axis=1)
    assert d.max() < 2 * lat.sampled_resolution + 0.5
    # curvature stays sane on the oval (r=60 -> kappa<=~1/50)
    assert np.abs(path[:n_valid, 3]).max() < 0.03
    # heading continuous
    dpsi = np.diff(np.unwrap(path[:n_valid, 2]))
    assert np.abs(dpsi).max() < 0.3


def test_object_blocks_straight_not_follow(lat):
    rl = np.asarray(lat.rl_idx)
    raceline = np.asarray(lat.raceline)
    # object sitting on the raceline ~8 layers ahead of layer 0
    obs_l = 8
    opos = np.zeros((O_PAD, 2), np.float32)
    opos[0] = raceline[obs_l]
    orad = np.zeros(O_PAD, np.float32)
    orad[0] = 2.5
    oact = np.zeros(O_PAD, bool)
    oact[0] = True
    obs_node = int(rl[obs_l])
    out = _plan(lat, 0, int(rl[0]),
                obj=(jnp.array(opos), jnp.array(orad), jnp.array(oact)),
                obs=(obs_l, obs_node, True))
    h_goal = int(out["h_goal"])
    feas = np.asarray(pg.feasibility_vectors(out["best"], out["vg"]))
    assert feas[pg.SLOT_STRAIGHT, h_goal]   # track wide enough to pass
    assert feas[pg.SLOT_FOLLOW, h_goal]
    assert feas[pg.SLOT_LEFT, h_goal]
    assert feas[pg.SLOT_RIGHT, h_goal]

    # follow ignores the object -> stays on raceline
    nodes_f, _ = pg.backtrace_slot(out["best"][1], out["bp"][1], out["vg"][1],
                                   jnp.int32(h_goal))
    nodes_f = np.asarray(nodes_f)
    win = np.asarray(out["win_layers"])
    assert abs(nodes_f[obs_l] - rl[win[obs_l]]) <= 1

    # straight must deviate at the obstacle layer
    nodes_s, _ = pg.backtrace_slot(out["best"][0], out["bp"][0], out["vg"][0],
                                   jnp.int32(h_goal))
    nodes_s = np.asarray(nodes_s)
    assert abs(int(nodes_s[obs_l]) - obs_node) >= 2

    # left keeps nodes strictly left of the obstacle node, right keeps right
    nodes_l, _ = pg.backtrace_slot(out["best"][2], out["bp"][2], out["vg"][2],
                                   jnp.int32(h_goal))
    nodes_r, _ = pg.backtrace_slot(out["best"][3], out["bp"][3], out["vg"][3],
                                   jnp.int32(h_goal))
    assert int(np.asarray(nodes_l)[obs_l]) < obs_node
    assert int(np.asarray(nodes_r)[obs_l]) >= obs_node


def test_zone_blocks_all_slots(lat):
    rl = np.asarray(lat.rl_idx)
    zone = np.zeros((lat.L, lat.N), bool)
    # block entire layer 5 except the two rightmost valid nodes
    nil = int(np.asarray(lat.nodes_in_layer)[5])
    zone[5, :nil - 2] = True
    out = _plan(lat, 0, int(rl[0]), zone=jnp.array(zone))
    h_goal = int(out["h_goal"])
    for slot in range(4):
        nodes, _ = pg.backtrace_slot(out["best"][slot], out["bp"][slot],
                                     out["vg"][slot], jnp.int32(h_goal))
        n5 = int(np.asarray(nodes)[5])
        assert n5 >= nil - 2


def test_w_last_edges_discount_prefers_previous_path(lat):
    rl = np.asarray(lat.rl_idx)
    start_node = int(rl[0]) + 2   # off-raceline start
    out0 = _plan(lat, 0, start_node, dense=True)
    h_goal = int(out0["h_goal"])
    nodes0, cost0 = pg.backtrace_slot(out0["best"][0], out0["bp"][0],
                                      out0["vg"][0], jnp.int32(h_goal))
    nodes0 = np.asarray(nodes0)
    # discount the first edges of a deliberately offset path
    last_nodes = jnp.array([start_node, start_node + 1, start_node + 1,
                            start_node + 1], jnp.int32)
    w_fac = jnp.array([0.0, 0.0, 0.0])
    out1 = _plan(lat, 0, start_node, last=(last_nodes, w_fac), dense=True)
    nodes1, cost1 = pg.backtrace_slot(out1["best"][0], out1["bp"][0],
                                      out1["vg"][0], jnp.int32(h_goal))
    # zero-cost discount applied to exactly the previous-path edges
    w0 = np.asarray(out0["w_all"][0])
    w1 = np.asarray(out1["w_all"][0])
    assert w1[0, start_node, start_node + 1] == 0.0
    assert w1[1, start_node + 1, start_node + 1] == 0.0
    assert w1[2, start_node + 1, start_node + 1] == 0.0
    changed = w0 != w1
    assert changed.sum() == 3
    assert float(cost1) <= float(cost0) + 1e-3


def test_horizon_shrink_on_fully_blocked_layer(lat):
    rl = np.asarray(lat.rl_idx)
    zone = np.zeros((lat.L, lat.N), bool)
    zone[10, :] = True            # completely blocked layer
    out = _plan(lat, 0, int(rl[0]), zone=jnp.array(zone))
    h_goal = int(out["h_goal"])
    feas = np.asarray(pg.feasibility_vectors(out["best"], out["vg"]))
    assert not feas[pg.SLOT_STRAIGHT, h_goal]
    # largest feasible horizon is 9 (one before the blocked layer)
    hs = np.nonzero(feas[pg.SLOT_STRAIGHT, :h_goal + 1])[0]
    assert hs.max() == 9


def test_assembly_inlined_eval_matches_splines(lat):
    """The r5 transposed-dot sampler inlines the cubic / derivative /
    heading / curvature / element-length arithmetic from the coefficient
    rows.  Pin it against the ops/splines composition it claims to
    replicate (same ops, same order), evaluated from the kernel's own
    outputs: resampling the returned refit coefficients at the implied
    per-point parameters must reproduce path x/y/psi/kappa to fma-level
    tolerance (see ref_eval below)."""
    from graphbasedlocaltrajectoryplanner_tpu.ops import splines as spl

    rl = np.asarray(lat.rl_idx)
    out = _plan(lat, 0, int(rl[0]))
    h_goal = int(out["h_goal"])
    nodes, _ = pg.backtrace_slot(out["best"][0], out["bp"][0], out["vg"][0],
                                 jnp.int32(h_goal))
    psi_s = float(np.asarray(lat.node_psi)[0, rl[0]])
    P = 256
    res = pg.assemble_action_kernel(lat, out["win_layers"], nodes,
                                    jnp.int32(h_goal), jnp.float32(psi_s),
                                    p_max=P)
    path = np.asarray(res["path"])
    n_valid = int(res["n_valid"])
    node_idx = np.asarray(res["node_idx"])
    H = lat.H_max
    cf = np.asarray(res["coeffs"])                    # (H, 8) [x cols | y]
    coeffs = np.stack([cf[:, :4], cf[:, 4:]], axis=-1)  # (H, 4, 2)

    # per-point segment + parameter exactly as the kernel derives them
    idxp = np.arange(P)
    seg = np.clip((node_idx[1:H + 1][None, :] <= idxp[:, None]).sum(1),
                  0, H - 1)
    npts = np.diff(node_idx[:H + 1]) + 1              # per-segment counts
    t = np.clip((idxp - node_idx[seg]).astype(np.float32)
                / np.maximum(npts[seg] - 1, 1), 0.0, 1.0)

    c_p = jnp.asarray(coeffs[seg], jnp.float32)       # (P, 4, 2)
    t_j = jnp.asarray(t, jnp.float32)

    @jax.jit
    def ref_eval(c, tt):
        # jitted so XLA applies the same fma contraction it applies to
        # the kernel's inlined expressions — eager op-by-op dispatch
        # differs at the ~1e-5 level (fma rounding), which is exactly
        # the compilation-context variance this test must NOT flag
        pts = spl.eval_spline(c, tt)
        psi, kappa = spl.head_curv_an(c, tt)
        return pts, psi, kappa

    pts, psi, kappa = map(np.asarray, ref_eval(c_p, t_j))
    # interior sampled rows (the final row & padding are the separate
    # fin-select); identical arithmetic in the same compilation context
    # agrees to fma-level tolerance
    m = slice(0, max(n_valid - 1, 1))
    np.testing.assert_allclose(path[m, 0], pts[m, 0], atol=2e-5, rtol=0)
    np.testing.assert_allclose(path[m, 1], pts[m, 1], atol=2e-5, rtol=0)
    np.testing.assert_allclose(path[m, 2], psi[m], atol=2e-5, rtol=0)
    np.testing.assert_allclose(path[m, 3], kappa[m], atol=2e-6, rtol=0)
