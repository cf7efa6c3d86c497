"""Streaming Pallas slab hit-mask kernel (ops/pallas_collision.py) vs the
XLA gather formulation in planner/pathgen.window_prelude — exact parity.
Runs in interpreter mode on the CPU test backend."""

import numpy as np
import jax.numpy as jnp
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import make_oval_track
from graphbasedlocaltrajectoryplanner_tpu.models import lattice as latmod
from graphbasedlocaltrajectoryplanner_tpu.utils.config import OfflineConfig
from graphbasedlocaltrajectoryplanner_tpu.planner import pathgen as pg
from graphbasedlocaltrajectoryplanner_tpu.ops import collision as col
from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_collision import (
    build_samples_t, hit_slab_pallas)


@pytest.fixture(scope="module")
def lat():
    gt = make_oval_track()
    return latmod.build_lattice(gt, OfflineConfig(min_plan_horizon=200.0),
                                md5_params="pcol")


def test_hit_slab_parity(lat):
    rng = np.random.default_rng(3)
    B, O = 13, 4
    L = lat.L
    rl = np.asarray(lat.rl_idx)
    nil = np.asarray(lat.nodes_in_layer)
    node_pos = np.asarray(lat.node_pos)

    hits_ref, slabs, opos, ref2s, apps = [], [], [], [], []
    for b in range(B):
        sl = int(rng.integers(0, L))
        obj_pos = np.zeros((O, 2), np.float32)
        obj_act = np.zeros((O,), bool)
        obj_rad = rng.uniform(0.5, 4.0, O).astype(np.float32)
        for k in range(O):
            la = int((sl + rng.integers(0, L)) % L)
            obj_pos[k] = node_pos[la, int(rng.integers(0, nil[la]))] \
                + rng.normal(0, 1.5, 2)
            obj_act[k] = bool(rng.random() < 0.7)
        obj_layer = col.object_layers(lat.refline, jnp.asarray(obj_pos))
        h_goal = lat.h_goal_for_start[sl]
        obs_idx, _, obs_found = col.closest_object(
            obj_layer, jnp.asarray(obj_act), jnp.int32(sl), h_goal, lat.L)
        pre = pg.window_prelude(
            lat, jnp.int32(sl), jnp.asarray(obj_pos), jnp.asarray(obj_rad),
            jnp.asarray(obj_act), obj_layer[obs_idx], jnp.int32(0),
            obs_found)
        hits_ref.append(np.asarray(pre["hit_slab"]))
        slabs.append(np.asarray(pre["slab_layers"]))
        opos.append(obj_pos)
        ref2s.append(np.asarray(pre["ref2"]))
        apps.append(np.asarray(pre["obj_app"]))

    samples_t = build_samples_t(lat.samples_xy)
    hit_p = hit_slab_pallas(
        samples_t, jnp.asarray(np.stack(slabs)),
        jnp.asarray(np.stack(opos)), jnp.asarray(np.stack(ref2s)),
        jnp.asarray(np.stack(apps)), interpret=True)
    np.testing.assert_array_equal(np.asarray(hit_p), np.stack(hits_ref))
    assert np.asarray(hit_p).any()          # non-degenerate fixture
    assert not np.asarray(hit_p).all()
