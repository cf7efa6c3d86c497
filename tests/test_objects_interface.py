"""Object-list / zone interface behaviors (reference
ObjectListInterface.py semantics)."""

import numpy as np
import pytest

from graphbasedlocaltrajectoryplanner_tpu.models.track import make_oval_track
from graphbasedlocaltrajectoryplanner_tpu.models.lattice import build_lattice
from graphbasedlocaltrajectoryplanner_tpu.utils.config import OfflineConfig
from graphbasedlocaltrajectoryplanner_tpu.planner import objects as objmod


@pytest.fixture(scope="module")
def lat():
    return build_lattice(make_oval_track(), OfflineConfig(), md5_params="obj")


def _interface(lat):
    oif = objmod.ObjectListInterface()
    oif.set_track_data(np.asarray(lat.refline), np.asarray(lat.normvec),
                       np.asarray(lat.track_width_left),
                       np.asarray(lat.track_width_right))
    return oif


def test_off_track_objects_filtered(lat):
    oif = _interface(lat)
    rl = np.asarray(lat.raceline)
    on = {"X": float(rl[3, 0]), "Y": float(rl[3, 1]), "theta": 0.0,
          "type": "physical", "id": 1, "length": 5.0, "v": 10.0}
    off = {"X": float(rl[3, 0]) + 500.0, "Y": float(rl[3, 1]) + 500.0,
           "theta": 0.0, "type": "physical", "id": 2, "length": 5.0, "v": 0.0}
    vehs = oif.process_object_list([on, off])
    assert len(vehs) == 1 and vehs[0].id == 1


def test_unknown_type_ignored(lat):
    oif = _interface(lat)
    rl = np.asarray(lat.raceline)
    weird = {"X": float(rl[0, 0]), "Y": float(rl[0, 1]), "theta": 0.0,
             "type": "ufo", "id": 3, "length": 5.0, "v": 0.0}
    assert oif.process_object_list([weird]) == []


def test_default_prediction_200ms(lat):
    oif = _interface(lat)
    rl = np.asarray(lat.raceline)
    obj = {"X": float(rl[0, 0]), "Y": float(rl[0, 1]), "theta": 0.5,
           "type": "physical", "id": 1, "length": 5.0, "v": 10.0}
    veh = oif.process_object_list([obj])[0]
    # heading 0 = north: dir = (-sin, cos)
    expected = np.array([obj["X"] - np.sin(0.5) * 10.0 * 0.2,
                         obj["Y"] + np.cos(0.5) * 10.0 * 0.2])
    np.testing.assert_allclose(veh.prediction[0], expected, atol=1e-9)
    assert veh.radius == 2.5


def test_none_keeps_old_objects(lat):
    oif = _interface(lat)
    rl = np.asarray(lat.raceline)
    obj = {"X": float(rl[0, 0]), "Y": float(rl[0, 1]), "theta": 0.0,
           "type": "physical", "id": 7, "length": 5.0, "v": 0.0}
    vehs = oif.process_object_list([obj])
    assert len(vehs) == 1
    # no update -> previous list returned (stale warning path)
    vehs2 = oif.process_object_list(None)
    assert vehs2 is vehs or [v.id for v in vehs2] == [7]


def test_zone_lifecycle(lat):
    oif = _interface(lat)
    zone_data = [[5, 5, 6], [0, 1, 0], np.zeros((2, 2)), np.zeros((2, 2))]
    zones = oif.update_zone("zA", zone_data, zone_type="nodes")
    assert len(zones) == 1 and zones[0].id == "zA"
    # same id again -> reused object
    zones2 = oif.update_zone("zA", zone_data, zone_type="nodes")
    assert zones2[0] is zones[0]
    # a different zone id -> old zone flagged disabled with 'rmv' suffix
    zones3 = oif.update_zone("zB", zone_data, zone_type="nodes")
    ids = sorted(z.id for z in zones3)
    assert "zB" in ids
    assert any(z.id == "zArmv" and z.disabled for z in zones3)


def test_zone_normals_resolution(lat):
    # zone given via normals must resolve to node indices on matching layers
    refline = np.asarray(lat.refline)
    normvec = np.asarray(lat.normvec)
    layers = [4, 5]
    ref_pos = refline[layers]
    norm_vec = normvec[layers]
    bound_l = np.array([-4.0, -4.0])   # left side strip
    bound_r = np.array([-1.0, -1.0])
    z = objmod.ZoneObject("zn", ref_pos_in=ref_pos, norm_vec_in=norm_vec,
                          bound_l_in=bound_l, bound_r_in=bound_r)
    layer_ids, node_ids = z.get_blocked_nodes(lattice=lat)
    assert set(layer_ids) == {4, 5}
    assert len(node_ids) > 0
    rl_idx = np.asarray(lat.rl_idx)
    # the strip is left of the raceline, but the vehicle-width + half-lat-res
    # inflation (get_zone_nodes.py:44-50) widens it slightly past it
    for l in (4, 5):
        ns = [n for li, n in zip(layer_ids, node_ids) if li == l]
        assert min(ns) < rl_idx[l]
        assert max(ns) <= rl_idx[l] + 2


def test_vehicles_to_arrays_padding(lat):
    vehs = [objmod.VehObject(1, [0.0, 0.0], 0.0, 2.0, 5.0, [[1.0, 1.0]]),
            objmod.VehObject(2, [3.0, 0.0], 0.0, 2.0, 5.0, [[4.0, 0.0]])]
    pos, rad, act, owner = objmod.vehicles_to_arrays(vehs, o_pad=8)
    assert act.sum() == 4              # 2 vehicles + 2 predictions
    assert owner.tolist()[:4] == [0, 0, 1, 1]
    np.testing.assert_allclose(pos[1], [1.0, 1.0])
    assert not act[4:].any()
