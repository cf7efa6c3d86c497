"""Object-vs-edge collision masking (JAX) — fused replacement of the
reference's per-edge Python distance loop
(``GraphBase.get_intersec_edges_in_range``, GraphBase.py:567-646, driven by
``get_intersec_edges.py`` and ``gen_local_node_template.py:164-203``).

Semantics replicated:
  * an object maps to its closest reference-line layer ``obj_layer``;
  * only edges *starting* in layers {obj_layer-1, obj_layer} (mod L) are
    candidates (the reference's induced-subgraph slab of layers
    [obj_layer-1, obj_layer+1]);
  * an edge is blocked if any of its sampled points lies within
    ``sqrt((r_obj + veh_width/2)^2 + sampled_resolution^2/4)`` of the object
    (discretization inflation, GraphBase.py:624-629);
  * objects outside the planning horizon (+/- 1 layer, wrap-aware) are
    ignored (get_intersec_edges.py:48-58).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def object_layers(refline: jnp.ndarray, obj_pos: jnp.ndarray):
    """Closest refline layer per object position (O, 2) -> (O,) int32."""
    d2 = jnp.sum((refline[None, :, :] - obj_pos[:, None, :]) ** 2, axis=-1)
    return jnp.argmin(d2, axis=-1).astype(jnp.int32)


def layer_dist_mod(from_layer, to_layer, num_layers):
    """(to - from) mod L — forward layer distance with lap wrap
    (gen_local_node_template.py:192-196)."""
    return jnp.mod(to_layer - from_layer, num_layers)


def edge_block_mask(window_samples_xy: jnp.ndarray,
                    window_layers: jnp.ndarray,
                    obj_pos: jnp.ndarray,
                    obj_radius: jnp.ndarray,
                    obj_layer: jnp.ndarray,
                    obj_active: jnp.ndarray,
                    start_layer,
                    h_goal,
                    num_layers: int,
                    veh_width: float,
                    sampled_resolution: float):
    """Boolean blocked-edge mask over the planning window.

    :param window_samples_xy: (H, N, N, S, 2) sampled points of the edge from
                              node n in window-layer h to node m in h+1
                              (padding repeats the end point — harmless).
    :param window_layers:     (H,) absolute layer index of each window step.
    :param obj_pos:           (O, 2) object positions (vehicles and their
                              prediction points alike).
    :param obj_radius:        (O,) collision radii.
    :param obj_layer:         (O,) closest refline layer per object.
    :param obj_active:        (O,) validity mask (padded object slots False).
    :param start_layer:       first layer of the window (scalar).
    :param h_goal:            planning horizon in layers (scalar).
    :param num_layers:        total layer count L (static).
    :returns: blocked (H, N, N) bool.
    """
    # horizon applicability per object: obj_layer within
    # [start-1, start+h_goal+1] in forward wrap distance
    fwd = layer_dist_mod(start_layer, obj_layer, num_layers)
    bwd_ok = fwd >= num_layers - 1                      # == start-1 (mod L)
    in_range = (fwd <= h_goal + 1) | bwd_ok
    applicable = obj_active & in_range

    # slab applicability per (object, window step): edge starts at layer
    # window_layers[h]; candidate iff start layer in {obj_layer-1, obj_layer}
    rel = jnp.mod(window_layers[None, :] - (obj_layer[:, None] - 1),
                  num_layers)                           # (O, H)
    slab = rel <= 1
    oa = applicable[:, None] & slab                     # (O, H)

    # distance test: min over samples of squared distance to each object
    ref2 = (obj_radius + veh_width / 2.0) ** 2 + sampled_resolution ** 2 / 4.0

    def per_object(pos, r2):
        d2 = jnp.sum((window_samples_xy - pos) ** 2, axis=-1)   # (H,N,N,S)
        return jnp.min(d2, axis=-1) <= r2                        # (H,N,N)

    hits = jax.vmap(per_object)(obj_pos, ref2)          # (O, H, N, N)
    blocked = jnp.any(hits & oa[:, :, None, None], axis=0)
    return blocked


def closest_object(obj_layer, obj_active, start_layer, h_goal, num_layers):
    """Index + layer of the closest object ahead within the horizon
    (gen_local_node_template.py:191-213).  Returns (idx, layer_dist, found);
    ``idx`` is arbitrary when ``found`` is False."""
    fwd = layer_dist_mod(start_layer, obj_layer, num_layers)
    ok = obj_active & (fwd <= h_goal)
    fwd_masked = jnp.where(ok, fwd, num_layers + 1)
    idx = jnp.argmin(fwd_masked).astype(jnp.int32)
    found = jnp.any(ok)
    return idx, fwd_masked[idx], found


def path_hits_objects(path_xy: jnp.ndarray, path_valid: jnp.ndarray,
                      obj_pos: jnp.ndarray, obj_radius: jnp.ndarray,
                      obj_active: jnp.ndarray, veh_width: float):
    """Per-object flag: does the polyline hit the object circle?
    (constant-path-segment check, main_online_path_gen.py:117-122 —
    note: *no* discretization inflation there)."""
    d2 = jnp.sum((path_xy[None, :, :] - obj_pos[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(path_valid[None, :], d2, jnp.inf)
    ref2 = (obj_radius + veh_width / 2.0) ** 2
    return obj_active & jnp.any(d2 <= ref2[:, None], axis=1)
