"""Arc-length projection helpers (JAX) — equivalents of the reference's
``helper_funcs/src/closest_path_index.py`` and ``get_s_coord.py``.

Used for: warm-start split-point lookup, ego-position cut index, object
s-coordinates along the raceline / local paths, in-bounds checks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def closest_path_index(path: jnp.ndarray, pos: jnp.ndarray,
                       valid_mask: jnp.ndarray = None):
    """Index of the closest point of ``path`` (n, 2) to ``pos`` (2,).

    Returns (index, squared_distances).  ``valid_mask`` excludes padded rows.
    Reference: closest_path_index.py:26-32 (argpartition k-NN; we only ever
    need k=1 or the two neighbours which :func:`get_s_coord` derives).
    """
    d2 = jnp.sum((path - pos) ** 2, axis=-1)
    if valid_mask is not None:
        d2 = jnp.where(valid_mask, d2, jnp.inf)
    return jnp.argmin(d2), d2


def _angle3pt(a, b, c):
    """Angle turning from a to c around b, wrapped to (-pi, pi]
    (reference get_s_coord.py:102-121)."""
    ang = jnp.arctan2(c[1] - b[1], c[0] - b[0]) - jnp.arctan2(a[1] - b[1], a[0] - b[0])
    return jnp.where(ang > jnp.pi, ang - 2 * jnp.pi,
                     jnp.where(ang <= -jnp.pi, ang + 2 * jnp.pi, ang))


def get_s_coord(ref_line: jnp.ndarray,
                pos: jnp.ndarray,
                s_array: jnp.ndarray = None,
                closed: bool = False,
                valid_mask: jnp.ndarray = None):
    """Continuous s-coordinate of ``pos`` on a polyline.

    Mirrors reference get_s_coord.py:34-99: pick the closest vertex, decide
    between its two neighbours via 3-point angles (the segment subtending the
    larger angle at ``pos`` contains the foot point), then drop a
    perpendicular onto that segment.

    :returns: (s, (idx_a, idx_b)) where (idx_a, idx_b) are the ordered
              neighbouring indices enclosing the projection.
    """
    n = ref_line.shape[0]
    idx_nb, _ = closest_path_index(ref_line, pos, valid_mask)

    if closed:
        idx1 = (idx_nb - 1) % n
        idx2 = (idx_nb + 1) % n
    else:
        idx1 = jnp.maximum(idx_nb - 1, 0)
        idx2 = jnp.minimum(idx_nb + 1, n - 1)

    ang1 = jnp.abs(_angle3pt(ref_line[idx_nb], pos, ref_line[idx1]))
    ang2 = jnp.abs(_angle3pt(ref_line[idx_nb], pos, ref_line[idx2]))
    use_prev = ang1 > ang2

    a_idx = jnp.where(use_prev, idx1, idx_nb)
    b_idx = jnp.where(use_prev, idx_nb, idx2)
    a_pos = ref_line[a_idx]
    b_pos = ref_line[b_idx]

    if s_array is None:
        d = jnp.linalg.norm(jnp.diff(ref_line, axis=0), axis=-1)
        s_array = jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(d)])

    ab = b_pos - a_pos
    denom = jnp.maximum(jnp.sum(ab * ab), 1e-12)
    t = jnp.dot(pos - a_pos, ab) / denom
    foot = a_pos + t * ab
    ds = jnp.linalg.norm(foot - a_pos)
    s = s_array[a_idx] + ds

    idx_a = jnp.where(ang1 >= ang2, idx1, idx_nb)
    idx_b = jnp.where(ang1 >= ang2, idx_nb, idx2)
    return s, (idx_a, idx_b)


def check_inside_bounds(bound1: jnp.ndarray, bound2: jnp.ndarray,
                        pos: jnp.ndarray):
    """On-track check (reference check_inside_bounds.py:27-57): interpolate
    the bound pair around the closest centerline segment (50 steps, mirroring
    ``np.linspace`` default) and verify the position is no farther from
    either bound than the local track width."""
    centerline = 0.5 * (bound1 + bound2)
    _, (ia, ib) = get_s_coord(centerline, pos, closed=True)
    w = jnp.linspace(0.0, 1.0, 50)[:, None]
    b1 = bound1[ia] * (1 - w) + bound1[ib] * w
    b2 = bound2[ia] * (1 - w) + bound2[ib] * w
    cl = centerline[ia] * (1 - w) + centerline[ib] * w
    k = jnp.argmin(jnp.sum((cl - pos) ** 2, axis=-1))
    d_track2 = jnp.sum((b1[k] - b2[k]) ** 2)
    d1 = jnp.sum((b1[k] - pos) ** 2)
    d2 = jnp.sum((b2[k] - pos) ** 2)
    return ~((d1 > d_track2) | (d2 > d_track2))
