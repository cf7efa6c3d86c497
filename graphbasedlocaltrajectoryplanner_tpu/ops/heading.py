"""Heading / curvature utilities (JAX, host-callable and jittable).

Conventions follow the reference planner: heading ``psi`` is measured with
``0.0`` pointing north (+y axis), positive counter-clockwise, wrapped to
``[-pi, pi)``; the direction vector of a heading is
``(cos(psi + pi/2), sin(psi + pi/2)) = (-sin psi, cos psi)``.

Equivalents of tph ``normalize_psi`` / ``calc_head_curv_num`` /
``calc_head_curv_an`` (call sites: reference
``graph_ltpl/offline_graph/src/gen_node_skeleton.py:63-90``,
``gen_edges.py:133``, ``main_online_path_gen.py:318``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TWO_PI = 2.0 * np.pi


def normalize_psi(psi):
    """Wrap an angle (array) to the interval [-pi, pi)."""
    return jnp.mod(psi + jnp.pi, TWO_PI) - jnp.pi


def heading_to_dir(psi):
    """Unit direction vector for heading ``psi`` (0 = north convention).

    Returns array shaped ``psi.shape + (2,)``.
    """
    psi = jnp.asarray(psi)
    return jnp.stack([-jnp.sin(psi), jnp.cos(psi)], axis=-1)


def dir_to_heading(dx, dy):
    """Heading (0 = north) of direction vector components."""
    return normalize_psi(jnp.arctan2(dy, dx) - jnp.pi / 2.0)


def calc_head_curv_num(path: jnp.ndarray,
                       el_lengths: jnp.ndarray,
                       is_closed: bool,
                       stepsize_psi_preview: float = 1.0,
                       stepsize_psi_review: float = 1.0,
                       stepsize_curv_preview: float = 2.0,
                       stepsize_curv_review: float = 2.0):
    """Numerical heading + curvature of a polyline.

    Mirrors tph ``calc_head_curv_num`` semantics: the tangent at point ``i``
    is the chord from ``i - review_steps`` to ``i + preview_steps``, where the
    step counts are ``max(round(stepsize / mean(el_lengths)), 1)``; curvature
    is the (wrapped) heading difference over the corresponding review/preview
    window divided by the summed element lengths.  For the lattice layers the
    element lengths are 10-30 m so all step counts collapse to 1 (central
    differences with wrap-around).

    :param path:        (n, 2) points.
    :param el_lengths:  (n,) for closed paths (includes wrap segment) or
                        (n-1,) for unclosed paths.
    :param is_closed:   closed-track flag (static).
    :returns: (psi, kappa), each (n,).
    """
    path = jnp.asarray(path, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    el_lengths = jnp.asarray(el_lengths, path.dtype)
    n = path.shape[0]

    avg_el = float(np.mean(np.asarray(el_lengths)))
    step_psi_prev = max(round(stepsize_psi_preview / avg_el), 1)
    step_psi_rev = max(round(stepsize_psi_review / avg_el), 1)
    step_curv_prev = max(round(stepsize_curv_preview / avg_el), 1)
    step_curv_rev = max(round(stepsize_curv_review / avg_el), 1)

    if is_closed:
        idx = jnp.arange(n)
        tang = path[(idx + step_psi_prev) % n] - path[(idx - step_psi_rev) % n]
        psi = dir_to_heading(tang[:, 0], tang[:, 1])

        dpsi = normalize_psi(psi[(idx + step_curv_prev) % n]
                             - psi[(idx - step_curv_rev) % n])
        # summed element lengths over the curvature window around each point
        win = step_curv_prev + step_curv_rev
        csum = jnp.concatenate([jnp.zeros((1,), el_lengths.dtype),
                                jnp.cumsum(jnp.tile(el_lengths, 3))])
        start = idx + n - step_curv_rev
        seg_len = csum[start + win] - csum[start]
        kappa = dpsi / jnp.maximum(seg_len, 1e-12)
    else:
        # forward/backward differences at the ends, chord in the interior
        idx = jnp.arange(n)
        lo = jnp.maximum(idx - step_psi_rev, 0)
        hi = jnp.minimum(idx + step_psi_prev, n - 1)
        tang = path[hi] - path[lo]
        psi = dir_to_heading(tang[:, 0], tang[:, 1])

        lo_c = jnp.maximum(idx - step_curv_rev, 0)
        hi_c = jnp.minimum(idx + step_curv_prev, n - 1)
        dpsi = normalize_psi(psi[hi_c] - psi[lo_c])
        csum = jnp.concatenate([jnp.zeros((1,), el_lengths.dtype),
                                jnp.cumsum(el_lengths)])
        seg_len = csum[hi_c] - csum[lo_c]
        kappa = dpsi / jnp.maximum(seg_len, 1e-12)

    return psi, kappa
