"""Pallas min-plus DP kernel vs the lax.scan reference (interpret mode on
CPU; the same test runs compiled on real TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from graphbasedlocaltrajectoryplanner_tpu.ops import search as srch
from graphbasedlocaltrajectoryplanner_tpu.ops.pallas_minplus import (
    minplus_scan_pallas)


def test_pallas_matches_scan():
    B, H, N = 16, 12, 16
    rng = np.random.default_rng(0)
    w = rng.uniform(1, 10, (B, H, N, N)).astype(np.float32)
    w[rng.uniform(size=w.shape) < 0.4] = float(srch.INF)
    start = rng.integers(0, N, B).astype(np.int32)
    w_j = jnp.asarray(w)
    s_j = jnp.asarray(start)

    b_ref, bp_ref = jax.jit(jax.vmap(srch.minplus_scan))(w_j, s_j)
    b_pl, bp_pl = minplus_scan_pallas(w_j, s_j)

    np.testing.assert_allclose(np.asarray(b_ref), np.asarray(b_pl), rtol=1e-6)
    # backpointers may differ only where the node is unreachable (argmin ties
    # between INF entries)
    reach = np.asarray(b_ref) < 1e29
    np.testing.assert_array_equal(np.asarray(bp_ref)[reach],
                                  np.asarray(bp_pl)[reach])


def test_pallas_batch_padding():
    # non-multiple-of-BLOCK_B batch exercises the padding path
    B, H, N = 5, 6, 8
    rng = np.random.default_rng(1)
    w = rng.uniform(1, 10, (B, H, N, N)).astype(np.float32)
    start = rng.integers(0, N, B).astype(np.int32)
    b_ref, _ = jax.jit(jax.vmap(srch.minplus_scan))(jnp.asarray(w),
                                                    jnp.asarray(start))
    b_pl, _ = minplus_scan_pallas(jnp.asarray(w), jnp.asarray(start))
    assert b_pl.shape == (B, H + 1, N)
    np.testing.assert_allclose(np.asarray(b_ref), np.asarray(b_pl), rtol=1e-6)
