"""Pallas TPU kernel for the batched min-plus DP scan.

The planner's hot loop relaxes ``best[h+1, m] = min_n best[h, n] + W[h, n, m]``
for every (scenario, action-slot) pair over H window layers.  The XLA
``lax.scan`` version streams the per-step ``(B, A, N, N)`` cost slabs through
HBM each step; this kernel keeps the DP frontier resident in VMEM across all
H steps and processes a block of scenario rows per grid program, writing the
frontiers and backpointers once.

Layout: the batch dimension (scenarios x slots) is tiled by ``BLOCK_B`` rows;
``N`` (padded lateral nodes, multiple of 8, typically 32) rides the lane
dimension.  The relaxation per step is a broadcasted add + min-reduce over
the contraction axis — VPU work, since N is far below the 128x128 MXU tile.

Numerically identical to :func:`ops.search.minplus_scan` (tests assert
equality of frontiers and backpointers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphbasedlocaltrajectoryplanner_tpu.ops.search import INF

_INF = 1e30      # python literal — jnp constants cannot be captured by kernels
BLOCK_B = 8


def _minplus_kernel(w_ref, start_ref, best_ref, bp_ref):
    """Grid program over batch blocks.

    w_ref:     (BLOCK_B, H, N, N) window costs
    start_ref: (BLOCK_B, 1) int32 start nodes
    best_ref:  (BLOCK_B, H + 1, N) out — DP frontiers
    bp_ref:    (BLOCK_B, H + 1, N) out — backpointers (int32, -1 at h=0)
    """
    H = w_ref.shape[1]
    N = w_ref.shape[3]

    node_ids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_B, N), 1)
    start = start_ref[:, 0][:, None]                       # (BLOCK_B, 1)
    best = jnp.where(node_ids == start, 0.0, _INF)         # (BLOCK_B, N)

    best_ref[:, 0, :] = best
    bp_ref[:, 0, :] = jnp.full((BLOCK_B, N), -1, jnp.int32)

    def step(h, best):
        w = w_ref[:, h, :, :]                              # (BLOCK_B, N, N)
        tot = best[:, :, None] + w
        best_next = jnp.minimum(jnp.min(tot, axis=1), _INF)
        bp_next = jnp.argmin(tot, axis=1).astype(jnp.int32)
        best_ref[:, h + 1, :] = best_next
        bp_ref[:, h + 1, :] = bp_next
        return best_next

    jax.lax.fori_loop(0, H, step, best)


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


@functools.partial(jax.jit, static_argnames=("interpret",))
def minplus_scan_pallas(w_window: jnp.ndarray, start_node: jnp.ndarray,
                        interpret: bool = None):
    """Batched min-plus DP via Pallas.

    :param w_window:   (B, H, N, N) edge costs (INF where absent).
    :param start_node: (B,) int32 start node per batch row.
    :param interpret:  force interpreter mode (auto: on for CPU backends).
    :returns: (best (B, H+1, N), bp (B, H+1, N) int32).
    """
    if interpret is None:
        interpret = not _on_tpu()
    B, H, N, _ = w_window.shape
    if B % BLOCK_B != 0:
        pad = BLOCK_B - B % BLOCK_B
        w_window = jnp.concatenate(
            [w_window, jnp.full((pad, H, N, N), INF, w_window.dtype)])
        start_node = jnp.concatenate(
            [start_node, jnp.zeros((pad,), start_node.dtype)])
    Bp = w_window.shape[0]

    grid = (Bp // BLOCK_B,)
    best, bp = pl.pallas_call(
        _minplus_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_B, H, N, N), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_B, H + 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, H + 1, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, H + 1, N), w_window.dtype),
            jax.ShapeDtypeStruct((Bp, H + 1, N), jnp.int32),
        ],
        interpret=interpret,
    )(w_window, start_node[:, None])
    return best[:B], bp[:B]
