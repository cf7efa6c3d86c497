"""Pallas TPU kernel: batched backpointer walk (goal select + backtrace).

``ops/search.backtrace`` recovers a node chain with an H-step ``lax.scan``
of dependent row gathers; at batch 4k x 4 slots that scan costs ~4 ms of
mostly per-step dispatch/gather latency (tools/asm_profile_r3.py:
``backtrace_ms``).  Here the (scenario x slot) rows live on the 128-lane
axis, each row's backpointer table ``(H+1, N)`` sits VMEM-resident, and the
walk is an unrolled H-step loop of one-hot select-reduces over the N
sublanes — no gathers, one kernel launch for the whole batch (same
custom_vmap flattening pattern as ops/pallas_velocity.py).

Semantics match ``search.backtrace`` + the goal argmin of
``pathgen.backtrace_slot`` (reference igraph ``get_shortest_paths`` result
walk, GraphBase.py:818-822); pinned in tests/test_pallas_backtrace.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graphbasedlocaltrajectoryplanner_tpu.ops import search as srch

LANES = 128
GB = 4


def _on_tpu():
    return jax.default_backend() == "tpu"


def _kernel(bp_ref, goal_ref, heff_ref, out_ref, *, Hp1, N):
    goal = goal_ref[:, 0, :]                            # (GB, 128) i32
    heff = heff_ref[:, 0, :]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (goal.shape[0], N, LANES), 1)
    oh = (iota_n == goal[:, None, :]).astype(jnp.int32)
    for h in range(Hp1 - 1, -1, -1):
        bp_h1 = bp_ref[:, min(h + 1, Hp1 - 1), :, :]    # (GB, N, 128)
        node_from = jnp.sum(bp_h1 * oh, axis=1)         # (GB, 128)
        node_h = jnp.where(h == heff, goal,
                           jnp.where(h > heff, jnp.int32(-1), node_from))
        oh = jnp.where((h <= heff)[:, None, :],
                       (iota_n == node_h[:, None, :]).astype(jnp.int32), oh)
        out_ref[:, h, :] = node_h


@functools.partial(jax.jit, static_argnames=("interpret",))
def _walk_flat(bp, goal_node, h_eff, interpret=False):
    """(R, Hp1, N) backpointers -> (R, Hp1) node chains via the kernel."""
    R, Hp1, N = bp.shape
    Rp = int(np.ceil(R / (LANES * GB)) * LANES * GB)
    G = Rp // LANES

    def pad(x, fill):
        return jnp.concatenate(
            [x, jnp.full((Rp - R,) + x.shape[1:], fill, x.dtype)], axis=0) \
            if Rp != R else x

    # rows -> (group, lane): (G, 128, Hp1, N) -> (G, Hp1, N, 128)
    bp_l = jnp.transpose(pad(bp, 0).reshape(G, LANES, Hp1, N), (0, 2, 3, 1))
    goal_l = pad(goal_node.astype(jnp.int32), 0).reshape(G, 1, LANES)
    heff_l = pad(h_eff.astype(jnp.int32), 0).reshape(G, 1, LANES)

    out = pl.pallas_call(
        functools.partial(_kernel, Hp1=Hp1, N=N),
        out_shape=jax.ShapeDtypeStruct((G, Hp1, LANES), jnp.int32),
        grid=(G // GB,),
        in_specs=[pl.BlockSpec((GB, Hp1, N, LANES), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((GB, 1, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((GB, 1, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((GB, Hp1, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(bp_l, goal_l, heff_l)
    return jnp.transpose(out, (0, 2, 1)).reshape(Rp, Hp1)[:R]


def make_backtrace_walk(interpret: bool = None):
    """Backpointer walk ALONE (goal node supplied by the caller): returns
    ``fn(bp (R, H+1, N), goal_node (R,), h_eff (R,)) -> nodes (R, H+1)``.
    Used by the batched engine, which computes the goal argmin with one
    tiny combined (slot, horizon) one-hot contraction instead of selecting
    the full best/vg tensors per output slot (parallel/scenario.py).
    Same custom_vmap row-flattening as :func:`make_backtrace_goal`."""
    if interpret is None:
        use_pallas = _on_tpu()
        interpret = False
    else:
        use_pallas = True

    @jax.custom_batching.custom_vmap
    def walk(bp, goal_node, h_eff):
        if use_pallas:
            return _walk_flat(bp, goal_node.astype(jnp.int32),
                              h_eff.astype(jnp.int32), interpret=interpret)
        return jax.vmap(srch.backtrace)(bp, h_eff.astype(jnp.int32),
                                        goal_node.astype(jnp.int32))

    @walk.def_vmap
    def _walk_vmap(axis_size, in_batched, bp, goal_node, h_eff):
        def flat(x, b):
            if not b:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            return x.reshape((axis_size * x.shape[1],) + x.shape[2:])
        R = bp.shape[1] if in_batched[0] else bp.shape[0]
        nodes = walk(*[flat(x, b) for x, b in
                       zip((bp, goal_node, h_eff), in_batched)])
        return nodes.reshape(axis_size, R, nodes.shape[-1]), True

    return walk


def make_backtrace_goal(interpret: bool = None):
    """Row-stacked goal-select + backtrace with backend dispatch.

    Returns ``fn(best (R, H+1, N), bp (R, H+1, N), vg (R, H+1, N),
    h_eff (R,)) -> (nodes (R, H+1) int32, cost (R,))`` — the batched
    equivalent of ``pathgen.backtrace_slot``.  Wrapped with ``custom_vmap``
    so the scenario batch flattens into rows (one kernel launch).
    """
    # default: compiled Pallas on TPU, the scan walk elsewhere; an explicit
    # ``interpret=True`` forces the (interpreted) Pallas path for tests
    if interpret is None:
        use_pallas = _on_tpu()
        interpret = False
    else:
        use_pallas = True

    @jax.custom_batching.custom_vmap
    def bt(best, bp, vg, h_eff):
        R, Hp1, N = best.shape
        ohh = (jnp.arange(Hp1)[None, :] == h_eff[:, None]).astype(best.dtype)
        goal_tot = jnp.einsum('rh,rhn->rn', ohh, best + vg)
        goal_node = jnp.argmin(goal_tot, axis=-1).astype(jnp.int32)
        cost = jnp.take_along_axis(goal_tot, goal_node[:, None],
                                   axis=1)[:, 0]
        if use_pallas:
            nodes = _walk_flat(bp, goal_node, h_eff.astype(jnp.int32),
                               interpret=interpret)
        else:
            nodes = jax.vmap(srch.backtrace)(bp, h_eff.astype(jnp.int32),
                                             goal_node)
        return nodes, cost

    @bt.def_vmap
    def _bt_vmap(axis_size, in_batched, best, bp, vg, h_eff):
        def flat(x, b):
            if not b:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            return x.reshape((axis_size * x.shape[1],) + x.shape[2:])
        R = best.shape[1] if in_batched[0] else best.shape[0]
        out = bt(*[flat(x, b) for x, b in
                   zip((best, bp, vg, h_eff), in_batched)])
        nodes, cost = out
        return ((nodes.reshape(axis_size, R, nodes.shape[-1]),
                 cost.reshape(axis_size, R)), (True, True))

    return bt
