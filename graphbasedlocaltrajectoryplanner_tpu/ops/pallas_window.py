"""Pallas TPU kernel: the fully-fused masked 4-slot window DP.

``planner/pathgen.plan_window_kernel`` expresses the per-tick search as a
``lax.scan`` over window steps; under ``vmap`` every step gathers each
scenario's (N, N) cost slab out of the global ``(L, N, N)`` tensor from HBM
— the dominant cost of the search stage at large batch.  This kernel keeps
the ENTIRE track cost tensor (L x N^2 f32, ~0.5 MB) plus the zone table
VMEM-resident and selects each scenario's layer slab with a one-hot matmul
on the MXU, so the H-step DP for a block of scenarios runs without touching
HBM (outputs stream once at the end).

Mosaic layout strategy: everything stays in the **flat edge layout**
``(BLOCK_B, N*N)`` with flat index ``n * N + m`` (lane-splitting reshapes
like (B, N^2) -> (B, N, N) are unsupported).  Row/column broadcasts become
matmuls with constant 0/1 matrices (``R_row[n, n*N+m] = 1``,
``R_col[m, n*N+m] = 1``) or flat-iota comparisons, and the min-plus
reduction over the source node ``n`` is a log2(N) halving tree of static
lane slices with index tracking (ties resolve to the lower n, matching
``jnp.argmin``).

Mask semantics are identical to ``plan_window_kernel``'s scan step (zones,
previous-solution discount, object blocking, overtake splits); the
per-scenario hit masks come from ``pathgen.window_prelude`` /
``ops.pallas_collision`` and are folded into one per-window blocked mask
(exact 0/1 MXU contraction over objects) before the kernel, so per-step
blocking is O-independent.  The window-step loop is a static python unroll
(dynamic sublane-indexed stores cost tens of cycles in Mosaic) and all 4
action slots relax in one stacked (4*BB, NN) tile.  Numerical equivalence
is asserted in tests/test_pallas_window.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e30          # python literals — kernels cannot capture jnp values
_FEAS = 1e29
BLOCK_B = 8
N_SLOTS = 4


def _min_argmin_over_n(x, N, if_n=None):
    """(BB, N*N) flat n-major -> (min over n (BB, N), argmin over n (BB, N))
    via a halving tree of static lane slices (no reshapes).  Ties pick the
    lower n (jnp.argmin semantics).  ``if_n``: (1, N*N) flat row ids."""
    if if_n is None:
        if_n = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) // N)
    idx = if_n
    width = x.shape[1]
    while width > N:
        half = width // 2
        lo_v, hi_v = x[:, :half], x[:, half:width]
        lo_i, hi_i = idx[:, :half], idx[:, half:width]
        take_hi = (hi_v < lo_v) | ((hi_v == lo_v) & (hi_i < lo_i))
        x = jnp.where(take_hi, hi_v, lo_v)
        idx = jnp.where(take_hi, hi_i, lo_i)
        width = half
    return x, idx


def _kernel(w_ref, zone_ref, fac_ref, rrow_ref, rcol_ref, ifn_ref, ifm_ref,
            start_l_ref, start_n_ref, blocked_ref,
            p_obs_ref, in_win_ref, obs_node_ref, last_ref,
            best_ref, bp_ref, *, L, N, H, n_last, closed):
    BB = start_l_ref.shape[0]
    NN = N * N
    iota_L = jax.lax.broadcasted_iota(jnp.int32, (BB, L), 1)
    iota_N = jax.lax.broadcasted_iota(jnp.int32, (BB, N), 1)

    start_l = start_l_ref[:, 0]                          # (BB,)
    start_n = start_n_ref[:, 0]
    w_flat = w_ref[:]                                    # (L, N*N)
    zone = zone_ref[:]                                   # (BB, L, N) f32 1=blocked
    r_row = rrow_ref[:]                                  # (N, N*N) R_row
    r_col = rcol_ref[:]                                  # (N, N*N) R_col
    if_n = ifn_ref[:]                                    # (BB, NN) flat n ids
    if_m = ifm_ref[:]                                    # (BB, NN) flat m ids
    last = last_ref[:]                                   # (BB, n_last) i32
    facs = fac_ref[:]                                    # (BB, n_last-1) f32
    in_win = in_win_ref[:, 0] != 0
    p_obs = p_obs_ref[:, 0]
    obs_node = obs_node_ref[:, 0]

    best0 = jnp.where(iota_N == start_n[:, None], 0.0, _INF)    # (BB, N)
    for s in range(N_SLOTS):
        best_ref[:, s * (H + 1), :] = best0
        bp_ref[:, s * (H + 1), :] = jnp.full((BB, N), -1, jnp.int32)

    # overtake split masks in flat space (elementwise, no broadcast matmuls)
    left_cols = if_m >= obs_node[:, None]                # (BB, NN)
    left_rows = if_n >= obs_node[:, None]
    right_cols = jnp.logical_not(left_cols)
    right_rows = jnp.logical_not(left_rows)

    iota_nl = jax.lax.broadcasted_iota(jnp.int32, (BB, n_last), 1)

    def step(h, best):
        # best: tuple of 4 (BB, N) slot frontiers
        # start_l < L and h < H <= L so a conditional subtract replaces the
        # mod (integer rem is not lowerable here)
        raw = start_l + h
        layer = jnp.where(raw >= L, raw - L, raw)
        nxt0 = layer + 1
        nxt = jnp.where(nxt0 >= L, nxt0 - L, nxt0)
        oh_l = (iota_L == layer[:, None]).astype(jnp.float32)
        oh_n = (iota_L == nxt[:, None]).astype(jnp.float32)
        w_l = jnp.dot(oh_l, w_flat,
                      preferred_element_type=jnp.float32)   # (BB, NN)
        if not closed:
            off_end = (start_l + h >= L - 1).astype(jnp.float32)
            w_l = jnp.where(off_end[:, None] > 0.5, _INF, w_l)
        # per-scenario zone tables: one-hot layer select (elementwise —
        # each scenario owns its own (L, N) zone mask)
        zb_l = jnp.sum(oh_l[:, :, None] * zone, axis=1)
        zb_n = jnp.sum(oh_n[:, :, None] * zone, axis=1)
        zb_rows = jnp.dot(zb_l, r_row,
                          preferred_element_type=jnp.float32)   # (BB, NN)
        zb_cols = jnp.dot(zb_n, r_col,
                          preferred_element_type=jnp.float32)
        w_base = jnp.where((zb_rows > 0.5) | (zb_cols > 0.5), _INF, w_l)

        # previous-solution discount (comparison-sum lookups into the tiny
        # per-scenario chain; dynamic ref indexing is avoided)
        ia = jnp.minimum(h, n_last - 1)
        ib = jnp.minimum(h + 1, n_last - 1)
        a = jnp.sum(jnp.where(iota_nl == ia, last, 0), axis=1)     # (BB,)
        b = jnp.sum(jnp.where(iota_nl == ib, last, 0), axis=1)
        ifc = jnp.minimum(h, n_last - 2)
        fac = jnp.sum(jnp.where(iota_nl[:, :n_last - 1] == ifc, facs, 0.0),
                      axis=1)                                      # (BB,)
        apply = ((h < n_last - 1) & (a >= 0) & (b >= 0)) \
            .astype(jnp.float32)                                   # (BB,)
        at_ab = (if_n == a[:, None]) & (if_m == b[:, None])
        w_base = jnp.where(at_ab & (apply[:, None] > 0.5)
                           & (w_base < _FEAS),
                           w_base * fac[:, None], w_base)

        # object edge blocking (straight/left/right slots): precomputed
        # per-window mask (one bf16 one-hot matmul outside the kernel) —
        # O-independent, statically indexed after the unroll
        blocked = blocked_ref[:, h, :]                   # (BB, NN) f32
        w_def = jnp.where(blocked > 0.5, _INF, w_base)

        # overtake splits at the obstacle layer
        into = (in_win & (h == p_obs - 1)).astype(jnp.float32)[:, None]
        outof = (in_win & (h == p_obs)).astype(jnp.float32)[:, None]
        w_left = jnp.where(((into > 0.5) & left_cols)
                           | ((outof > 0.5) & left_rows), _INF, w_def)
        w_right = jnp.where(((into > 0.5) & right_cols)
                            | ((outof > 0.5) & right_rows), _INF, w_def)

        # all 4 slots relax in ONE stacked (4*BB, NN) tile: one MXU dot and
        # one min/argmin halving tree instead of four — the tree's per-op
        # issue overhead amortizes over 4x-taller tiles
        w_stack = jnp.concatenate([w_def, w_base, w_left, w_right], axis=0)
        rep = jnp.dot(best, r_row,
                      preferred_element_type=jnp.float32)      # (4BB, NN)
        bn, bi = _min_argmin_over_n(rep + w_stack, N, if_n4)
        bn = jnp.minimum(bn, _INF)
        for s in range(N_SLOTS):
            best_ref[:, s * (H + 1) + h + 1, :] = bn[s * BB:(s + 1) * BB]
            bp_ref[:, s * (H + 1) + h + 1, :] = bi[s * BB:(s + 1) * BB]
        return bn

    if_n4 = jnp.concatenate([if_n] * N_SLOTS, axis=0)
    # static python unroll over the window steps: H is small and static,
    # and dynamic sublane-indexed stores cost tens of cycles each in
    # Mosaic (8 stores/step — the same pattern that made the v1 velocity
    # kernel slower than the XLA scan)
    best = jnp.concatenate([best0] * N_SLOTS, axis=0)
    for h in range(H):
        best = step(h, best)


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


@functools.partial(jax.jit,
                   static_argnames=("closed", "h_max", "interpret"))
def fused_window_dp(w,             # (L, N, N) f32 offline costs (INF absent)
                    zone_block,    # (L, N) bool shared or (B, L, N) per-scenario
                    start_layer,   # (B,) i32
                    start_node,    # (B,) i32
                    slab_layers,   # (B, O, 2) i32
                    hit_slab,      # (B, O, 2, N, N) bool
                    p_obs,         # (B,) i32
                    in_win,        # (B,) bool
                    obs_node,      # (B,) i32
                    last_nodes,    # (B, n_last) i32
                    w_last_factors,  # (n_last - 1,) f32
                    closed: bool,
                    h_max: int,
                    interpret: bool = None):
    """Batched fused window DP.  Returns (best (B, 4, H+1, N),
    bp (B, 4, H+1, N) i32) — identical to stacking
    ``plan_window_kernel(...)['best'/'bp']`` over the batch."""
    if interpret is None:
        interpret = not _on_tpu()
    L, N_in, _ = w.shape
    B = start_layer.shape[0]
    H = h_max
    n_last = last_nodes.shape[1]
    O = hit_slab.shape[1]

    # per-scenario zone masks (VERDICT r2 item 6): a shared (L, N) mask is
    # broadcast; a (B, L, N) batch gives every fleet member its own zones
    if zone_block.ndim == 2:
        zone_block = jnp.broadcast_to(zone_block[None], (B,) + zone_block.shape)

    # the flat min/argmin halving tree needs N * 2^k lanes: pad the node
    # axis to the next power of two (padded nodes carry INF cost rows/cols
    # and can never win)
    N = 1 << (N_in - 1).bit_length()
    if N != N_in:
        pn = N - N_in
        w = jnp.pad(w, ((0, 0), (0, pn), (0, pn)),
                    constant_values=float(_INF))
        zone_block = jnp.pad(zone_block, ((0, 0), (0, 0), (0, pn)))
        hit_slab = jnp.pad(hit_slab,
                           ((0, 0), (0, 0), (0, 0), (0, pn), (0, pn)))

    # constant broadcast matrices: R_row[n, n*N+m] = 1, R_col[m, n*N+m] = 1
    r_row = jnp.asarray(np.kron(np.eye(N), np.ones((1, N))), jnp.float32)
    r_col = jnp.asarray(np.tile(np.eye(N), (1, N)), jnp.float32)
    flat = np.arange(N * N)
    if_n = jnp.asarray(np.tile(flat // N, (BLOCK_B, 1)), jnp.int32)
    if_m = jnp.asarray(np.tile(flat % N, (BLOCK_B, 1)), jnp.int32)

    pad = (-B) % BLOCK_B
    if pad:
        def _pad(x, val=0):
            return jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], val, x.dtype)])
        start_layer = _pad(start_layer)
        start_node = _pad(start_node)
        zone_block = _pad(zone_block, False)
        slab_layers = _pad(slab_layers, -1)
        hit_slab = _pad(hit_slab, False)
        p_obs = _pad(p_obs)
        in_win = _pad(in_win, False)
        obs_node = _pad(obs_node)
        last_nodes = _pad(last_nodes, -1)
    Bp = start_layer.shape[0]

    # fold the per-object slab hit masks into ONE per-window blocked mask
    # (exact 0/1 contraction over objects on the MXU) so the kernel's
    # per-step blocking is O-independent and statically indexed
    win = jnp.mod(start_layer[:, None] + jnp.arange(H)[None, :], L)
    is0 = (win[:, :, None] == slab_layers[:, None, :, 0]).astype(jnp.bfloat16)
    is1 = (win[:, :, None] == slab_layers[:, None, :, 1]).astype(jnp.bfloat16)
    hit_f = hit_slab.reshape(Bp, -1, 2, N * N).astype(jnp.bfloat16)
    # exact: 0/1 operands, integer accumulation <= O in f32
    blocked_win = (
        jnp.einsum('bho,bon->bhn', is0, hit_f[:, :, 0],
                   preferred_element_type=jnp.float32)
        + jnp.einsum('bho,bon->bhn', is1, hit_f[:, :, 1],
                     preferred_element_type=jnp.float32))

    kern = functools.partial(_kernel, L=L, N=N, H=H, n_last=n_last,
                             closed=closed)
    grid = (Bp // BLOCK_B,)

    def row(_):          # per-scenario scalar -> (B, 1) VMEM block
        return pl.BlockSpec((BLOCK_B, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    best, bp = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, N * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, L, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, n_last - 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, N * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, N * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            row(None), row(None),
            pl.BlockSpec((BLOCK_B, H, N * N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            row(None), row(None), row(None),
            pl.BlockSpec((BLOCK_B, n_last), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_B, N_SLOTS * (H + 1), N),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, N_SLOTS * (H + 1), N),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, N_SLOTS * (H + 1), N), jnp.float32),
            jax.ShapeDtypeStruct((Bp, N_SLOTS * (H + 1), N), jnp.int32),
        ],
        interpret=interpret,
    )(w.reshape(L, N * N),
      zone_block.astype(jnp.float32),
      jnp.tile(w_last_factors.astype(jnp.float32)[None, :], (BLOCK_B, 1)),
      r_row, r_col, if_n, if_m,
      start_layer[:, None].astype(jnp.int32),
      start_node[:, None].astype(jnp.int32),
      blocked_win,
      p_obs[:, None].astype(jnp.int32),
      in_win[:, None].astype(jnp.int32),
      obs_node[:, None].astype(jnp.int32),
      last_nodes.astype(jnp.int32))
    best = best.reshape(Bp, N_SLOTS, H + 1, N)
    bp = bp.reshape(Bp, N_SLOTS, H + 1, N)
    return best[:B, :, :, :N_in], bp[:B, :, :, :N_in]
