"""Pallas TPU kernel: the fully-fused masked 4-slot window DP.

``planner/pathgen.plan_window_kernel`` expresses the per-tick search as a
``lax.scan`` over window steps; under ``vmap`` every step gathers each
scenario's (N, N) cost slab out of the global ``(L, N, N)`` tensor from HBM
— the dominant cost of the search stage at large batch.  This kernel keeps
the track cost tensor (L x N^2 f32, ~0.5 MB) VMEM-resident and selects each
scenario's layer slab with a one-hot matmul on the MXU.

Round-4 layout (r3 ran H statically unrolled inside one grid step at
BLOCK_B=8; profiling showed the per-op issue overhead of 8-row tiles and
the in-kernel zone one-hot selects over the full (BB, L, N) zone tensor
dominating):

  * The window-step axis becomes the minor GRID dimension with the DP
    frontier carried in persistent VMEM scratch (grid iterations execute
    sequentially on a TPU core), so per-step inputs are STREAMED one step
    at a time and BLOCK_B rises 8 -> 128: every elementwise op runs on
    128/512-row tiles and the MXU dots use full 128-row tiles.
  * Mask inputs arrive FACTORED, built by three XLA einsums (step-major,
    nothing transposed): per-step zone row/col vectors (H, B, N) selected
    over the layer axis (k = L, efficient MXU), and the per-step object
    block counts (H, B, N*N) bf16 from ONE exact 0/1 contraction over the
    2*O slab slots.  The kernel expands zones with one tiny 0/1 dot + a
    lane tile, and rebuilds the overtake split masks from scalars — the
    r3 path materialized a priority-packed (B, H, N*N) mask through an
    unfused 8-stage elementwise chain instead.
  * The w_last discount lookup collapses to one flat-edge-id compare
    against a precomputed (H, B) edge-id table (factor 1.0 where inactive
    — exact, as ``w * 1.0 == w`` in f32).
  * Both cost dots run at ``Precision.HIGHEST``: the Mosaic MXU computes
    f32 dots in bf16 by default, which rounds the selected costs (~2
    decimal digits) and flips DP argmins — caught on hardware by
    tools/pallas_parity.py (the recurring artifact gate).

Mosaic layout strategy: everything stays in the **flat edge layout**
``(BLOCK_B, N*N)`` with flat index ``n * N + m`` (lane-splitting reshapes
like (B, N^2) -> (B, N, N) are unsupported).  The frontier row-broadcast is
a matmul with the constant 0/1 matrix ``R_row[n, n*N+m] = 1`` and the
min-plus reduction over the source node ``n`` is a log2(N) halving tree of
static lane slices with index tracking (ties resolve to the lower n,
matching ``jnp.argmin``).  All 4 action slots relax in one stacked
(4*BLOCK_B, NN) tile.

Mask semantics are identical to ``plan_window_kernel``'s scan step (zones,
previous-solution discount, object blocking, overtake splits,
gen_local_node_template.py:43-162); the per-scenario hit masks come from
``pathgen.window_prelude`` / ``ops.pallas_collision``.  Numerical
equivalence is asserted in tests/test_pallas_window.py and re-checked on
hardware every bench run (tools/pallas_parity.py ->
artifacts/PALLAS_PARITY.json).
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
BLOCK_B = 128
N_SLOTS = 4


def split3_bf16(x):
    """Exact bf16x3 split of an f32 tensor: hi + mid + lo == x (24 mantissa
    bits covered by three 8-bit bf16 parts).  A one-hot selection matmul
    against the three parts at DEFAULT precision reconstructs the f32
    values exactly in 3 MXU passes — half of Precision.HIGHEST's 6 (the
    one-hot operand is itself exact in bf16).

    The optimization barriers are load-bearing: this backend compiles with
    ``--xla_allow_excess_precision=true``, which lets XLA elide the bf16
    round-trips (hi "=" x, residuals 0) and collapse the split back into a
    single rounding bf16 dot — measured 1.5 m of path corruption before
    the barriers pinned each part."""
    ob = jax.lax.optimization_barrier
    hi = ob(x.astype(jnp.bfloat16))
    r1 = x - hi.astype(jnp.float32)
    mid = ob(r1.astype(jnp.bfloat16))
    lo = ob((r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16))
    return hi, mid, lo


def _sel3(oh_bf16, parts):
    """One-hot selection against a bf16x3-split table: exact f32 result.
    Precision is pinned to DEFAULT — the package-wide
    ``jax_default_matmul_precision=highest`` would otherwise attach an
    fp32 contract precision that Mosaic rejects on bf16 operands (and the
    bf16 single-pass product is already exact here)."""
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    return (jnp.dot(oh_bf16, parts[0], **kw)
            + jnp.dot(oh_bf16, parts[1], **kw)
            + jnp.dot(oh_bf16, parts[2], **kw))


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


def _kernel(w_ref, w3_ref, rrow_ref, ifn_ref, start_l_ref, start_n_ref,
            p_obs_ref, in_win_ref, obs_node_ref,
            zrow_ref, zcol_ref, obj_ref, ab_ref, fac_ref,
            best_ref, bp_ref, best_c,
            *, L, N, H, use_bf16x3):
    """One (batch-block, window-step) grid cell: select the step's cost
    slab, apply zones/discount/objects/overtake-splits, relax all 4 slots
    in one stacked tile, write the step's frontier + backpointers.
    ``best_c`` is the persistent VMEM carry of the 4-slot frontier.

    Streamed blocks are laid out step-major — zone vectors (H, Bp, N),
    object counts (H, Bp, NN) bf16, discount tables (H, Bp, 1), outputs
    (H, Bp, 4N) — so every block's trailing two dims satisfy the Mosaic
    (8, 128)-divisibility rule."""
    BB = start_l_ref.shape[0]
    NN = N * N
    h = pl.program_id(1)
    iota_L = jax.lax.broadcasted_iota(jnp.int32, (BB, L), 1)
    iota_N = jax.lax.broadcasted_iota(jnp.int32, (BB, N), 1)
    if_n = ifn_ref[:]                                    # (4BB, NN) row ids
    if_flat = jax.lax.broadcasted_iota(jnp.int32, (BB, NN), 1)
    if_nb = if_n[:BB]
    if_m = if_flat - if_nb * N

    start_l = start_l_ref[:, 0]                          # (BB,)
    start_n = start_n_ref[:, 0]

    # (re)initialize the frontier carry at the first window step of every
    # batch block (the scratch persists across the whole grid)
    @pl.when(h == 0)
    def _init():
        b0 = jnp.where(iota_N == start_n[:, None], 0.0, _INF)
        best_c[:] = jnp.concatenate([b0] * N_SLOTS, axis=0)

    # one-hot layer select of the step's cost slab — exact either via a
    # bf16x3-split table at DEFAULT precision (3 MXU passes, Mosaic) or an
    # f32 dot at HIGHEST (interpret mode: the CPU backend cannot execute
    # bf16 dots); see module docstring
    raw = start_l + h
    layer = jnp.where(raw >= L, raw - L, raw)            # conditional mod
    if use_bf16x3:
        oh_l = (iota_L == layer[:, None]).astype(jnp.bfloat16)
        w3 = w3_ref[:]
        w_l = _sel3(oh_l, (w3[0:L], w3[L:2 * L], w3[2 * L:3 * L]))
    else:
        oh_l = (iota_L == layer[:, None]).astype(jnp.float32)
        w_l = jnp.dot(oh_l, w_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)   # (BB, NN)

    # previous-solution discount: one flat-edge-id compare (fac == 1.0
    # where inactive — w * 1.0 == w exactly)
    ab = ab_ref[0, :, 0]                                 # (BB,)
    fac = fac_ref[0, :, 0]
    at_ab = if_flat == ab[:, None]
    w_disc = jnp.where(at_ab & (w_l < _FEAS), w_l * fac[:, None], w_l)

    # zone blocking: expand the step's (BB, N) zone vectors to edge space
    # — rows via a tiny 0/1 dot (exact in the default bf16 path), cols via
    # a lane tile
    zb_rows = jnp.dot(zrow_ref[0], rrow_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)   # (BB, NN)
    zcol = zcol_ref[0]                                       # (BB, N)
    zb_cols = jnp.concatenate([zcol] * N, axis=1)
    w_fol = jnp.where((zb_rows > 0.5) | (zb_cols > 0.5), _INF, w_disc)

    # object blocking (straight/left/right slots)
    w_def = jnp.where(obj_ref[0].astype(jnp.float32) > 0.5, _INF, w_fol)

    # overtake splits at the obstacle layer
    obs_node = obs_node_ref[:, 0]
    p_obs = p_obs_ref[:, 0]
    in_win = in_win_ref[:, 0] != 0
    left_cols = if_m >= obs_node[:, None]                    # (BB, NN)
    left_rows = if_nb >= obs_node[:, None]
    into = (in_win & (h == p_obs - 1))[:, None]
    outof = (in_win & (h == p_obs))[:, None]
    w_left = jnp.where((into & left_cols) | (outof & left_rows),
                       _INF, w_def)
    w_right = jnp.where((into & ~left_cols) | (outof & ~left_rows),
                        _INF, w_def)

    # all 4 slots relax in ONE stacked (4BB, NN) tile: one MXU dot and one
    # min/argmin halving tree
    w_stack = jnp.concatenate([w_def, w_fol, w_left, w_right], axis=0)
    if use_bf16x3:
        # frontier replicate: split the carry bf16x3 and run 3 DEFAULT
        # dots against the exact 0/1 bf16 R_row (reconstruction exact)
        bc = best_c[:]
        hi = bc.astype(jnp.bfloat16)
        r1 = bc - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        rr = rrow_ref[:].astype(jnp.bfloat16)
        kwd = dict(preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)
        rep = (jnp.dot(hi, rr, **kwd) + jnp.dot(mid, rr, **kwd)
               + jnp.dot(lo, rr, **kwd))
    else:
        rep = jnp.dot(best_c[:], rrow_ref[:],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)   # (4BB, NN)
    bn, bi = _min_argmin_over_n(rep + w_stack, N, if_n)
    bn = jnp.minimum(bn, _INF)
    best_c[:] = bn
    # slot-major lane concat: out row b carries [slot0 | slot1 | ...]
    best_ref[0] = jnp.concatenate(
        [bn[s * BB:(s + 1) * BB] for s in range(N_SLOTS)], axis=1)
    bp_ref[0] = jnp.concatenate(
        [bi[s * BB:(s + 1) * BB] for s in range(N_SLOTS)], axis=1)


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


def window_step_tables(zone_block, start_layer, slab_layers, hit_slab,
                       closed: bool, H: int, L: int, N: int):
    """Factored per-step mask tables, step-major (XLA prep for the kernel):

      zone_row (H, B, N) f32 — step's from-layer zone vector (off-end
          truncation of open tracks folded in, main_offline_callback:91-100)
      zone_col (H, B, N) f32 — step's to-layer zone vector
      obj      (H, B, N*N) bf16 — object block counts from ONE exact 0/1
          contraction over the 2*O slab slots (integer counts <= 2*O are
          exact in bf16)
    """
    B = start_layer.shape[0]
    hs = jnp.arange(H)
    win = jnp.mod(start_layer[None, :] + hs[:, None], L)     # (H, B)
    nxt = jnp.mod(win + 1, L)

    # bf16 operands on TPU (exact for 0/1 values and integer counts
    # <= 2*O); the CPU test backend cannot execute bf16 dots — use f32
    dt = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    zf = zone_block.astype(dt)                               # (B, L, N)
    oh_win = (win[:, :, None] == jnp.arange(L)[None, None, :]).astype(dt)
    oh_nxt = (nxt[:, :, None] == jnp.arange(L)[None, None, :]).astype(dt)
    zone_row = jnp.einsum('hbl,bln->hbn', oh_win, zf,
                          preferred_element_type=jnp.float32)
    zone_col = jnp.einsum('hbl,bln->hbn', oh_nxt, zf,
                          preferred_element_type=jnp.float32)
    if not closed:
        off_end = (start_layer[None, :] + hs[:, None]) >= (L - 1)
        zone_row = jnp.where(off_end[:, :, None], 1.0, zone_row)

    # merged slab-slot axis k = 2*O: one contraction instead of two
    sl2 = slab_layers.reshape(B, -1)                         # (B, 2O)
    isk = (win[:, :, None] == sl2[None, :, :]).astype(dt)
    hit2 = hit_slab.reshape(B, -1, N * N).astype(dt)
    obj = jnp.einsum('hbk,bkn->hbn', isk, hit2,
                     preferred_element_type=dt)
    return zone_row, zone_col, obj


@functools.partial(jax.jit,
                   static_argnames=("closed", "h_max", "interpret",
                                    "block_b"))
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
                    interpret: bool = None,
                    block_b: int = None):
    """Batched fused window DP.  Returns (best (B, 4, H+1, N),
    bp (B, 4, H+1, N) i32) — identical to stacking
    ``plan_window_kernel(...)['best'/'bp']`` over the batch."""
    if interpret is None:
        interpret = not _on_tpu()
    if block_b is None:
        block_b = BLOCK_B
    L, N_in, _ = w.shape
    B = start_layer.shape[0]
    H = h_max
    n_last = last_nodes.shape[1]

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

    BB = min(block_b, max(8, 1 << (B - 1).bit_length()))
    pad = (-B) % BB
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

    # factored per-step tables + discount tables (XLA; the kernel streams
    # them one window step at a time, step-major for Mosaic block rules)
    zone_row, zone_col, obj = window_step_tables(
        zone_block, start_layer, slab_layers, hit_slab, closed, H, L, N)
    hs = jnp.arange(H)
    ia = jnp.clip(hs, 0, n_last - 1)
    ib = jnp.clip(hs + 1, 0, n_last - 1)
    a = last_nodes[:, ia]                                    # (Bp, H)
    b = last_nodes[:, ib]
    fac = w_last_factors[jnp.clip(hs, 0, n_last - 2)][None, :]
    apply = (hs[None, :] < n_last - 1) & (a >= 0) & (b >= 0)
    ab_tab = jnp.where(apply, a * N + b, -1).astype(jnp.int32).T[:, :, None]
    fac_tab = jnp.where(apply, fac, 1.0).astype(jnp.float32).T[:, :, None]

    # constant broadcast matrix R_row[n, n*N+m] = 1 and flat row ids
    r_row = jnp.asarray(np.kron(np.eye(N), np.ones((1, N))), jnp.float32)
    if_n = jnp.asarray(
        np.tile(np.arange(N * N) // N, (N_SLOTS * BB, 1)), jnp.int32)

    kern = functools.partial(_kernel, L=L, N=N, H=H,
                             use_bf16x3=not interpret)
    grid = (Bp // BB, H)
    w_flat = w.reshape(L, N * N)
    w3 = jnp.concatenate(split3_bf16(w_flat), axis=0)     # (3L, NN) bf16

    def row(_):          # per-scenario scalar -> (BB, 1) VMEM block
        return pl.BlockSpec((BB, 1), lambda i, h: (i, 0),
                            memory_space=pltpu.VMEM)

    def row_h(_):        # per-(step, scenario) scalar -> (1, BB, 1) block
        return pl.BlockSpec((1, BB, 1), lambda i, h: (h, i, 0),
                            memory_space=pltpu.VMEM)

    def step_tab(width):  # per-(step, scenario) vector -> (1, BB, width)
        return pl.BlockSpec((1, BB, width), lambda i, h: (h, i, 0),
                            memory_space=pltpu.VMEM)

    best_s, bp_s = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, N * N), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * L, N * N), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N * N), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_SLOTS * BB, N * N), lambda i, h: (0, 0),
                         memory_space=pltpu.VMEM),
            row(None), row(None), row(None), row(None), row(None),
            step_tab(N), step_tab(N), step_tab(N * N),
            row_h(None), row_h(None),
        ],
        out_specs=[
            pl.BlockSpec((1, BB, N_SLOTS * N), lambda i, h: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB, N_SLOTS * N), lambda i, h: (h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, Bp, N_SLOTS * N), jnp.float32),
            jax.ShapeDtypeStruct((H, Bp, N_SLOTS * N), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((N_SLOTS * BB, N), jnp.float32)],
        interpret=interpret,
    )(w_flat, w3, r_row, if_n,
      start_layer[:, None].astype(jnp.int32),
      start_node[:, None].astype(jnp.int32),
      p_obs[:, None].astype(jnp.int32),
      in_win[:, None].astype(jnp.int32),
      obs_node[:, None].astype(jnp.int32),
      zone_row, zone_col, obj, ab_tab, fac_tab)

    # (H, Bp, 4N) step-major lane-concat layout -> (Bp, 4, H, N)
    best_s = jnp.moveaxis(best_s.reshape(H, Bp, N_SLOTS, N), (1, 2), (0, 1))
    bp_s = jnp.moveaxis(bp_s.reshape(H, Bp, N_SLOTS, N), (1, 2), (0, 1))

    # h = 0 frontier (trivial one-hot) + the kernel's H step frontiers
    iN = jnp.arange(N)
    best0 = jnp.where(iN[None, :] == start_node[:, None], 0.0, _INF)
    best0 = jnp.broadcast_to(best0[:, None, None, :], (Bp, N_SLOTS, 1, N))
    bp0 = jnp.full((Bp, N_SLOTS, 1, N), -1, jnp.int32)
    best = jnp.concatenate([best0, best_s], axis=2)
    bp = jnp.concatenate([bp0, bp_s], axis=2)
    return best[:B, :, :, :N_in], bp[:B, :, :, :N_in]
