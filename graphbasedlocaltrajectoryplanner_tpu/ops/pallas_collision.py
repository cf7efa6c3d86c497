"""Pallas TPU kernel: batched object->edge slab hit masks.

``planner/pathgen.window_prelude`` marks, per scenario and object, which
edges of the two layer slabs {obj_layer-1, obj_layer} an object blocks
(reference semantics: any sampled spline point within the inflated radius,
GraphBase.py:614-646).  Expressed in XLA that is a batched gather of
``(O, 2, N, N, S, 2)`` sample slabs followed by a distance reduction —
the gather materializes ~1 MB per scenario in HBM and dominated the search
stage (~19 ms of a 55 ms tick at batch 1024).

This kernel streams each scenario's 2*O sample slabs straight from HBM into
VMEM (one auto-pipelined BlockSpec ref per slab, row selected via scalar-
prefetched layer indices) and reduces them in registers, writing only the
``(2*O, N*N)`` boolean result — a single pass at HBM speed of light with no
materialized intermediates.

Layout: the lattice sample table is pre-transposed once per engine build to
``(L, 2*S, N*N)`` f32 — x coordinates in rows [0, S), y in rows [S, 2S),
flat edge index ``n * N + m`` in lanes (matching ops/pallas_window.py's
flat edge layout).  N*N = 1024 lanes tiles perfectly.

Numerics are bit-identical to the XLA formulation: d2 = (x-ox)^2 + (y-oy)^2
in f32, min over S, compare against the same inflated radius.  Equivalence
is pinned in tests/test_pallas_collision.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_samples_t(samples_xy) -> jnp.ndarray:
    """(L, N, N, S, 2) sample table -> kernel layout (L, 2*S, N*N) f32.

    Host-side, once per engine construction (parallel/scenario.py)."""
    a = np.asarray(samples_xy, np.float32)
    L, N, _, S, _ = a.shape
    x = a[..., 0].transpose(0, 3, 1, 2).reshape(L, S, N * N)
    y = a[..., 1].transpose(0, 3, 1, 2).reshape(L, S, N * N)
    return jnp.asarray(np.concatenate([x, y], axis=1))


def _kernel(slab_ref, par_ref, *refs, O, S):
    out_ref = refs[-1]
    for o in range(O):
        ox = par_ref[0, 0, o]
        oy = par_ref[0, 0, O + o]
        r2 = par_ref[0, 0, 2 * O + o]
        app = par_ref[0, 0, 3 * O + o]
        for j in range(2):
            blk = refs[2 * o + j][0]               # (2S, NN)
            dx = blk[:S] - ox
            dy = blk[S:] - oy
            d2 = dx * dx + dy * dy                 # (S, NN)
            dmin = jnp.min(d2, axis=0, keepdims=True)          # (1, NN)
            hit = (dmin <= r2).astype(jnp.float32) * app
            out_ref[:, 2 * o + j, :] = hit


def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hit_slab_pallas(samples_t,     # (L, 2*S, N*N) f32 (build_samples_t)
                    slab_layers,   # (B, O, 2) i32 — {obj_layer-1, obj_layer}
                    obj_pos,       # (B, O, 2) f32
                    ref2,          # (B, O) f32 inflated radius^2
                    obj_app,       # (B, O) bool — active & in planning range
                    interpret: bool = None):
    """Batched slab hit masks: (B, O, 2, N, N) bool, bit-identical to the
    XLA path in ``pathgen.window_prelude``."""
    if interpret is None:
        interpret = not _on_tpu()
    L, S2, NN = samples_t.shape
    S = S2 // 2
    N = math.isqrt(NN)
    B, O, _ = slab_layers.shape

    # scalar-prefetch operands live whole in SMEM and are row-padded —
    # keep the slab table (2*O, B) so it stays a few KB
    slab_flat = jnp.clip(slab_layers.reshape(B, 2 * O), 0, L - 1) \
        .astype(jnp.int32).T                                   # (2*O, B)
    params = jnp.concatenate(
        [obj_pos[:, :, 0], obj_pos[:, :, 1],
         ref2.astype(jnp.float32),
         obj_app.astype(jnp.float32)], axis=1)[:, None, :]     # (B, 1, 4*O)

    def smap(k):
        return lambda b, slab: (slab[k, b], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, 4 * O), lambda b, slab: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ] + [
            pl.BlockSpec((1, S2, NN), smap(k), memory_space=pltpu.VMEM)
            for k in range(2 * O)
        ],
        out_specs=pl.BlockSpec((1, 2 * O, NN), lambda b, slab: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    hit = pl.pallas_call(
        functools.partial(_kernel, O=O, S=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 2 * O, NN), jnp.float32),
        interpret=interpret,
    )(slab_flat, params, *([samples_t] * (2 * O)))
    return (hit != 0.0).reshape(B, O, 2, N, N)
