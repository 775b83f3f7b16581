"""Fused two-layer tower backward (VERDICT r4/5: the towers_bwd slack).

The flagship towers are 2-layer ReLU MLPs ([128] -> [128] -> [64], final
activation ON — `models/mlp.py`). Their XLA backward reads the saved
activations from HBM, runs 4 matmuls + 2 elementwise masks as separate
fusions, and round-trips d_pooled — measured 1.81 ms (with dense Adam)
against a ~1.3 ms byte/FLOP floor at bs=262k bf16 (DESIGN §8a).

This kernel runs the WHOLE tower backward in one Pallas grid over batch
tiles:

- activations are RECOMPUTED in VMEM from the pooled input (two small
  matmuls per tile — MXU is not the bottleneck here), so h1/out never
  touch HBM in either direction;
- the weight/bias gradients accumulate across tiles in f32 VMEM scratch
  and are written once at the last tile;
- d_pooled (the only O(B) output) is written once per tile, in the wire
  dtype the sparse-update kernels consume (bf16 in bf16 mode).

All matmuls use bf16 operands with f32 accumulation — the same numerics
class as the XLA bf16-compute backward it replaces. The second layer's
64-wide dim is zero-padded to 128 lanes (zeros contribute exact zero
gradients).

Shape contract (the flagship class): D_in == H1 == 128 lanes exactly,
H2 <= 128, batch a multiple of the 512-row minimum tile. `fits()` gates routing;
anything else falls back to XLA autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048  # preferred; falls to 512 when the batch requires
MIN_TILE = 512
_LANE = 128


def fits(d_in: int, h1: int, h2: int, batch: int) -> bool:
    return (d_in == _LANE and h1 == _LANE and 0 < h2 <= _LANE
            and batch % MIN_TILE == 0)


def _mm(a, b, ta=False, tb=False):
    """bf16-operand matmul, f32 accumulation (one MXU pass)."""
    dims = ((1,) if not ta else (0,), (0,) if not tb else (1,))
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(x_ref, dq_ref, out_ref, w1_ref, b1_ref, w2_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dw1_acc, db1_acc, dw2_acc, db2_acc, *, out_dtype):
    t = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(t == 0)
    def _():
        dw1_acc[:] = jnp.zeros_like(dw1_acc)
        db1_acc[:] = jnp.zeros_like(db1_acc)
        dw2_acc[:] = jnp.zeros_like(dw2_acc)
        db2_acc[:] = jnp.zeros_like(db2_acc)

    x = x_ref[:]            # [T, 128] input tile (pooled), any float dtype
    w1 = w1_ref[:]          # [128, 128]
    b1 = b1_ref[:]          # [1, 128]
    w2 = w2_ref[:]          # [128, 128] (H2 zero-padded)
    # the final-relu mask applies IN KERNEL from the saved output tile
    # (both stream as their native narrow dtype — no f32 [B, 128] dq
    # round-trip on HBM)
    dq = jnp.where(out_ref[:].astype(jnp.float32) > 0.0,
                   dq_ref[:].astype(jnp.float32), 0.0)

    # recompute forward in VMEM, mirroring apply_mlp's dtype decisions
    # EXACTLY: pre1 = bf16(f32-accum matmul) + bf16 bias (bf16 add), so the
    # layer-1 relu mask and the saved-h1 operand match the XLA backward
    # bit-for-bit (a f32 mask flips rows near zero — 0.1%-class grad
    # divergence the oracle test caught).
    pre1 = _mm(x, w1).astype(jnp.bfloat16) + b1.astype(jnp.bfloat16)
    # compare/select in f32 (Mosaic rejects bf16 comparisons on v5e:
    # "Target does not support this comparison"); the f32 cast of a
    # bf16-valued number is exact, so the mask decision is still the
    # forward's bf16 one bit-for-bit
    pre1f = pre1.astype(jnp.float32)
    h1 = jnp.maximum(pre1f, 0.0)             # == fwd's relu(bf16 pre1), exact

    d2 = dq                                  # [T, 128] out-masked above
    dh1 = _mm(d2, w2, tb=True)               # [T, 128]
    d1 = jnp.where(pre1f > 0.0, dh1, 0.0)    # relu' of layer 1 (bf16 decision)
    dx_ref[:] = _mm(d1, w1, tb=True).astype(out_dtype)

    dw1_acc[:] += _mm(x, d1, ta=True)        # [128, 128]
    db1_acc[:] += jnp.sum(d1, axis=0, keepdims=True)
    dw2_acc[:] += _mm(h1, d2, ta=True)       # [128, 128]
    db2_acc[:] += jnp.sum(d2, axis=0, keepdims=True)

    @pl.when(t == last)
    def _():
        dw1_ref[:] = dw1_acc[:]
        db1_ref[:] = db1_acc[:]
        dw2_ref[:] = dw2_acc[:]
        db2_ref[:] = db2_acc[:]


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def tower_backward_fused(
    x: jax.Array,      # [B, 128] pooled tower input
    dq: jax.Array,     # [B, H2] raw cotangent (native dtype; masked in-kernel)
    out: jax.Array,    # [B, H2] the SAVED forward output (final-relu mask)
    w1: jax.Array,     # [128, 128]
    b1: jax.Array,     # [128]
    w2: jax.Array,     # [128, H2]
    *,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """(dx [B,128] out_dtype, dw1, db1, dw2, db2) — f32 weight grads."""
    if interpret is None:
        from two_tower_recommender_model_tpu.ops.block_sorted import (
            _auto_interpret,
        )

        interpret = _auto_interpret()
    b, d = x.shape
    h2 = w2.shape[1]
    pad2 = _LANE - h2
    w2p = jnp.pad(w2.astype(jnp.float32), ((0, 0), (0, pad2))) if pad2 else w2
    # padded columns: out pads to 0 -> mask false -> their dq is ignored
    dqp = jnp.pad(dq, ((0, 0), (0, pad2))) if pad2 else dq
    outp = jnp.pad(out, ((0, 0), (0, pad2))) if pad2 else out
    tile = TILE if b % TILE == 0 else MIN_TILE
    grid = b // tile
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, out_dtype=jnp.dtype(out_dtype)),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, _LANE), lambda t: (t, 0)),
            pl.BlockSpec((tile, _LANE), lambda t: (t, 0)),
            pl.BlockSpec((tile, _LANE), lambda t: (t, 0)),
            pl.BlockSpec((_LANE, _LANE), lambda t: (0, 0)),
            pl.BlockSpec((1, _LANE), lambda t: (0, 0)),
            pl.BlockSpec((_LANE, _LANE), lambda t: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, _LANE), lambda t: (t, 0)),
            pl.BlockSpec((_LANE, _LANE), lambda t: (0, 0)),
            pl.BlockSpec((1, _LANE), lambda t: (0, 0)),
            pl.BlockSpec((_LANE, _LANE), lambda t: (0, 0)),
            pl.BlockSpec((1, _LANE), lambda t: (0, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((b, _LANE), jnp.dtype(out_dtype)),
            jax.ShapeDtypeStruct((_LANE, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((_LANE, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((1, _LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_LANE, _LANE), jnp.float32),
            pltpu.VMEM((1, _LANE), jnp.float32),
            pltpu.VMEM((_LANE, _LANE), jnp.float32),
            pltpu.VMEM((1, _LANE), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(x, dqp, outp, w1.astype(jnp.float32), b1.astype(jnp.float32)[None, :],
      w2p)
    return (dx, dw1, db1[0], dw2[:, :h2] if pad2 else dw2,
            db2[0, :h2] if pad2 else db2[0])
