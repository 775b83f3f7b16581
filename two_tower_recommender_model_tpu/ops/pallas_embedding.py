"""Pallas TPU kernel: fused pooled embedding lookup (gather + weighted pool).

The TPU-native counterpart of fbgemm-gpu's pooled `EmbeddingBag` forward
(exercised by the reference at `03_model_training.py:417`): for each sample,
DMA the bag's rows straight from the HBM-resident table into VMEM and
accumulate the weighted sum on the VPU — the `[B, L, D]` gathered intermediate
never touches HBM, so traffic is `B*L*D` reads + `B*D` writes (vs the
unfused gather->mask->sum chain when XLA fails to fuse).

Design (see /opt/skills/guides/pallas_guide.md):
- ids arrive via `PrefetchScalarGridSpec` scalar prefetch, so row addresses
  are known before the kernel body runs and can drive DMA issue;
- the table stays in HBM (`pltpu.ANY`); rows are copied with
  `make_async_copy` into an NBUF-deep ring of VMEM row buffers (double
  buffering generalized to depth 8 to hide DMA latency);
- grid over batch tiles; each program pools TILE_B samples into its VMEM
  output block.

Status: measured on v5e, XLA's native dynamic-gather ties or beats this
kernel at training shapes (it is already DMA-pipelined, and the mask-multiply
-sum epilogue fuses), so the TRAINING PATH USES THE XLA LOOKUP — this kernel
is an opt-in alternative (`pooled_lookup_auto`, or
`TTRM_TPU_PALLAS_LOOKUP=1` to route `ops.embedding_ops.pooled_lookup`
through it) and the substrate for future quantized-table variants. See
DESIGN.md §6.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBUF = 8  # DMA pipeline depth


def _pooled_kernel(ids_ref, w_ref, table_ref, out_ref, rows, sems, *, tile_b, bag_l):
    """One grid step: pool `tile_b` samples (bag length `bag_l`) from HBM.

    ids_ref: [TILE_B, L] int32 in SMEM (blocked per grid step — whole-array
             scalar prefetch overflows the ~1MB SMEM at training batch sizes)
    w_ref:   [TILE_B, L] f32 in VMEM (per-slot pool weights; 0 = dead slot)
    table_ref: [N, D] in HBM/ANY
    out_ref: [TILE_B, D] VMEM
    rows:    [NBUF, D] VMEM scratch ring
    sems:    [NBUF] DMA semaphores
    """
    total = tile_b * bag_l

    def row_dma(j, slot):
        i = j // bag_l
        l = j % bag_l
        rid = ids_ref[i, l]
        return pltpu.make_async_copy(
            table_ref.at[rid], rows.at[slot], sems.at[slot]
        )

    # Warm the pipeline.
    for j in range(min(NBUF, total)):
        row_dma(j, j % NBUF).start()

    out_ref[:] = jnp.zeros_like(out_ref)

    def body(j, _):
        slot = j % NBUF
        row_dma(j, slot).wait()
        i = j // bag_l
        l = j % bag_l
        w = w_ref[i, l]
        out_ref[i, :] += w * rows[slot, :]

        nxt = j + NBUF

        @pl.when(nxt < total)
        def _():
            row_dma(nxt, slot).start()

        return 0

    jax.lax.fori_loop(0, total, body, 0)


@functools.partial(jax.jit, static_argnames=("tile_b", "interpret"))
def pallas_pooled_lookup(
    table: jax.Array,  # [N, D]
    ids: jax.Array,  # [B, L] int32
    w: jax.Array,  # [B, L] float32 (0 for dead slots; mean pooling pre-scaled)
    tile_b: int = 256,
    interpret: bool = False,
) -> jax.Array:  # [B, D]
    b, bag_l = ids.shape
    n, d = table.shape
    tile_b = min(tile_b, b)
    if b % tile_b:
        raise ValueError(f"batch {b} must be a multiple of tile_b {tile_b}")

    kernel = functools.partial(_pooled_kernel, tile_b=tile_b, bag_l=bag_l)
    return pl.pallas_call(
        kernel,
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, bag_l), lambda i: (i, 0), memory_space=pltpu.SMEM),  # ids
            pl.BlockSpec((tile_b, bag_l), lambda i: (i, 0)),  # w
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec((tile_b, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d), table.dtype),
        interpret=interpret,
        scratch_shapes=[
            pltpu.VMEM((NBUF, d), table.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * bag_l * d,
            bytes_accessed=b * bag_l * d * table.dtype.itemsize + b * d * table.dtype.itemsize,
            transcendentals=0,
        ),
    )(ids.astype(jnp.int32), w.astype(table.dtype), table)


def pooled_lookup_auto(table, ids, w, tile_b: int = 256):
    """Kernel on TPU when shapes fit the tiling constraints; XLA gather
    otherwise."""
    b, _ = ids.shape
    d = table.shape[1]
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu and d % 128 == 0 and b % tile_b == 0:
        return pallas_pooled_lookup(table, ids, w, tile_b=tile_b)
    emb = jnp.take(table, ids, axis=0)
    return (emb * w[..., None].astype(emb.dtype)).sum(axis=1)
