"""Pallas TPU kernel: fused row-wise Adagrad gather-update-scatter.

The TPU counterpart of fbgemm's fused sparse optimizer backward (the
`apply_optimizer_in_backward` kernels the reference relies on,
`03_model_training.py:791-795`): for each touched row, DMA the row out of
HBM, apply `row -= scale_row * g_row` on the VPU, and DMA it back — in place
(`input_output_aliases`), one pass, no table-sized intermediates.

Division of labor:
- XLA side: duplicate-id aggregation (sort + segment ops — XLA's strength)
  AND the accumulator math (`acc += mean(g^2)`, `scale = lr/(sqrt(acc)+eps)`)
  — acc is an [N] vector whose scatter is trivially cheap, and Mosaic's DMA
  tiling (last dim aligned to 128) makes per-scalar HBM round-trips awkward
  in-kernel;
- Pallas side: the [M, D] row read-modify-write, the actual HBM traffic.

Like the lookup kernel, this is an opt-in alternative: XLA's scatter is
already in-place under donation and measured competitive. The kernel is the
substrate for variants XLA can't express as one pass (e.g. quantized
read-modify-write with on-the-fly rescaling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBUF = 4  # row-DMA ring depth


def _apply_kernel(ids_ref, g_ref, table_ref, out_table_ref, rows, sems,
                  *, tile_m, n):
    """One grid step: `out_table[id[j]] = table[id[j]] - g[j]` for `tile_m`
    aggregated pairs; sentinel ids (>= n) skip. The per-row Adagrad step size
    is folded into g on the XLA side (an f32 SMEM operand trips a Mosaic
    layout check; pre-scaling fuses into the surrounding XLA ops anyway).

    ids_ref: [TILE_M, 1] int32 SMEM (2D: 1-D SMEM operands trip XLA/Mosaic layout disagreement)
    g_ref:   [TILE_M, D] f32 VMEM (pre-scaled update rows)
    table_ref/out_table_ref: [N, D] HBM, aliased
    rows: [NBUF, D] VMEM scratch ring
    """

    def row_in(j, slot):
        return pltpu.make_async_copy(
            table_ref.at[ids_ref[j, 0]], rows.at[slot], sems.at[slot]
        )

    for j in range(min(NBUF, tile_m)):
        @pl.when(ids_ref[j, 0] < n)
        def _(j=j):
            row_in(j, j % NBUF).start()

    def body(j, _):
        slot = j % NBUF
        rid = ids_ref[j, 0]

        @pl.when(rid < n)
        def _():
            row_in(j, slot).wait()
            rows[slot, :] = rows[slot, :] - g_ref[j, :]
            w = pltpu.make_async_copy(rows.at[slot], out_table_ref.at[rid], sems.at[slot])
            w.start()
            w.wait()

        nxt = j + NBUF

        @pl.when(nxt < tile_m)
        def _():
            @pl.when(ids_ref[nxt, 0] < n)
            def _():
                row_in(nxt, slot).start()

        return 0

    jax.lax.fori_loop(0, tile_m, body, 0)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def pallas_row_subtract(
    table: jax.Array,  # [N, D] f32
    rep_ids: jax.Array,  # [M] int32 (sentinel >= N skips)
    updates: jax.Array,  # [M, D] f32 pre-scaled update rows
    tile_m: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """In-place `table[rep_ids] -= updates` (sentinels skip)."""
    n, d = table.shape
    m = rep_ids.shape[0]
    tile_m = min(tile_m, m)
    if m % tile_m:
        pad = tile_m - m % tile_m
        rep_ids = jnp.concatenate([rep_ids, jnp.full((pad,), n, jnp.int32)])
        updates = jnp.concatenate([updates, jnp.zeros((pad, d), updates.dtype)])
        m += pad

    kernel = functools.partial(_apply_kernel, tile_m=tile_m, n=n)
    return pl.pallas_call(
        kernel,
        grid=(m // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),  # ids
            pl.BlockSpec((tile_m, d), lambda i: (i, 0)),  # pre-scaled updates
            pl.BlockSpec(memory_space=pl.ANY),  # table (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, d), table.dtype),
        scratch_shapes=[
            pltpu.VMEM((NBUF, d), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
        input_output_aliases={2: 0},  # table updated in place
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
    )(rep_ids.astype(jnp.int32)[:, None], updates.astype(jnp.float32), table)


def pallas_sparse_rowwise_adagrad(
    table: jax.Array,
    acc: jax.Array,
    flat_ids: jax.Array,
    flat_grads: jax.Array,
    lr: float,
    eps: float = 1e-10,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for `train.optimizer.sparse_rowwise_adagrad`: XLA aggregation +
    accumulator math, Pallas fused row apply."""
    from two_tower_recommender_model_tpu.train.optimizer import aggregate_grads_by_row

    n, _ = table.shape
    g_seg, rep, valid, safe = aggregate_grads_by_row(flat_ids, flat_grads, n)
    g2 = jnp.mean(g_seg * g_seg, axis=1)
    new_acc_rows = acc[safe].astype(jnp.float32) + g2
    scales = lr / (jnp.sqrt(new_acc_rows) + eps)
    rep_ids = jnp.where(valid, rep, n).astype(jnp.int32)
    new_acc = acc.at[rep_ids].set(new_acc_rows.astype(acc.dtype), mode="drop")
    new_table = pallas_row_subtract(
        table, rep_ids, scales[:, None] * g_seg, interpret=interpret
    )
    return new_table, new_acc
