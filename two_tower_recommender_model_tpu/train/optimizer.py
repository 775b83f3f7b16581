"""Optimizers: fused row-wise Adagrad for embedding tables, Adam for towers.

The reference splits optimization the same way (SURVEY §2.5): sparse tables get
fbgemm's fused `RowWiseAdagrad` applied *in the backward* with no dense table
gradient (`apply_optimizer_in_backward`, `03_model_training.py:791-795`); dense
towers get Adam via `KeyedOptimizerWrapper` (`03_model_training.py:826-829`).

Row-wise Adagrad semantics (fbgemm): per-row accumulator
    acc_row += mean(g_row^2);  row -= lr * g_row / (sqrt(acc_row) + eps)
where g_row is the *aggregated* gradient over duplicate occurrences of the row
in the batch.

Two implementations:
- `sparse_rowwise_adagrad` (default): sort ids, aggregate duplicates with
  segment ops, gather/update/scatter only touched rows — O(B·D) HBM traffic,
  independent of table size. Dead slots carry an out-of-range sentinel id and
  are dropped by `mode="drop"` scatters.
- `dense_rowwise_adagrad`: transient dense-gradient variant (scatter-add into
  a table-shaped buffer). O(N·D) traffic; test oracle + small-table path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def row_grad_flatten(
    ids: jax.Array,  # [B, L]
    mask: jax.Array,  # [B, L]
    row_grads: jax.Array,  # [B, L, D]
    num_rows: int,
) -> tuple[jax.Array, jax.Array]:
    """Flatten per-slot grads to ([M] ids, [M, D] grads); dead slots get the
    sentinel id `num_rows` (dropped downstream)."""
    flat_ids = jnp.where(mask.reshape(-1) > 0, ids.reshape(-1), num_rows).astype(jnp.int32)
    flat_g = row_grads.reshape(-1, row_grads.shape[-1])
    return flat_ids, flat_g


def aggregate_grads_by_row(
    flat_ids: jax.Array,  # [M] (sentinel >= n for dead slots)
    flat_grads: jax.Array,  # [M, D]
    n: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Sort ids and segment-sum duplicate occurrences (fbgemm gradient-
    aggregation semantics). Returns (g_seg [M, D], rep [M] row id per segment,
    valid [M], safe [M] in-range gather index) — shared prologue of every
    fused sparse-update variant."""
    m = flat_ids.shape[0]
    order = jnp.argsort(flat_ids)
    sids = flat_ids[order]
    sg = flat_grads[order].astype(jnp.float32)
    starts = jnp.concatenate([jnp.ones(1, bool), sids[1:] != sids[:-1]])
    seg = jnp.cumsum(starts) - 1  # [M], values in [0, M)
    g_seg = jax.ops.segment_sum(sg, seg, num_segments=m)  # [M, D]
    rep = jax.ops.segment_max(sids, seg, num_segments=m)  # row id (or int min for empty)
    valid = (rep >= 0) & (rep < n)
    safe = jnp.where(valid, rep, 0)
    return g_seg, rep, valid, safe


def sparse_rowwise_adagrad(
    table: jax.Array,  # [N, D]
    acc: jax.Array,  # [N]
    flat_ids: jax.Array,  # [M] (sentinel N for dead)
    flat_grads: jax.Array,  # [M, D]
    lr: float,
    eps: float = 1e-10,
) -> tuple[jax.Array, jax.Array]:
    n, d = table.shape
    g_seg, rep, valid, safe = aggregate_grads_by_row(flat_ids, flat_grads, n)

    rows = table[safe].astype(jnp.float32)
    acc_rows = acc[safe].astype(jnp.float32)
    g2 = jnp.mean(g_seg * g_seg, axis=1)
    new_acc_rows = acc_rows + g2
    denom = jnp.sqrt(new_acc_rows) + eps
    new_rows = rows - lr * g_seg / denom[:, None]

    scatter_idx = jnp.where(valid, rep, n)  # out-of-range => dropped
    new_table = table.at[scatter_idx].set(new_rows.astype(table.dtype), mode="drop")
    new_acc = acc.at[scatter_idx].set(new_acc_rows.astype(acc.dtype), mode="drop")
    return new_table, new_acc


def pick_sparse_update(num_rows: int, batch_slots: int):
    """Update-path policy, measured on v5e (DESIGN §6c): the sorted-segment
    path costs two 64k sorts + segment ops + scatter (~3.6ms/table at B=64k,
    N=206k); the transient-dense path costs O(N*D) streaming traffic but no
    sort (~1.8ms same shapes) and wins while the batch touches a sizable
    fraction of the table. Crossover modeled at N ~ 8*B."""
    return dense_rowwise_adagrad if num_rows <= 8 * batch_slots else sparse_rowwise_adagrad


def device_sorted_fused_adagrad(
    table: jax.Array,
    acc: jax.Array,
    flat_ids: jax.Array,  # [M] int32, ANY order (sentinel >= N for dead slots)
    flat_grads: jax.Array,  # [M, D]
    lr: float,
    eps: float = 1e-10,
    *,
    matmul_dtype: str = "float32",
) -> tuple[jax.Array, jax.Array]:
    """Unsorted-id front-end for the fused block-sorted Adagrad kernel:
    device-sort (id, row), permute the grads into id order, then run the MXU
    aggregation + epilogue kernel. Gives UNSORTED tables (e.g. the item table
    when the host sort rides the user column — only one feature's order can)
    the block-kernel update without any host or wire change.

    Measured at flagship item-table shapes (N=49,688, M=262,144, v5e,
    tools/probe_item_paths.py): lax.sort 0.24 ms + [M,128] grad permute
    0.58 ms + fused kernel 1.15 ms ≈ 2.0 ms vs 5.46 ms for the transient-
    dense scatter path. Same numerics class as the other block-sorted paths
    (f32 summation order; exact operand products via bf16x3 when
    matmul_dtype='float32').

    Accepts int8 `QuantizedTable` storage transparently (routes to the fused
    quantized kernel, which streams the table as int8 both ways)."""
    from two_tower_recommender_model_tpu.ops.block_sorted import (
        block_sorted_rowwise_adagrad_fused,
        block_sorted_rowwise_adagrad_fused_quantized,
    )
    from two_tower_recommender_model_tpu.ops.quantized import QuantizedTable

    m = flat_ids.shape[0]
    sids, perm = jax.lax.sort(
        (flat_ids, jnp.arange(m, dtype=jnp.int32)), num_keys=1
    )
    if matmul_dtype == "bfloat16":
        # the kernel rounds grads to bf16 anyway (_oh_dot): casting BEFORE
        # the [M, D] permute is bitwise-identical and halves the permute's
        # HBM traffic (134 -> 67 MB at flagship M)
        flat_grads = flat_grads.astype(jnp.bfloat16)
    if isinstance(table, QuantizedTable):
        assert not table.packed, (
            "packed int8 storage has no s8 [N, D] operand for the block "
            "kernels; route packed tables through quantized_rowwise_adagrad "
            "(pick_table_update_fn gates this)"
        )
        new_v, new_s, new_a = block_sorted_rowwise_adagrad_fused_quantized(
            table.values, table.scales, acc, sids, flat_grads[perm], lr, eps,
            matmul_dtype=matmul_dtype,
        )
        return QuantizedTable(values=new_v, scales=new_s), new_a
    return block_sorted_rowwise_adagrad_fused(
        table, acc, sids, flat_grads[perm], lr, eps, matmul_dtype=matmul_dtype
    )


def masked_rowwise_adagrad_epilogue(
    table: jax.Array,  # [N, D]
    acc: jax.Array,  # [N]
    g: jax.Array,  # [N, D] f32 dense aggregated gradient
    touched: jax.Array,  # [N] bool — rows to update
    lr: float,
    eps: float,
) -> tuple[jax.Array, jax.Array]:
    """Row-wise Adagrad over a dense aggregated gradient, applied only to
    `touched` rows — the shared epilogue of the transient-dense scatter path
    and the block-sorted MXU aggregation kernel (any change to the Adagrad
    math must hit both, or the oracle-parity contract between them breaks)."""
    g2 = jnp.mean(g * g, axis=1)
    new_acc = jnp.where(touched, acc.astype(jnp.float32) + g2, acc.astype(jnp.float32))
    denom = jnp.sqrt(new_acc) + eps
    new_table = jnp.where(
        touched[:, None], table.astype(jnp.float32) - lr * g / denom[:, None], table
    )
    return new_table.astype(table.dtype), new_acc.astype(acc.dtype)


def dense_rowwise_adagrad(
    table: jax.Array,
    acc: jax.Array,
    flat_ids: jax.Array,
    flat_grads: jax.Array,
    lr: float,
    eps: float = 1e-10,
    *,
    ids_sorted: bool = False,
    buffer_dtype: jnp.dtype | None = None,
) -> tuple[jax.Array, jax.Array]:
    """`ids_sorted=True` asserts `flat_ids` is non-decreasing (host-sorted
    batch, see `TrainConfig.sorted_feature`) and passes the
    `indices_are_sorted` hint to the scatter-adds — measured 1.6x on the
    scatter, the dominant cost of this path (DESIGN §6c). `buffer_dtype=
    bfloat16` additionally aggregates the transient gradient buffer in bf16
    (another ~2.7x on the sorted scatter; opt-in — duplicate-row gradients
    accumulate at reduced precision)."""
    n, d = table.shape
    buf_dtype = jnp.float32 if buffer_dtype is None else buffer_dtype
    g = (
        jnp.zeros((n, d), buf_dtype)
        .at[flat_ids]
        .add(flat_grads.astype(buf_dtype), mode="drop", indices_are_sorted=ids_sorted)
        .astype(jnp.float32)
    )
    touched = (
        jnp.zeros((n,), bool)
        .at[flat_ids]
        .set(True, mode="drop", indices_are_sorted=ids_sorted)
    )
    return masked_rowwise_adagrad_epilogue(table, acc, g, touched, lr, eps)


def sparse_rowwise_adagrad_columns(
    table_cols: jax.Array,  # [N, D_local] — this device's column slice
    acc: jax.Array,  # [N] row accumulators (replicated across column shards)
    flat_ids: jax.Array,  # [M] (sentinel N for dead)
    flat_grads_cols: jax.Array,  # [M, D_local] grads for the local columns
    lr: float,
    eps: float,
    full_dim: int,
    psum_axis=None,
) -> tuple[jax.Array, jax.Array]:
    """Row-wise Adagrad for a column-sharded table: the accumulator is per
    FULL row, so the squared-gradient reduction spans all column shards
    (psum over `psum_axis`); the weight update touches only local columns.
    Deterministic given sorted ids, so the replicated accumulator stays in
    sync across shards."""
    n, d_local = table_cols.shape
    g_seg, rep, valid, safe = aggregate_grads_by_row(flat_ids, flat_grads_cols, n)

    g2_local = jnp.sum(g_seg * g_seg, axis=1)  # partial sum over local columns
    if psum_axis is not None:
        g2 = jax.lax.psum(g2_local, psum_axis) / full_dim
    else:
        g2 = g2_local / full_dim

    rows = table_cols[safe].astype(jnp.float32)
    acc_rows = acc[safe].astype(jnp.float32)
    new_acc_rows = acc_rows + g2
    denom = jnp.sqrt(new_acc_rows) + eps
    new_rows = rows - lr * g_seg / denom[:, None]

    scatter_idx = jnp.where(valid, rep, n)
    new_table = table_cols.at[scatter_idx].set(new_rows.astype(table_cols.dtype), mode="drop")
    new_acc = acc.at[scatter_idx].set(new_acc_rows.astype(acc.dtype), mode="drop")
    return new_table, new_acc


def dense_optimizer(
    learning_rate: float,
    schedule: str = "constant",
    total_steps: int | None = None,
    warmup_steps: int = 0,
    end_factor: float = 0.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Adam for the dense towers (`03_model_training.py:826-829`), with the
    Composer stack's LR-schedule options (`DecoupledAdamW` + `LinearLR`,
    `pytorch-model-training.py:563-575`):

    - "constant": plain Adam (reference default)
    - "linear": linear decay from lr to lr*end_factor over total_steps
    - "cosine": cosine decay (TPU-common), optional warmup
    """
    if schedule == "constant":
        lr = optax.constant_schedule(learning_rate) if warmup_steps else learning_rate
    elif schedule == "linear":
        if total_steps is None:
            raise ValueError("linear schedule requires total_steps")
        lr = optax.linear_schedule(learning_rate, learning_rate * end_factor,
                                   total_steps - warmup_steps)
    elif schedule == "cosine":
        if total_steps is None:
            raise ValueError("cosine schedule requires total_steps")
        lr = optax.cosine_decay_schedule(learning_rate, total_steps - warmup_steps,
                                         alpha=end_factor)
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    if warmup_steps:
        lr = optax.join_schedules(
            [optax.linear_schedule(0.0, learning_rate, warmup_steps), lr], [warmup_steps]
        )
    if weight_decay:
        return optax.adamw(lr, weight_decay=weight_decay)  # DecoupledAdamW role
    return optax.adam(lr)
