"""Block-sorted one-hot MXU kernels for the host-sorted feature.

XLA's dynamic gather/scatter costs ~9-15 ns per row at flagship shapes
(DESIGN §6c) — 10-30x above the HBM streaming roofline — because each row is
an independent random access. When the batch is host-sorted by one feature's
hashed id (`TrainConfig.sorted_feature`), that feature's flat ids are
non-decreasing, so the rows each table *block* needs form a contiguous run of
the batch. These kernels exploit that: stream the table in [R, D] blocks and
the batch in [C, D] chunks (both sequential HBM traffic), and replace the
per-row access with a `[R, C] @ [C, D]` one-hot matmul on the MXU — turning a
latency-bound gather/scatter into streaming DMA + dense FLOPs.

This is the role fbgemm's batched sorted-segment embedding kernels play for
the reference (`03_model_training.py:791-795` routes its table updates through
fused fbgemm backward ops); the TPU realization is necessarily different:
MXU one-hot contraction instead of warp-per-row scatter.

Work-item plan (computed in-jit with XLA ops, fed via scalar prefetch):
the grid enumerates (table block, batch chunk) pairs for every chunk whose id
range overlaps the block, in block-major order, plus one dead visit for every
block no chunk touches (so every output block is written; a dead visit
contributes nothing because no id of its chunk lands in the block). Bounds:
  W_real <= nchunks + 2*G - 1   (sorted ids => chunk spans telescope)
so the static grid is W_max = nchunks + 2*G, padded with repeats of the last
(block, chunk) pair that are masked out via `w >= w_real`.

Kernels:
- `block_sorted_lookup`: gathered[j] = table[ids[j]] (sentinel ids -> 0 rows).
  Exact — each output row is 1.0 * the table row (+ exact zeros).
- `block_sorted_aggregate`: dense duplicate-aggregated gradient
  G[r] = sum_{j: ids[j]==r} grads[j], accumulated in f32 on the MXU.
- `block_sorted_rowwise_adagrad`: aggregation kernel + the same masked
  row-wise Adagrad epilogue as `train.optimizer.dense_rowwise_adagrad`
  (drop-in for the sorted-feature table's update).

`matmul_dtype` controls the one-hot contraction operand precision:
"float32" (default; XLA-equivalent 3-pass f32 MXU, aggregation differs from
segment-sum only by f32 summation order) or "bfloat16" (single pass, ~3x the
MXU rate: grad/table values round to bf16 but accumulation stays f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _auto_interpret() -> bool:
    """Compiled Mosaic on TPU; interpret mode elsewhere (CPU tests)."""
    return jax.default_backend() != "tpu"


def plan_block_work(sids: jax.Array, n: int, r: int, c: int):
    """Work-item schedule for sorted flat ids.

    Returns (wi_block [W], wi_chunk [W], w_real [1]) int32, with
    W = nchunks + 2*G static. `wi_block` is non-decreasing; visits of one
    (output) chunk are consecutive, as are visits of one (output) block.
    """
    m = sids.shape[0]
    assert m % c == 0, (m, c)
    nchunks = m // c
    g = -(-n // r)
    w_max = nchunks + 2 * g

    first = jnp.clip(sids[::c] // r, 0, g - 1)  # [nchunks], non-decreasing
    last = jnp.clip(sids[c - 1 :: c] // r, 0, g - 1)
    blocks = jnp.arange(g, dtype=jnp.int32)
    lo = jnp.searchsorted(last, blocks, side="left")  # first chunk reaching b
    hi = jnp.searchsorted(first, blocks, side="right") - 1  # last chunk at b
    visits = jnp.maximum(1, hi - lo + 1)  # empty blocks get one dead visit
    offs = jnp.concatenate([jnp.zeros(1, visits.dtype), jnp.cumsum(visits)])
    w_real = offs[g].astype(jnp.int32)

    wi_block = jnp.repeat(blocks, visits, total_repeat_length=w_max)
    w_ar = jnp.arange(w_max, dtype=jnp.int32)
    wi_block = jnp.where(w_ar < w_real, wi_block, g - 1).astype(jnp.int32)
    k = w_ar - offs[wi_block].astype(jnp.int32)
    wi_chunk = jnp.clip(lo[wi_block].astype(jnp.int32), 0, nchunks - 1) + k
    wi_chunk = jnp.clip(wi_chunk, 0, nchunks - 1)
    return wi_block, wi_chunk, w_real[None]


def _ids3d(sids: jax.Array, c: int) -> jax.Array:
    """[nchunks, 8, c] int32 view of the sorted ids (row 0 real; rows 1-7 are
    sublane padding — int32 VMEM blocks need a second-to-last dim of 8)."""
    nchunks = sids.shape[0] // c
    return jnp.broadcast_to(
        sids.reshape(nchunks, 1, c).astype(jnp.int32), (nchunks, 8, c)
    )



def _oh_dot(oh, x, cdt, dims):
    """One-hot contraction at the requested precision.

    cdt == bf16: single MXU pass, operands rounded to bf16, f32 accumulation.
    cdt == f32: manual bf16x3 — x splits into three bf16 components covering
    the full f32 mantissa (Mosaic lacks Precision.HIGH); with the exact-in-
    bf16 one-hot operand this reconstructs f32 rows/sums at 3 passes instead
    of HIGHEST's 6.
    """
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    if cdt != jnp.float32:
        return dot(oh.astype(cdt), x.astype(cdt))
    oh = oh.astype(jnp.bfloat16)
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(oh, hi) + dot(oh, mid) + dot(oh, lo)


def _gather_kernel(wi_block, wi_chunk, w_real, ids_ref, tab_ref, out_ref, *, r, cdt, n_rows):
    w = pl.program_id(0)
    blk = wi_block[w]
    t = wi_chunk[w]
    is_first = (w == 0) | (wi_chunk[jnp.maximum(w - 1, 0)] != t)

    @pl.when(w < w_real[0])
    def _():
        local = ids_ref[0, 0, :] - blk * r  # [C]
        c = local.shape[0]
        oh = jax.lax.broadcasted_iota(jnp.int32, (c, r), 1) == local[:, None]
        # Zero the ragged last block's pad rows: their VMEM contents are
        # uninitialized, and 0 * NaN would poison the one-hot contraction.
        row_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) + blk * r < n_rows
        )
        tab = jnp.where(row_valid, tab_ref[:], 0.0)
        contrib = _oh_dot(oh, tab, cdt, ((1,), (0,)))

        # bf16 out: each output row receives exactly one nonzero contribution
        # (its owning block) plus exact zeros, so rounding at the write is
        # identical to the downstream pooled.astype(bf16) cast it replaces
        @pl.when(is_first)
        def _():
            out_ref[:] = contrib.astype(out_ref.dtype)

        @pl.when(jnp.logical_not(is_first))
        def _():
            out_ref[:] = (
                out_ref[:].astype(jnp.float32) + contrib
            ).astype(out_ref.dtype)


def _aggregate_kernel(
    wi_block, wi_chunk, w_real, ids_ref, g_ref, out_ref, scratch, *, r, cdt
):
    w = pl.program_id(0)
    blk = wi_block[w]
    is_first = (w == 0) | (wi_block[jnp.maximum(w - 1, 0)] != blk)
    last_w = pl.num_programs(0) - 1
    is_last = (w == last_w) | (wi_block[jnp.minimum(w + 1, last_w)] != blk)

    @pl.when(is_first)
    def _():
        scratch[:] = jnp.zeros_like(scratch)

    @pl.when(w < w_real[0])
    def _():
        local = ids_ref[0, 0, :] - blk * r  # [C]
        c = local.shape[0]
        oh = jax.lax.broadcasted_iota(jnp.int32, (r, c), 0) == local[None, :]
        scratch[:] += _oh_dot(oh, g_ref[:], cdt, ((1,), (0,)))

    @pl.when(is_last)
    def _():
        out_ref[:] = scratch[:]


def _grad_wire_dtype(cdt):
    """HBM dtype for the [M, D] gradient operand. In bf16 mode the kernels
    round the grads to bf16 anyway (`_oh_dot`), so streaming them from HBM
    as bf16 is bitwise-identical and halves the grad read traffic (134 ->
    67 MB at M=262k, D=128) — and XLA fuses the cast into the grad producer,
    halving the WRITE too. f32 mode keeps full-mantissa grads (bf16x3)."""
    return jnp.bfloat16 if jnp.dtype(cdt) == jnp.bfloat16 else jnp.float32


def _identity_mask(r):
    return jax.lax.broadcasted_iota(jnp.int32, (r, r), 0) == jax.lax.broadcasted_iota(
        jnp.int32, (r, r), 1
    )


def _lane_to_sublane(v_1r):
    """[1, r] -> [r, 1] without a Mosaic relayout: broadcast along sublanes,
    mask to the diagonal, reduce over lanes. EXACT (one term per row)."""
    r = v_1r.shape[1]
    masked = jnp.where(_identity_mask(r), jnp.broadcast_to(v_1r, (r, r)), 0.0)
    return jnp.sum(masked, axis=1, keepdims=True)


def _sublane_to_lane(v_r1):
    """[r, 1] -> [1, r]: the transpose of `_lane_to_sublane` (diagonal mask +
    sublane reduction). EXACT."""
    r = v_r1.shape[0]
    masked = jnp.where(_identity_mask(r), jnp.broadcast_to(v_r1, (r, r)), 0.0)
    return jnp.sum(masked, axis=0, keepdims=True)


def _fused_update_kernel(
    wi_block, wi_chunk, w_real, ids_ref, g_ref, tab_ref, acc_ref,
    out_tab_ref, out_acc_ref, scratch, *, r, cdt, lr, eps
):
    """Aggregation + row-wise Adagrad epilogue in ONE kernel: the dense
    aggregated gradient never round-trips HBM (it lives in the per-block
    VMEM scratch), the table block streams exactly once (read for the
    epilogue, written updated), and the [N]-shaped accumulator streams in
    [1, R] blocks alongside its table block (a whole-array VMEM block would
    cap the table at ~2M rows — VERDICT r5 crossover sweep)."""
    w = pl.program_id(0)
    blk = wi_block[w]
    is_first = (w == 0) | (wi_block[jnp.maximum(w - 1, 0)] != blk)
    last_w = pl.num_programs(0) - 1
    is_last = (w == last_w) | (wi_block[jnp.minimum(w + 1, last_w)] != blk)

    @pl.when(is_first)
    def _():
        scratch[:] = jnp.zeros_like(scratch)

    @pl.when(w < w_real[0])
    def _():
        local = ids_ref[0, 0, :] - blk * r  # [C]
        c = local.shape[0]
        oh = jax.lax.broadcasted_iota(jnp.int32, (r, c), 0) == local[None, :]
        scratch[:] += _oh_dot(oh, g_ref[:], cdt, ((1,), (0,)))

    @pl.when(is_last)
    def _():
        g = scratch[:]  # [r, d] f32 aggregated gradient of this block
        touched = jnp.any(g != 0.0, axis=1, keepdims=True)  # [r, 1]
        g2 = jnp.mean(g * g, axis=1, keepdims=True)  # [r, 1]
        acc_rows = acc_ref[0:1, :]  # [1, r] lane-oriented block slice
        acc_col = _lane_to_sublane(acc_rows)  # [r, 1]
        new_acc = jnp.where(touched, acc_col + g2, acc_col)
        denom = jnp.sqrt(new_acc) + eps
        tab = tab_ref[:]
        out_tab_ref[:] = jnp.where(touched, tab - lr * g / denom, tab)
        out_acc_ref[0:1, :] = _sublane_to_lane(new_acc)


def _check(n, d, m, r, c):
    if d % 128 or r % 8 or c % 128:
        raise ValueError(f"block_sorted needs d%128==0, r%8==0, c%128==0 (d={d}, r={r}, c={c})")
    if m % c:
        raise ValueError(f"flat id count {m} must divide by chunk c={c}")


def block_sorted_shapes_ok(d: int, m: int, c: int = 512) -> bool:
    """True when ([M] ids, [M, D] grads) fit the kernels' tiling constraints
    (mirrors `_check` with the default c=min(c, m) resolution) — the gate for
    routing a table through the block kernels at trace time."""
    c = min(c, m)
    return d % 128 == 0 and c % 128 == 0 and m % c == 0


def block_sorted_profitable(n_rows: int, m: int, r: int = 512,
                            min_ids_per_block: int = 128) -> bool:
    """Arithmetic-intensity gate: the block kernels visit EVERY r-row table
    block at least once (streaming reads for the gather, read+write for the
    fused update) and pay one [C, R] x [R, D] one-hot MXU pass per visit, so
    their cost scales with TABLE size, not batch — the right trade only
    while each block serves enough ids. Measured on v5e at bs=262k
    (round-5 crossover sweep, /tmp/crossover_r5.log): 206k rows
    (651 ids/block) block f32 11.3 ms vs XLA 12.7 — block wins; 2M rows
    (67 ids/block) block 28.4 vs XLA-sorted 22.9 — block loses; 8M rows
    (17 ids/block) 86.0 vs 53.2 — block loses badly. Threshold 128 sits
    between the measured win and loss points."""
    blocks = -(-n_rows // r)
    return m >= min_ids_per_block * blocks


@functools.partial(
    jax.jit, static_argnames=("r", "c", "matmul_dtype", "interpret", "out_dtype")
)
def block_sorted_lookup(
    table: jax.Array,  # [N, D]
    sids: jax.Array,  # [M] int32, NON-DECREASING hashed ids; sentinel >= N -> zero row
    r: int = 512,
    c: int = 512,
    matmul_dtype: str = "float32",
    interpret: bool | None = None,
    out_dtype=None,  # None -> f32; bf16 halves the [M, D] output write and
    # replaces the downstream compute-dtype cast pass (identical rounding:
    # each row is written once from its owning block, see _gather_kernel)
) -> jax.Array:  # [M, D] out_dtype: table[sids] (0 for sentinels)
    if interpret is None:
        interpret = _auto_interpret()
    n, d = table.shape
    m = sids.shape[0]
    c = min(c, m)
    r = min(r, -(-n // 8) * 8)
    _check(n, d, m, r, c)
    g = -(-n // r)
    nchunks = m // c
    wi_block, wi_chunk, w_real = plan_block_work(sids, n, r, c)
    cdt = jnp.dtype(matmul_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nchunks + 2 * g,),
        in_specs=[
            pl.BlockSpec((1, 8, c), lambda w, wb, wc, wr: (wc[w], 0, 0)),
            pl.BlockSpec((r, d), lambda w, wb, wc, wr: (wb[w], 0)),
        ],
        out_specs=pl.BlockSpec((c, d), lambda w, wb, wc, wr: (wc[w], 0)),
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, r=r, cdt=cdt, n_rows=n),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.dtype(out_dtype or jnp.float32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(wi_block, wi_chunk, w_real, _ids3d(sids, c), table)


@functools.partial(
    jax.jit, static_argnames=("table_rows", "r", "c", "matmul_dtype", "interpret")
)
def block_sorted_aggregate(
    table_rows: int,
    sids: jax.Array,  # [M] int32 non-decreasing; sentinel >= N dropped
    grads: jax.Array,  # [M, D]
    r: int = 512,
    c: int = 512,
    matmul_dtype: str = "float32",
    interpret: bool | None = None,
) -> jax.Array:  # [N, D] f32 dense aggregated gradient
    if interpret is None:
        interpret = _auto_interpret()
    n = table_rows
    m, d = grads.shape
    c = min(c, m)
    r = min(r, -(-n // 8) * 8)
    _check(n, d, m, r, c)
    g = -(-n // r)
    nchunks = m // c
    wi_block, wi_chunk, w_real = plan_block_work(sids, n, r, c)
    cdt = jnp.dtype(matmul_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nchunks + 2 * g,),
        in_specs=[
            pl.BlockSpec((1, 8, c), lambda w, wb, wc, wr: (wc[w], 0, 0)),
            pl.BlockSpec((c, d), lambda w, wb, wc, wr: (wc[w], 0)),
        ],
        out_specs=pl.BlockSpec((r, d), lambda w, wb, wc, wr: (wb[w], 0)),
        scratch_shapes=[pltpu.VMEM((r, d), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_aggregate_kernel, r=r, cdt=cdt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(wi_block, wi_chunk, w_real, _ids3d(sids, c), grads.astype(_grad_wire_dtype(cdt)))


@functools.partial(
    jax.jit, static_argnames=("lr", "eps", "r", "c", "matmul_dtype", "interpret")
)
def block_sorted_rowwise_adagrad_fused(
    table: jax.Array,  # [N, D] float32
    acc: jax.Array,  # [N] float32
    flat_ids: jax.Array,  # [M] NON-DECREASING (sentinel >= N for dead slots)
    flat_grads: jax.Array,  # [M, D]
    lr: float,
    eps: float = 1e-10,
    *,
    r: int = 512,
    c: int = 512,
    matmul_dtype: str = "float32",
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Single-kernel variant of `block_sorted_rowwise_adagrad`: the MXU
    aggregation AND the masked row-wise Adagrad epilogue run in one Pallas
    kernel, so the dense aggregated gradient never materializes in HBM and
    the table streams exactly once (read+write). The accumulator is VMEM-
    resident for the whole grid; its [1, r] lane slices convert to/from the
    [r, 1] sublane orientation by exact identity-one-hot matmuls (bf16x3)
    instead of Mosaic relayouts. Same numerics class as the two-kernel
    path (f32 summation order)."""
    if interpret is None:
        interpret = _auto_interpret()
    n, d = table.shape
    m = flat_grads.shape[0]
    c = min(c, m)
    r = min(r, -(-n // 8) * 8)
    _check(n, d, m, r, c)
    g = -(-n // r)
    nchunks = m // c
    n_pad = g * r
    wi_block, wi_chunk, w_real = plan_block_work(flat_ids, n, r, c)
    cdt = jnp.dtype(matmul_dtype)

    acc_pad = jnp.pad(acc.astype(jnp.float32), (0, n_pad - n))[None, :]  # [1, G*R]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nchunks + 2 * g,),
        in_specs=[
            pl.BlockSpec((1, 8, c), lambda w, wb, wc, wr: (wc[w], 0, 0)),
            pl.BlockSpec((c, d), lambda w, wb, wc, wr: (wc[w], 0)),
            pl.BlockSpec((r, d), lambda w, wb, wc, wr: (wb[w], 0)),
            pl.BlockSpec((1, r), lambda w, wb, wc, wr: (0, wb[w])),
        ],
        out_specs=[
            pl.BlockSpec((r, d), lambda w, wb, wc, wr: (wb[w], 0)),
            pl.BlockSpec((1, r), lambda w, wb, wc, wr: (0, wb[w])),
        ],
        scratch_shapes=[pltpu.VMEM((r, d), jnp.float32)],
    )
    new_table, new_acc = pl.pallas_call(
        functools.partial(_fused_update_kernel, r=r, cdt=cdt, lr=lr, eps=eps),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, d), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
        interpret=interpret,
        # in-place: the [N, D] table and [1, N] accumulator update into their
        # own buffers (each block is read, updated, written once — visits are
        # consecutive) — without this the kernel materializes a SECOND full
        # table and a 20M-row f32 table cannot fit HBM (r5 crossover OOM).
        # Indices count all operands including the 3 scalar-prefetch args.
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(wi_block, wi_chunk, w_real, _ids3d(flat_ids, c),
      flat_grads.astype(_grad_wire_dtype(cdt)), table, acc_pad)
    return new_table.astype(table.dtype), new_acc[0, :n].astype(acc.dtype)


def _split3(x):
    """Exact 3-way bf16 split of an f32 array: x == hi + mid + lo with each
    component exactly representable in bf16 (3x8 mantissa bits cover f32's 24)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _gather_kernel_quantized(
    wi_block, wi_chunk, w_real, ids_ref, tab_ref, scl_ref, out_ref, out_scl_ref,
    *, r, n_rows
):
    """int8 variant of `_gather_kernel`: the one-hot contraction runs on the
    RAW int8 values (cast to bf16 — every int in [-127, 127] is exact in bf16,
    so the single-pass MXU result is the exact integer row), and the per-row
    scales are picked with the same one-hot trick into a second [1, C] output
    (3 single-term bf16x3 dots — exact). The caller multiplies rows by
    scales/127 outside (XLA fuses it into the consumer); vs
    `quantized_pooled_lookup` the only divergence is XLA's reciprocal-multiply
    rewrite of the constant division (1 ulp)."""
    w = pl.program_id(0)
    blk = wi_block[w]
    t = wi_chunk[w]
    is_first = (w == 0) | (wi_chunk[jnp.maximum(w - 1, 0)] != t)

    @pl.when(w < w_real[0])
    def _():
        local = ids_ref[0, 0, :] - blk * r  # [C]
        c = local.shape[0]
        oh = (jax.lax.broadcasted_iota(jnp.int32, (c, r), 1) == local[:, None])
        ohb = oh.astype(jnp.bfloat16)
        # pad rows of the ragged last block hold uninitialized int8 (finite;
        # no NaN risk) and are never hit by a real id's one-hot column
        row_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) + blk * r < n_rows
        )
        tab = jnp.where(row_valid, tab_ref[:], 0).astype(jnp.bfloat16)
        contrib = jax.lax.dot_general(
            ohb, tab, dimension_numbers=((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, D] exact integers
        # exact scale pick: [1, R] scales -> [1, C] via 3 one-hot matmuls on
        # the bf16x3 split (one term per output row => no summation rounding)
        scl = scl_ref[0:1, :]  # [1, r] block slice (streamed per block)
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sc = sum(dot(p, ohb) for p in _split3(scl))  # [1, C]

        # the int-rows output wires as bf16: every int in [-127, 127] is
        # EXACT in bf16 (and the cross-block accumulation only adds exact
        # zeros), so this halves the [M, D] write with bitwise-identical
        # dequantized results after the caller's f32 upcast
        @pl.when(is_first)
        def _():
            out_ref[:] = contrib.astype(out_ref.dtype)
            out_scl_ref[:] = sc

        @pl.when(jnp.logical_not(is_first))
        def _():
            out_ref[:] = (
                out_ref[:].astype(jnp.float32) + contrib
            ).astype(out_ref.dtype)
            out_scl_ref[:] = out_scl_ref[:] + sc


@functools.partial(jax.jit, static_argnames=("r", "c", "interpret"))
def block_sorted_lookup_quantized(
    values: jax.Array,  # [N, D] int8
    scales: jax.Array,  # [N] f32 per-row absmax
    sids: jax.Array,  # [M] int32, NON-DECREASING; sentinel >= N -> zero row
    r: int = 512,
    c: int = 512,
    interpret: bool | None = None,
) -> jax.Array:  # [M, D] f32 dequantized rows (0 for sentinels)
    """int8 `block_sorted_lookup`: streams the RAW int8 table blocks (4x less
    HBM than f32) and dequantizes per output row — bitwise-identical to
    `ops.quantized.quantized_pooled_lookup`'s per-row dequantize (the int8
    speed role of fbgemm's quantized EmbeddingBag kernels, SURVEY §2.8.1)."""
    if interpret is None:
        interpret = _auto_interpret()
    n, d = values.shape
    m = sids.shape[0]
    c = min(c, m)
    r = min(r, -(-n // 8) * 8)
    _check(n, d, m, r, c)
    g = -(-n // r)
    nchunks = m // c
    n_pad = g * r
    wi_block, wi_chunk, w_real = plan_block_work(sids, n, r, c)
    scl_pad = jnp.pad(scales.astype(jnp.float32), (0, n_pad - n))[None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nchunks + 2 * g,),
        in_specs=[
            pl.BlockSpec((1, 8, c), lambda w, wb, wc, wr: (wc[w], 0, 0)),
            pl.BlockSpec((r, d), lambda w, wb, wc, wr: (wb[w], 0)),
            pl.BlockSpec((1, r), lambda w, wb, wc, wr: (0, wb[w])),
        ],
        out_specs=[
            pl.BlockSpec((c, d), lambda w, wb, wc, wr: (wc[w], 0)),
            pl.BlockSpec((1, c), lambda w, wb, wc, wr: (0, wc[w])),
        ],
    )
    rows_int, scl_rows = pl.pallas_call(
        functools.partial(_gather_kernel_quantized, r=r, n_rows=n),
        grid_spec=grid_spec,
        out_shape=(
            # bf16 wire for the exact integer rows (see kernel note): halves
            # the [M, D] HBM write; the f32 upcast below is exact
            jax.ShapeDtypeStruct((m, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(wi_block, wi_chunk, w_real, _ids3d(sids, c), values, scl_pad)
    return rows_int.astype(jnp.float32) * (scl_rows[0, :, None] / 127.0)


def _fused_update_kernel_quantized(
    wi_block, wi_chunk, w_real, ids_ref, g_ref, tab_ref, scl_ref, acc_ref,
    out_tab_ref, out_scl_ref, out_acc_ref, scratch, *, r, cdt, lr, eps
):
    """int8 `_fused_update_kernel`: MXU aggregation into VMEM scratch, then a
    dequantize -> row-wise Adagrad -> fresh-absmax requantize epilogue, all in
    one kernel — the table streams once as int8 in each direction and the
    dense aggregated gradient never reaches HBM. Untouched rows keep their
    exact stored bytes and scales (requantization is NOT idempotent)."""
    w = pl.program_id(0)
    blk = wi_block[w]
    is_first = (w == 0) | (wi_block[jnp.maximum(w - 1, 0)] != blk)
    last_w = pl.num_programs(0) - 1
    is_last = (w == last_w) | (wi_block[jnp.minimum(w + 1, last_w)] != blk)

    @pl.when(is_first)
    def _():
        scratch[:] = jnp.zeros_like(scratch)

    @pl.when(w < w_real[0])
    def _():
        local = ids_ref[0, 0, :] - blk * r  # [C]
        c = local.shape[0]
        oh = jax.lax.broadcasted_iota(jnp.int32, (r, c), 0) == local[None, :]
        scratch[:] += _oh_dot(oh, g_ref[:], cdt, ((1,), (0,)))

    @pl.when(is_last)
    def _():
        g = scratch[:]  # [r, d] f32 aggregated gradient of this block
        touched = jnp.any(g != 0.0, axis=1, keepdims=True)  # [r, 1]
        g2 = jnp.mean(g * g, axis=1, keepdims=True)  # [r, 1]
        acc_col = _lane_to_sublane(acc_ref[0:1, :])  # [r, 1]
        scl_col = _lane_to_sublane(scl_ref[0:1, :])  # [r, 1]
        vals = tab_ref[:]  # [r, d] int8
        rows = vals.astype(jnp.float32) * (scl_col / 127.0)
        new_acc = jnp.where(touched, acc_col + g2, acc_col)
        new_rows = rows - lr * g / (jnp.sqrt(new_acc) + eps)
        new_scl = jnp.max(jnp.abs(new_rows), axis=1, keepdims=True)  # [r, 1]
        denom = jnp.where(new_scl > 0, new_scl, 1.0)
        q = jnp.clip(jnp.round(new_rows / denom * 127.0), -127, 127).astype(jnp.int8)
        out_tab_ref[:] = jnp.where(touched, q, vals)
        out_scl_ref[0:1, :] = _sublane_to_lane(
            jnp.where(touched, new_scl, scl_col)
        )
        out_acc_ref[0:1, :] = _sublane_to_lane(new_acc)


@functools.partial(
    jax.jit, static_argnames=("lr", "eps", "r", "c", "matmul_dtype", "interpret")
)
def block_sorted_rowwise_adagrad_fused_quantized(
    values: jax.Array,  # [N, D] int8
    scales: jax.Array,  # [N] f32
    acc: jax.Array,  # [N] f32
    flat_ids: jax.Array,  # [M] NON-DECREASING (sentinel >= N for dead slots)
    flat_grads: jax.Array,  # [M, D]
    lr: float,
    eps: float = 1e-10,
    *,
    r: int = 512,
    c: int = 512,
    matmul_dtype: str = "float32",
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:  # (values, scales, acc)
    """Fused int8 row-wise Adagrad on sorted ids: same grid/aggregation as
    `block_sorted_rowwise_adagrad_fused`, with the int8 dequantize/requantize
    folded into the epilogue. Same quantization math as
    `ops.quantized.quantized_rowwise_adagrad` (fresh per-row absmax, untouched
    rows byte-exact); aggregation is in the f32-summation-order numerics class
    of the other block kernels. `matmul_dtype` sets the GRADIENT operand
    precision of the aggregation matmul, as in the f32 kernels."""
    if interpret is None:
        interpret = _auto_interpret()
    n, d = values.shape
    m = flat_grads.shape[0]
    c = min(c, m)
    r = min(r, -(-n // 8) * 8)
    _check(n, d, m, r, c)
    g = -(-n // r)
    nchunks = m // c
    n_pad = g * r
    wi_block, wi_chunk, w_real = plan_block_work(flat_ids, n, r, c)
    cdt = jnp.dtype(matmul_dtype)

    scl_pad = jnp.pad(scales.astype(jnp.float32), (0, n_pad - n))[None, :]
    acc_pad = jnp.pad(acc.astype(jnp.float32), (0, n_pad - n))[None, :]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nchunks + 2 * g,),
        in_specs=[
            pl.BlockSpec((1, 8, c), lambda w, wb, wc, wr: (wc[w], 0, 0)),
            pl.BlockSpec((c, d), lambda w, wb, wc, wr: (wc[w], 0)),
            pl.BlockSpec((r, d), lambda w, wb, wc, wr: (wb[w], 0)),
            pl.BlockSpec((1, r), lambda w, wb, wc, wr: (0, wb[w])),
            pl.BlockSpec((1, r), lambda w, wb, wc, wr: (0, wb[w])),
        ],
        out_specs=[
            pl.BlockSpec((r, d), lambda w, wb, wc, wr: (wb[w], 0)),
            pl.BlockSpec((1, r), lambda w, wb, wc, wr: (0, wb[w])),
            pl.BlockSpec((1, r), lambda w, wb, wc, wr: (0, wb[w])),
        ],
        scratch_shapes=[pltpu.VMEM((r, d), jnp.float32)],
    )
    new_vals, new_scl, new_acc = pl.pallas_call(
        functools.partial(_fused_update_kernel_quantized, r=r, cdt=cdt, lr=lr, eps=eps),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, d), jnp.int8),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
        interpret=interpret,
        # in-place table/scales/accumulator (see the f32 kernel note: without
        # aliasing a second full table buffer doubles HBM at large N);
        # indices count all operands including the 3 scalar-prefetch args
        input_output_aliases={5: 0, 6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )(wi_block, wi_chunk, w_real, _ids3d(flat_ids, c),
      flat_grads.astype(_grad_wire_dtype(cdt)), values, scl_pad, acc_pad)
    return new_vals, new_scl[0, :n], new_acc[0, :n].astype(acc.dtype)


def device_sorted_lookup(
    table,  # [N, D] f32 array or (values int8, scales f32) via QuantizedTable
    flat_ids: jax.Array,  # [M] int32, ANY order (sentinel >= N -> zero row)
    *,
    matmul_dtype: str = "float32",
    interpret: bool | None = None,
) -> jax.Array:  # [M, D] f32 rows in the ORIGINAL batch order
    """Unsorted-id front-end for the block-sorted GATHER — the forward-path
    sibling of `train.optimizer.device_sorted_fused_adagrad`: device-sort the
    ids, stream the table block-by-block through the one-hot MXU kernel, then
    inverse-permute the [M, D] rows back to batch order. Turns the
    latency-bound random gather of UNSORTED tables (e.g. the item table when
    the host sort rides the user column) into streaming DMA + dense FLOPs +
    one row permute. Dispatches int8 `QuantizedTable` storage to the raw-int8
    kernel. Exactness matches the underlying kernel (f32 gather is exact)."""
    from two_tower_recommender_model_tpu.ops.quantized import QuantizedTable

    m = flat_ids.shape[0]
    sids, perm = jax.lax.sort(
        (flat_ids.astype(jnp.int32), jnp.arange(m, dtype=jnp.int32)), num_keys=1
    )
    if isinstance(table, QuantizedTable):
        rows = block_sorted_lookup_quantized(
            table.values, table.scales, sids, interpret=interpret
        )
    else:
        rows = block_sorted_lookup(
            table, sids, matmul_dtype=matmul_dtype, interpret=interpret
        )
    inv = jnp.zeros((m,), jnp.int32).at[perm].set(jnp.arange(m, dtype=jnp.int32))
    return jnp.take(rows, inv, axis=0)


def block_sorted_rowwise_adagrad(
    table: jax.Array,
    acc: jax.Array,
    flat_ids: jax.Array,  # [M] NON-DECREASING (sentinel N for dead slots)
    flat_grads: jax.Array,  # [M, D]
    lr: float,
    eps: float = 1e-10,
    *,
    r: int = 512,
    c: int = 512,
    matmul_dtype: str = "float32",
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for `dense_rowwise_adagrad(..., ids_sorted=True)`: the MXU
    aggregation kernel + the identical masked row-wise Adagrad epilogue.
    `touched` is derived from the aggregated gradient (a touched row with an
    exactly-zero aggregated gradient updates to the same values either way)."""
    from two_tower_recommender_model_tpu.train.optimizer import (
        masked_rowwise_adagrad_epilogue,
    )

    n, d = table.shape
    g = block_sorted_aggregate(
        n, flat_ids, flat_grads, r=r, c=c, matmul_dtype=matmul_dtype,
        interpret=interpret,
    )
    touched = jnp.any(g != 0.0, axis=1)
    return masked_rowwise_adagrad_epilogue(table, acc, g, touched, lr, eps)
