"""Fused in-batch sampled-softmax kernels (flash-softmax for retrieval).

The blockwise scan path (`models/losses.py:_chunked_sampled_softmax`) is
HBM-bound: every [R, B] score block round-trips HBM for its logsumexp (~34 GB
per step at bs=64k — 42 ms of traffic against a 5.6 ms MXU floor for the
[B, B] matmul itself). These kernels stream q/c tiles and keep every score
tile in VMEM with an ONLINE logsumexp (the flash-attention recurrence), so
the O(B^2) scores never materialize:

- `_lse_fused`: per-row logsumexp_j s_ij over k tiles with running
  (max, sum) rescaling (custom_vjp);
- backward: two recompute passes — q-block-major for dq (dq_i = sum_j
  softmax_ij * g_i * c_j) and k-block-major for dc (dc_j = sum_i ... q_i);
- the positive score s_i,pos is an O(B*D) rowwise dot OUTSIDE the kernels
  (plain jnp; autodiff covers its gradient) — the kernels are
  VPU-recompute-bound, so every per-tile op removed counts: preloaded
  column-index row instead of per-tile iota, logQ+pad merged into one
  additive adjust, operands pre-converted to bf16 (halves kernel DMA).

The kernels are RECTANGULAR: q is [BQ, D] and c is [BK, D] with BQ <= BK, and
each q row carries its GLOBAL row index (= the column of its positive). That
makes the same kernel serve both the single-device square case (BQ == BK,
rows = arange) and the shard_map data-parallel case — each shard runs its
local [B_local, D] q block against the all-gathered [B, D] candidates with
`row_offset = axis_index * B_local`, so the O(B^2) score work is partitioned
over the data axis with zero redundancy (see
`models/losses.py:make_sharded_sampled_softmax`).

Embedding dims that are not lane-aligned (the flagship towers emit [B, 64],
`config.py layer_sizes=(128, 64)`) are zero-padded to a multiple of 128
before the kernel: zero columns change no dot product, and the pad is
differentiable (its VJP slices dq/dc back).

Score semantics match the scan path exactly: s = (q @ c^T)/T, minus logQ,
-1e9 on pad columns (>= n_valid) and accidental-hit columns (same item id,
off-positive). Matmuls run single-pass bf16 operands with f32 accumulation —
the SAME numerics class as the scan path's Precision.DEFAULT dots; the online
rescaling reorders f32 adds vs a one-shot row logsumexp (1-ulp-scale diffs).

This is the TPU answer to the north-star loss cost (SURVEY §7 hard-part 6);
the reference has no analog (its BCE objective is O(B)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _score_tile(q_blk, ct_tile, adj_tile, ids_row_col, ids_col_row, row_col,
                colidx_row, temperature, use_adj, use_ids):
    """Adjusted score tile [RQ, CK] for one (q block, key tile) pair — the same
    adjustment order as the scan path (temperature, logQ+pad additive adjust,
    dup mask excluding the positive column). `row_col` is [RQ, 1] global row
    indices (the positive of row i is column row_col[i]); `colidx_row` is the
    [1, CK] global column index of each key column, PRELOADED instead of a
    per-tile iota (saves 3 VPU ops/element/pass; the fused kernel is
    VPU-recompute-bound — DESIGN §6c-r4)."""
    s = jax.lax.dot_general(
        q_blk, ct_tile,  # bf16 operands, converted ONCE outside the kernel
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / temperature)
    if use_adj:
        # adj = logQ + BIG * pad_mask, merged into ONE subtract
        s = s - adj_tile
    if use_ids:
        eye = row_col == colidx_row  # [RQ, 1] == [1, CK]
        dup = ids_row_col == ids_col_row  # [RQ, 1] == [1, CK]
        s = jnp.where(dup & ~eye, NEG, s)
    return s


def _fwd_kernel(q_ref, ct_ref, adj_ref, idr_ref, idc_ref, row_ref, colidx_ref,
                lse_ref, m_scr, l_scr, *,
                nk, temperature, use_adj, use_ids):
    wk = pl.program_id(1)

    @pl.when(wk == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)

    s = _score_tile(
        q_ref[:], ct_ref[:], adj_ref[0:1, :], idr_ref[:, 0:1], idc_ref[0:1, :],
        row_ref[:, 0:1], colidx_ref[0:1, :], temperature, use_adj, use_ids,
    )
    m_old = m_scr[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    l_scr[:] = l_scr[:] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(s - m_new), axis=1, keepdims=True
    )
    m_scr[:] = m_new

    @pl.when(wk == nk - 1)
    def _():
        lse = m_scr[:] + jnp.log(l_scr[:])  # [RQ, 1]
        lse_ref[:] = jnp.broadcast_to(lse, lse_ref.shape)


def _dq_kernel(q_ref, ct_ref, c_ref, adj_ref, idr_ref, idc_ref, row_ref,
               colidx_ref, lse_ref, g_ref, dq_ref, acc_scr, *,
               nk, temperature, use_adj, use_ids):
    """dq_i = (1/T) * sum_j g_i * softmax_ij * c_j  (q-block-major; the
    positive-score term is autodiffed outside — it's elementwise in i)."""
    wk = pl.program_id(1)

    @pl.when(wk == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = _score_tile(
        q_ref[:], ct_ref[:], adj_ref[0:1, :], idr_ref[:, 0:1], idc_ref[0:1, :],
        row_ref[:, 0:1], colidx_ref[0:1, :], temperature, use_adj, use_ids,
    )
    p = jnp.exp(s - lse_ref[:, 0:1]) * g_ref[:, 0:1]  # [RQ, CK]
    acc_scr[:] += jax.lax.dot_general(
        p.astype(jnp.bfloat16), c_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(wk == nk - 1)
    def _():
        dq_ref[:] = acc_scr[:] * (1.0 / temperature)


def _dc_kernel(q_ref, ct_ref, adj_ref, idr_ref, idc_ref, row_ref,
               colidx_ref, lse_ref, g_ref, dc_ref, acc_scr, *,
               nq, temperature, use_adj, use_ids):
    """dc_j = (1/T) * sum_i g_i * softmax_ij * q_i  (k-block-major: the k
    tile's accumulator stays in VMEM while q tiles stream)."""
    wq = pl.program_id(1)

    @pl.when(wq == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = _score_tile(
        q_ref[:], ct_ref[:], adj_ref[0:1, :], idr_ref[:, 0:1], idc_ref[0:1, :],
        row_ref[:, 0:1], colidx_ref[0:1, :], temperature, use_adj, use_ids,
    )
    p = jnp.exp(s - lse_ref[:, 0:1]) * g_ref[:, 0:1]  # [RQ, CK]
    acc_scr[:] += jax.lax.dot_general(
        p.astype(jnp.bfloat16), q_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),  # [CK, D]
        preferred_element_type=jnp.float32,
    )

    @pl.when(wq == nq - 1)
    def _():
        dc_ref[:] = acc_scr[:] * (1.0 / temperature)


def _blocks(bq: int, bk: int, rq: int, ck: int) -> tuple[int, int]:
    rq = min(rq, bq)
    ck = min(ck, bk)
    while bq % rq:
        rq //= 2
    while bk % ck:
        ck //= 2
    return rq, ck


def softmax_kernel_shapes_ok(bk: int, d: int, bq: int | None = None) -> bool:
    """Shapes the fused kernels tile cleanly: 128-divisible batch dims (q rows
    may be a shard of the columns) and a modest embedding dim (zero-padded to
    a lane multiple inside the wrapper, so d itself need not be 128-aligned)."""
    if bq is None:
        bq = bk
    return (
        bk % 128 == 0 and bk >= 256 and bq % 128 == 0 and bq >= 128
        and bk % bq == 0 and 0 < d <= 2048
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9)
)
def _lse_fused(
    q: jax.Array,  # [BQ, D] f32 (D a multiple of 128)
    c: jax.Array,  # [BK, D] f32 — all in-batch candidates
    row_ids_f: jax.Array,  # [BQ] f32 item ids of each row's positive; zeros when unused
    col_ids_f: jax.Array,  # [BK] f32 item ids of each column; zeros when unused
    log_q: jax.Array,  # [BK] f32; pass zeros when unused
    rows_f: jax.Array,  # [BQ] f32 GLOBAL row index (positive's column) per q row
    temperature: float,
    n_valid: int | None,
    flags: tuple,  # (use_ids, use_logq) — static
    interpret: bool | None,
) -> jax.Array:
    """Per-row logsumexp_j s_ij of the adjusted in-batch score matrix,
    computed without materializing it. Differentiable in (q, c); the
    positive-score term is plain jnp in `lse_and_pos` (autodiff covers it)."""
    return _lse_fwd_impl(q, c, row_ids_f, col_ids_f, log_q, rows_f,
                         temperature, n_valid, flags, interpret)


def lse_and_pos(
    q: jax.Array,
    c: jax.Array,
    row_ids_f: jax.Array,
    col_ids_f: jax.Array,
    log_q: jax.Array,
    rows_f: jax.Array,
    temperature: float,
    n_valid: int | None,
    flags: tuple,
    interpret: bool | None,
) -> tuple[jax.Array, jax.Array]:
    """Per-row (logsumexp_j s_ij, s_i,pos). The lse rides the fused Pallas
    kernels; the positive score is an O(B*D) rowwise dot OUTSIDE the kernel
    (q_i . c_pos(i) / T - logQ_pos(i)) — removing its per-tile extraction
    from the VPU-bound forward pass and letting autodiff produce its exact
    f32 gradient (DESIGN §6c-r4). `rows_f` must be contiguous ascending
    (row_offset + arange), which makes c_pos a slice, not a gather."""
    use_ids, use_logq = flags
    bq = q.shape[0]
    lse = _lse_fused(q, c, row_ids_f, col_ids_f, log_q, rows_f,
                     temperature, n_valid, flags, interpret)
    start = rows_f[0].astype(jnp.int32)
    c_rows = jax.lax.dynamic_slice_in_dim(c, start, bq, axis=0)
    pos = jnp.sum(q * c_rows, axis=1) * (1.0 / temperature)
    if use_logq:
        pos = pos - jax.lax.dynamic_slice_in_dim(log_q, start, bq)
    if n_valid is not None:
        # a padded row's own column is pad-masked in the score matrix
        pos = jnp.where(rows_f >= n_valid, NEG, pos)
    return lse, pos


def _bcast128(x: jax.Array) -> jax.Array:
    """[B] -> [B, 128]: sublane-oriented per-row scalars without 1-lane IO
    (Mosaic-friendly; the 128x redundant bytes are ~0.04 ms at bs=64k)."""
    return jnp.broadcast_to(x[:, None], (x.shape[0], 128))


def _common_inputs(q, c, row_ids_f, col_ids_f, log_q, rows_f, n_valid,
                   use_logq):
    """Kernel operands: bf16 q/cT (converted ONCE — halves kernel DMA; the
    kernels' dots take bf16 operands anyway), a merged additive adjust row
    (logQ + BIG*pad so the kernels apply ONE subtract), and the global
    column-index row (replaces a per-tile iota)."""
    bk = c.shape[0]
    q16 = q.astype(jnp.bfloat16)  # [BQ, D]
    ct16 = c.T.astype(jnp.bfloat16)  # [D, BK]
    colidx = jnp.arange(bk, dtype=jnp.float32)
    adj = log_q.astype(jnp.float32) if use_logq else jnp.zeros((bk,), jnp.float32)
    if n_valid is not None:
        adj = adj + jnp.where(colidx >= n_valid, -NEG, 0.0)
    adj_row = adj[None, :]  # [1, BK]
    colidx_row = colidx[None, :]  # [1, BK]
    ids_row = col_ids_f[None, :].astype(jnp.float32)  # [1, BK] (column ids)
    ids_col = _bcast128(row_ids_f.astype(jnp.float32))  # [BQ, 128] (row ids)
    row_col = _bcast128(rows_f.astype(jnp.float32))  # [BQ, 128] global rows
    return q16, ct16, adj_row, colidx_row, ids_row, ids_col, row_col


def _lse_fwd_impl(q, c, row_ids_f, col_ids_f, log_q, rows_f, temperature,
                  n_valid, flags, interpret, rq: int = 1024, ck: int = 512):
    if interpret is None:
        interpret = _auto_interpret()
    use_ids, use_logq = flags
    use_adj = use_logq or n_valid is not None
    (bq, d), bk = q.shape, c.shape[0]
    rq, ck = _blocks(bq, bk, rq, ck)
    nq, nk = bq // rq, bk // ck
    q16, ct16, adj_row, colidx_row, ids_row, ids_col, row_col = _common_inputs(
        q, c, row_ids_f, col_ids_f, log_q, rows_f, n_valid, use_logq)

    kern = functools.partial(
        _fwd_kernel, nk=nk, temperature=temperature,
        use_adj=use_adj, use_ids=use_ids,
    )
    lse_b = pl.pallas_call(
        kern,
        grid=(nq, nk),
        in_specs=[
            pl.BlockSpec((rq, d), lambda wq, wk: (wq, 0)),      # q block (bf16)
            pl.BlockSpec((d, ck), lambda wq, wk: (0, wk)),      # cT tile (bf16)
            pl.BlockSpec((1, ck), lambda wq, wk: (0, wk)),      # adj tile
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),    # row ids
            pl.BlockSpec((1, ck), lambda wq, wk: (0, wk)),      # col ids
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),    # global rows
            pl.BlockSpec((1, ck), lambda wq, wk: (0, wk)),      # col index
        ],
        out_specs=pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),
        out_shape=jax.ShapeDtypeStruct((bq, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rq, 1), jnp.float32),
            pltpu.VMEM((rq, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(q16, ct16, adj_row, ids_col, ids_row, row_col, colidx_row)
    return lse_b[:, 0]


def _lse_fwd(q, c, row_ids_f, col_ids_f, log_q, rows_f, temperature,
             n_valid, flags, interpret):
    lse = _lse_fwd_impl(q, c, row_ids_f, col_ids_f, log_q, rows_f,
                        temperature, n_valid, flags, interpret)
    return lse, (q, c, row_ids_f, col_ids_f, log_q, rows_f, lse)


def _lse_bwd(temperature, n_valid, flags, interpret, res, g_lse,
             rq: int = 1024, ck: int = 512):
    """VJP of the lse alone: ds_ij = g_lse_i * softmax_ij; two recompute
    passes (q-block-major for dq, k-block-major for dc). The positive-score
    term lives outside the custom_vjp (plain jnp in `lse_and_pos`), so
    autodiff adds its slice/update contribution separately."""
    q, c, row_ids_f, col_ids_f, log_q, rows_f, lse = res
    if interpret is None:
        interpret = _auto_interpret()
    use_ids, use_logq = flags
    use_adj = use_logq or n_valid is not None
    (bq, d), bk = q.shape, c.shape[0]
    rq, ck = _blocks(bq, bk, rq, ck)
    nq, nk = bq // rq, bk // ck
    q16, ct16, adj_row, colidx_row, ids_row, ids_col, row_col = _common_inputs(
        q, c, row_ids_f, col_ids_f, log_q, rows_f, n_valid, use_logq)
    c16 = c.astype(jnp.bfloat16)
    lse_b = _bcast128(lse)
    g_b = _bcast128(g_lse.astype(jnp.float32))

    common = dict(
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, nk=nk, temperature=temperature,
                          use_adj=use_adj, use_ids=use_ids),
        grid=(nq, nk),
        in_specs=[
            pl.BlockSpec((rq, d), lambda wq, wk: (wq, 0)),      # q block (bf16)
            pl.BlockSpec((d, ck), lambda wq, wk: (0, wk)),      # cT tile (bf16)
            pl.BlockSpec((ck, d), lambda wq, wk: (wk, 0)),      # c tile (bf16)
            pl.BlockSpec((1, ck), lambda wq, wk: (0, wk)),      # adj tile
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),    # row ids
            pl.BlockSpec((1, ck), lambda wq, wk: (0, wk)),      # col ids
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),    # global rows
            pl.BlockSpec((1, ck), lambda wq, wk: (0, wk)),      # col index
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),    # lse
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),    # g_lse
        ],
        out_specs=pl.BlockSpec((rq, d), lambda wq, wk: (wq, 0)),
        out_shape=jax.ShapeDtypeStruct((bq, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rq, d), jnp.float32)],
        **common,
    )(q16, ct16, c16, adj_row, ids_col, ids_row, row_col, colidx_row,
      lse_b, g_b)

    dc = pl.pallas_call(
        functools.partial(_dc_kernel, nq=nq, temperature=temperature,
                          use_adj=use_adj, use_ids=use_ids),
        grid=(nk, nq),
        in_specs=[
            pl.BlockSpec((rq, d), lambda wk, wq: (wq, 0)),      # q block (bf16)
            pl.BlockSpec((d, ck), lambda wk, wq: (0, wk)),      # cT tile (bf16)
            pl.BlockSpec((1, ck), lambda wk, wq: (0, wk)),      # adj tile
            pl.BlockSpec((rq, 128), lambda wk, wq: (wq, 0)),    # row ids
            pl.BlockSpec((1, ck), lambda wk, wq: (0, wk)),      # col ids
            pl.BlockSpec((rq, 128), lambda wk, wq: (wq, 0)),    # global rows
            pl.BlockSpec((1, ck), lambda wk, wq: (0, wk)),      # col index
            pl.BlockSpec((rq, 128), lambda wk, wq: (wq, 0)),    # lse
            pl.BlockSpec((rq, 128), lambda wk, wq: (wq, 0)),    # g_lse
        ],
        out_specs=pl.BlockSpec((ck, d), lambda wk, wq: (wk, 0)),
        out_shape=jax.ShapeDtypeStruct((bk, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ck, d), jnp.float32)],
        **common,
    )(q16, ct16, adj_row, ids_col, ids_row, row_col, colidx_row, lse_b, g_b)

    return (dq.astype(q.dtype), dc.astype(c.dtype), jnp.zeros_like(row_ids_f),
            jnp.zeros_like(col_ids_f), jnp.zeros_like(log_q),
            jnp.zeros_like(rows_f))


_lse_fused.defvjp(_lse_fwd, _lse_bwd)


def _pad_dim(x: jax.Array) -> jax.Array:
    """Zero-pad the embedding dim to a lane multiple (128): zero columns add
    zero to every dot product, so scores are bit-unchanged; jnp.pad's VJP
    slices the gradient back."""
    d = x.shape[1]
    pad = (-d) % 128
    return x if pad == 0 else jnp.pad(x, ((0, 0), (0, pad)))


def sampled_softmax_fused_parts(
    query_emb: jax.Array,  # [BQ, D]
    cand_emb: jax.Array,  # [BK, D] — all in-batch candidates
    labels: jax.Array,  # [BQ]
    row_item_ids: jax.Array | None = None,  # [BQ] hashed ids (< 2^24)
    col_item_ids: jax.Array | None = None,  # [BK]; defaults to row_item_ids
    log_q: jax.Array | None = None,  # [BK]
    temperature: float = 1.0,
    n_valid: int | None = None,
    row_offset: jax.Array | int = 0,  # global index of q row 0
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused loss numerator/denominator: (sum over label==1 rows of
    (lse_i - s_i,pos), count of label==1 rows). Shard_map callers psum both
    over the data axis and divide once globally."""
    bq, bk = query_emb.shape[0], cand_emb.shape[0]
    if col_item_ids is None:
        col_item_ids = row_item_ids
    use_ids = row_item_ids is not None
    if use_ids == (col_item_ids is None):
        raise ValueError("row_item_ids and col_item_ids must both be set or both None")
    row_ids_f = (jnp.zeros((bq,), jnp.float32) if not use_ids
                 else row_item_ids.astype(jnp.float32))
    col_ids_f = (jnp.zeros((bk,), jnp.float32) if not use_ids
                 else col_item_ids.astype(jnp.float32))
    lq = (jnp.zeros((bk,), jnp.float32) if log_q is None
          else log_q.astype(jnp.float32))
    rows_f = (jnp.arange(bq, dtype=jnp.int32) + row_offset).astype(jnp.float32)
    lse, pos = lse_and_pos(
        _pad_dim(query_emb.astype(jnp.float32)),
        _pad_dim(cand_emb.astype(jnp.float32)),
        row_ids_f, col_ids_f, lq, rows_f,
        temperature, n_valid, (use_ids, log_q is not None), interpret,
    )
    w = labels.astype(jnp.float32)
    if n_valid is not None:
        # pad entries may appear among the q rows too (square case): a padded
        # row's global index lands in the masked column range
        w = w * (rows_f < n_valid)
    return ((lse - pos) * w).sum(), w.sum()


def sampled_softmax_fused(
    query_emb: jax.Array,  # [B, D]
    cand_emb: jax.Array,  # [B, D]
    labels: jax.Array,  # [B]
    item_ids: jax.Array | None = None,  # [B] hashed ids (< 2^24)
    log_q: jax.Array | None = None,  # [B]
    temperature: float = 1.0,
    n_valid: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in for the scan-path `_chunked_sampled_softmax`: mean over
    label==1 rows of (lse_i - s_ii), with the O(B^2) scores fused in VMEM."""
    num, den = sampled_softmax_fused_parts(
        query_emb, cand_emb, labels, item_ids, None, log_q,
        temperature, n_valid, 0, interpret,
    )
    return num / jnp.maximum(den, 1.0)
