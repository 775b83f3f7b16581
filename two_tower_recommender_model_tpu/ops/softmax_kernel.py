"""Fused in-batch sampled-softmax kernels (flash-softmax for retrieval).

The blockwise scan path (`models/losses.py:_chunked_sampled_softmax`) is
HBM-bound: every [R, B] score block round-trips HBM for its logsumexp (~34 GB
per step at bs=64k — 42 ms of traffic against a 5.6 ms MXU floor for the
[B, B] matmul itself). These kernels stream q/c tiles and keep every score
tile in VMEM with an ONLINE logsumexp (the flash-attention recurrence), so
the O(B^2) scores never materialize:

- `_lse_pos_fwd`: per-row (logsumexp_j s_ij, s_i,pos) over k tiles with
  running (max, sum) rescaling;
- backward: two recompute passes — q-block-major for dq (dq_i = sum_j
  softmax_ij * g_i * c_j) and k-block-major for dc (dc_j = sum_i ... q_i) —
  wired through `jax.custom_vjp` on `lse_and_pos`.

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


def _score_tile(q_blk, ct_tile, logq_tile, ids_row_col, ids_col_row, row_col,
                wk, rq, ck, temperature, n_valid, use_ids, use_logq):
    """Adjusted score tile [RQ, CK] for one (q block, key tile) pair — the same
    adjustment order as the scan path (temperature, logQ, pad mask, dup mask
    excluding the positive column). `row_col` is [RQ, 1] global row indices;
    the positive of row i is column row_col[i]."""
    s = jax.lax.dot_general(
        q_blk.astype(jnp.bfloat16), ct_tile.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / temperature)
    if use_logq:
        s = s - logq_tile
    cols = wk * ck + jax.lax.broadcasted_iota(jnp.float32, (rq, ck), 1)
    eye = row_col == cols  # [RQ, 1] == [RQ, CK]
    if n_valid is not None:
        s = jnp.where(cols >= n_valid, NEG, s)
    if use_ids:
        dup = ids_row_col == ids_col_row  # [RQ, 1] == [1, CK]
        s = jnp.where(dup & ~eye, NEG, s)
    return s, eye


def _fwd_kernel(q_ref, ct_ref, logq_ref, idr_ref, idc_ref, row_ref,
                lse_ref, pos_ref, m_scr, l_scr, p_scr, *,
                rq, ck, nk, temperature, n_valid, use_ids, use_logq):
    wk = pl.program_id(1)

    @pl.when(wk == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        p_scr[:] = jnp.zeros_like(p_scr)

    s, eye = _score_tile(
        q_ref[:], ct_ref[:], logq_ref[0:1, :], idr_ref[:, 0:1], idc_ref[0:1, :],
        row_ref[:, 0:1], wk, rq, ck, temperature, n_valid, use_ids, use_logq,
    )
    p_scr[:] += jnp.sum(jnp.where(eye, s, 0.0), axis=1, keepdims=True)
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
        pos_ref[:] = jnp.broadcast_to(p_scr[:], pos_ref.shape)


def _dq_kernel(q_ref, ct_ref, c_ref, logq_ref, idr_ref, idc_ref, row_ref,
               lse_ref, g_ref, dq_ref, acc_scr, *,
               rq, ck, nk, temperature, n_valid, use_ids, use_logq):
    """dq_i = (1/T) * sum_j g_i * softmax_ij * c_j  (q-block-major; the
    positive-score g_pos term is added outside — it's elementwise in i)."""
    wk = pl.program_id(1)

    @pl.when(wk == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s, _eye = _score_tile(
        q_ref[:], ct_ref[:], logq_ref[0:1, :], idr_ref[:, 0:1], idc_ref[0:1, :],
        row_ref[:, 0:1], wk, rq, ck, temperature, n_valid, use_ids, use_logq,
    )
    p = jnp.exp(s - lse_ref[:, 0:1]) * g_ref[:, 0:1]  # [RQ, CK]
    acc_scr[:] += jax.lax.dot_general(
        p.astype(jnp.bfloat16), c_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(wk == nk - 1)
    def _():
        dq_ref[:] = acc_scr[:] * (1.0 / temperature)


def _dc_kernel(q_ref, ct_ref, c_ref, logq_ref, idr_ref, idc_ref, row_ref,
               lse_ref, g_ref, dc_ref, acc_scr, *,
               rq, ck, nq, temperature, n_valid, use_ids, use_logq):
    """dc_j = (1/T) * sum_i g_i * softmax_ij * q_i  (k-block-major: the k
    tile's accumulator stays in VMEM while q tiles stream)."""
    wk = pl.program_id(0)
    wq = pl.program_id(1)

    @pl.when(wq == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s, _eye = _score_tile(
        q_ref[:], ct_ref[:], logq_ref[0:1, :], idr_ref[:, 0:1], idc_ref[0:1, :],
        row_ref[:, 0:1], wk, rq, ck, temperature, n_valid, use_ids, use_logq,
    )
    p = jnp.exp(s - lse_ref[:, 0:1]) * g_ref[:, 0:1]  # [RQ, CK]
    acc_scr[:] += jax.lax.dot_general(
        p.astype(jnp.bfloat16), q_ref[:].astype(jnp.bfloat16),
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
def lse_and_pos(
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
) -> tuple[jax.Array, jax.Array]:
    """Per-row (logsumexp_j s_ij, s_i,pos) of the adjusted in-batch score
    matrix, computed without materializing it. Differentiable in (q, c)."""
    lse, pos = _lse_pos_fwd_impl(q, c, row_ids_f, col_ids_f, log_q, rows_f,
                                 temperature, n_valid, flags, interpret)
    return lse, pos


def _bcast128(x: jax.Array) -> jax.Array:
    """[B] -> [B, 128]: sublane-oriented per-row scalars without 1-lane IO
    (Mosaic-friendly; the 128x redundant bytes are ~0.04 ms at bs=64k)."""
    return jnp.broadcast_to(x[:, None], (x.shape[0], 128))


def _common_inputs(q, c, row_ids_f, col_ids_f, log_q, rows_f):
    ct = c.T  # [D, BK]
    logq_row = log_q[None, :].astype(jnp.float32)  # [1, BK]
    ids_row = col_ids_f[None, :].astype(jnp.float32)  # [1, BK] (column ids)
    ids_col = _bcast128(row_ids_f.astype(jnp.float32))  # [BQ, 128] (row ids)
    row_col = _bcast128(rows_f.astype(jnp.float32))  # [BQ, 128] global rows
    return ct, logq_row, ids_row, ids_col, row_col


def _lse_pos_fwd_impl(q, c, row_ids_f, col_ids_f, log_q, rows_f, temperature,
                      n_valid, flags, interpret, rq: int = 1024, ck: int = 512):
    if interpret is None:
        interpret = _auto_interpret()
    use_ids, use_logq = flags
    (bq, d), bk = q.shape, c.shape[0]
    rq, ck = _blocks(bq, bk, rq, ck)
    nq, nk = bq // rq, bk // ck
    ct, logq_row, ids_row, ids_col, row_col = _common_inputs(
        q, c, row_ids_f, col_ids_f, log_q, rows_f)

    kern = functools.partial(
        _fwd_kernel, rq=rq, ck=ck, nk=nk, temperature=temperature,
        n_valid=n_valid, use_ids=use_ids, use_logq=use_logq,
    )
    lse_b, pos_b = pl.pallas_call(
        kern,
        grid=(nq, nk),
        in_specs=[
            pl.BlockSpec((rq, d), lambda wq, wk: (wq, 0)),      # q block
            pl.BlockSpec((d, ck), lambda wq, wk: (0, wk)),      # cT tile
            pl.BlockSpec((1, ck), lambda wq, wk: (0, wk)),      # logq tile
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),    # row ids
            pl.BlockSpec((1, ck), lambda wq, wk: (0, wk)),      # col ids
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),    # global rows
        ],
        out_specs=[
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((bq, 128), jnp.float32),
            jax.ShapeDtypeStruct((bq, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rq, 1), jnp.float32),
            pltpu.VMEM((rq, 1), jnp.float32),
            pltpu.VMEM((rq, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(q.astype(jnp.float32), ct.astype(jnp.float32), logq_row, ids_col,
      ids_row, row_col)
    return lse_b[:, 0], pos_b[:, 0]


def _lse_pos_fwd(q, c, row_ids_f, col_ids_f, log_q, rows_f, temperature,
                 n_valid, flags, interpret):
    lse, pos = _lse_pos_fwd_impl(q, c, row_ids_f, col_ids_f, log_q, rows_f,
                                 temperature, n_valid, flags, interpret)
    return (lse, pos), (q, c, row_ids_f, col_ids_f, log_q, rows_f, lse)


def _lse_pos_bwd(temperature, n_valid, flags, interpret, res, grads,
                 rq: int = 1024, ck: int = 512):
    """VJP: ds_ij = g_lse_i * softmax_ij + g_pos_i * [j == pos_i]; two
    recompute passes fold the softmax term; the positive term is elementwise."""
    q, c, row_ids_f, col_ids_f, log_q, rows_f, lse = res
    g_lse, g_pos = grads
    if interpret is None:
        interpret = _auto_interpret()
    use_ids, use_logq = flags
    (bq, d), bk = q.shape, c.shape[0]
    rq, ck = _blocks(bq, bk, rq, ck)
    nq, nk = bq // rq, bk // ck
    ct, logq_row, ids_row, ids_col, row_col = _common_inputs(
        q, c, row_ids_f, col_ids_f, log_q, rows_f)
    lse_b = _bcast128(lse)
    g_b = _bcast128(g_lse.astype(jnp.float32))

    common = dict(
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, rq=rq, ck=ck, nk=nk,
                          temperature=temperature, n_valid=n_valid,
                          use_ids=use_ids, use_logq=use_logq),
        grid=(nq, nk),
        in_specs=[
            pl.BlockSpec((rq, d), lambda wq, wk: (wq, 0)),
            pl.BlockSpec((d, ck), lambda wq, wk: (0, wk)),
            pl.BlockSpec((ck, d), lambda wq, wk: (wk, 0)),      # c tile
            pl.BlockSpec((1, ck), lambda wq, wk: (0, wk)),
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),
            pl.BlockSpec((1, ck), lambda wq, wk: (0, wk)),
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),    # global rows
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),    # lse
            pl.BlockSpec((rq, 128), lambda wq, wk: (wq, 0)),    # g_lse
        ],
        out_specs=pl.BlockSpec((rq, d), lambda wq, wk: (wq, 0)),
        out_shape=jax.ShapeDtypeStruct((bq, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rq, d), jnp.float32)],
        **common,
    )(q.astype(jnp.float32), ct.astype(jnp.float32), c.astype(jnp.float32),
      logq_row, ids_col, ids_row, row_col, lse_b, g_b)

    dc = pl.pallas_call(
        functools.partial(_dc_kernel, rq=rq, ck=ck, nq=nq,
                          temperature=temperature, n_valid=n_valid,
                          use_ids=use_ids, use_logq=use_logq),
        grid=(nk, nq),
        in_specs=[
            pl.BlockSpec((rq, d), lambda wk, wq: (wq, 0)),
            pl.BlockSpec((d, ck), lambda wk, wq: (0, wk)),
            pl.BlockSpec((ck, d), lambda wk, wq: (wk, 0)),
            pl.BlockSpec((1, ck), lambda wk, wq: (0, wk)),
            pl.BlockSpec((rq, 128), lambda wk, wq: (wq, 0)),
            pl.BlockSpec((1, ck), lambda wk, wq: (0, wk)),
            pl.BlockSpec((rq, 128), lambda wk, wq: (wq, 0)),    # global rows
            pl.BlockSpec((rq, 128), lambda wk, wq: (wq, 0)),
            pl.BlockSpec((rq, 128), lambda wk, wq: (wq, 0)),
        ],
        out_specs=pl.BlockSpec((ck, d), lambda wk, wq: (wk, 0)),
        out_shape=jax.ShapeDtypeStruct((bk, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ck, d), jnp.float32)],
        **common,
    )(q.astype(jnp.float32), ct.astype(jnp.float32), c.astype(jnp.float32),
      logq_row, ids_col, ids_row, row_col, lse_b, g_b)

    # positive term: ds_i,pos = g_pos_i adds (1/T) * g_pos_i * c_pos(i) to dq_i
    # and scatter-adds (1/T) * g_pos_i * q_i into dc at column pos_i. In the
    # square case pos_i == i (identity take/scatter); in the sharded case the
    # caller's rows are a contiguous [row_offset, row_offset + BQ) slice.
    gp = (g_pos.astype(jnp.float32) / temperature)[:, None]
    # rows_f is CONTIGUOUS ascending by construction (row_offset + arange in
    # sampled_softmax_fused_parts), so the column-side add is a slice update,
    # not a scatter
    start = rows_f[0].astype(jnp.int32)
    dq = dq + gp * jax.lax.dynamic_slice_in_dim(
        c.astype(jnp.float32), start, bq, axis=0)
    seg = jax.lax.dynamic_slice_in_dim(dc, start, bq, axis=0)
    dc = jax.lax.dynamic_update_slice_in_dim(
        dc, seg + gp * q.astype(jnp.float32), start, axis=0)
    return (dq.astype(q.dtype), dc.astype(c.dtype), jnp.zeros_like(row_ids_f),
            jnp.zeros_like(col_ids_f), jnp.zeros_like(log_q),
            jnp.zeros_like(rows_f))


lse_and_pos.defvjp(_lse_pos_fwd, _lse_pos_bwd)


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
