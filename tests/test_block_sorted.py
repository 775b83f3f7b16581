"""Oracle tests for the block-sorted one-hot MXU kernels (interpret mode).

The kernels' contract: for NON-DECREASING flat ids (the
`TrainConfig.sorted_feature` layout, sentinel >= N for dead slots),
`block_sorted_lookup` == `jnp.take` (exactly — each output row is
1.0 * table row + exact zeros) and `block_sorted_rowwise_adagrad` ==
`dense_rowwise_adagrad` (to f32 summation-order tolerance).

Covers the planner edge cases: ragged last block, empty blocks (dead
visits), chunks spanning many blocks, all-sentinel chunks, duplicates
crossing chunk boundaries.
"""

from __future__ import annotations

import zlib

import numpy as np
import jax.numpy as jnp
import pytest

from two_tower_recommender_model_tpu.ops.block_sorted import (
    block_sorted_aggregate,
    block_sorted_lookup,
    block_sorted_rowwise_adagrad,
    plan_block_work,
)
from two_tower_recommender_model_tpu.train.optimizer import dense_rowwise_adagrad

R, C, D = 16, 128, 128


def _case(kind: str, rng, n: int, m: int) -> np.ndarray:
    if kind == "uniform":
        ids = rng.integers(0, n, size=m)
    elif kind == "sentinels":
        ids = np.concatenate(
            [rng.integers(0, n, size=m // 2), np.full(m - m // 2, n)]
        )
    elif kind == "empty_blocks":  # ids clustered -> most blocks empty
        ids = np.concatenate(
            [rng.integers(0, R, size=m // 2), rng.integers(n - 3, n, size=m - m // 2)]
        )
    elif kind == "one_hot_row":  # one id repeated across every chunk boundary
        ids = np.full(m, 7)
    elif kind == "all_sentinel":
        ids = np.full(m, n)
    else:
        raise AssertionError(kind)
    return np.sort(ids).astype(np.int32)


CASES = ["uniform", "sentinels", "empty_blocks", "one_hot_row", "all_sentinel"]


@pytest.mark.parametrize("kind", CASES)
@pytest.mark.parametrize("n", [220, 16 * 11])  # ragged + exact-multiple of R
def test_lookup_oracle(kind, n):
    rng = np.random.default_rng(zlib.crc32(kind.encode()) % 2**31)
    m = 3 * C
    sids = _case(kind, rng, n, m)
    table = rng.normal(size=(n, D)).astype(np.float32)
    out = np.asarray(
        block_sorted_lookup(jnp.asarray(table), jnp.asarray(sids), r=R, c=C, interpret=True)
    )
    safe = np.minimum(sids, n - 1)
    exp = np.where((sids < n)[:, None], table[safe], 0.0)
    np.testing.assert_array_equal(out, exp)  # gather must be EXACT


@pytest.mark.parametrize("kind", CASES)
@pytest.mark.parametrize("n", [220, 16 * 11])
def test_lookup_out_dtype_bf16(kind, n):
    """out_dtype=bf16 (round-4 grad-wire companion): the kernel-side rounding
    must equal the downstream f32-lookup-then-cast it replaces — each output
    row is one nonzero contribution plus exact zeros, so rounding commutes
    with the accumulation across blocks."""
    rng = np.random.default_rng(zlib.crc32(kind.encode()) % 2**31 + 7)
    m = 3 * C
    sids = _case(kind, rng, n, m)
    table = rng.normal(size=(n, D)).astype(np.float32)
    out = np.asarray(
        block_sorted_lookup(
            jnp.asarray(table), jnp.asarray(sids), r=R, c=C, interpret=True,
            matmul_dtype="bfloat16", out_dtype=jnp.bfloat16,
        ).astype(jnp.float32)
    )
    ref = np.asarray(
        block_sorted_lookup(
            jnp.asarray(table), jnp.asarray(sids), r=R, c=C, interpret=True,
            matmul_dtype="bfloat16",
        ).astype(jnp.bfloat16).astype(jnp.float32)
    )
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("kind", CASES)
@pytest.mark.parametrize("n", [220, 16 * 11])
def test_adagrad_oracle(kind, n):
    rng = np.random.default_rng(zlib.crc32(kind.encode()) % 2**31 + 1)
    m = 3 * C
    sids = _case(kind, rng, n, m)
    grads = rng.normal(size=(m, D)).astype(np.float32)
    table = rng.normal(size=(n, D)).astype(np.float32)
    acc = np.abs(rng.normal(size=(n,))).astype(np.float32)

    got_t, got_a = block_sorted_rowwise_adagrad(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(sids), jnp.asarray(grads),
        lr=0.05, eps=1e-10, r=R, c=C, interpret=True,
    )
    exp_t, exp_a = dense_rowwise_adagrad(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(sids), jnp.asarray(grads),
        0.05, 1e-10, ids_sorted=True,
    )
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(exp_a), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(exp_t), rtol=1e-5, atol=1e-6)


def test_aggregate_matches_bincount():
    rng = np.random.default_rng(3)
    n, m = 220, 4 * C
    sids = _case("uniform", rng, n, m)
    grads = rng.normal(size=(m, D)).astype(np.float32)
    out = np.asarray(
        block_sorted_aggregate(n, jnp.asarray(sids), jnp.asarray(grads), r=R, c=C, interpret=True)
    )
    exp = np.zeros((n, D), np.float64)
    np.add.at(exp, sids, grads.astype(np.float64))
    np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-5)


def test_plan_bounds_and_coverage():
    """Every block and every chunk is visited; W_real within the static bound;
    consecutive visits per block and per chunk (the kernels' revisiting
    contract)."""
    rng = np.random.default_rng(11)
    for kind in CASES:
        n, m = 220, 3 * C
        sids = _case(kind, rng, n, m)
        wb, wc, wr = (np.asarray(x) for x in plan_block_work(jnp.asarray(sids), n, R, C))
        g = -(-n // R)
        w_real = int(wr[0])
        assert w_real <= m // C + 2 * g - 1
        real_b, real_c = wb[:w_real], wc[:w_real]
        assert set(real_b) == set(range(g)), kind
        assert set(real_c) == set(range(m // C)), kind
        assert (np.diff(real_b) >= 0).all()
        # consecutive-visit contract: once a block/chunk is left, never revisited
        for seq in (wb, wc):  # padded tail repeats the last pair, still contiguous
            _, idx = np.unique(seq, return_index=True)
            starts = np.sort(idx)
            for s, e in zip(starts, list(starts[1:]) + [len(seq)]):
                assert (seq[s:e] == seq[s]).all(), kind
        # ids of a dead visit's chunk never land in that block
        for w in range(w_real):
            b, t = int(wb[w]), int(wc[w])
            chunk = sids[t * C : (t + 1) * C]
            in_block = ((chunk >= b * R) & (chunk < (b + 1) * R)).sum()
            # (covered visits may or may not have ids; just assert the sum over
            # visits reproduces every id exactly once)
        # each id counted exactly once across its block's visits
        counts = np.zeros(n + 1, np.int64)
        for w in range(w_real):
            b, t = int(wb[w]), int(wc[w])
            chunk = sids[t * C : (t + 1) * C]
            sel = (chunk >= b * R) & (chunk < min((b + 1) * R, n + 1))
            np.add.at(counts, chunk[sel], 1)
        exp_counts = np.bincount(np.minimum(sids, n), minlength=n + 1)
        np.testing.assert_array_equal(counts[:n], exp_counts[:n])


def test_validation_errors():
    table = jnp.zeros((64, 128))
    with pytest.raises(ValueError, match="divide"):
        block_sorted_lookup(table, jnp.zeros(300, jnp.int32), r=16, c=C)
    with pytest.raises(ValueError, match="d%128"):
        block_sorted_lookup(jnp.zeros((64, 64)), jnp.zeros(C, jnp.int32), r=16, c=C)


# --- train-step integration (TrainConfig.block_sorted_kernel) ---


def test_train_step_block_sorted_matches_baseline():
    """block_sorted_kernel="float32" == the hinted-scatter sorted baseline on
    identical sorted batches (gather rows exact; Adagrad within f32
    summation-order tolerance)."""
    import jax

    from two_tower_recommender_model_tpu import config as cfg_lib
    from two_tower_recommender_model_tpu.data import SyntheticClickstream
    from two_tower_recommender_model_tpu.data.device_featurizer import (
        PackedFeaturizer,
        make_packed_train_step,
    )
    from two_tower_recommender_model_tpu.train.step import (
        create_train_state,
        make_train_step,
    )

    mcfg = cfg_lib.two_tower_model_config(300, 80, embedding_dim=128)
    ds = SyntheticClickstream(300, 80, seed=7)
    cols_list = [ds.sample(256, start=i) for i in range(3)]
    feat = PackedFeaturizer(mcfg, sort_feature="user_id")

    def run(tcfg):
        state, dense_opt = create_train_state(jax.random.key(5), mcfg, tcfg)
        core = make_train_step(mcfg, tcfg, dense_opt, donate=False, jit=False)
        step = make_packed_train_step(core, mcfg)
        losses = []
        for cols in cols_list:
            state, out = step(state, jax.tree.map(jnp.asarray, feat(cols)))
            losses.append(float(out["loss"]))
        return state, losses

    state_a, loss_a = run(cfg_lib.TrainConfig(sorted_feature="user_id"))
    state_b, loss_b = run(
        cfg_lib.TrainConfig(sorted_feature="user_id", block_sorted_kernel="float32")
    )
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
    for name in state_a.tables:
        np.testing.assert_allclose(
            np.asarray(state_a.tables[name]), np.asarray(state_b.tables[name]),
            rtol=1e-5, atol=1e-6,
        )
    for pa, pb in zip(
        jax.tree.leaves(state_a.dense_params), jax.tree.leaves(state_b.dense_params)
    ):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-4, atol=1e-6)

    # block_sorted_gather=False: plain XLA take forward + block-kernel
    # updates. The forward gather is EXACT either way, so tables/losses stay
    # in the same tolerance class as the full block-kernel step.
    state_c, loss_c = run(
        cfg_lib.TrainConfig(sorted_feature="user_id",
                            block_sorted_kernel="float32",
                            block_sorted_gather=False)
    )
    np.testing.assert_allclose(loss_a, loss_c, rtol=1e-5)
    for name in state_a.tables:
        np.testing.assert_allclose(
            np.asarray(state_a.tables[name]), np.asarray(state_c.tables[name]),
            rtol=1e-5, atol=1e-6,
        )


def test_block_sorted_without_sorted_feature_matches_baseline():
    """block_sorted_kernel WITHOUT a sorted_feature: every eligible table's
    update routes through the device-sort + fused kernel front-end
    (`device_sorted_fused_adagrad`) on UNSORTED batches, matching the plain
    scatter-path step to f32 summation-order tolerance."""
    import jax

    from two_tower_recommender_model_tpu import config as cfg_lib
    from two_tower_recommender_model_tpu.data import Featurizer, SyntheticClickstream
    from two_tower_recommender_model_tpu.train.step import (
        create_train_state,
        make_train_step,
    )

    mcfg = cfg_lib.two_tower_model_config(300, 80, embedding_dim=128)
    ds = SyntheticClickstream(300, 80, seed=7)
    feat = Featurizer(mcfg)
    batches = [feat(ds.sample(256, start=i)) for i in range(3)]

    def run(tcfg):
        state, dense_opt = create_train_state(jax.random.key(5), mcfg, tcfg)
        step = make_train_step(mcfg, tcfg, dense_opt, donate=False)
        losses = []
        for b in batches:
            state, out = step(state, b)
            losses.append(float(out["loss"]))
        return state, losses

    state_a, loss_a = run(cfg_lib.TrainConfig())
    state_b, loss_b = run(cfg_lib.TrainConfig(block_sorted_kernel="float32"))
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
    for name in state_a.tables:
        np.testing.assert_allclose(
            np.asarray(state_a.tables[name]), np.asarray(state_b.tables[name]),
            rtol=1e-5, atol=1e-6,
        )


@pytest.mark.parametrize("kind", CASES)
@pytest.mark.parametrize("n", [220, 16 * 11])
def test_fused_adagrad_matches_two_kernel_path(kind, n):
    """The single-kernel fused aggregation+epilogue must be BIT-identical to
    the two-kernel path (same f32 summation order, exact bf16x3 acc
    transposes) and match the scatter oracle to f32 tolerance."""
    from two_tower_recommender_model_tpu.ops.block_sorted import (
        block_sorted_rowwise_adagrad_fused,
    )

    rng = np.random.default_rng(zlib.crc32(kind.encode()) % 2**31 + 2)
    m = 3 * C
    sids = _case(kind, rng, n, m)
    grads = rng.normal(size=(m, D)).astype(np.float32)
    table = rng.normal(size=(n, D)).astype(np.float32)
    acc = np.abs(rng.normal(size=(n,))).astype(np.float32)

    two_t, two_a = block_sorted_rowwise_adagrad(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(sids), jnp.asarray(grads),
        lr=0.05, eps=1e-10, r=R, c=C, interpret=True,
    )
    fus_t, fus_a = block_sorted_rowwise_adagrad_fused(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(sids), jnp.asarray(grads),
        lr=0.05, eps=1e-10, r=R, c=C, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(fus_t), np.asarray(two_t))
    np.testing.assert_array_equal(np.asarray(fus_a), np.asarray(two_a))
    exp_t, exp_a = dense_rowwise_adagrad(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(sids), jnp.asarray(grads),
        0.05, 1e-10, ids_sorted=True,
    )
    np.testing.assert_allclose(np.asarray(fus_a), np.asarray(exp_a), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fus_t), np.asarray(exp_t), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n", [220, 16 * 11])
def test_device_sorted_fused_matches_dense_on_unsorted_ids(n):
    """device_sorted_fused_adagrad: UNSORTED ids (+ sentinels + duplicates)
    through the device sort + permute + fused kernel == dense_rowwise_adagrad
    on the same unsorted ids (f32 summation-order tolerance)."""
    from two_tower_recommender_model_tpu.train.optimizer import (
        device_sorted_fused_adagrad,
    )

    rng = np.random.default_rng(77)
    m = 3 * C
    ids = np.concatenate(
        [rng.integers(0, n, size=m - m // 8), np.full(m // 8, n)]
    ).astype(np.int32)
    rng.shuffle(ids)  # deliberately NOT sorted
    grads = rng.normal(size=(m, D)).astype(np.float32)
    table = rng.normal(size=(n, D)).astype(np.float32)
    acc = np.abs(rng.normal(size=(n,))).astype(np.float32)

    got_t, got_a = device_sorted_fused_adagrad(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(ids), jnp.asarray(grads),
        0.05, 1e-10,
    )
    exp_t, exp_a = dense_rowwise_adagrad(
        jnp.asarray(table), jnp.asarray(acc), jnp.asarray(ids), jnp.asarray(grads),
        0.05, 1e-10,
    )
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(exp_a), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(exp_t), rtol=1e-5, atol=1e-6)


def test_block_sorted_shapes_ok():
    from two_tower_recommender_model_tpu.ops.block_sorted import (
        block_sorted_shapes_ok,
    )

    assert block_sorted_shapes_ok(128, 262144)
    assert block_sorted_shapes_ok(128, 256)   # c resolves to m
    assert block_sorted_shapes_ok(256, 1024)
    assert not block_sorted_shapes_ok(64, 262144)   # d % 128
    assert not block_sorted_shapes_ok(128, 200)     # c=200 % 128
    assert not block_sorted_shapes_ok(128, 1000)    # m % c


# ---------------------------------------------------------------- int8 kernels


def _quant_setup(kind, n, rng):
    from two_tower_recommender_model_tpu.ops.quantized import quantize_table

    m = 3 * C
    sids = _case(kind, rng, n, m)
    table = rng.normal(size=(n, D)).astype(np.float32)
    qt = quantize_table(jnp.asarray(table))
    return sids, qt


@pytest.mark.parametrize("kind", CASES)
@pytest.mark.parametrize("n", [220, 16 * 11])
def test_quantized_lookup_oracle(kind, n):
    """int8 block gather vs the dequantized-gather oracle: the one-hot
    contraction of raw int8 values (exact in bf16) and the bf16x3 scale pick
    are both EXACT, so the only divergence from the numpy oracle is the final
    `* (s/127)` — XLA rewrites constant division to reciprocal multiply
    (1 ulp vs IEEE divide). Sentinel rows must be exact zeros."""
    from two_tower_recommender_model_tpu.ops.block_sorted import (
        block_sorted_lookup_quantized,
    )

    rng = np.random.default_rng(zlib.crc32(kind.encode()) % 2**31 + 5)
    sids, qt = _quant_setup(kind, n, rng)
    out = np.asarray(block_sorted_lookup_quantized(
        qt.values, qt.scales, jnp.asarray(sids), r=R, c=C, interpret=True
    ))
    vals = np.asarray(qt.values)
    scls = np.asarray(qt.scales)
    safe = np.minimum(sids, n - 1)
    exp = np.where(
        (sids < n)[:, None],
        vals[safe].astype(np.float32) * (scls[safe][:, None] / np.float32(127.0)),
        0.0,
    )
    np.testing.assert_allclose(out, exp, rtol=5e-7, atol=0.0)
    np.testing.assert_array_equal(out[sids >= n], 0.0)


@pytest.mark.parametrize("kind", CASES)
@pytest.mark.parametrize("n", [220, 16 * 11])
def test_quantized_fused_adagrad_oracle(kind, n):
    """Fused int8 update vs `quantized_rowwise_adagrad`: scales/acc to f32
    tolerance; int8 values within one quantization step (aggregation
    summation order can flip a round-to-nearest boundary); untouched rows
    BYTE-exact (requantization is not idempotent and must not run on them)."""
    from two_tower_recommender_model_tpu.ops.block_sorted import (
        block_sorted_rowwise_adagrad_fused_quantized,
    )
    from two_tower_recommender_model_tpu.ops.quantized import (
        quantized_rowwise_adagrad,
    )

    rng = np.random.default_rng(zlib.crc32(kind.encode()) % 2**31 + 6)
    sids, qt = _quant_setup(kind, n, rng)
    m = 3 * C
    grads = rng.normal(size=(m, D)).astype(np.float32)
    acc = np.abs(rng.normal(size=(n,))).astype(np.float32)

    got_v, got_s, got_a = block_sorted_rowwise_adagrad_fused_quantized(
        qt.values, qt.scales, jnp.asarray(acc), jnp.asarray(sids),
        jnp.asarray(grads), lr=0.05, eps=1e-10, r=R, c=C, interpret=True,
    )
    exp_qt, exp_a = quantized_rowwise_adagrad(
        qt, jnp.asarray(acc), jnp.asarray(sids), jnp.asarray(grads), 0.05, 1e-10
    )
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(exp_a),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(exp_qt.scales),
                               rtol=1e-5, atol=1e-6)
    dq = np.abs(np.asarray(got_v, np.int32) - np.asarray(exp_qt.values, np.int32))
    assert dq.max() <= 1, f"int8 values differ by >1 step (max {dq.max()})"
    touched = np.zeros(n, bool)
    touched[sids[sids < n]] = True
    np.testing.assert_array_equal(
        np.asarray(got_v)[~touched], np.asarray(qt.values)[~touched]
    )
    np.testing.assert_array_equal(
        np.asarray(got_s)[~touched], np.asarray(qt.scales)[~touched]
    )
    np.testing.assert_array_equal(np.asarray(got_a)[~touched], acc[~touched])


def test_train_step_int8_block_sorted_matches_quantized_baseline():
    """int8 tables + block_sorted_kernel: the sorted table rides the fused
    quantized kernel, unsorted tables the device-sort front-end — matching
    the plain quantized-update step. Quantization rounding can flip one int8
    step per update and feeds back through the towers, so the contract is
    dequantized closeness, not bitwise."""
    import dataclasses

    import jax

    from two_tower_recommender_model_tpu import config as cfg_lib
    from two_tower_recommender_model_tpu.data import SyntheticClickstream
    from two_tower_recommender_model_tpu.data.device_featurizer import (
        PackedFeaturizer,
        make_packed_train_step,
    )
    from two_tower_recommender_model_tpu.ops.quantized import dequantize_table
    from two_tower_recommender_model_tpu.train.step import (
        create_train_state,
        make_train_step,
    )

    mcfg = cfg_lib.two_tower_model_config(300, 80, embedding_dim=128)
    mcfg = dataclasses.replace(mcfg, table_dtype="int8")
    ds = SyntheticClickstream(300, 80, seed=7)
    cols_list = [ds.sample(256, start=i) for i in range(3)]
    feat = PackedFeaturizer(mcfg, sort_feature="user_id")

    def run(tcfg):
        state, dense_opt = create_train_state(jax.random.key(5), mcfg, tcfg)
        core = make_train_step(mcfg, tcfg, dense_opt, donate=False, jit=False)
        step = make_packed_train_step(core, mcfg)
        losses = []
        for cols in cols_list:
            state, out = step(state, jax.tree.map(jnp.asarray, feat(cols)))
            losses.append(float(out["loss"]))
        return state, losses

    state_a, loss_a = run(cfg_lib.TrainConfig(sorted_feature="user_id"))
    state_b, loss_b = run(
        cfg_lib.TrainConfig(sorted_feature="user_id", block_sorted_kernel="float32")
    )
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-3)
    for name in state_a.tables:
        da = np.asarray(dequantize_table(state_a.tables[name]))
        db = np.asarray(dequantize_table(state_b.tables[name]))
        np.testing.assert_allclose(da, db, atol=1e-2)
        assert state_b.tables[name].values.dtype == jnp.int8


@pytest.mark.parametrize("n", [220, 16 * 11])
def test_device_sorted_lookup_matches_take(n):
    """device_sorted_lookup on UNSORTED ids (+ sentinels + duplicates) ==
    jnp.take, EXACTLY (sort + exact block gather + exact row permute) — f32
    and int8 storage."""
    from two_tower_recommender_model_tpu.ops.block_sorted import (
        device_sorted_lookup,
    )
    from two_tower_recommender_model_tpu.ops.quantized import quantize_table

    rng = np.random.default_rng(21)
    m = 3 * C
    ids = np.concatenate(
        [rng.integers(0, n, size=m - m // 8), np.full(m // 8, n)]
    ).astype(np.int32)
    rng.shuffle(ids)  # deliberately NOT sorted
    table = rng.normal(size=(n, D)).astype(np.float32)

    out = np.asarray(device_sorted_lookup(jnp.asarray(table), jnp.asarray(ids)))
    safe = np.minimum(ids, n - 1)
    exp = np.where((ids < n)[:, None], table[safe], 0.0)
    np.testing.assert_array_equal(out, exp)

    qt = quantize_table(jnp.asarray(table))
    out_q = np.asarray(device_sorted_lookup(qt, jnp.asarray(ids)))
    vals, scls = np.asarray(qt.values), np.asarray(qt.scales)
    exp_q = np.where(
        (ids < n)[:, None],
        vals[safe].astype(np.float32) * (scls[safe][:, None] / np.float32(127.0)),
        0.0,
    )
    np.testing.assert_allclose(out_q, exp_q, rtol=5e-7, atol=0.0)


def test_train_step_device_sorted_gather_matches_baseline():
    """device_sorted_gather=True: the UNSORTED item feature's forward gather
    rides the device-sort block kernel; step numerics match the plain step
    (gather rows exact; update summation-order tolerance)."""
    import jax

    from two_tower_recommender_model_tpu import config as cfg_lib
    from two_tower_recommender_model_tpu.data import Featurizer, SyntheticClickstream
    from two_tower_recommender_model_tpu.train.step import (
        create_train_state,
        make_train_step,
    )

    mcfg = cfg_lib.two_tower_model_config(300, 80, embedding_dim=128)
    ds = SyntheticClickstream(300, 80, seed=7)
    feat = Featurizer(mcfg)
    batches = [feat(ds.sample(256, start=i)) for i in range(3)]

    def run(tcfg):
        state, dense_opt = create_train_state(jax.random.key(5), mcfg, tcfg)
        step = make_train_step(mcfg, tcfg, dense_opt, donate=False)
        losses = []
        for b in batches:
            state, out = step(state, b)
            losses.append(float(out["loss"]))
        return state, losses

    state_a, loss_a = run(cfg_lib.TrainConfig(block_sorted_kernel="float32"))
    state_b, loss_b = run(cfg_lib.TrainConfig(block_sorted_kernel="float32",
                                              device_sorted_gather=True))
    np.testing.assert_allclose(loss_a, loss_b, rtol=1e-5)
    for name in state_a.tables:
        np.testing.assert_allclose(
            np.asarray(state_a.tables[name]), np.asarray(state_b.tables[name]),
            rtol=1e-5, atol=1e-6,
        )
