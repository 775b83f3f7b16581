"""Losses: BCE parity, weighted BCE, in-batch sampled softmax properties."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from two_tower_recommender_model_tpu.models.losses import (
    bce_with_logits,
    in_batch_sampled_softmax,
    weighted_bce_with_logits,
)


def test_bce_matches_optax(rng):
    logits = jnp.asarray(rng.normal(size=64) * 3, jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, 64), jnp.int32)
    want = optax.sigmoid_binary_cross_entropy(logits, labels.astype(jnp.float32)).mean()
    got = bce_with_logits(logits, labels)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bce_extreme_logits_stable():
    logits = jnp.asarray([100.0, -100.0, 0.0])
    labels = jnp.asarray([1, 0, 1])
    assert np.isfinite(float(bce_with_logits(logits, labels)))


def test_weighted_bce(rng):
    logits = jnp.asarray(rng.normal(size=10), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, 10), jnp.int32)
    onehot = jax.nn.one_hot(jnp.asarray(rng.integers(0, 3, 10)), 3)
    tw = jnp.asarray([1.0, 2.0, 0.5])
    got = weighted_bce_with_logits(logits, labels, onehot, tw)
    w = np.asarray(onehot) @ np.asarray(tw)
    per = np.maximum(logits, 0) - np.asarray(logits) * np.asarray(labels) + np.log1p(
        np.exp(-np.abs(np.asarray(logits)))
    )
    np.testing.assert_allclose(got, (per * w).sum() / w.sum(), rtol=1e-5)


def test_sampled_softmax_prefers_matching_pairs(rng):
    # aligned q/c pairs should have lower loss than shuffled ones
    d = 8
    q = jnp.asarray(rng.normal(size=(16, d)), jnp.float32)
    labels = jnp.ones(16, jnp.int32)
    aligned = in_batch_sampled_softmax(q, q * 2.0, labels)
    shuffled = in_batch_sampled_softmax(q, jnp.roll(q * 2.0, 5, axis=0), labels)
    assert float(aligned) < float(shuffled)


def test_sampled_softmax_ignores_label0_rows(rng):
    q = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    labels = jnp.asarray([1, 1, 0, 0, 1, 0, 1, 1], jnp.int32)
    full = in_batch_sampled_softmax(q, c, labels)
    # zeroing q-rows of negative-label rows must not change the loss value
    q2 = q.at[jnp.asarray([2, 3, 5])].set(123.0)
    # (their columns still act as negatives; only their row-loss is excluded)
    full2 = in_batch_sampled_softmax(q2, c, labels)
    # rows 2,3,5 excluded from the mean -> changing their q changes nothing
    np.testing.assert_allclose(full, full2, rtol=1e-6)


def test_sampled_softmax_logq_correction(rng):
    q = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    labels = jnp.ones(8, jnp.int32)
    logq = jnp.asarray(rng.normal(size=8), jnp.float32)
    a = in_batch_sampled_softmax(q, c, labels, log_q=logq)
    b = in_batch_sampled_softmax(q, c, labels)
    assert not np.allclose(float(a), float(b))


def test_sampled_softmax_accidental_hit_masking(rng):
    q = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)
    labels = jnp.ones(4, jnp.int32)
    ids_dup = jnp.asarray([7, 7, 8, 9], jnp.int32)  # rows 0,1 share an item
    loss_masked = in_batch_sampled_softmax(q, c, labels, item_ids=ids_dup)
    loss_plain = in_batch_sampled_softmax(q, c, labels)
    # with duplicates masked the softmax has fewer negatives -> lower-or-equal loss
    assert float(loss_masked) <= float(loss_plain) + 1e-6


def test_chunked_sampled_softmax_matches_dense():
    """The blockwise (flash-style) in-batch softmax must match the dense path
    exactly in value AND gradients — same per-row logsumexp, only the final
    reduction order differs."""
    import jax
    import jax.numpy as jnp

    from two_tower_recommender_model_tpu.models.losses import (
        _chunked_sampled_softmax,
        in_batch_sampled_softmax,
    )

    rng = np.random.default_rng(0)
    b, d = 512, 16
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, b).astype(np.int32))
    item_ids = jnp.asarray(rng.integers(0, 40, b).astype(np.int32))  # many dups
    log_q = jnp.asarray(rng.normal(size=b).astype(np.float32) * 0.1)

    def dense(q, c):
        return in_batch_sampled_softmax(q, c, labels, item_ids, log_q,
                                        temperature=0.7)

    def chunked(q, c):
        return _chunked_sampled_softmax(q, c, labels, item_ids, log_q, 0.7, r=64)

    lv_d, g_d = jax.value_and_grad(lambda a: dense(a, c))(q)
    lv_c, g_c = jax.value_and_grad(lambda a: chunked(a, c))(q)
    np.testing.assert_allclose(float(lv_c), float(lv_d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_d), rtol=1e-5, atol=1e-7)
    # candidate-side grads too (flow through every block's columns)
    _, gc_d = jax.value_and_grad(lambda a: dense(q, a))(c)
    _, gc_c = jax.value_and_grad(lambda a: chunked(q, a))(c)
    np.testing.assert_allclose(np.asarray(gc_c), np.asarray(gc_d), rtol=1e-5, atol=1e-7)


def test_chunked_sampled_softmax_no_ids_no_logq():
    import jax
    import jax.numpy as jnp

    from two_tower_recommender_model_tpu.models.losses import (
        _chunked_sampled_softmax,
        in_batch_sampled_softmax,
    )

    rng = np.random.default_rng(1)
    b, d = 256, 8
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    labels = jnp.ones(b, jnp.int32)
    dense_v = in_batch_sampled_softmax(q, c, labels)
    chunk_v = _chunked_sampled_softmax(q, c, labels, None, None, 1.0, r=32)
    np.testing.assert_allclose(float(chunk_v), float(dense_v), rtol=1e-6)


def test_auto_row_chunk_policy():
    from two_tower_recommender_model_tpu.models.losses import _auto_row_chunk

    assert _auto_row_chunk(1024) is None           # small: dense
    assert _auto_row_chunk(8192) == 2048           # 16.7M-element blocks
    assert _auto_row_chunk(262144) == 64
    assert _auto_row_chunk(5000) == 8              # non-power-of-2: small divisor
