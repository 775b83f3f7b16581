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
