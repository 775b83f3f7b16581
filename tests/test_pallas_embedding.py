"""Pallas fused gather+pool kernel, interpret mode on CPU (compiled-mode
parity is exercised on real TPU by bench.py / examples)."""

import jax.numpy as jnp
import numpy as np
import pytest

from two_tower_recommender_model_tpu.ops.pallas_embedding import (
    pallas_pooled_lookup,
    pooled_lookup_auto,
)


def _ref(table, ids, w):
    return (np.asarray(table)[np.asarray(ids)] * np.asarray(w)[..., None]).sum(1)


@pytest.mark.parametrize("bag_l", [1, 3])
def test_kernel_matches_reference(rng, bag_l):
    table = jnp.asarray(rng.normal(size=(300, 128)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 300, (64, bag_l)), jnp.int32)
    w = jnp.asarray(rng.random((64, bag_l)) * (rng.random((64, bag_l)) > 0.3), jnp.float32)
    out = pallas_pooled_lookup(table, ids, w, tile_b=16, interpret=True)
    np.testing.assert_allclose(out, _ref(table, ids, w), rtol=1e-5, atol=1e-6)


def test_kernel_dead_slots_zero_weight(rng):
    table = jnp.asarray(rng.normal(size=(50, 128)), jnp.float32)
    ids = jnp.zeros((8, 2), jnp.int32)
    w = jnp.zeros((8, 2), jnp.float32)
    out = pallas_pooled_lookup(table, ids, w, tile_b=8, interpret=True)
    np.testing.assert_array_equal(out, 0.0)


def test_batch_not_divisible_rejected(rng):
    table = jnp.asarray(rng.normal(size=(50, 128)), jnp.float32)
    ids = jnp.zeros((24, 1), jnp.int32)
    w = jnp.ones((24, 1), jnp.float32)
    with pytest.raises(ValueError, match="multiple of tile_b"):
        pallas_pooled_lookup(table, ids, w, tile_b=16, interpret=True)


def test_auto_falls_back_on_cpu(rng):
    # on CPU (tests), auto must take the XLA path and still be correct
    table = jnp.asarray(rng.normal(size=(40, 64)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 40, (10, 2)), jnp.int32)
    w = jnp.asarray(rng.random((10, 2)), jnp.float32)
    out = pooled_lookup_auto(table, ids, w)
    np.testing.assert_allclose(out, _ref(table, ids, w), rtol=1e-5, atol=1e-6)


def test_pallas_update_kernel_matches_xla(rng):
    """Fused Pallas row-update kernel (interpret mode) == XLA sparse Adagrad,
    incl. duplicate aggregation and sentinel skipping."""
    from two_tower_recommender_model_tpu.ops.pallas_update import (
        pallas_sparse_rowwise_adagrad)
    from two_tower_recommender_model_tpu.train.optimizer import sparse_rowwise_adagrad

    N, D, M = 100, 128, 64
    table = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    acc = jnp.asarray(rng.random(N), jnp.float32)
    ids = jnp.asarray(
        np.concatenate([rng.integers(0, N, M - 10), np.full(10, N)]), jnp.int32)
    g = jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
    t1, a1 = pallas_sparse_rowwise_adagrad(table, acc, ids, g, 0.1, interpret=True)
    t2, a2 = sparse_rowwise_adagrad(table, acc, ids, g, 0.1)
    np.testing.assert_allclose(t1, t2, atol=1e-5)
    np.testing.assert_allclose(a1, a2, atol=1e-5)


def test_pallas_update_all_sentinels_noop(rng):
    from two_tower_recommender_model_tpu.ops.pallas_update import (
        pallas_sparse_rowwise_adagrad)

    table = jnp.asarray(rng.normal(size=(20, 128)), jnp.float32)
    acc = jnp.zeros(20, jnp.float32)
    ids = jnp.full((16,), 20, jnp.int32)
    g = jnp.ones((16, 128), jnp.float32)
    t, a = pallas_sparse_rowwise_adagrad(table, acc, ids, g, 0.1, interpret=True)
    np.testing.assert_array_equal(t, table)
    np.testing.assert_array_equal(a, acc)
