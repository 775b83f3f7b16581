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
