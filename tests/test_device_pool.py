"""Device-generated batch pools match PackedFeaturizer's layout contract."""

import jax.numpy as jnp
import numpy as np

from two_tower_recommender_model_tpu import config as cfg_lib
from two_tower_recommender_model_tpu.data.device_featurizer import (
    PackedBatch,
    unpack_batch,
)
from two_tower_recommender_model_tpu.data.device_pool import device_batch_pool

U, I = 1009, 517


def _mcfg():
    return cfg_lib.two_tower_model_config(num_users=U, num_items=I, embedding_dim=8)


def test_layout_and_ranges():
    pool = device_batch_pool(_mcfg(), 64, 3, pack_label=True, sort=False, seed=1)
    assert pool.shape == (3, 64, 2) and pool.dtype == jnp.int32
    arr = np.asarray(pool)
    raw0 = arr[:, :, 0] & ((1 << 30) - 1)
    labels = (arr[:, :, 0] >> 30) & 1
    assert raw0.min() >= 1 and raw0.max() <= U
    assert arr[:, :, 1].min() >= 1 and arr[:, :, 1].max() <= I
    # learnable labels: parity of the slot-0 id
    assert (labels == (raw0 & 1)).all()
    # distinct payloads per pool entry (tunnel dedupe requirement)
    assert not np.array_equal(arr[0], arr[1])
    assert not np.array_equal(arr[1], arr[2])


def test_sorted_invariant():
    pool = device_batch_pool(_mcfg(), 256, 2, pack_label=True, sort=True, seed=2)
    arr = np.asarray(pool)
    key = arr[:, :, 0] & ((1 << 30) - 1)  # hashed key == raw here
    assert (np.diff(key, axis=1) >= 0).all()


def test_unpacks_through_device_featurizer():
    mcfg = _mcfg()
    pool = device_batch_pool(mcfg, 32, 1, pack_label=True, sort=True, seed=3)
    batch = unpack_batch(
        PackedBatch(ids_raw=pool[0], labels=jnp.zeros(0, jnp.int32)),
        mcfg,
        pack_label=True,
    )
    assert batch.labels.shape == (32,)
    assert set(np.unique(np.asarray(batch.labels))) <= {0, 1}
    ids_u = np.asarray(batch.features["user_id"].ids)
    assert ids_u.min() >= 1 and ids_u.max() < U  # hashed == raw, no zeros
    assert float(batch.features["user_id"].mask.min()) == 1.0


def test_no_pack_label():
    pool = device_batch_pool(_mcfg(), 16, 2, pack_label=False, sort=False, seed=4)
    arr = np.asarray(pool)
    assert arr[:, :, 0].max() <= U  # no label bit set
