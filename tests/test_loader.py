"""StreamLoader: determinism, multi-host disjoint coverage, resume."""

import numpy as np
import pytest

from two_tower_recommender_model_tpu.data.loader import StreamLoader
from two_tower_recommender_model_tpu.data.shards import ShardedDataset, write_dataset


@pytest.fixture
def dataset(tmp_path):
    n = 1000
    write_dataset(
        str(tmp_path / "ds"),
        {"row_id": np.arange(n), "label": np.arange(n) % 2},
        rows_per_shard=128,
    )
    return ShardedDataset(str(tmp_path / "ds"))


def _collect(loader, n=None):
    out = []
    for i, b in enumerate(loader):
        out.append(b)
        if n is not None and i + 1 >= n:
            break
    return out


def test_deterministic_same_seed(dataset):
    a = _collect(StreamLoader(dataset, 64, seed=3))
    b = _collect(StreamLoader(dataset, 64, seed=3))
    assert len(a) == len(b) == 1000 // 64
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["row_id"], y["row_id"])


def test_different_epochs_differ(dataset):
    l1 = StreamLoader(dataset, 64, seed=3, drop_last=False)
    a = _collect(l1)  # epoch 0; advances to epoch 1
    b = _collect(l1)  # epoch 1
    assert any(not np.array_equal(x["row_id"], y["row_id"]) for x, y in zip(a, b))
    # but both epochs cover the same sample set
    sa = np.sort(np.concatenate([x["row_id"] for x in a]))
    sb = np.sort(np.concatenate([x["row_id"] for x in b]))
    np.testing.assert_array_equal(sa, sb)


def test_full_coverage_no_shuffle(dataset):
    loader = StreamLoader(dataset, 100, shuffle=False, drop_last=False)
    rows = np.concatenate([b["row_id"] for b in loader])
    np.testing.assert_array_equal(np.sort(rows), np.arange(1000))


def test_multi_host_disjoint_and_complete(dataset):
    seen = []
    for h in range(4):
        loader = StreamLoader(dataset, 32, seed=5, host_index=h, num_hosts=4, drop_last=False)
        seen.append(np.concatenate([b["row_id"] for b in loader]))
    allrows = np.concatenate(seen)
    assert len(allrows) == 1000
    assert len(np.unique(allrows)) == 1000  # disjoint + complete


def test_drop_last(dataset):
    loader = StreamLoader(dataset, 300, drop_last=True)
    batches = _collect(loader)
    assert all(len(b["row_id"]) == 300 for b in batches)
    assert len(batches) == 3


def test_resume_mid_epoch(dataset):
    full = _collect(StreamLoader(dataset, 64, seed=7))

    loader = StreamLoader(dataset, 64, seed=7)
    it = iter(loader)
    first = [next(it) for _ in range(6)]
    state = loader.state_dict()
    assert state["batches_yielded"] == 6
    it.close()

    resumed = StreamLoader(dataset, 64, seed=7)
    resumed.load_state_dict(state)
    rest = _collect(resumed)
    got = first + rest
    assert len(got) == len(full)
    for x, y in zip(got, full):
        np.testing.assert_array_equal(x["row_id"], y["row_id"])


def test_resume_state_mismatch_rejected(dataset):
    loader = StreamLoader(dataset, 64, seed=7)
    state = loader.state_dict()
    other = StreamLoader(dataset, 64, seed=8)
    with pytest.raises(ValueError, match="incompatible"):
        other.load_state_dict(state)


def test_batches_per_epoch(dataset):
    assert StreamLoader(dataset, 64).batches_per_epoch() == 15
    assert StreamLoader(dataset, 64, drop_last=False).batches_per_epoch() == 16


def test_read_workers_deterministic(dataset):
    a = _collect(StreamLoader(dataset, 64, seed=3, read_workers=4))
    b = _collect(StreamLoader(dataset, 64, seed=3, read_workers=1))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["row_id"], y["row_id"])
