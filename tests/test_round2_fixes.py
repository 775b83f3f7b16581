"""Regression tests for the round-2 advisor/verdict fixes:

1. recall@k divides by len(targets) (mlflow retriever protocol,
   `04_evaluate_retrieval.py:202-210`), not min(len(targets), k).
2. PackedFeaturizer pre-hashes uint32 ids >= 2^31 (would wrap negative on
   int32 assignment and hash differently than the host Featurizer).
3. export_feature_embeddings / evaluate_retrieval work on int8-trained state.
4. pack_label pre-hashes raw ids in [2^30, 2^31) that would corrupt the
   stolen label bit.
5. loader _ChunkBuffer slices by cursor (no per-batch buffer rebuild) with
   identical batch semantics.
6. weighted_bce is reachable from TrainConfig.loss through the train step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_tower_recommender_model_tpu import config as cfg_lib
from two_tower_recommender_model_tpu.data import Featurizer, SyntheticClickstream
from two_tower_recommender_model_tpu.data.device_featurizer import (
    PackedFeaturizer,
    unpack_batch,
)
from two_tower_recommender_model_tpu.evaluation.retrieval import (
    evaluate_retrieval,
    export_feature_embeddings,
    retrieval_metrics,
)
from two_tower_recommender_model_tpu.models import losses as losses_lib
from two_tower_recommender_model_tpu.train.step import create_train_state, make_train_step


def test_recall_divides_by_target_count_not_k():
    # 4 targets, k=2, both retrieved hits: mlflow recall@2 = 2/4, not 2/2
    m = retrieval_metrics(np.array([[1, 2]]), [[1, 2, 3, 4]], ks=(2,))
    np.testing.assert_allclose(m["recall_at_2"], 0.5)
    # fewer targets than k unchanged
    m = retrieval_metrics(np.array([[1, 2, 3, 4]]), [[1, 3]], ks=(4,))
    np.testing.assert_allclose(m["recall_at_4"], 1.0)


@pytest.fixture
def mcfg():
    return cfg_lib.two_tower_model_config(num_users=1000, num_items=60, embedding_dim=8,
                                          layer_sizes=(16, 8))


def test_uint32_ids_match_host_featurizer(mcfg):
    # id 3000000000 >= 2^31: naive int32 assignment wraps negative; the host
    # Featurizer hashes the raw value. Device must agree (ADVICE finding 2).
    cols = {
        "user_id": np.array([3_000_000_000, 7, 0, 2_000], np.uint32),
        "product_id": np.array([1, 2, 3, 4], np.uint32),
        "label": np.zeros(4, np.int64),
    }
    host = Featurizer(mcfg)(cols)
    packed = PackedFeaturizer(mcfg)(cols)
    dev = unpack_batch(jax.tree.map(jnp.asarray, packed), mcfg)
    np.testing.assert_array_equal(np.asarray(dev.features["user_id"].ids),
                                  host.features["user_id"].ids)
    np.testing.assert_array_equal(np.asarray(dev.features["user_id"].mask),
                                  host.features["user_id"].mask)


def test_pack_label_bit30_ids_preserved(mcfg):
    # raw ids in [2^30, 2^31) are legal under id % N hashing but collide with
    # the stolen label bit — pre-hash must keep hash AND label intact.
    uid = np.array([(1 << 30) + 5, (1 << 30), 3, 0], np.int64)
    cols = {
        "user_id": uid,
        "product_id": np.array([1, 2, 3, 4], np.int64),
        "label": np.array([1, 0, 1, 0], np.int64),
    }
    host = Featurizer(mcfg)(cols)
    packed = PackedFeaturizer(mcfg, pack_label=True)(cols)
    dev = unpack_batch(jax.tree.map(jnp.asarray, packed), mcfg, pack_label=True)
    np.testing.assert_array_equal(np.asarray(dev.labels), host.labels)
    np.testing.assert_array_equal(np.asarray(dev.features["user_id"].ids),
                                  host.features["user_id"].ids)
    np.testing.assert_array_equal(np.asarray(dev.features["user_id"].mask),
                                  host.features["user_id"].mask)


def test_int8_state_exports_and_evaluates():
    mcfg = cfg_lib.two_tower_model_config(num_users=50, num_items=30, embedding_dim=8,
                                          layer_sizes=(16, 8))
    mcfg = dataclasses.replace(mcfg, table_dtype="int8")
    tcfg = cfg_lib.TrainConfig()
    state, dense_opt = create_train_state(jax.random.key(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, dense_opt)
    feat = Featurizer(mcfg)
    ds = SyntheticClickstream(50, 30, seed=1)
    batch = jax.tree.map(jnp.asarray, feat(ds.sample(64)))
    state, _ = step(state, batch)

    params = {"tables": state.tables, **state.dense_params}
    emb = export_feature_embeddings(params, mcfg, "product_id")
    assert emb.shape == (30, 8)
    assert np.isfinite(emb).all()
    m = evaluate_retrieval(params, mcfg, {1: [3, 4], 2: [5]}, k=10, ks=(10,))
    assert np.isfinite(m["recall_at_10"])


def test_chunk_buffer_cursor_semantics():
    from two_tower_recommender_model_tpu.data.loader import _ChunkBuffer

    buf = _ChunkBuffer()
    buf.push({"x": np.arange(5), "y": np.arange(5) * 10})
    buf.push({"x": np.arange(5, 8), "y": np.arange(5, 8) * 10})
    assert buf.rows == 8
    b1 = buf.take(3)  # within first chunk: zero-copy view
    np.testing.assert_array_equal(b1["x"], [0, 1, 2])
    assert b1["x"].base is not None  # a view, not a copy
    b2 = buf.take(3)  # straddles the chunk boundary: one concatenate
    np.testing.assert_array_equal(b2["x"], [3, 4, 5])
    np.testing.assert_array_equal(b2["y"], [30, 40, 50])
    b3 = buf.take(2)
    np.testing.assert_array_equal(b3["x"], [6, 7])
    assert buf.rows == 0


def test_weighted_bce_reachable_from_train_config():
    mcfg = cfg_lib.two_tower_model_config(num_users=40, num_items=20, embedding_dim=8,
                                          layer_sizes=(16, 8))
    # dense side input carries the 2 one-hot type columns
    mcfg = dataclasses.replace(
        mcfg, query_tower=dataclasses.replace(mcfg.query_tower, dense_dim=2)
    )
    tcfg = cfg_lib.TrainConfig(loss="weighted_bce", loss_type_weights=(1.0, 3.0))
    state, dense_opt = create_train_state(jax.random.key(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, dense_opt, donate=False)

    feat = Featurizer(mcfg, dense_cols=("t0", "t1"))
    rng = np.random.default_rng(0)
    t0 = rng.integers(0, 2, 64)
    cols = {
        "user_id": rng.integers(1, 40, 64),
        "product_id": rng.integers(1, 20, 64),
        "label": rng.integers(0, 2, 64),
        "t0": t0.astype(np.float32),
        "t1": (1 - t0).astype(np.float32),
    }
    batch = jax.tree.map(jnp.asarray, feat(cols))
    new_state, out = step(state, batch)

    # oracle: forward logits -> manual weighted bce
    from two_tower_recommender_model_tpu.models.two_tower import forward

    q, c = forward({"tables": state.tables, **state.dense_params}, batch, mcfg)
    logits = jnp.sum(q * c, axis=1)
    want = losses_lib.weighted_bce_with_logits(
        logits, batch.labels, batch.dense, jnp.array([1.0, 3.0]))
    np.testing.assert_allclose(float(out["loss"]), float(want), rtol=1e-6)
    # and the unweighted loss differs (weights actually take effect)
    plain = losses_lib.bce_with_logits(logits, batch.labels)
    assert abs(float(want) - float(plain)) > 1e-6


def test_per_table_dtype_mix():
    """One int8 side table among f32 tables (TableConfig.dtype override):
    trains, exports, and round-trips through config JSON."""
    from two_tower_recommender_model_tpu.ops.quantized import QuantizedTable

    mcfg = cfg_lib.ModelConfig(
        tables=(
            cfg_lib.TableConfig("t_a", 50, 8),
            cfg_lib.TableConfig("t_b", 30, 8, dtype="int8"),
        ),
        features=(cfg_lib.FeatureConfig("a", "t_a"), cfg_lib.FeatureConfig("b", "t_b")),
        query_tower=cfg_lib.TowerConfig(("a",), (16, 8)),
        candidate_tower=cfg_lib.TowerConfig(("b",), (16, 8)),
    )
    tcfg = cfg_lib.TrainConfig()
    state, dense_opt = create_train_state(jax.random.key(0), mcfg, tcfg)
    assert not isinstance(state.tables["t_a"], QuantizedTable)
    assert isinstance(state.tables["t_b"], QuantizedTable)
    step = make_train_step(mcfg, tcfg, dense_opt, donate=False)
    rng = np.random.default_rng(0)
    feat_cols = {"a": rng.integers(1, 50, 32), "b": rng.integers(1, 30, 32),
                 "label": rng.integers(0, 2, 32)}
    from two_tower_recommender_model_tpu.data import Featurizer

    batch = jax.tree.map(jnp.asarray, Featurizer(mcfg)(feat_cols))
    state, out = step(state, batch)
    assert np.isfinite(float(out["loss"]))
    # config JSON round-trip preserves the per-table dtype
    import json as _json

    d = _json.loads(cfg_lib.to_json(mcfg))
    mcfg2 = cfg_lib.model_config_from_dict(d)
    assert mcfg2.table("t_b").dtype == "int8" and mcfg2.table("t_a").dtype is None


def test_text_side_features_end_to_end():
    """Text embeddings feed the candidate tower through training AND the
    retrieval export (export_feature_embeddings(dense=...)) — the trained
    model with text features must beat random retrieval, and the export must
    match the forward pass when dense inputs are supplied."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "text_side_features",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "examples", "text_side_features.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = mod.main(num_users=300, num_items=120, text_dim=16, steps=120)
    assert np.isfinite(out["loss"])
    assert out["recall_at_10"] > 3 * 10 / 120, out


def test_text_side_features_precomputed_path(tmp_path):
    """The same example through the PRECOMPUTED-embedding ingestion arm
    (round-3: the shape real ai_query output arrives in) must reproduce the
    n-gram arm exactly when the file carries the same vectors."""
    import importlib.util
    import os

    from two_tower_recommender_model_tpu.data.text_features import (
        save_precomputed_embeddings,
    )

    spec = importlib.util.spec_from_file_location(
        "text_side_features",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "examples", "text_side_features.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import pandas as pd

    from two_tower_recommender_model_tpu.data.text_features import (
        build_product_text_features,
    )

    n_items = 120
    products = pd.DataFrame({
        "product_id": np.arange(1, n_items + 1),
        "product_name": [f"organic product {i} pack" for i in range(1, n_items + 1)],
        "department": [f"department_{i % 21}" for i in range(1, n_items + 1)],
        "aisle": [f"aisle_{i % 134}" for i in range(1, n_items + 1)],
    })
    _, emb = build_product_text_features(products, dim=16)
    path = str(tmp_path / "emb.parquet")
    save_precomputed_embeddings(path, np.arange(1, n_items + 1), emb)
    base = mod.main(num_users=300, num_items=n_items, text_dim=16, steps=60)
    pre = mod.main(num_users=300, num_items=n_items, text_dim=16, steps=60,
                   precomputed_path=path)
    assert pre["loss"] == base["loss"]
    assert pre["recall_at_10"] == base["recall_at_10"]


def test_export_dense_matches_forward():
    """Exported embedding with per-id dense == tower forward on a batch
    carrying the same dense values."""
    from two_tower_recommender_model_tpu.models.two_tower import forward, init_params

    mcfg = cfg_lib.two_tower_model_config(num_users=30, num_items=20, embedding_dim=8,
                                          layer_sizes=(16, 4))
    mcfg = dataclasses.replace(
        mcfg, candidate_tower=dataclasses.replace(mcfg.candidate_tower, dense_dim=3))
    params = init_params(jax.random.key(0), mcfg)
    feat = Featurizer(mcfg)
    ids = np.array([1, 5, 19])
    dense_all = np.random.default_rng(0).normal(size=(20, 3)).astype(np.float32)
    batch = feat({"user_id": np.array([7, 7, 7]), "product_id": ids,
                  "label": np.zeros(3)})
    batch = batch.replace(dense=dense_all[ids])
    batch = jax.tree.map(jnp.asarray, batch)
    _, cand = forward(params, batch, mcfg)
    exported = export_feature_embeddings(params, mcfg, "product_id", dense=dense_all)
    np.testing.assert_allclose(exported[ids], np.asarray(cand), rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="dense"):
        export_feature_embeddings(params, mcfg, "product_id", dense=dense_all[:5])


def test_quantized_dense_update_matches_sorted():
    """The transient-dense int8 update must match the sorted-segment variant:
    untouched rows bitwise, touched rows to quantization tolerance."""
    from two_tower_recommender_model_tpu.ops.quantized import (
        quantize_table,
        quantized_dense_rowwise_adagrad,
        quantized_rowwise_adagrad,
    )

    rng = np.random.default_rng(0)
    n, d, m = 40, 8, 24
    qt = quantize_table(jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)))
    acc = jnp.asarray(rng.random(n).astype(np.float32))
    ids = jnp.asarray(np.concatenate([rng.integers(0, n, m - 4), [n] * 4]).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(m, d)).astype(np.float32) * 0.1)

    (qa, aa) = quantized_rowwise_adagrad(qt, acc, ids, g, 0.05)
    (qb, ab) = quantized_dense_rowwise_adagrad(qt, acc, ids, g, 0.05)
    np.testing.assert_allclose(np.asarray(aa), np.asarray(ab), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(qa.scales), np.asarray(qb.scales),
                               rtol=1e-5, atol=1e-7)
    # int8 codes: allow off-by-one from summation-order rounding
    diff = np.abs(np.asarray(qa.values, np.int32) - np.asarray(qb.values, np.int32))
    assert diff.max() <= 1, diff.max()
    untouched = np.setdiff1d(np.arange(n), np.asarray(ids))
    np.testing.assert_array_equal(np.asarray(qa.values)[untouched],
                                  np.asarray(qb.values)[untouched])
