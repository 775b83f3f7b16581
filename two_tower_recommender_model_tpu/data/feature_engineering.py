"""Offline feature engineering, columnar/vectorized.

The role of the reference's PySpark notebooks (`02_feature_engineering.py`):

- positive pairs: distinct (user, product) from interactions, label=1 (`:25-31`)
- random negative sampling: per user, `len(positives)` negatives drawn from
  `all_products - user_positives`, label=0, unioned 1:1 (`:49-77`)
- per-user split: every user's first row forced into train, remainder split
  by per-user row percentile 80/10/10, with the "no user lacks train rows"
  invariant asserted (`:89-144`)
- id indexing: contiguous 1-based indices for user/product ids
  (StringIndexer role, `:182-194`) — 0 stays reserved as the missing sentinel
  that the featurizer drops.

Implemented with numpy/pandas instead of Spark; outputs feed the TTRS shard
writer (`data/shards.py`) the way the reference writes Delta + MDS (`:213-282`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def build_positive_pairs(
    interactions: pd.DataFrame, user_col: str = "user_id", item_col: str = "product_id"
) -> pd.DataFrame:
    """Distinct (user, item) with label=1 (`02_feature_engineering.py:25-31`)."""
    pos = interactions[[user_col, item_col]].drop_duplicates().reset_index(drop=True)
    pos["label"] = np.int64(1)
    return pos


def sample_negatives(
    positives: pd.DataFrame,
    all_items: np.ndarray,
    seed: int = 0,
    user_col: str = "user_id",
    item_col: str = "product_id",
) -> pd.DataFrame:
    """Per user, sample len(user_positives) items uniformly from the
    complement of the user's positives (`generate_negatives`,
    `02_feature_engineering.py:53-58`). Rejection-sampled vectorized."""
    rng = np.random.default_rng(seed)
    all_items = np.asarray(all_items)
    unique_items = np.unique(all_items)

    # Fully vectorized global rejection sampling (the per-user Python-loop
    # version took hours at 206k users x 18M positives): one candidate slot
    # per needed negative; every round, reject candidates colliding with the
    # user's positives or an already-accepted negative (via sorted int64
    # (user, item) pair keys + searchsorted membership) and redraw only the
    # unfilled slots.
    users_arr = positives[user_col].to_numpy()
    items_arr = positives[item_col].to_numpy()
    uniq_users, pos_counts = np.unique(users_arr, return_counts=True)
    # membership keys: user * K + item_index (dense item indexing keeps the
    # key within int64 for arbitrary raw id ranges)
    k_items = len(unique_items)
    pos_item_idx = np.searchsorted(unique_items, items_arr)
    user_rank_arr = np.searchsorted(uniq_users, users_arr)
    pos_keys = np.sort(user_rank_arr.astype(np.int64) * k_items + pos_item_idx)

    # negatives per user capped by the complement size (termination guarantee)
    # distinct positives per user == group size here (positives are distinct)
    complement = k_items - pos_counts
    if (complement <= 0).any():
        bad = uniq_users[complement <= 0][0]
        raise ValueError(
            f"user {bad!r} has positives covering the whole catalog; "
            "cannot sample distinct negatives"
        )
    take_n = np.minimum(pos_counts, complement)

    slot_user_rank = np.repeat(np.arange(len(uniq_users), dtype=np.int64), take_n)
    total = len(slot_user_rank)
    filled_item_idx = np.empty(total, np.int64)
    unfilled = np.arange(total)
    taken_keys = pos_keys  # membership: positives + accepted negatives
    while len(unfilled):
        cand = rng.integers(0, k_items, size=len(unfilled))
        keys = slot_user_rank[unfilled] * k_items + cand
        # reject: collision with positives/accepted, or duplicate within round
        first = np.zeros(len(keys), bool)
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        first[order] = np.concatenate([[True], ks[1:] != ks[:-1]])
        pos_hit = np.searchsorted(taken_keys, keys)
        collide = (pos_hit < len(taken_keys)) & (taken_keys[np.minimum(pos_hit, len(taken_keys) - 1)] == keys)
        ok = first & ~collide
        filled_item_idx[unfilled[ok]] = cand[ok]
        taken_keys = np.sort(np.concatenate([taken_keys, keys[ok]]))
        unfilled = unfilled[~ok]
    neg = pd.DataFrame(
        {
            user_col: uniq_users[slot_user_rank],
            item_col: unique_items[filled_item_idx],
            "label": np.int64(0),
        }
    )
    return neg


def union_pos_neg(pos: pd.DataFrame, neg: pd.DataFrame) -> pd.DataFrame:
    """1:1 union (`02_feature_engineering.py:74`)."""
    return pd.concat([pos, neg], ignore_index=True)


def per_user_split(
    df: pd.DataFrame,
    seed: int = 0,
    fractions: tuple[float, float] = (0.8, 0.9),
    user_col: str = "user_id",
) -> pd.DataFrame:
    """Assign 'train'/'val'/'test' per row: rows are shuffled per user, the
    first row of every user is forced into train, the rest cut at the per-user
    row-percent fractions (`02_feature_engineering.py:92-114`). Adds a
    `split` column."""
    rng = np.random.default_rng(seed)
    df = df.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    grp = df.groupby(user_col, sort=False)
    row_idx = grp.cumcount().to_numpy()
    counts = grp[user_col].transform("size").to_numpy()
    pct = (row_idx + 1) / counts
    split = np.where(pct <= fractions[0], "train", np.where(pct <= fractions[1], "val", "test"))
    split = np.where(row_idx == 0, "train", split)  # every user trains
    out = df.copy()
    out["split"] = split
    assert_user_coverage(out, user_col)
    return out


def assert_user_coverage(df: pd.DataFrame, user_col: str = "user_id") -> None:
    """The reference's split invariant: no user may lack train rows
    (`02_feature_engineering.py:136-144`)."""
    users = set(df[user_col].unique())
    train_users = set(df.loc[df["split"] == "train", user_col].unique())
    missing = users - train_users
    if missing:
        raise AssertionError(
            f"{len(missing)} users have no train rows (e.g. {sorted(missing)[:5]})"
        )


def index_ids(
    df: pd.DataFrame, cols: tuple[str, ...] = ("user_id", "product_id")
) -> tuple[pd.DataFrame, dict[str, dict]]:
    """Contiguous 1-based indexing per column (StringIndexer role,
    `02_feature_engineering.py:182-194`); index 0 is reserved for "missing"
    (the featurizer's falsy-drop sentinel). Returns (df with `{col}_index`
    columns, {col: {original -> index}})."""
    mappings: dict[str, dict] = {}
    out = df.copy()
    for col in cols:
        uniques = pd.unique(df[col])
        mapping = {v: i + 1 for i, v in enumerate(uniques)}
        mappings[col] = mapping
        out[f"{col}_index"] = df[col].map(mapping).astype(np.int64)
    return out, mappings


def binarize_ratings(ratings: np.ndarray, threshold: float | None = None) -> np.ndarray:
    """Explicit ratings -> binary labels: below the (mean) threshold -> 0,
    else 1 (the workshop path's label rule,
    `workshop/01-mosaic-streaming.py:121-138`)."""
    ratings = np.asarray(ratings, dtype=np.float64)
    if threshold is None:
        threshold = float(ratings.mean())
    return (ratings >= threshold).astype(np.int64)


def splits_to_columns(
    df: pd.DataFrame,
    user_col: str = "user_id_index",
    item_col: str = "product_id_index",
) -> dict[str, dict[str, np.ndarray]]:
    """Per-split dict-of-columns ready for the TTRS shard writer (the role of
    the per-split parquet/MDS writers, `02_feature_engineering.py:213-282`)."""
    out = {}
    for split in ("train", "val", "test"):
        part = df[df["split"] == split]
        out[split] = {
            "user_id": part[user_col].to_numpy(np.int64),
            "product_id": part[item_col].to_numpy(np.int64),
            "label": part["label"].to_numpy(np.int64),
        }
    return out
