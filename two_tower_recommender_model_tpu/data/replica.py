"""Schema-faithful Instacart replica generator.

Kaggle is unreachable from many environments; this writes the EXACT file set
and schemas the real dataset ships (`config/data_extract.py:37-80`,
`01_data_prep.py:17-27`) at the real scale — 206,209 users, 49,688 products,
~3.2M orders, ~30M prior order-products rows — so the full `scripts/`
pipeline (fetch -> prepare -> train -> retrieval eval) runs end to end and
its quality numbers are meaningful:

- baskets are drawn from a latent-preference model (user x item affinity +
  Zipf item popularity + noise), so two-tower training has real signal to
  recover, and retrieval metrics rank configurations the same way they would
  on organic data;
- per-user order counts, basket sizes, and the prior/train eval_set split
  mirror the published dataset's shapes (orders 4..100/user, baskets ~10,
  last order per user held out as eval_set="train"; the modeling pipeline
  reads prior — `02_feature_engineering.py:25-31`).

Files written: orders.csv, products.csv, order_products__prior.csv,
order_products__train.csv, departments.csv, aisles.csv.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

REAL_USERS = 206_209
REAL_PRODUCTS = 49_688
REAL_DEPARTMENTS = 21
REAL_AISLES = 134


def _positions_within_groups(sizes: np.ndarray) -> np.ndarray:
    """[1..s0, 1..s1, ...] for group sizes, vectorized (no Python loop)."""
    total = int(sizes.sum())
    starts = np.cumsum(sizes) - sizes
    return np.arange(total, dtype=np.int64) - np.repeat(starts, sizes) + 1


def write_instacart_replica(
    out_dir: str,
    num_users: int = REAL_USERS,
    num_products: int = REAL_PRODUCTS,
    mean_orders_per_user: float = 15.6,
    mean_basket: float = 9.0,
    latent_dim: int = 4,
    popularity: float = 1.0,
    noise: float = 0.35,
    seed: int = 0,
    chunk_rows: int = 4_000_000,
) -> dict:
    """Generate the CSV set. Returns summary counts. Memory-bounded: basket
    sampling and CSV writing stream in `chunk_rows` chunks (pandas C writer)."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    # --- products / departments / aisles -------------------------------
    pd.DataFrame({
        "department_id": np.arange(1, REAL_DEPARTMENTS + 1),
        "department": [f"department_{d}" for d in range(1, REAL_DEPARTMENTS + 1)],
    }).to_csv(os.path.join(out_dir, "departments.csv"), index=False)
    pd.DataFrame({
        "aisle_id": np.arange(1, REAL_AISLES + 1),
        "aisle": [f"aisle_{a}" for a in range(1, REAL_AISLES + 1)],
    }).to_csv(os.path.join(out_dir, "aisles.csv"), index=False)
    pd.DataFrame({
        "product_id": np.arange(1, num_products + 1),
        "product_name": [f"product_{i}" for i in range(1, num_products + 1)],
        "aisle_id": rng.integers(1, REAL_AISLES + 1, num_products),
        "department_id": rng.integers(1, REAL_DEPARTMENTS + 1, num_products),
    }).to_csv(os.path.join(out_dir, "products.csv"), index=False)

    # --- latent preference model (the signal the model must recover) ----
    user_latent = rng.normal(size=(num_users + 1, latent_dim)).astype(np.float32)
    item_latent = rng.normal(size=(num_products + 1, latent_dim)).astype(np.float32)
    # Zipf-ish popularity over items (popular products bought by everyone)
    pop = 1.0 / np.arange(1, num_products + 1) ** popularity
    item_perm = rng.permutation(num_products) + 1  # which ids are popular
    pop_p = pop / pop.sum()

    # --- orders ---------------------------------------------------------
    # per-user order counts: clipped lognormal, 4..100 (real data's bounds)
    counts = np.clip(
        rng.lognormal(mean=np.log(mean_orders_per_user) - 0.25, sigma=0.7,
                      size=num_users),
        4, 100,
    ).astype(np.int64)
    total_orders = int(counts.sum())
    order_user = np.repeat(np.arange(1, num_users + 1), counts)
    order_number = _positions_within_groups(counts)
    order_id = rng.permutation(total_orders) + 1  # ids not sorted by user (real data)
    is_last = order_number == np.repeat(counts, counts)
    eval_is_train = is_last
    days = rng.integers(1, 31, total_orders).astype(object)
    days[order_number == 1] = ""  # first order: empty (real schema)
    pd.DataFrame({
        "order_id": order_id,
        "user_id": order_user,
        "eval_set": np.where(eval_is_train, "train", "prior"),
        "order_number": order_number,
        "order_dow": rng.integers(0, 7, total_orders),
        "order_hour_of_day": rng.integers(0, 24, total_orders),
        "days_since_prior_order": days,
    }).to_csv(os.path.join(out_dir, "orders.csv"), index=False)

    # --- order products (prior + train), chunked ------------------------
    basket = np.clip(rng.poisson(mean_basket - 1, total_orders) + 1, 1, 60)
    total_rows = int(basket.sum())
    row_order_idx = np.repeat(np.arange(total_orders), basket)
    cart_pos = _positions_within_groups(basket)

    def sample_items(user_ids: np.ndarray, block_rng) -> np.ndarray:
        """Popularity-weighted candidates, pick argmax user-affinity of k —
        preference-correlated, popularity-skewed baskets."""
        k = 4
        n = len(user_ids)
        cands = item_perm[block_rng.choice(num_products, size=(n, k), p=pop_p)]
        aff = np.einsum("nd,nkd->nk", user_latent[user_ids], item_latent[cands])
        aff += block_rng.normal(scale=noise * (aff.std() + 1e-6), size=aff.shape)
        return cands[np.arange(n), aff.argmax(axis=1)]

    paths = {
        "prior": os.path.join(out_dir, "order_products__prior.csv"),
        "train": os.path.join(out_dir, "order_products__train.csv"),
    }
    rows_out = {"prior": 0, "train": 0}
    header = {"prior": True, "train": True}
    for lo in range(0, total_rows, chunk_rows):
        hi = min(lo + chunk_rows, total_rows)
        oi = row_order_idx[lo:hi]
        block_rng = np.random.default_rng(np.random.SeedSequence([seed, 7, lo]))
        items = sample_items(order_user[oi], block_rng)
        df = pd.DataFrame({
            "order_id": order_id[oi],
            "product_id": items,
            "add_to_cart_order": cart_pos[lo:hi],
            "reordered": block_rng.integers(0, 2, hi - lo),
        })
        train_mask = eval_is_train[oi]
        for which, m in (("prior", ~train_mask), ("train", train_mask)):
            if not m.any():
                continue
            df[m].to_csv(paths[which], index=False, header=header[which],
                         mode="w" if header[which] else "a")
            header[which] = False
            rows_out[which] += int(m.sum())

    return {
        "users": num_users,
        "products": num_products,
        "orders": total_orders,
        "prior_rows": rows_out["prior"],
        "train_rows": rows_out["train"],
    }
