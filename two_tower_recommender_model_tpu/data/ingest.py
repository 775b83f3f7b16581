"""Columnar raw-data ingest (the role of `01_data_prep.py`: CSV -> Delta with
explicit schemas, then the order_detail join).

pandas/pyarrow stand in for Spark; the outputs are plain DataFrames that feed
`feature_engineering.py`. Schemas mirror the Instacart tables declared at
`01_data_prep.py:39-109`.
"""

from __future__ import annotations

import os

import pandas as pd

INSTACART_SCHEMAS: dict[str, dict[str, str]] = {
    # mirrors the explicit StructTypes of 01_data_prep.py:39-109
    "orders": {
        "order_id": "int64", "user_id": "int64", "eval_set": "string",
        "order_number": "int64", "order_dow": "int64", "order_hour_of_day": "int64",
        "days_since_prior_order": "float64",
    },
    "products": {
        "product_id": "int64", "product_name": "string", "aisle_id": "int64",
        "department_id": "int64",
    },
    "order_products": {
        "order_id": "int64", "product_id": "int64", "add_to_cart_order": "int64",
        "reordered": "int64",
    },
    "departments": {"department_id": "int64", "department": "string"},
    "aisles": {"aisle_id": "int64", "aisle": "string"},
}


def read_csv_table(path: str, table: str) -> pd.DataFrame:
    """CSV with the declared schema (`read_data` role, `01_data_prep.py:17-27`)."""
    schema = INSTACART_SCHEMAS[table]
    df = pd.read_csv(path, dtype={k: v for k, v in schema.items() if v != "string"})
    missing = set(schema) - set(df.columns)
    if missing:
        raise ValueError(f"{table}: missing columns {sorted(missing)}")
    return df


def write_parquet(df: pd.DataFrame, out_dir: str, name: str) -> str:
    """Parquet writer (`write_data` role, `01_data_prep.py:29-37`)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.parquet")
    df.to_parquet(path, index=False)
    return path


def build_order_detail(
    orders: pd.DataFrame, order_products: pd.DataFrame, products: pd.DataFrame
) -> pd.DataFrame:
    """The order_detail join (`01_data_prep.py:111-117`): orders x
    order_products x products -> one row per (order, product) with user_id."""
    df = order_products.merge(orders, on="order_id", how="inner")
    df = df.merge(products, on="product_id", how="inner")
    return df[
        ["order_id", "user_id", "product_id", "product_name", "order_number",
         "add_to_cart_order", "reordered", "eval_set"]
    ]
