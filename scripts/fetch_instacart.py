#!/usr/bin/env python
"""Fetch the Instacart market-basket dataset (Kaggle) into a local directory.

The role of the reference's acquisition cell (`config/data_extract.py:20-80`:
Kaggle CLI download via secret-stored credentials, unzip, move to UC Volumes).
Here: kaggle CLI if available, with a clear offline path — place the CSVs
manually and the pipeline picks them up.

Usage:
    python scripts/fetch_instacart.py --out data/instacart
    # offline: put orders.csv, products.csv, order_products__prior.csv,
    #          order_products__train.csv, departments.csv, aisles.csv in --out
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import zipfile

DATASET = "psparks/instacart-market-basket-analysis"
EXPECTED = [
    "orders.csv", "products.csv", "order_products__prior.csv",
    "order_products__train.csv", "departments.csv", "aisles.csv",
]


def have(out: str) -> list[str]:
    return [f for f in EXPECTED if not os.path.exists(os.path.join(out, f))]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/instacart")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    missing = have(args.out)
    if not missing:
        print(f"all {len(EXPECTED)} CSVs already present in {args.out}")
        return 0

    if shutil.which("kaggle") is None:
        print(
            f"missing files: {missing}\n"
            "kaggle CLI not found (or offline environment). Manual path:\n"
            f"  1. download https://www.kaggle.com/datasets/{DATASET}\n"
            f"  2. unzip the CSVs into {args.out}\n",
            file=sys.stderr,
        )
        return 1

    subprocess.run(
        ["kaggle", "datasets", "download", "-d", DATASET, "-p", args.out], check=True
    )
    for f in os.listdir(args.out):
        if f.endswith(".zip"):
            with zipfile.ZipFile(os.path.join(args.out, f)) as z:
                z.extractall(args.out)
    missing = have(args.out)
    if missing:
        print(f"still missing after download: {missing}", file=sys.stderr)
        return 1
    print(f"dataset ready in {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
