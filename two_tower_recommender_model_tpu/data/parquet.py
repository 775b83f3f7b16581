"""Parquet input path (the Ray Data alternative pipeline,
`ray_tune_optuna_tuning_alex_test_ray_data.py:242-261`).

`parquet_batches` mirrors `get_ray_dataset` + `iter_torch_batches`: read
parquet file(s), apply a columnar preprocess fn, emit dict-of-numpy batches
with int64 id columns. Row-group streaming keeps memory bounded; the batches
feed the same Featurizer/pipeline as the TTRS loader.
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Iterator, Mapping

import numpy as np


def _files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return sorted(glob.glob(path)) if any(c in path for c in "*?[") else [path]


def parquet_batches(
    path: str,
    batch_size: int,
    columns: list[str] | None = None,
    preprocess: Callable[[dict], Mapping[str, np.ndarray]] | None = None,
    drop_last: bool = False,
    int64_ids: bool = True,
) -> Iterator[dict[str, np.ndarray]]:
    """Stream dict-of-columns batches from parquet file(s) or a directory."""
    import pyarrow.parquet as pq

    files = _files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files at {path}")

    buf: dict[str, list[np.ndarray]] = {}
    buf_rows = 0

    def drain(n):
        nonlocal buf, buf_rows
        cols = {k: np.concatenate(v) if len(v) > 1 else v[0] for k, v in buf.items()}
        batch = {k: v[:n] for k, v in cols.items()}
        buf = {k: [v[n:]] for k, v in cols.items()}
        buf_rows -= n
        return batch

    for f in files:
        pf = pq.ParquetFile(f)
        for rg in range(pf.num_row_groups):
            tbl = pf.read_row_group(rg, columns=columns)
            cols = {name: tbl.column(name).to_numpy(zero_copy_only=False)
                    for name in tbl.column_names}
            if int64_ids:
                cols = {
                    k: v.astype(np.int64) if v.dtype.kind in "iu" else v
                    for k, v in cols.items()
                }
            if preprocess is not None:
                cols = dict(preprocess(cols))
            n = len(next(iter(cols.values())))
            for k, v in cols.items():
                buf.setdefault(k, []).append(np.asarray(v))
            buf_rows += n
            while buf_rows >= batch_size:
                yield drain(batch_size)
    if buf_rows and not drop_last:
        yield drain(buf_rows)


def write_parquet_dataset(path: str, columns: Mapping[str, np.ndarray],
                          rows_per_file: int = 1 << 20) -> list[str]:
    """Columnar dict -> parquet file(s) (split-writer parity with the
    reference's parquet train/val/test dirs, `02_feature_engineering.py:213-238`)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    n = len(next(iter(columns.values())))
    out = []
    for i, start in enumerate(range(0, n, rows_per_file)):
        tbl = pa.table({k: v[start : start + rows_per_file] for k, v in columns.items()})
        fp = os.path.join(path, f"part_{i:05d}.parquet")
        pq.write_table(tbl, fp)
        out.append(fp)
    return out
