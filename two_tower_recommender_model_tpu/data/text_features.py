"""Item text features: deterministic text embeddings + similarity utilities.

The role of `02a_create_product_features.py`: the reference concatenates
department/aisle/product-name text (`:30-41`), embeds it with a hosted LLM
endpoint (`ai_query("databricks-gte-large-en")`, `:46-56`), computes cosine
similarities via a pandas UDF (`:67-91`) and publishes a feature table
(`:96-121`).

This build is offline/zero-egress, so the embedder is a *feature-hashing
n-gram encoder*: token and character-n-gram hashes scatter into a fixed-dim
vector (signed hashing-trick), L2-normalized. Deterministic, dependency-free,
and a drop-in slot for any pretrained encoder's vectors — the downstream
surface (cosine similarity, feature table, dense tower side-features) is
encoder-agnostic.
"""

from __future__ import annotations

import hashlib

import numpy as np


def concat_text_fields(*fields: str, sep: str = " ") -> str:
    """`concat(department, aisle, product_name)` (`02a:30-41`)."""
    return sep.join(str(f) for f in fields if f)


def _stable_hash(token: str, salt: int) -> int:
    h = hashlib.blake2b(f"{salt}:{token}".encode(), digest_size=8).digest()
    return int.from_bytes(h, "little")


def embed_text(
    texts: list[str],
    dim: int = 256,
    char_ngrams: tuple[int, ...] = (3, 4),
    lowercase: bool = True,
) -> np.ndarray:
    """[len(texts), dim] L2-normalized hashed n-gram embeddings."""
    out = np.zeros((len(texts), dim), np.float32)
    for i, text in enumerate(texts):
        if lowercase:
            text = str(text).lower()
        tokens = list(text.split())
        for n in char_ngrams:
            padded = f" {text} "
            tokens.extend(padded[j : j + n] for j in range(len(padded) - n + 1))
        for tok in tokens:
            h = _stable_hash(tok, 0)
            idx = h % dim
            sign = 1.0 if (h >> 32) & 1 else -1.0
            out[i, idx] += sign
        norm = np.linalg.norm(out[i])
        if norm > 0:
            out[i] /= norm
    return out


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise cosine similarity (the pandas-UDF role, `02a:67-91`)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    num = np.einsum("ij,ij->i", a, b)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    out = np.zeros_like(num)
    np.divide(num, den, out=out, where=den > 0)
    return out


def save_precomputed_embeddings(
    path: str,
    ids: np.ndarray,  # [N] raw 1-based ids (0 is the missing sentinel)
    embeddings: np.ndarray,  # [N, D]
    id_col: str = "product_id",
    emb_col: str = "text_emb",
) -> None:
    """Write an (id -> embedding) file in either of the shapes a hosted
    encoder's output lands in (`02a_create_product_features.py:46-56` writes
    `ai_query(...)` results to a feature table keyed by product_id):
    `.npz` (keys = id_col, emb_col) or `.parquet` (id column + list column)."""
    ids = np.asarray(ids)
    embeddings = np.asarray(embeddings, np.float32)
    if path.endswith(".npz"):
        np.savez(path, **{id_col: ids, emb_col: embeddings})
    elif path.endswith(".parquet"):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.table({id_col: ids, emb_col: list(embeddings)}), path
        )
    else:
        raise ValueError(f"unsupported embedding file {path!r} (.npz|.parquet)")


def load_precomputed_embeddings(
    path: str,
    id_col: str = "product_id",
    emb_col: str = "text_emb",
    num_ids: int | None = None,
) -> np.ndarray:
    """Ingest a precomputed (id -> embedding) file — the exact shape a real
    LLM encoder's output arrives in (the reference materializes
    `ai_query("databricks-gte-large-en")` vectors keyed by product_id,
    `02a_create_product_features.py:46-121`) — into a dense
    `[num_ids + 1, D]` f32 lookup table with row 0 as the missing/pad
    sentinel, ready for `dense`-side tower input or
    `export_feature_embeddings(candidate_dense=...)`.

    Accepts `.npz` (arrays under `id_col`/`emb_col`, or `ids`/`embeddings`)
    and `.parquet` (id column + list-of-float column). Validates: integer
    ids >= 1, no duplicates, one embedding per id, consistent dim."""
    if path.endswith(".npz"):
        data = np.load(path)
        def pick(primary, fallback):
            if primary in data.files:
                return np.asarray(data[primary])
            if fallback in data.files:
                return np.asarray(data[fallback])
            raise ValueError(
                f"{path}: missing array {primary!r} (or {fallback!r}); "
                f"has {data.files}"
            )
        ids = pick(id_col, "ids")
        emb = pick(emb_col, "embeddings")
    elif path.endswith(".parquet"):
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        if id_col not in t.column_names or emb_col not in t.column_names:
            raise ValueError(
                f"{path}: needs columns {id_col!r} and {emb_col!r}; "
                f"has {t.column_names}"
            )
        ids = t.column(id_col).to_numpy()
        emb = np.stack(t.column(emb_col).to_pylist())
    else:
        raise ValueError(f"unsupported embedding file {path!r} (.npz|.parquet)")

    ids = np.asarray(ids)
    emb = np.asarray(emb, np.float32)
    if not np.issubdtype(ids.dtype, np.integer):
        raise ValueError(f"{id_col} must be integers, got {ids.dtype}")
    if emb.ndim != 2 or len(ids) != len(emb):
        raise ValueError(f"expected [N] ids + [N, D] embeddings, got "
                         f"{ids.shape} / {emb.shape}")
    if len(ids) and ids.min() < 1:
        raise ValueError("ids must be >= 1 (0 is the missing-id sentinel)")
    if len(np.unique(ids)) != len(ids):
        raise ValueError(f"{id_col} contains duplicate ids")
    n = int(num_ids if num_ids is not None else (ids.max() if len(ids) else 0))
    if len(ids) and ids.max() > n:
        raise ValueError(f"id {ids.max()} exceeds num_ids={n}")
    table = np.zeros((n + 1, emb.shape[1]), np.float32)
    table[ids] = emb
    return table


def build_product_text_features(
    products,  # pd.DataFrame with product_id + text columns
    text_cols: tuple[str, ...] = ("department", "aisle", "product_name"),
    id_col: str = "product_id",
    dim: int = 256,
):
    """Product feature table: id -> text embedding (the Feature Store write,
    `02a:96-121`). Returns a DataFrame with `{id_col}` and `text_emb` list
    column plus the raw [N, dim] matrix aligned to row order."""
    import pandas as pd

    texts = [
        concat_text_fields(*(row[c] for c in text_cols))
        for _, row in products.iterrows()
    ]
    emb = embed_text(texts, dim=dim)
    table = pd.DataFrame({id_col: products[id_col].to_numpy(), "text_emb": list(emb)})
    return table, emb
