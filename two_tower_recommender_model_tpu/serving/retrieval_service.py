"""Online retrieval service: user -> top-k items, as a callable and over HTTP.

The role of the reference's Vector Search index + `similarity_search` REST
API (`03_model_training.py:1189-1211`, `04_evaluate_retrieval.py:136-141`):
the item corpus is embedded once (full-corpus export) and kept device-
resident; each query embeds the user(s) and runs the exact chunked top-k —
no external index service, no approximation.

HTTP surface (added to `ModelServer` when constructed with a
`RetrievalService`):

    POST /retrieve  {"user_id": [u1, u2], "k": 10}
                 -> {"items": [[...], [...]], "scores": [[...], [...]]}
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from two_tower_recommender_model_tpu.config import ModelConfig
from two_tower_recommender_model_tpu.evaluation.retrieval import export_feature_embeddings
from two_tower_recommender_model_tpu.ops.topk import chunked_topk


class RetrievalService:
    def __init__(
        self,
        model_cfg: ModelConfig,
        params: dict,
        query_feature: str = "user_id",
        candidate_feature: str = "product_id",
        exclude_item_zero: bool = True,
        max_k: int = 1000,
    ):
        self.model_cfg = model_cfg
        self.params = params
        self.query_feature = query_feature
        self.candidate_feature = candidate_feature
        self.max_k = max_k
        self._start = 1 if exclude_item_zero else 0
        item_emb = export_feature_embeddings(params, model_cfg, candidate_feature)
        self.corpus = jnp.asarray(item_emb[self._start :])
        self.corpus_size = int(self.corpus.shape[0])

    def retrieve(self, user_ids, k: int = 100) -> tuple[np.ndarray, np.ndarray]:
        """(items [U, k], scores [U, k]) — best first; exact over the corpus."""
        if not (1 <= k <= min(self.max_k, self.corpus_size)):
            raise ValueError(
                f"k={k} out of range [1, {min(self.max_k, self.corpus_size)}]"
            )
        user_ids = np.asarray(user_ids)
        q = export_feature_embeddings(
            self.params, self.model_cfg, self.query_feature, ids=user_ids
        )
        scores, idx = chunked_topk(jnp.asarray(q), self.corpus, k=k)
        return np.asarray(idx) + self._start, np.asarray(scores)

    def refresh(self, params: dict) -> None:
        """Re-embed the corpus after a model update (the `index.sync()` role,
        `03_model_training.py:1208-1211`)."""
        self.params = params
        item_emb = export_feature_embeddings(params, self.model_cfg, self.candidate_feature)
        self.corpus = jnp.asarray(item_emb[self._start :])
