from two_tower_recommender_model_tpu.serving.scorer import Scorer, load_scorer  # noqa: F401
from two_tower_recommender_model_tpu.serving.retrieval_service import RetrievalService  # noqa: F401,E501
