from two_tower_recommender_model_tpu.serving.scorer import Scorer, load_scorer  # noqa: F401
