from two_tower_recommender_model_tpu.utils.tracking import ExperimentLogger  # noqa: F401
from two_tower_recommender_model_tpu.utils.checkpoint import Checkpointer  # noqa: F401
