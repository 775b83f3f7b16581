from two_tower_recommender_model_tpu.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
from two_tower_recommender_model_tpu.train.loop import train_val_test  # noqa: F401
