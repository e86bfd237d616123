from uegan_tpu.train.schedules import lambda_linear_decay, make_lr_schedule
from uegan_tpu.train.image_pool import ImagePool, pool_init, pool_query
from uegan_tpu.train.state import TrainState, create_train_state
from uegan_tpu.train.step import make_train_step, make_eval_step

__all__ = [
    "lambda_linear_decay",
    "make_lr_schedule",
    "ImagePool",
    "pool_init",
    "pool_query",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
