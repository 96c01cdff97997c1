"""Training: optimizers, EMA, TrainState, jitted data-parallel train step."""
from ucdir_tpu.train.state import TrainState, create_train_state
from ucdir_tpu.train.optim import make_optimizer
from ucdir_tpu.train.step import make_train_step, make_eval_step
