"""Training stack: optimizers/schedulers, train state, jitted steps, loop."""

from objectdetectionpl_tpu.train.optim import build_optimizer, build_scheduler  # noqa: F401
from objectdetectionpl_tpu.train.state import TrainState, create_train_state  # noqa: F401
from objectdetectionpl_tpu.train.step import make_eval_step, make_train_step  # noqa: F401
