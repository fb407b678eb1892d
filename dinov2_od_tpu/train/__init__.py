"""Training: optimizer construction, jitted train/eval steps, state."""

from .state import TrainState, create_train_state, make_optimizer  # noqa: F401
from .step import make_eval_step, make_train_step  # noqa: F401
