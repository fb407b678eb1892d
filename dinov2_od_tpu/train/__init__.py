"""Training: optimizer construction, jitted train/eval steps, state."""

from .state import TrainState, create_train_state, make_optimizer  # noqa: F401
from .step import (  # noqa: F401
    make_eval_step,
    make_eval_topk_step,
    make_train_step,
)
