"""asltpu.train — jit-compiled data-parallel training (C12)."""

from asltpu.train.loop import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    train,
)
