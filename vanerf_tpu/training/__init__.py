from .train_step import TrainState, create_train_state, train_step, make_lr_schedule  # noqa: F401
