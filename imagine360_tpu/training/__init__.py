from .train import TrainState, make_train_step, make_dual_batch
