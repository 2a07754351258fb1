from .bertadam import bert_adam, warmup_linear_schedule
from .trainer import TrainState, make_train_step, make_loss_fn
