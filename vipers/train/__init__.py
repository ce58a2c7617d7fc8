from vipers.train.steps import TrainState, make_train_step, make_eval_step, accuracy_topk  # noqa: F401
from vipers.train.optim import make_lr_schedule, make_optimizer, weight_decay_rates  # noqa: F401
from vipers.train.ema import ema_decay_for, ema_update  # noqa: F401
