from .schedules import make_lr_schedule
from .optim import make_optimizer
from .ema import ema_alpha, update_ema
from .state import TrainState
