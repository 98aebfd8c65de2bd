from gkgnet_tpu.core import metrics
from gkgnet_tpu.core.config import Config
from gkgnet_tpu.core.optim import build_optimizer
from gkgnet_tpu.core.schedules import build_lr_schedule
from gkgnet_tpu.core.trainer import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
)
