from socialways_tpu.engine.train_step import (
    StepMetrics,
    TrainState,
    gan_step,
    init_train_state,
    make_optimizers,
)
from socialways_tpu.engine.trainer import Trainer
from socialways_tpu.engine import losses

__all__ = [
    "StepMetrics", "TrainState", "gan_step", "init_train_state",
    "make_optimizers", "Trainer", "losses",
]
