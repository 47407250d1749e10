from socialways_tpu.engine.train_step import (
    StepMetrics,
    TrainState,
    eval_params,
    gan_step,
    init_train_state,
    make_optimizers,
    transplant_schedule_clock,
)
from socialways_tpu.engine.trainer import Trainer
from socialways_tpu.engine.ensemble import (EnsembleTrainer,
                                            member_state,
                                            stack_states)
from socialways_tpu.engine.simulate import (
    crowd_simulate,
    crowd_simulate_sharded,
    make_crowd_sim,
)
from socialways_tpu.engine.ethucy import merge_scenes, run_leave_one_out
from socialways_tpu.engine.rescue import StallTracker, reinit_discriminator
from socialways_tpu.engine import losses

__all__ = [
    "StepMetrics", "TrainState", "eval_params", "gan_step",
    "init_train_state",
    "make_optimizers", "transplant_schedule_clock", "Trainer",
    "EnsembleTrainer", "member_state", "stack_states", "losses",
    "crowd_simulate", "crowd_simulate_sharded", "make_crowd_sim",
    "merge_scenes",
    "run_leave_one_out",
    "StallTracker", "reinit_discriminator",
]
