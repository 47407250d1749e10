from socialways_tpu.utils.math_utils import cart2pol, norm, pol2cart, unit
from socialways_tpu.utils.learning_utils import step_decay_lr
from socialways_tpu.utils.profiling import StepTimer, trace

__all__ = ["cart2pol", "pol2cart", "norm", "unit", "step_decay_lr",
           "StepTimer", "trace"]
