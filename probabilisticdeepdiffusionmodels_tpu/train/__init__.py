from .samplers import LossHistory, sample_importance, sample_uniform
from .distill import distill_round, halved_student, make_distill_step
from .state import TrainState, ema_update
from .step import (global_norm, make_eval_step,
                   make_fused_train_step, make_train_step)
