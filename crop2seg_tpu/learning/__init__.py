from crop2seg_tpu.learning import losses, metrics
from crop2seg_tpu.learning.trainer import (
    StepConfig, TrainState, create_train_state, make_eval_step,
    make_train_step, run_epoch,
)
from crop2seg_tpu.learning.weight_init import apply_reference_init
