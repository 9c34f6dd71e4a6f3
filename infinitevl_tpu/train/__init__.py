from .distill import (
    apply_trainable_mask,
    make_stage1_step,
    make_stage2_step,
    stage1_loss,
    teacher_layer_io,
)
from .step import (
    IGNORE_INDEX,
    cross_entropy_loss,
    kl_distill_loss,
    layerwise_mse_loss,
    make_optimizer,
    make_sft_train_step,
    sft_loss_fn,
)
from .trainer import Trainer, build_config, build_dataset, collate, run_dt, run_exp, run_sft

__all__ = [k for k in dir() if not k.startswith("_")]
