from .step import (
    IGNORE_INDEX,
    cross_entropy_loss,
    kl_distill_loss,
    layerwise_mse_loss,
    make_optimizer,
    make_sft_train_step,
    sft_loss_fn,
)

__all__ = [k for k in dir() if not k.startswith("_")]
