from .pipeline import (
    PIPE,
    create_pp_mesh,
    make_pp_sft_train_step,
    pipeline_decoder_forward,
    pp_param_shardings,
    pp_sft_loss_fn,
    shard_pp_params,
    stack_stage_params,
    unstack_stage_params,
)
from .sharding import (
    DATA,
    MODEL,
    batch_sharding,
    create_hybrid_mesh,
    create_mesh,
    hybrid_device_order,
    param_shardings,
    param_spec,
    shard_params,
    shard_state,
    state_shardings,
)

__all__ = [k for k in dir() if not k.startswith("_")]
