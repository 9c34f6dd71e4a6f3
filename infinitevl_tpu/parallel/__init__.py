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
