from .sharding import (
    DATA,
    MODEL,
    batch_sharding,
    create_mesh,
    param_shardings,
    param_spec,
    shard_params,
    shard_state,
    state_shardings,
)

__all__ = [k for k in dir() if not k.startswith("_")]
