from .mesh import (
    DATA_AXIS,
    P,
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
    spatial_sharding,
)
from .runtime import RuntimeInfo, initialize_runtime, runtime_from_env
