from wekws_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    pad_batch_to_multiple,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "pad_batch_to_multiple",
]
