from animate_anything_tpu.parallel.partition import (
    batch_sharding,
    infer_state_shardings,
    param_partition_spec,
    replicate,
)

__all__ = [
    "batch_sharding",
    "infer_state_shardings",
    "param_partition_spec",
    "replicate",
]
