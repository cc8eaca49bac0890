from animate_anything_tpu.core.compile_cache import (enable_compilation_cache,
                                                      xla_compiler_options)
from animate_anything_tpu.core.config import Config, load_config, merge_dotlist
from animate_anything_tpu.core.mesh import (
    AXIS_DATA,
    AXIS_FRAME,
    AXIS_TENSOR,
    create_mesh,
    named_sharding,
    shard_batch,
)
from animate_anything_tpu.core.dtypes import Policy, cast_floating, half_policy, full_policy

__all__ = [
    "enable_compilation_cache",
    "xla_compiler_options",
    "Config",
    "load_config",
    "merge_dotlist",
    "AXIS_DATA",
    "AXIS_FRAME",
    "AXIS_TENSOR",
    "create_mesh",
    "named_sharding",
    "shard_batch",
    "Policy",
    "cast_floating",
    "half_policy",
    "full_policy",
]
