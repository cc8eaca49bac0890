"""Parameter / optimizer-state partitioning over the device mesh.

The reference's entire distributed runtime is HF Accelerate + DeepSpeed
ZeRO-2 over NCCL (/root/reference/train.py:378-383,
/root/reference/example/deepspeed.yaml: zero_stage 2, CPU optimizer offload).
The TPU-native equivalent here:

- **DP**: batches sharded over the ``data`` mesh axis; gradients are reduced
  by XLA-inserted psum over ICI (no NCCL, no process groups);
- **ZeRO**: optimizer moments (and MultiSteps grad accumulators) sharded over
  ``data`` on their largest divisible axis — the pjit analog of DeepSpeed's
  partitioned optimizer state. Params stay replicated; the per-step update
  all-gather is tiny relative to grads;
- **TP (extension)**: attention/MLP kernels optionally sharded over a
  ``tensor`` axis by path rules (the reference has no TP at all — SURVEY §2.4);
- **frame/sequence axis**: activation sharding for inference batching, applied
  at the pipeline level via with_sharding_constraint.

Host CPU offload (DeepSpeed's memory valve) is replaced by rematerialization +
donation, which is the right trade on TPU.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from animate_anything_tpu.core.mesh import AXIS_DATA, AXIS_TENSOR

# path-substring → (axis index to shard over 'tensor') rules for TP.
# kernel layouts are flax (in, out) for Dense / (kh, kw, in, out) for convs.
_TP_RULES = (
    ("to_q.kernel", -1),
    ("to_k.kernel", -1),
    ("to_v.kernel", -1),
    ("to_out_0.kernel", 0),
    ("net_0_proj.kernel", -1),
    ("net_2.kernel", 0),
)


def _path_str(path) -> str:
    return ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def param_partition_spec(path, value, mesh: Mesh) -> P:
    """PartitionSpec for one parameter. Replicated unless TP is enabled
    (tensor axis size > 1) and a rule matches."""
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    if axes.get(AXIS_TENSOR, 1) > 1:
        p = _path_str(path)
        for pat, axis in _TP_RULES:
            if p.endswith(pat):
                dim = value.ndim + axis if axis < 0 else axis
                if value.shape[dim] % axes[AXIS_TENSOR] == 0:
                    spec = [None] * value.ndim
                    spec[dim] = AXIS_TENSOR
                    return P(*spec)
    return P()


def _zero_spec(value, data_size: int, min_size: int) -> P:
    """ZeRO sharding: largest axis divisible by the data-axis size."""
    if value.ndim == 0 or value.size < min_size:
        return P()
    order = np.argsort(value.shape)[::-1]
    for dim in order:
        if value.shape[dim] % data_size == 0:
            spec = [None] * value.ndim
            spec[dim] = AXIS_DATA
            return P(*spec)
    return P()


def infer_state_shardings(state: Any, mesh: Mesh, min_shard_size: int = 2**14) -> Any:
    """Build a NamedSharding pytree matching a TrainState:
    params → TP/replicated; opt_state arrays → ZeRO over 'data'.

    min_shard_size: arrays smaller than this stay replicated (sharding tiny
    tensors costs more in collective latency than it saves in HBM)."""
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    data_size = axes.get(AXIS_DATA, 1)

    def param_shard(path, v):
        return NamedSharding(mesh, param_partition_spec(path, v, mesh))

    def opt_shard(v):
        if data_size <= 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _zero_spec(v, data_size, min_shard_size))

    params_sh = jax.tree_util.tree_map_with_path(param_shard, state.params)
    opt_sh = jax.tree_util.tree_map(opt_shard, state.opt_state)
    scalar = NamedSharding(mesh, P())
    return state.replace(params=params_sh, opt_state=opt_sh, step=scalar)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def batch_sharding(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
