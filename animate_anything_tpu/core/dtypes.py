"""Mixed-precision policy.

TPU-native replacement for the reference's CUDA autocast fp16
(``accelerator.autocast`` /root/reference/train.py:561, ``mixed_precision: fp16``
configs): parameters are kept in fp32 (master), compute runs in bfloat16 — the
MXU's native input type — and reductions/softmax/sigma math stay fp32.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16

    def cast_to_compute(self, tree):
        return cast_floating(tree, self.compute_dtype)

    def cast_to_param(self, tree):
        return cast_floating(tree, self.param_dtype)


def cast_floating(tree, dtype):
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_cast, tree)


def half_policy() -> Policy:
    return Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)


def full_policy() -> Policy:
    return Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


def policy_from_string(name: str | None) -> Policy:
    """Map reference config values ('fp16'/'bf16'/'no',
    /root/reference/train.py mixed_precision key) onto TPU policies."""
    if name in (None, "no", "fp32", "float32"):
        return full_policy()
    if name in ("fp16", "bf16", "bfloat16", "float16"):
        return half_policy()
    raise ValueError(f"unknown mixed_precision: {name}")
