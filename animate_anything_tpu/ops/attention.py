"""Attention dispatch: XLA fused attention or Pallas flash-attention kernels.

This is the TPU-native replacement for the reference's xformers /
torch-2.0-SDPA attention processors (``handle_memory_attention``
/root/reference/train.py:140-156): instead of swapping "attention processors"
on modules, all attention in the framework funnels through this one functional
entry point, and the implementation is chosen by name:

- ``xla``    — jax.nn.dot_product_attention (XLA fuses QKᵀ+softmax+V well);
- ``pallas`` — fused flash-attention Pallas kernel (ops/flash_attention.py),
  tiled for the two video sequence regimes: long spatial sequences (h·w up to
  4096) and many tiny temporal sequences (f ≤ 32, batched over b·h·w).

All inputs are (batch, seq, heads, head_dim); output matches q's shape/dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_DEFAULT_IMPL = "xla"


def set_default_attn_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(f"unknown attention impl {impl}")
    _DEFAULT_IMPL = impl


def default_attn_impl() -> str:
    return _DEFAULT_IMPL


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: Optional[str] = None,
    is_causal: bool = False,
    tag: Optional[tuple] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, S, H, D) tensors.

    tag = (module_path, is_cross): when a prompt-to-prompt controller is
    active (utils/ptp.attention_control), attention runs on a
    probability-materializing path and the controller can observe/rewrite
    the probabilities (the TPU-native analog of the reference's processor
    swapping, ptp_utils.py:273-361)."""
    from animate_anything_tpu.utils.ptp import active_controller

    ctrl = active_controller()
    if ctrl is not None and not is_causal:
        return _controlled_attention(q, k, v, ctrl, tag)
    impl = impl or _DEFAULT_IMPL
    if impl == "pallas":
        from animate_anything_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, is_causal=is_causal)
    return _xla_attention(q, k, v, is_causal=is_causal)


def _controlled_attention(q, k, v, ctrl, tag):
    from animate_anything_tpu.utils.ptp import place_in_unet

    path, is_cross = tag if tag is not None else ((), q is not k)
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (1.0 / d ** 0.5)
    probs = jax.nn.softmax(scores, axis=-1).reshape(b * h, sq, sk)
    probs = jnp.asarray(ctrl(probs, bool(is_cross), place_in_unet(tuple(path))))
    probs = probs.reshape(b, h, sq, sk)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _xla_attention(q, k, v, is_causal=False):
    # jax.nn.dot_product_attention expects (B, S, H, D); softmax in fp32.
    return jax.nn.dot_product_attention(q, k, v, is_causal=is_causal)
