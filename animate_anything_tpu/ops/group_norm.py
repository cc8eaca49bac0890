"""Fused GroupNorm(+SiLU) kernel.

Profiling the 512px UNet step on v5e showed normalization as the largest
non-matmul cost: XLA lowers each GroupNorm to convert+reduce passes plus a
separate apply fusion (~3 HBM round-trips of a 90MB activation). This kernel
does stats + normalize + SiLU in ONE pass per sample: one bf16 read, one bf16
write, fp32 statistics on-chip.

Kernel shape notes (pallas_guide):
- grid = (N,) with the whole (S, C) sample in VMEM (≤2.6MB at the largest
  UNet level) — no inter-program reduction needed;
- group sums are computed as matmuls against a constant (C, G) one-hot matrix
  (MXU) instead of reshape-reductions over the tiny C/G axis (VPU-hostile
  relayouts);
- mean/inv-std broadcast back through the transposed one-hot.

``group_norm_silu`` falls back to the same math in XLA off-TPU (and stays the
default — the kernel is opt-in via impl='pallas' / set_default_norm_impl).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEFAULT_IMPL = "xla"


def set_default_norm_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(impl)
    _DEFAULT_IMPL = impl


def _onehot(c: int, groups: int, dtype=jnp.float32) -> jnp.ndarray:
    eye = np.zeros((c, groups), np.float32)
    eye[np.arange(c), np.arange(c) // (c // groups)] = 1.0
    return jnp.asarray(eye, dtype)


def _gn_kernel(x_ref, scale_ref, bias_ref, onehot_ref, o_ref, *, eps: float,
               silu: bool, group_size: int):
    x = x_ref[0]                                   # (S, C) storage dtype
    xf = x.astype(jnp.float32)
    onehot = onehot_ref[...]                       # (C, G) fp32
    s = x.shape[0]
    n = float(s * group_size)

    sums = jax.lax.dot_general(                    # (S, C) @ (C, G) → (S, G)
        xf, onehot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    sq_sums = jax.lax.dot_general(
        xf * xf, onehot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    g_sum = jnp.sum(sums, axis=0)                  # (G,)
    g_sq = jnp.sum(sq_sums, axis=0)
    mean = g_sum / n
    var = g_sq / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    # broadcast per-group → per-channel through onehotᵀ: (C,G)@(G,) per column
    mean_c = jnp.dot(onehot, mean, preferred_element_type=jnp.float32)   # (C,)
    inv_c = jnp.dot(onehot, inv, preferred_element_type=jnp.float32)

    y = (xf - mean_c[None, :]) * inv_c[None, :]
    y = y * scale_ref[...].astype(jnp.float32)[None, :] + bias_ref[...].astype(jnp.float32)[None, :]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pallas_group_norm(x2, scale, bias, groups, eps, silu):
    n, s, c = x2.shape
    onehot = _onehot(c, groups)
    return pl.pallas_call(
        functools.partial(_gn_kernel, eps=eps, silu=silu, group_size=c // groups),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(x2, scale, bias, onehot)


def _xla_group_norm(x2, scale, bias, groups, eps, silu):
    n, s, c = x2.shape
    xg = x2.reshape(n, s, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square(xg.astype(jnp.float32)), axis=(1, 3), keepdims=True
    ) - mean * mean
    y = (xg.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, s, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x2.dtype)


def group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    eps: float = 1e-5,
    silu: bool = True,
    impl: str | None = None,
) -> jnp.ndarray:
    """GroupNorm over the last axis of (n, ..., c) with stats pooled over all
    non-batch dims (torch GN semantics), optionally fused with SiLU."""
    impl = impl or _DEFAULT_IMPL
    shape = x.shape
    x2 = x.reshape(shape[0], -1, shape[-1])
    c = shape[-1]
    use_pallas = (
        impl == "pallas"
        and c % groups == 0
        and x2.shape[1] * c * 6 < 14 * 2**20  # whole sample + fp32 temps in VMEM
    )
    if use_pallas:
        out = _pallas_group_norm(x2, scale, bias, groups, eps, silu)
    else:
        out = _xla_group_norm(x2, scale, bias, groups, eps, silu)
    return out.reshape(shape)
