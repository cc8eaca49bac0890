"""Blockwise 8-bit AdamW (optax transform).

TPU-native replacement for bitsandbytes' ``AdamW8bit`` (engaged by the
reference's ``use_8bit_adam`` config key, /root/reference/train.py:204-215):
Adam moments are stored quantized to 8 bits with per-block fp32 scales —
m (signed) as int8 symmetric, v (non-negative) as uint8 — cutting optimizer
state from 8 to ~2.03 bytes/param. Dequantize → fp32 Adam math → requantize
happens inside the jitted update, so the fp32 moments never exist in HBM
between steps.

bitsandbytes uses a nonlinear "dynamic" quantization map; this uses linear
blockwise scaling (block=256, same as bnb's default block size), which on TPU
vectorizes to a reshape + per-row max — the practical behavior (train large
models with an 8-bit optimizer at bf16-comparable convergence) is the same.

State remains a pytree of per-leaf arrays, so ZeRO sharding
(parallel/partition.py) applies to the quantized state unchanged.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

_BLOCK = 256


class _Quantized(NamedTuple):
    q: Any        # int8/uint8 array, original shape
    scale: Any    # fp32 (nblocks,) per-leaf


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    m: Any        # pytree of _Quantized
    v: Any        # pytree of _Quantized


def _nblocks(size: int, block: int) -> int:
    return -(-size // block)


def _quant_sym(x: jnp.ndarray, block: int) -> _Quantized:
    """Symmetric int8 blockwise quantization of a float array."""
    shape = x.shape
    flat = x.reshape(-1)
    n = _nblocks(flat.size, block)
    pad = n * block - flat.size
    fb = jnp.pad(flat, (0, pad)).reshape(n, block)
    scale = jnp.max(jnp.abs(fb), axis=1) / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(fb / safe[:, None]), -127, 127).astype(jnp.int8)
    return _Quantized(q.reshape(-1)[: flat.size].reshape(shape), scale)


def _dequant_sym(z: _Quantized, block: int) -> jnp.ndarray:
    shape = z.q.shape
    flat = z.q.reshape(-1).astype(jnp.float32)
    n = z.scale.shape[0]
    pad = n * block - flat.size
    fb = jnp.pad(flat, (0, pad)).reshape(n, block) * z.scale[:, None]
    return fb.reshape(-1)[: flat.size].reshape(shape)


def _quant_pos(x: jnp.ndarray, block: int) -> _Quantized:
    """uint8 blockwise quantization of a non-negative array."""
    shape = x.shape
    flat = x.reshape(-1)
    n = _nblocks(flat.size, block)
    pad = n * block - flat.size
    fb = jnp.pad(flat, (0, pad)).reshape(n, block)
    scale = jnp.max(fb, axis=1) / 255.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(fb / safe[:, None]), 0, 255).astype(jnp.uint8)
    return _Quantized(q.reshape(-1)[: flat.size].reshape(shape), scale)


def _dequant_pos(z: _Quantized, block: int) -> jnp.ndarray:
    return _dequant_sym(z, block)  # same linear math; q is uint8


def adamw_8bit(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-2,
    block: int = _BLOCK,
    mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """AdamW with int8/uint8 blockwise-quantized moments."""

    _is_q = lambda x: isinstance(x, _Quantized)

    def init(params):
        def zq(p):
            n = _nblocks(p.size, block)
            return _Quantized(jnp.zeros(p.shape, jnp.int8), jnp.zeros((n,), jnp.float32))

        def zv(p):
            n = _nblocks(p.size, block)
            return _Quantized(jnp.zeros(p.shape, jnp.uint8), jnp.zeros((n,), jnp.float32))

        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree_util.tree_map(zq, params),
            v=jax.tree_util.tree_map(zv, params),
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("adamw_8bit needs params (weight decay)")
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        tmap = jax.tree_util.tree_map
        m = tmap(lambda z: _dequant_sym(z, block), state.m, is_leaf=_is_q)
        v = tmap(lambda z: _dequant_pos(z, block), state.v, is_leaf=_is_q)
        m = tmap(lambda mm, g: b1 * mm + (1.0 - b1) * g.astype(jnp.float32), m, grads)
        v = tmap(lambda vv, g: b2 * vv + (1.0 - b2) * jnp.square(g.astype(jnp.float32)), v, grads)
        upd = tmap(
            lambda mm, vv, p: (
                -learning_rate * (mm / c1 / (jnp.sqrt(vv / c2) + eps)
                                  + weight_decay * p.astype(jnp.float32))
            ).astype(p.dtype),
            m, v, params,
        )
        return upd, Adam8bitState(
            count=count,
            m=tmap(lambda mm: _quant_sym(mm, block), m),
            v=tmap(lambda vv: _quant_pos(vv, block), v),
        )

    tx = optax.GradientTransformation(init, update)
    if mask is not None:
        tx = optax.masked(tx, mask)
    return tx
