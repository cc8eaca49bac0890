"""Fused transformer-output projection + residual add + GN-stats epilogue.

Every spatial/temporal transformer in the 3D UNet ends with
``x + proj_out(hidden)`` (diffusers Transformer2DModel / TransformerTemporalModel
tails, engaged at /root/reference/models/unet_3d_blocks.py:286-307), and the
CONSUMER of that sum is always a GroupNorm (the temporal transformer's entry
norm, the next resnet's norm1, or conv_norm_out). In composite XLA form that
costs, per site at 512px:

- a standalone stats pass over the sum (the producer chain ends in an
  elementwise add, which XLA's reduce emitter reads through a full
  {3,2,1,0}→{3,0,2,1} relayout copy — r4 profile: the layout tug-of-war
  between reduce-preferred and pallas-required layouts generates ~4.9 GB of
  copies per UNet step);
- a separate residual-add pass reading proj_out's output again.

This kernel does matmul + bias + residual + per-(n, f, c) Σy/Σy² in ONE pass:
read hidden + residual once, write the sum once, stats accumulate in VMEM.
The sums feed the consumer GroupNorm via ``group_affine(sums=...)``
(ops/group_norm.py), so no XLA reduce ever touches this tensor and nothing
downstream prefers the transposed layout.

Backward is a custom_vjp against an exact XLA twin (matmul grads + pass-through
residual grad + the stats terms), so the fused path is trainable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 7 * 2**20


def _rup(a: int, b: int) -> int:
    return -(-a // b) * b


def _pick_chunk(s: int, k: int, c: int, itemsize: int = 2) -> int:
    """Rows per grid step: largest multiple-of-8 divisor of s whose working
    set (h + res + out double-buffered, fp32 accumulator, weight) fits."""
    k_p, c_p = _rup(k, 128), _rup(c, 128)
    w_bytes = k_p * c_p * itemsize
    per_row = 2 * (k_p * itemsize) + 4 * (c_p * itemsize) + c_p * 4
    limit = max(0, (_VMEM_BUDGET - w_bytes)) // per_row
    best = 0
    d = 1
    while d * d <= s:
        if s % d == 0:
            for cand in (d, s // d):
                if cand % 8 == 0 and cand <= limit and cand > best:
                    best = cand
        d += 1
    return best


def _kernel(h_ref, w_ref, b_ref, r_ref, o_ref, s1_ref, s2_ref):
    y = jax.lax.dot_general(
        h_ref[0], w_ref[...],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    y = y + b_ref[0][None, :] + r_ref[0].astype(jnp.float32)
    yc = y.astype(o_ref.dtype)
    o_ref[0] = yc

    @pl.when(pl.program_id(1) == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    yf = yc.astype(jnp.float32)  # stats of the STORED value
    s1_ref[0, 0, :] += jnp.sum(yf, axis=0)
    s2_ref[0, 0, :] += jnp.sum(yf * yf, axis=0)


def _pallas_proj(h, w, bias, residual, ch: int):
    n, s, k = h.shape
    c = w.shape[-1]
    out = pl.pallas_call(
        _kernel,
        grid=(n, s // ch),
        in_specs=[
            pl.BlockSpec((1, ch, k), lambda i, j: (i, j, 0)),
            pl.BlockSpec((k, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, ch, c), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ch, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, s, c), h.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * s * k * c,
            bytes_accessed=n * s * (k + 2 * c) * h.dtype.itemsize,
            transcendentals=0,
        ),
    )(h, w.astype(h.dtype), bias.reshape(1, c).astype(jnp.float32), residual)
    y, s1, s2 = out
    return y, s1[:, 0, :], s2[:, 0, :]


def _reference(h, w, bias, residual):
    """Exact XLA twin (backward + tests + non-TPU path)."""
    y = jnp.einsum("nsk,kc->nsc", h, w.astype(h.dtype),
                   preferred_element_type=jnp.float32)
    y = y + bias.astype(jnp.float32) + residual.astype(jnp.float32)
    yc = y.astype(h.dtype)
    yf = yc.astype(jnp.float32)
    return yc, jnp.sum(yf, axis=1), jnp.sum(yf * yf, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _proj_p(h, w, bias, residual, ch):
    return _pallas_proj(h, w, bias, residual, ch)


def _proj_fwd(h, w, bias, residual, ch):
    return _pallas_proj(h, w, bias, residual, ch), (h, w, bias, residual)


def _proj_bwd(ch, res, g):
    h, w, bias, residual = res
    _, vjp = jax.vjp(_reference, h, w, bias, residual)
    return vjp(g)


_proj_p.defvjp(_proj_fwd, _proj_bwd)


def proj_residual_stats(
    h: jnp.ndarray,          # (n, s, k) hidden
    w: jnp.ndarray,          # (k, c) projection kernel
    bias: jnp.ndarray,       # (c,)
    residual: jnp.ndarray,   # (n, s, c)
    impl: str | None = None,
):
    """``y = h @ w + bias + residual`` with a per-(n, c) fp32 (Σy, Σy²)
    epilogue. Returns ``(y, (s1, s2))``; stats are None when the composite
    path ran without them being free (never — the XLA twin computes them too,
    they just cost a reduce there, which XLA fuses into the add)."""
    n, s, k = h.shape
    use_pallas = (
        impl == "pallas"
        and jax.devices()[0].platform in ("tpu", "axon")
    )
    if use_pallas:
        ch = _pick_chunk(s, k, w.shape[-1], h.dtype.itemsize)
        if ch >= 8:
            y, s1, s2 = _proj_p(h, w, bias, residual, ch)
            return y, (s1, s2)
    y, s1, s2 = _reference(h, w, bias, residual)
    return y, (s1, s2)
