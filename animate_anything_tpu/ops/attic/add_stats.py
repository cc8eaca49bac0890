"""DORMANT fused residual add + GN-stats epilogue — r5 negative result.

The resnet blocks end with ``shortcut + conv2(h)`` (diffusers ResnetBlock2D,
engaged at /root/reference/models/unet_3d_blocks.py:18), and the consumer of
that sum is the temporal conv's first GroupNorm (or, at num_frames==1, the
spatial transformer's entry norm). The stats reduce over the sum is what's
left of the layout tug-of-war after the producer-epilogue work in
ops/temporal_conv.py / ops/proj_residual.py: XLA's reduce prefers the
{3,0,2,1} layout, the pallas temp-conv stage requires {3,2,1,0}, and the HLO
shows full-tensor relayout copies at exactly these resnet→temp-conv seams.

This op computes the add and the per-(n, c) fp32 (Σy, Σy²) in ONE pallas
pass: identical HBM traffic to the XLA add fusion (read x + read r, write y),
with the stats riding along in VMEM — no reduce, no preference, no copy.

Backward is trivial (pass-through for the add; the stats terms add
``g1 + 2·y·g2``) via a custom_vjp against the XLA twin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 6 * 2**20


def _rup(a: int, b: int) -> int:
    return -(-a // b) * b


def _pick_chunk(s: int, c: int, itemsize: int = 2) -> int:
    c_p = _rup(c, 128)
    per_row = 6 * c_p * itemsize  # x + r + y, double-buffered
    limit = _VMEM_BUDGET // per_row
    best = 0
    d = 1
    while d * d <= s:
        if s % d == 0:
            for cand in (d, s // d):
                if cand % 8 == 0 and cand <= limit and cand > best:
                    best = cand
        d += 1
    return best


def _kernel(x_ref, r_ref, o_ref, s1_ref, s2_ref):
    y = x_ref[0].astype(jnp.float32) + r_ref[0].astype(jnp.float32)
    yc = y.astype(o_ref.dtype)
    o_ref[0] = yc

    @pl.when(pl.program_id(1) == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    yf = yc.astype(jnp.float32)  # stats of the STORED value
    s1_ref[0, 0, :] += jnp.sum(yf, axis=0)
    s2_ref[0, 0, :] += jnp.sum(yf * yf, axis=0)


def _pallas_add(x, r, ch: int):
    n, s, c = x.shape
    out = pl.pallas_call(
        _kernel,
        grid=(n, s // ch),
        in_specs=[
            pl.BlockSpec((1, ch, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, ch, c), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, ch, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, s, c), x.dtype),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * s * c,
            bytes_accessed=3 * n * s * c * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, r)
    y, s1, s2 = out
    return y, s1[:, 0, :], s2[:, 0, :]


def _reference(x, r):
    y = (x.astype(jnp.float32) + r.astype(jnp.float32)).astype(x.dtype)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=1), jnp.sum(yf * yf, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _add_p(x, r, ch):
    return _pallas_add(x, r, ch)


def _add_fwd(x, r, ch):
    return _pallas_add(x, r, ch), (x, r)


def _add_bwd(ch, res, g):
    x, r = res
    _, vjp = jax.vjp(_reference, x, r)
    return vjp(g)


_add_p.defvjp(_add_fwd, _add_bwd)


def add_with_stats(x: jnp.ndarray, r: jnp.ndarray, impl: str | None = None):
    """``y = x + r`` over (n, s, c) with a per-(n, c) fp32 (Σy, Σy²) epilogue.
    Returns ``(y, (s1, s2))``; stats are None off the pallas path (falling
    back to a plain XLA add — an XLA-reduce fallback would reintroduce the
    layout preference this op exists to remove)."""
    n, s, c = x.shape
    use_pallas = (
        impl == "pallas"
        and jax.devices()[0].platform in ("tpu", "axon")
    )
    if use_pallas:
        ch = _pick_chunk(s, c, x.dtype.itemsize)
        if ch >= 8:
            y, s1, s2 = _add_p(x, r, ch)
            return y, (s1, s2)
    return x + r.astype(x.dtype), None
