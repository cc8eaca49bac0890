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
import os

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


def _pick_chunk(s: int, c: int) -> int:
    """Largest divisor of s (multiple of 8) whose fp32 chunk fits ~2MB."""
    limit = max(8, (2**21) // (4 * c))
    best = 0
    d = 1
    while d * d <= s:
        if s % d == 0:
            for cand in (d, s // d):
                if cand % 8 == 0 and cand <= limit and cand > best:
                    best = cand
        d += 1
    return best


def _stats_kernel(x_ref, s1_ref, s2_ref):
    """One grid step: accumulate per-channel Σx and Σx² for one row chunk."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    xf = x_ref[0].astype(jnp.float32)
    s1_ref[0, 0, :] += jnp.sum(xf, axis=0)
    s2_ref[0, 0, :] += jnp.sum(xf * xf, axis=0)


def _stats_chunk(s: int, c: int, itemsize: int) -> int:
    """Largest multiple-of-8 divisor of s with chunk ≤ ~1MB (double-buffered
    input blocks stay ≤2MB of VMEM)."""
    limit = max(8, (2**20) // (itemsize * c))
    best = 0
    d = 1
    while d * d <= s:
        if s % d == 0:
            for cand in (d, s // d):
                if cand % 8 == 0 and cand <= limit and cand > best:
                    best = cand
        d += 1
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _pallas_channel_sums(x2):
    """(n, s, c) -> per-(n, c) fp32 (Σx, Σx²) in ONE streaming pass.

    Standalone this is ~20× faster than the XLA reduction
    (scripts/gn_stats_sweep.py), but in the full UNet step XLA's stats
    fusions co-compute their producer chain's elementwise epilogue, so
    swapping ALL sites to this kernel regressed the headline bench — it
    stays opt-in (see set_default_stats_impl)."""
    n, s, c = x2.shape
    ch = _stats_chunk(s, c, x2.dtype.itemsize)
    out = pl.pallas_call(
        _stats_kernel,
        grid=(n, s // ch),
        in_specs=[pl.BlockSpec((1, ch, c), lambda i, j: (i, j, 0))],
        out_specs=[pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
                   pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((n, 1, c), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x2)
    return out[0][:, 0, :], out[1][:, 0, :]


def _channel_sums_fwd(x2):
    return _pallas_channel_sums(x2), x2


def _channel_sums_bwd(x2, g):
    g1, g2 = g
    dx = (g1[:, None, :] + 2.0 * x2.astype(jnp.float32) * g2[:, None, :])
    return (dx.astype(x2.dtype),)


_pallas_channel_sums.defvjp(_channel_sums_fwd, _channel_sums_bwd)


_DEFAULT_STATS = "xla"


def set_default_stats_impl(impl: str) -> None:
    """'auto' routes GroupNorm statistics through the streaming channel-sums
    kernel on TPU and the composite reduction elsewhere; 'pallas' forces the
    kernel (interpret-mode tests); 'xla' (default) keeps the composite form.

    Measured end-to-end (512px headline): the kernel wins 20x standalone
    (scripts/gn_stats_sweep.py — 38 -> 1.8 ms at UNet L0) but LOSES 13 ms/step
    in the full model: XLA's stats fusions are kInput fusions that co-compute
    the producing chain's elementwise epilogue, so extracting the reduction
    into an opaque custom call forces that work into separate HBM passes.
    Kept opt-in for producer-is-custom-call sites and as a documented
    negative result."""
    global _DEFAULT_STATS
    if impl not in ("auto", "xla", "pallas"):
        raise ValueError(impl)
    _DEFAULT_STATS = impl


def stats_ok(x2) -> bool:
    """Pallas channel-sums eligibility: row count divisible into aligned
    chunks. c needs no 128-alignment (blocks equal the array's minor dim, so
    Mosaic masks the lane padding)."""
    if _DEFAULT_STATS == "xla":
        return False
    if _DEFAULT_STATS == "auto" and \
            jax.devices()[0].platform not in ("tpu", "axon"):
        return False
    n, s, c = x2.shape
    return _stats_chunk(s, c, x2.dtype.itemsize) >= 8


# Two-stage GN stats experiment (r5, measured NEUTRAL — kept opt-in as a
# documented negative result). Hypothesis was: the (Σx, Σx²) reduce fused
# into the producing conv's kOutput fusion forces the fusion's bf16 output
# into a {3,0,2,1} (n,c)-minor layout, halving c=320/640 conv throughput;
# reducing over H only in the fused stage should keep the (W, C)-minor
# standard tiling. Measured: XLA gives the H-only partial reduce the same
# transposed preference ({2,0,1} on the (n, W, C) stage-1 outputs, conv
# output still {3,0,2,1}) and the full bench is unchanged (9.599 vs
# 9.605 s). Cross-checked standalone (scripts/conv_stats_probe.py): un-
# fusing stats entirely behind an optimization_barrier is also neutral-to-
# worse at every UNet/VAE geometry — the L0/L1 conv rate (~89-98 TF/s) is a
# property of the 64²/32² conv shapes, not of the stats epilogue (the same
# emitter hits 183 TF/s on the 16²/c1280 convs, stats and all).
_SPLIT_STATS = os.environ.get("AA_SPLIT_STATS", "0") != "0"


def set_split_stats(on: bool) -> None:
    global _SPLIT_STATS
    _SPLIT_STATS = bool(on)


def _split_stage_sums(x):
    """Per-(n, c) fp32 (Σx, Σx²) of (n, ..., W, c) via an H-only fused stage
    plus a barriered (n, W, c) collapse. See _SPLIT_STATS note above."""
    n, c = x.shape[0], x.shape[-1]
    w = x.shape[-2]
    x4 = x.reshape(n, -1, w, c)
    xf = x4.astype(jnp.float32)
    p1 = jnp.sum(xf, axis=1)                  # (n, W, c) — fuses into producer
    p2 = jnp.sum(xf * xf, axis=1)
    p1, p2 = jax.lax.optimization_barrier((p1, p2))
    return jnp.sum(p1, axis=1), jnp.sum(p2, axis=1)


def group_affine(x2, scale, bias, groups, eps, stats=None, sums=None):
    """Per-(batch, channel) fp32 affine (a, b) such that a·x+b applies
    GroupNorm(+scale/bias) to x2 of shape (n, s, c).

    ``sums``: optional precomputed per-(n, c) fp32 (Σx, Σx²) over the row
    axis — produced as an epilogue of the kernel that PRODUCED x2 (e.g. the
    fused temporal-conv stage, ops/temporal_conv.py). When the producer is a
    pallas custom-call XLA cannot fuse the stats reduction into it and emits
    a standalone {1,2,0}-relayout + transposed-reduce pass (r4 profile:
    ~10 ms/step across the transformer entry norms); riding the sums out of
    the producer kernel removes both that pass and the relayout.

    Stats are accumulated per-CHANNEL over the row axis first (a
    lane-preserving reduce on the natural (n, s, c) layout) and only then
    combined into per-group moments on the tiny (n, c) result. The direct
    (n, s, groups, c/g) reshape+reduce form makes the minor dim c/g (10-40,
    not lane-aligned). On-chip (v5e) the two forms profile the same in the
    512px UNet step — XLA fuses either stats pass into the producing conv's
    epilogue (kOutput conv fusions emitting (f32[n,c], f32[n,c], act)
    tuples) — but the channel-first form is the one that stays fusable when
    the producer is a custom-call boundary, and it shares one implementation
    across the gn_silu_* fused ops."""
    n, s, c = x2.shape
    # stats='pallas': per-call override for sites whose PRODUCER is a pallas
    # custom-call (spatial/temporal transformer entry norms) — there XLA has
    # no producer epilogue to co-fuse the reduction into, and instead emits a
    # {1,2,0} relayout copy of the whole tensor before a transposed reduce
    # (r4 profile: ~0.3 ms per L0 site). The streaming kernel reads the
    # natural layout. Global default stays 'xla' (see set_default_stats_impl:
    # forcing ALL sites through the kernel un-fuses conv epilogues, −13 ms).
    force = (stats == "pallas"
             and jax.devices()[0].platform in ("tpu", "axon")
             and _stats_chunk(s, c, x2.dtype.itemsize) >= 8)
    if sums is not None:
        s1, s2 = sums                                                    # (n, c)
        s1 = s1.astype(jnp.float32)
        s2 = s2.astype(jnp.float32)
    elif force or stats_ok(x2):
        s1, s2 = _pallas_channel_sums(x2)                                # (n, c)
    else:
        xf = x2.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=1)                                         # (n, c)
        s2 = jnp.sum(xf * xf, axis=1)                                    # (n, c)
    g1 = s1.reshape(n, groups, c // groups).sum(-1)                      # (n, g)
    g2 = s2.reshape(n, groups, c // groups).sum(-1)
    cnt = float(s * (c // groups))
    mean = g1 / cnt
    var = g2 / cnt - mean * mean
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    inv_c = jnp.repeat(inv, c // groups, axis=1)                         # (n, c)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    a = inv_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean_c * a
    return a, b


def _xla_group_norm(x2, scale, bias, groups, eps, silu, stats=None, sums=None):
    """Composite GN: stats in fp32, application as ONE fused multiply-add in
    the storage dtype. Folding mean/var/scale/bias into per-(batch, channel)
    a·x+b avoids materializing the full tensor in fp32 — the naive
    (x−mean)·rsqrt·scale+bias form cost several full-tensor fp32 copies and
    layout conversions per site in the 512px UNet step (profiled on v5e)."""
    a, b = group_affine(x2, scale, bias, groups, eps, stats=stats, sums=sums)
    y = x2 * a[:, None, :].astype(x2.dtype) + b[:, None, :].astype(x2.dtype)
    if silu:
        # SiLU via the EXACT identity sigmoid(x) = 0.5·(1 + tanh(x/2)):
        # XLA lowers logistic with an exp + divide (the GN-apply fusions
        # profile as divide_multiply_fusion at ~3.7× their bandwidth floor
        # in the VAE decoder); tanh is a single EUP op. Same math, float
        # rounding differences ≤ 1 ulp.
        y = 0.5 * y * (1.0 + jnp.tanh(0.5 * y))
    return y


def group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    groups: int,
    eps: float = 1e-5,
    silu: bool = True,
    impl: str | None = None,
    stats: str | None = None,
    sums: tuple | None = None,
) -> jnp.ndarray:
    """GroupNorm over the last axis of (n, ..., c) with stats pooled over all
    non-batch dims (torch GN semantics), optionally fused with SiLU.

    stats='pallas' forces the streaming channel-sums kernel for THIS call's
    statistics (see group_affine) — used by norms whose producer is a pallas
    custom-call. ``sums``: precomputed per-(n, c) fp32 (Σx, Σx²) ridden out
    of the producing kernel's epilogue — the GN then costs only the fused
    a·x+b apply pass."""
    impl = impl or _DEFAULT_IMPL
    shape = x.shape
    if sums is None and stats != "pallas" and len(shape) >= 4 and _SPLIT_STATS:
        sums = _split_stage_sums(x)
    x2 = x.reshape(shape[0], -1, shape[-1])
    c = shape[-1]
    ch = _pick_chunk(x2.shape[1], c) if impl == "pallas" else 0
    # Mosaic DMA/tiling requires a lane-aligned channel dim (c % 128) — the
    # 320-ch level routes to XLA (measured compile failure otherwise)
    if (impl == "pallas" and sums is None and c % groups == 0 and c % 128 == 0
            and ch >= 8):
        # dormant one-pass streaming kernel (measured negative result;
        # ops/attic/streaming_group_norm.py) — opt-in only
        from animate_anything_tpu.ops.attic.streaming_group_norm import (
            _pallas_group_norm)

        out = _pallas_group_norm(x2, scale, bias, groups, eps, silu, ch)
    else:
        out = _xla_group_norm(x2, scale, bias, groups, eps, silu, stats=stats,
                              sums=sums)
    return out.reshape(shape)
