"""Fused temporal-attention block Pallas kernel.

The temporal transformer (reference: diffusers TransformerTemporalModel at
/root/reference/models/unet_3d_blocks.py:526, double-self-attention blocks)
is the UNet's worst TPU citizen: per spatial location it runs a f-frame
(f = 14-17) attention — thousands of 17×17 matmuls — and around them four
c→c projections plus LayerNorms, each a separate HBM round-trip in the
composite XLA form.

This kernel fuses LayerNorm → Q/K/V projections → per-location frame
attention → output projection → residual into ONE VMEM-resident pass over a
*packed* token layout:

- ``pack_frames`` reorders (b, f, s, c) so each group of p = ⌊128/f⌋ spatial
  locations' frames becomes one contiguous (R = p·f, c) row-block, rows
  frame-major/location-minor, padded to Rp = roundup(R, 8) sublanes.
- Inside the kernel the full (Rp × Rp) score matrix for a pack is ONE dense
  MXU matmul; because rows interleave locations, "query r may attend key c"
  is simply r ≡ c (mod p) — a static mask added to the scores. The row
  softmax under that mask is exactly the per-location softmax. Packing turns
  2% MXU tile occupancy (17×17 batched matmuls) into ~86%.
- Scores, probabilities, and all intermediates stay in VMEM; per attention
  module the only HBM traffic is one read of x, one write of the output, and
  the (DMA-elided across grid steps) weights.

Measured on v5e-1 vs the composite XLA path (LN+projections+einsum
attention+residual), CFG batch, f=17: c=320/s=4096: 10.7→4.4 ms;
c=640/s=1024: 5.5→2.6 ms; c=1280/s=256: 3.4→2.1 ms — ≈2.2× per module,
~115 ms per UNet CFG step.

Backward: custom_vjp rematerializing through an exact XLA reference on the
packed layout (flash-style — nothing O(f²·s) is stored), so the fused path
is usable in training.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _rup(a: int, b: int) -> int:
    return _cdiv(a, b) * b


@dataclasses.dataclass(frozen=True)
class PackGeometry:
    """Static geometry of the packed frame layout."""

    f: int          # frames
    s: int          # locations (h·w)
    p: int          # locations packed per tile
    R: int          # real rows per pack (p·f)
    Rp: int         # sublane-padded rows per pack
    npk: int        # number of packs (covers s, padded)

    @property
    def s_pad(self) -> int:
        return self.npk * self.p

    @property
    def tokens(self) -> int:
        return self.npk * self.Rp


def pack_geometry(f: int, s: int) -> PackGeometry:
    p = max(1, _LANE // f)
    return PackGeometry(f=f, s=s, p=p, R=p * f, Rp=_rup(p * f, 8), npk=_cdiv(s, p))


def pack_frames(x: jnp.ndarray, geom: PackGeometry) -> jnp.ndarray:
    """(b, f, s, c) → (b, npk·Rp, c) packed tokens (frame-major, loc-minor)."""
    b, f, s, c = x.shape
    g = geom
    if g.s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, g.s_pad - s), (0, 0)))
    x = x.reshape(b, f, g.npk, g.p, c).transpose(0, 2, 1, 3, 4)
    x = x.reshape(b, g.npk, g.R, c)
    if g.Rp != g.R:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, g.Rp - g.R), (0, 0)))
    return x.reshape(b, g.npk * g.Rp, c)


def unpack_frames(xp: jnp.ndarray, geom: PackGeometry) -> jnp.ndarray:
    """Inverse of pack_frames: (b, npk·Rp, c) → (b, f, s, c)."""
    b, _, c = xp.shape
    g = geom
    x = xp.reshape(b, g.npk, g.Rp, c)[:, :, : g.R]
    x = x.reshape(b, g.npk, g.f, g.p, c).transpose(0, 2, 1, 3, 4)
    x = x.reshape(b, g.f, g.s_pad, c)
    return x[:, :, : g.s]


def _pick_nblk(c: int, npk: int) -> int:
    """Packs per grid step: tile VMEM scales with nblk·Rp·c; weights with c².
    Measured-good points: c=320→8, c=640→4, c=1280→2 (c=640 at nblk=8 and
    c=320 at nblk=16 exceed VMEM)."""
    nblk = max(1, 2560 // c)
    while nblk > 1 and nblk > npk:
        nblk //= 2
    return nblk


def _kernel(x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
            o_ref, obuf, *, p: int, R: int, Rp: int, nblk: int, heads: int,
            d: int, eps: float, fuse_residual: bool):
    x = x_ref[0]                                        # (nblk·Rp, c) bf16
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]).astype(x.dtype)

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    q = dot(ln, wq_ref[...]).astype(x.dtype)            # (rows, heads·d)
    k = dot(ln, wk_ref[...]).astype(x.dtype)
    v = dot(ln, wv_ref[...]).astype(x.dtype)

    row = jax.lax.broadcasted_iota(jnp.int32, (Rp, Rp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Rp, Rp), 1)
    neg = jnp.where(((row % p) == (col % p)) & (col < R), 0.0, -1e30).astype(jnp.float32)
    scale = 1.0 / d ** 0.5

    for i in range(nblk):
        for hi in range(heads):
            qi = q[i * Rp:(i + 1) * Rp, hi * d:(hi + 1) * d]
            ki = k[i * Rp:(i + 1) * Rp, hi * d:(hi + 1) * d]
            vi = v[i * Rp:(i + 1) * Rp, hi * d:(hi + 1) * d]
            sc = jax.lax.dot_general(
                qi, ki, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale + neg
            e = jnp.exp(sc - jnp.max(sc, axis=-1, keepdims=True))
            o = jnp.dot(e.astype(vi.dtype), vi, preferred_element_type=jnp.float32)
            o = o / jnp.sum(e, axis=-1, keepdims=True)
            obuf[i * Rp:(i + 1) * Rp, hi * d:(hi + 1) * d] = o.astype(obuf.dtype)

    out = dot(obuf[...], wo_ref[...])
    if fuse_residual:
        out = out + bo_ref[0] + xf
    o_ref[0] = out.astype(o_ref.dtype)


def _reference(xp, lns, lnb, wq, wk, wv, wo, bo, *, geom: PackGeometry,
               heads: int, d: int, eps: float = 1e-5):
    """Exact XLA twin of the kernel on the packed layout (bwd + tests)."""
    b, t, c = xp.shape
    g = geom
    xf = xp.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + eps) * lns + lnb).astype(xp.dtype)

    def proj(w):
        y = jnp.einsum("btc,cD->btD", ln, w, preferred_element_type=jnp.float32)
        return y.astype(xp.dtype).reshape(b, g.npk, g.Rp, heads, d)

    q, k, v = proj(wq), proj(wk), proj(wv)
    sc = jnp.einsum("bnrhd,bnchd->bnhrc", q, k, preferred_element_type=jnp.float32)
    sc = sc * (1.0 / d ** 0.5)
    row = jax.lax.broadcasted_iota(jnp.int32, (g.Rp, g.Rp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g.Rp, g.Rp), 1)
    neg = jnp.where(((row % g.p) == (col % g.p)) & (col < g.R), 0.0, -1e30)
    probs = jax.nn.softmax(sc + neg, axis=-1)
    o = jnp.einsum("bnhrc,bnchd->bnrhd", probs.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(xp.dtype)
    o = o.reshape(b, t, c)
    out = jnp.einsum("btc,cD->btD", o, wo, preferred_element_type=jnp.float32)
    return (out + bo + xf).astype(xp.dtype)


def _reference_lean(xp, lns, lnb, wq, wk, wv, wo, bo, *, geom: PackGeometry,
                    heads: int, d: int, eps: float = 1e-5):
    """Gradient twin with per-location attention (backward only).

    The exact twin above materializes the DENSE packed (Rp, Rp) score/prob
    matrices the kernel uses — under vjp those are saved fp32 residuals,
    ~270 MB per c=320 site at 512px, and the dominant HBM cost of training
    through the fused path. But the pack mask makes the attention exactly
    block-diagonal: row r = frame·p + location only attends within its
    location. This twin computes the same function unpacked per location
    (f×f scores instead of Rp×Rp — p·(Rp/R)² ≈ 7× smaller, and only this is
    saved fp32), so it has identical gradients on all real rows. Pad rows
    (R..Rp) differ in VALUE from the exact twin, which is safe in a
    gradient-only role: pad rows are never attended to as keys (col < R
    mask) and every consumer drops them, so their cotangent is always zero.
    """
    b, t, c = xp.shape
    g = geom
    xf = xp.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + eps) * lns + lnb).astype(xp.dtype)

    def proj(w):
        y = jnp.einsum("btc,cD->btD", ln, w, preferred_element_type=jnp.float32)
        y = y.astype(xp.dtype).reshape(b, g.npk, g.Rp, heads * d)[:, :, : g.R]
        return y.reshape(b, g.npk, g.f, g.p, heads, d)

    q, k, v = proj(wq), proj(wk), proj(wv)
    sc = jnp.einsum("bnfphd,bngphd->bnphfg", q, k,
                    preferred_element_type=jnp.float32) * (1.0 / d ** 0.5)
    probs = jax.nn.softmax(sc, axis=-1)                 # (b, npk, p, h, f, f)
    o = jnp.einsum("bnphfg,bngphd->bnfphd", probs.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(xp.dtype)
    o = o.reshape(b, g.npk, g.R, heads * d)
    if g.Rp != g.R:
        o = jnp.pad(o, ((0, 0), (0, 0), (0, g.Rp - g.R), (0, 0)))
    o = o.reshape(b, t, heads * d)
    out = jnp.einsum("btc,cD->btD", o, wo, preferred_element_type=jnp.float32)
    return (out + bo + xf).astype(xp.dtype)


@functools.lru_cache(maxsize=64)
def _build(geom: PackGeometry, heads: int, d: int, c: int, eps: float,
           fuse_residual: bool = True):
    """heads·d may be < c (a head GROUP): the kernel then emits only this
    group's partial out-projection (no bias/residual) for XLA summation."""
    g = geom
    inner = heads * d
    nblk = _pick_nblk(max(c, inner), g.npk)
    npk_pad = _rup(g.npk, nblk)
    t_in = g.npk * g.Rp
    t_pad = npk_pad * g.Rp

    blk = lambda bi, ni: (bi, ni, 0)
    vspec = pl.BlockSpec((1, c), lambda bi, ni: (0, 0))
    wqspec = pl.BlockSpec((c, inner), lambda bi, ni: (0, 0))
    wospec = pl.BlockSpec((inner, c), lambda bi, ni: (0, 0))

    def forward(xp, lns, lnb, wq, wk, wv, wo, bo):
        b = xp.shape[0]
        x = xp if t_pad == t_in else jnp.pad(xp, ((0, 0), (0, t_pad - t_in), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_kernel, p=g.p, R=g.R, Rp=g.Rp, nblk=nblk,
                              heads=heads, d=d, eps=eps,
                              fuse_residual=fuse_residual),
            grid=(b, npk_pad // nblk),
            in_specs=[pl.BlockSpec((1, nblk * g.Rp, c), blk),
                      vspec, vspec, wqspec, wqspec, wqspec, wospec, vspec],
            out_specs=pl.BlockSpec((1, nblk * g.Rp, c), blk),
            out_shape=jax.ShapeDtypeStruct((b, t_pad, c), xp.dtype),
            scratch_shapes=[pltpu.VMEM((nblk * g.Rp, inner), xp.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * t_pad * (3 * c * inner + inner * c) + 4 * b * t_pad * g.Rp * inner,
                bytes_accessed=2 * b * t_pad * c * xp.dtype.itemsize,
                transcendentals=b * t_pad * g.Rp * heads,
            ),
        )(x, lns, lnb, wq, wk, wv, wo, bo)
        return out[:, :t_in] if t_pad != t_in else out

    return forward


# ---------------------------------------------------------------------------
# bfsc variant: in-kernel pack/unpack.
#
# The packed entry above needs the caller to materialize the packed token
# layout in HBM (pad → 5-d transpose → pad → and back), ~5 full passes over
# the activation per temporal site — profiled at ~15-20 ms of the 512px UNet
# step. But a pack's data (p consecutive locations × all f frames) is a
# CONTIGUOUS block of the natural (b, f, s, c) array: BlockSpec
# (1, f, nblk·p, c) fetches it directly, and the frame-major row shuffle the
# MXU wants is done in VMEM (sublane copies, no HBM traffic). The s-edge
# block (s % (nblk·p) ≠ 0) reads garbage locations past the array edge;
# that's safe because a real row only ever attends keys of its OWN location
# slot (row ≡ col mod p) — garbage stays confined to garbage rows, whose
# writes Mosaic's ragged-edge handling discards — provided the mask is a
# select, not an additive -1e30 (NaN + -1e30 = NaN would leak garbage into
# real rows' softmax).
# ---------------------------------------------------------------------------


def _kernel_bfsc(x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                 bo_ref, o_ref, xbuf, *, f: int, p: int, R: int,
                 Rp: int, nblk: int, heads: int, d: int, eps: float):
    # pack shuffle: (f, nblk·p, c) natural → (nblk·Rp, c) frame-major rows
    for i in range(nblk):
        for fr in range(f):
            r0 = i * Rp + fr * p
            xbuf[r0:r0 + p, :] = x_ref[0, fr, i * p:(i + 1) * p, :]
        if Rp != R:
            xbuf[i * Rp + R:(i + 1) * Rp, :] = jnp.zeros(
                (Rp - R, x_ref.shape[-1]), x_ref.dtype)

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    row = jax.lax.broadcasted_iota(jnp.int32, (Rp, Rp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Rp, Rp), 1)
    valid = ((row % p) == (col % p)) & (col < R)
    scale = 1.0 / d ** 0.5

    # per-pack pipeline: the value stack holds one pack's temps (Rp rows)
    # instead of the whole block's — what lets c=640 fit scoped VMEM
    for i in range(nblk):
        x = xbuf[i * Rp:(i + 1) * Rp, :]
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        ln = ((xf - mu) * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]).astype(x.dtype)
        q = dot(ln, wq_ref[...]).astype(x.dtype)
        k = dot(ln, wk_ref[...]).astype(x.dtype)
        v = dot(ln, wv_ref[...]).astype(x.dtype)

        parts = []
        for hi in range(heads):
            qi = q[:, hi * d:(hi + 1) * d]
            ki = k[:, hi * d:(hi + 1) * d]
            vi = v[:, hi * d:(hi + 1) * d]
            sc = jax.lax.dot_general(
                qi, ki, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            # select-mask (NOT additive): edge-block garbage keys may be NaN
            sc = jnp.where(valid, sc * scale, -1e30)
            e = jnp.exp(sc - jnp.max(sc, axis=-1, keepdims=True))
            o = jnp.dot(e.astype(vi.dtype), vi, preferred_element_type=jnp.float32)
            parts.append((o / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype))

        out = (dot(jnp.concatenate(parts, axis=-1), wo_ref[...])
               + bo_ref[0] + xf).astype(o_ref.dtype)
        # unpack shuffle: packed rows → (f, p, c) slice; pack pad rows dropped
        for fr in range(f):
            o_ref[0, fr, i * p:(i + 1) * p, :] = out[fr * p:(fr + 1) * p, :]


def _reference_bfsc(x, lns, lnb, wq, wk, wv, wo, bo, *, heads: int, d: int,
                    eps: float = 1e-5):
    """Exact XLA twin on the natural (b, f, s, c) layout: per-location frame
    attention (what the packed mask computes on real rows). Used as the
    custom_vjp remat target and the non-TPU fallback."""
    b, f, s, c = x.shape
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + eps) * lns + lnb).astype(x.dtype)

    def proj(w):
        y = jnp.einsum("bfsc,cD->bfsD", ln, w, preferred_element_type=jnp.float32)
        return y.astype(x.dtype).reshape(b, f, s, heads, d)

    q, k, v = proj(wq), proj(wk), proj(wv)
    sc = jnp.einsum("bfshd,bgshd->bshfg", q, k,
                    preferred_element_type=jnp.float32) * (1.0 / d ** 0.5)
    probs = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("bshfg,bgshd->bfshd", probs.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.reshape(b, f, s, heads * d)
    out = jnp.einsum("btsc,cD->btsD", o, wo, preferred_element_type=jnp.float32)
    return (out + bo + xf).astype(x.dtype)


def _bfsc_geometry(f: int, s: int, c: int) -> Optional[tuple]:
    """(p, R, Rp, nblk) for the bfsc kernel, or None when it doesn't fit:
    nblk·p must be a sublane multiple (BlockSpec last-two-dims rule) and the
    VMEM working set must stay inside the scoped budget."""
    import math

    p = max(1, _LANE // f)
    base = 8 // math.gcd(p, 8)   # nblk·p must be a multiple of 8 sublanes
    nblk = base * _cdiv(_pick_nblk(c, 10**9), base)
    while nblk > base and nblk * p > s:
        nblk -= base
    R, Rp = p * f, _rup(p * f, 8)
    if nblk * p > s:
        return None
    # double-buffered in+out blocks + pack scratch + weights + value stack
    # (ONE pack's xf/out fp32 + ln/q/k/v bf16 ≈ 16 B/row-elem — the kernel
    # pipelines per pack precisely to keep this term small)
    blk = f * nblk * p * c * 2
    scratch = nblk * Rp * c * 2
    weights = 4 * c * c * 2
    stack = Rp * c * 16
    if 4 * blk + scratch + weights + stack > 14 * 2**20:
        return None
    return p, R, Rp, nblk


@functools.lru_cache(maxsize=64)
def _build_bfsc(f: int, s: int, heads: int, d: int, c: int, eps: float):
    p, R, Rp, nblk = _bfsc_geometry(f, s, c)
    n_sblk = _cdiv(s, nblk * p)

    vspec = pl.BlockSpec((1, c), lambda bi, ni: (0, 0))
    wqspec = pl.BlockSpec((c, c), lambda bi, ni: (0, 0))

    def forward(x, lns, lnb, wq, wk, wv, wo, bo):
        b = x.shape[0]
        return pl.pallas_call(
            functools.partial(_kernel_bfsc, f=f, p=p, R=R, Rp=Rp, nblk=nblk,
                              heads=heads, d=d, eps=eps),
            grid=(b, n_sblk),
            in_specs=[
                pl.BlockSpec((1, f, nblk * p, c), lambda bi, ni: (bi, 0, ni, 0)),
                vspec, vspec, wqspec, wqspec, wqspec, wqspec, vspec,
            ],
            out_specs=pl.BlockSpec((1, f, nblk * p, c),
                                   lambda bi, ni: (bi, 0, ni, 0)),
            out_shape=jax.ShapeDtypeStruct((b, f, s, c), x.dtype),
            scratch_shapes=[pltpu.VMEM((nblk * Rp, c), x.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * f * s * 4 * c * c + 4 * b * s * f * Rp // p * c,
                bytes_accessed=2 * b * f * s * c * 2,
                transcendentals=b * s * f * Rp // p * heads,
            ),
        )(x, lns, lnb, wq, wk, wv, wo, bo)

    return forward


@functools.lru_cache(maxsize=64)
def _build_vjp_bfsc(f: int, s: int, heads: int, d: int, c: int, eps: float):
    forward = _build_bfsc(f, s, heads, d, c, eps)
    ref = functools.partial(_reference_bfsc, heads=heads, d=d, eps=eps)

    @jax.custom_vjp
    def fused(x, lns, lnb, wq, wk, wv, wo, bo):
        return forward(x, lns, lnb, wq, wk, wv, wo, bo)

    def fwd(*args):
        return forward(*args), args

    def bwd(res, gout):
        _, vjp = jax.vjp(ref, *res)
        return vjp(gout)

    fused.defvjp(fwd, bwd)
    return fused


def bfsc_ok(f: int, s: int, c: int, heads: int, head_dim: int) -> bool:
    """Gate for the transpose-free (b, f, s, c) fused temporal block."""
    if not fused_ok(f, c, heads, head_dim):
        return False
    if _n_head_groups(c, heads) != 1:
        return False
    return _bfsc_geometry(f, s, c) is not None


def fused_temporal_block_bfsc(
    x: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    *,
    heads: int,
    head_dim: int,
    eps: float = 1e-5,
    impl: str = "pallas",
) -> jnp.ndarray:
    """LN → QKV → per-location frame attention → out-proj → +residual on the
    NATURAL (b, f, s, c) layout — no HBM pack/unpack passes (the row shuffle
    happens in VMEM inside the kernel). Same math and param tree as
    fused_temporal_attn_block."""
    b, f, s, c = x.shape
    if heads * head_dim != c:
        raise ValueError(f"fused block needs heads*head_dim == c, got {heads}x{head_dim} vs {c}")
    dt = x.dtype
    args = (
        x,
        ln_scale.reshape(1, c).astype(jnp.float32),
        ln_bias.reshape(1, c).astype(jnp.float32),
        wq.astype(dt), wk.astype(dt), wv.astype(dt), wo.astype(dt),
        bo.reshape(1, c).astype(jnp.float32),
    )
    if impl != "pallas" or jax.devices()[0].platform not in ("tpu", "axon"):
        return _reference_bfsc(*args, heads=heads, d=head_dim, eps=eps)
    return _build_vjp_bfsc(f, s, heads, head_dim, c, eps)(*args)


def _n_head_groups(c: int, heads: int) -> int:
    """Head groups so the per-group QKV+O weight blocks stay ≲8MB of VMEM.
    c ≤ 1024 → 1; c = 1280 (20 heads) → 2."""
    ngroups = 1
    while 4 * c * (c // ngroups) * 2 > 8 * 2**20:
        ngroups += 1
    while heads % ngroups:
        ngroups += 1
    return ngroups


@functools.lru_cache(maxsize=64)
def _build_vjp(geom: PackGeometry, heads: int, d: int, c: int, eps: float):
    g = geom
    ngroups = _n_head_groups(c, heads)
    hg = heads // ngroups

    if ngroups == 1:
        forward = _build(geom, heads, d, c, eps)
    else:
        part = _build(geom, hg, d, c, eps, fuse_residual=False)

        def forward(xp, lns, lnb, wq, wk, wv, wo, bo):
            acc = None
            for gi in range(ngroups):
                sl = slice(gi * hg * d, (gi + 1) * hg * d)
                y = part(xp, lns, lnb, wq[:, sl], wk[:, sl], wv[:, sl],
                         wo[sl, :], bo).astype(jnp.float32)
                acc = y if acc is None else acc + y
            return (acc + bo + xp.astype(jnp.float32)).astype(xp.dtype)

    ref = functools.partial(_reference_lean, geom=g, heads=heads, d=d, eps=eps)

    @jax.custom_vjp
    def fused(xp, lns, lnb, wq, wk, wv, wo, bo):
        return forward(xp, lns, lnb, wq, wk, wv, wo, bo)

    def fwd(*args):
        return forward(*args), args

    def bwd(res, gout):
        _, vjp = jax.vjp(ref, *res)
        return vjp(gout)

    fused.defvjp(fwd, bwd)
    return fused


def fused_temporal_attn_block(
    xp: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wq: jnp.ndarray,
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    *,
    geom: PackGeometry,
    heads: int,
    head_dim: int,
    eps: float = 1e-5,
    impl: str = "pallas",
) -> jnp.ndarray:
    """LN → QKV → per-location frame attention → out-proj → +residual on
    packed tokens (b, npk·Rp, c). Requires heads·head_dim == c."""
    c = xp.shape[-1]
    if heads * head_dim != c:
        raise ValueError(f"fused block needs heads*head_dim == c, got {heads}x{head_dim} vs {c}")
    dt = xp.dtype
    args = (
        xp,
        ln_scale.reshape(1, c).astype(jnp.float32),
        ln_bias.reshape(1, c).astype(jnp.float32),
        wq.astype(dt), wk.astype(dt), wv.astype(dt), wo.astype(dt),
        bo.reshape(1, c).astype(jnp.float32),
    )
    if impl != "pallas" or jax.devices()[0].platform not in ("tpu", "axon"):
        return _reference(*args, geom=geom, heads=heads, d=head_dim, eps=eps)
    return _build_vjp(geom, heads, head_dim, c, eps)(*args)


def fused_ok(f: int, c: int, heads: int, head_dim: int) -> bool:
    """Geometry gate for the fused path. Above c=1024 the four (c, c) weight
    blocks exceed VMEM in one shot, so the kernel runs per head GROUP with an
    XLA partial-sum (works when the groups divide heads — see
    _n_head_groups); past c=2048 even per-head weights are too large."""
    if not (2 <= f <= _LANE and heads * head_dim == c and head_dim % 8 == 0):
        return False
    if c <= 1024:
        return True
    return c <= 2048 and heads % _n_head_groups(c, heads) == 0
