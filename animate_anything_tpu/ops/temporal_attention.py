"""Packed temporal-attention Pallas kernel.

Temporal self-attention in the video UNet is thousands of tiny attentions:
seq = f frames (14-17) per spatial location, batched over b·h·w locations
(reference site: diffusers TransformerTemporalModel used at
/root/reference/models/unet_3d_blocks.py:526). Neither generic schedule fits:

- flash-attention tiling is pointless at seq 17;
- XLA's batched matmul runs one 17×17×64 MXU pass per location (≈2% tile
  utilization) and round-trips the (b·hw·heads, f, f) score tensor plus two
  full layout permutes of Q/K/V through HBM.

This kernel instead PACKS p = ⌊128/f⌋ spatial locations into one MXU tile:
rows of the packed (p·f, d) Q/K blocks are ordered frame-major /
location-minor, so the full (p·f)×(p·f) score matrix is ONE dense matmul and
the per-location structure becomes a strided mask — entry (r, c) is a real
(frame_r, frame_c) score iff r ≡ c (mod p), i.e. both rows belong to the same
location. Masking the rest to -inf makes the row softmax exactly the
per-location softmax, and a second dense matmul against the packed V produces
all p locations' outputs at once. Scores/probabilities never leave VMEM.

At f=17 (16 frames + condition frame) this packs 7 locations → 119×119
matmuls at ~86% tile occupancy vs 2% for the batched-tiny-matmul form, and
removes ~5 HBM round-trips of score/permute traffic per attention site.

Numerics match the einsum formulation: bf16 matmul inputs, fp32 scores and
softmax, probabilities cast back to the value dtype for the PV matmul.

Backward: custom_vjp that recomputes attention with the XLA einsum form
(nothing O(f²·hw) is saved), so the kernel is usable in training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_MIN_LOCS = 512  # below this, dispatch overhead beats the packing win


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, p: int, scale: float, nblk: int):
    """q/k/v/o blocks: (1, nblk, R, d) with R = p·f rows packed frame-major."""
    r = q_ref.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    same_loc = (row % p) == (col % p)

    for i in range(nblk):
        q = q_ref[0, i]                                     # (R, d)
        k = k_ref[0, i]
        v = v_ref[0, i]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                           # (R, R) fp32
        scores = jnp.where(same_loc, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, i] = o.astype(o_ref.dtype)


def _packed_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q/k/v: (b, f, s, h, d) → attention over f per (b, s, h); same shape out."""
    b, f, s, h, d = q.shape
    p = max(1, _LANE // f)
    scale = 1.0 / (d ** 0.5)

    npk = _cdiv(s, p)                       # packs of p locations
    nblk = min(16, npk)
    npk_pad = _cdiv(npk, nblk) * nblk
    s_pad = npk_pad * p

    def pack(x):
        if s_pad != s:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0), (0, 0)))
        # (b, f, np, p, h, d) → (b, h, np, f, p, d) → (b·h, np, f·p, d):
        # packed rows are frame-major, location-minor → same-location pairs
        # are r ≡ c (mod p)
        x = x.reshape(b, f, npk_pad, p, h, d)
        x = x.transpose(0, 4, 2, 1, 3, 5)
        return x.reshape(b * h, npk_pad, f * p, d)

    qp, kp, vp = pack(q), pack(k), pack(v)
    grid = (b * h, npk_pad // nblk)
    blk = lambda bh, ni: (bh, ni, 0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, p=p, scale=scale, nblk=nblk),
        grid=grid,
        in_specs=[pl.BlockSpec((1, nblk, f * p, d), blk)] * 3,
        out_specs=pl.BlockSpec((1, nblk, f * p, d), blk),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * f * f * p * d,
            bytes_accessed=4 * qp.size * qp.dtype.itemsize,
            transcendentals=b * h * s_pad * f * f * p,
        ),
    )(qp, kp, vp)

    out = out.reshape(b, h, npk_pad, f, p, d).transpose(0, 3, 2, 4, 1, 5)
    out = out.reshape(b, f, s_pad, h, d)
    return out[:, :, :s] if s_pad != s else out


def _einsum_reference(q, k, v):
    """The transpose-free XLA form (models/attention.py) — also the VJP path."""
    d = q.shape[-1]
    scores = jnp.einsum(
        "bfshd,bgshd->bshfg", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / d ** 0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bshfg,bgshd->bfshd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


@jax.custom_vjp
def _temporal_attention_p(q, k, v):
    return _packed_forward(q, k, v)


def _fwd(q, k, v):
    return _packed_forward(q, k, v), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_einsum_reference, q, k, v)
    return vjp(g)


_temporal_attention_p.defvjp(_fwd, _bwd)


def temporal_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, impl: str = "xla"
) -> jnp.ndarray:
    """Attention over axis 1 (frames) of (b, f, s, h, d) tensors.

    impl='xla'/'pallas' → the transpose-free einsum form (measured fastest as
    a STANDALONE op on v5e: the packed kernel wins on the attention core —
    2.45ms vs 4.9ms at the 512px site — but its host-side pack/unpack
    permutes eat the margin; the packing only pays inside the fused
    temporal-block kernel where projections amortize it).
    impl='packed' → the packed Pallas kernel, explicitly."""
    b, f, s, h, d = q.shape
    if (
        impl != "packed"
        or f < 2
        or f > _LANE
        or d % 8 != 0
        or b * s * h < _MIN_LOCS
        or jax.devices()[0].platform not in ("tpu", "axon")
    ):
        return _einsum_reference(q, k, v)
    return _temporal_attention_p(q, k, v)
