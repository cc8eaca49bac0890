"""Fused flash-attention Pallas kernel for TPU.

Replaces the reference's xformers ``MemoryEfficientAttentionFlashAttentionOp``
/ torch-2.0 SDPA processors (/root/reference/train.py:124-156) on the three
attention sites of the video UNet:

- spatial self-attention: seq = h·w (1024-4096 at 256-512px), batch = b·f;
- cross-attention: seq_q = h·w, seq_k = 77 text tokens;
- temporal self-attention: seq = f ≤ 32, batch = b·h·w — thousands of tiny
  attentions.

Kernel design (per pallas_guide):
- grid = (batch·heads, q-blocks); each program holds one q tile in VMEM and
  the full K/V rows for that (batch, head) — at D=64 and S≤4096 that is ≤2MB,
  well under the 16MB VMEM budget, so no online-softmax streaming is needed;
  scores/softmax run in fp32 on the VPU, both matmuls hit the MXU with
  preferred_element_type=fp32;
- K is padded to a lane multiple outside the kernel and masked inside with a
  scalar valid-length (cross-attention's 77 tokens);
- the tiny temporal regime (seq < MIN_SEQ) folds the sequence into the lane
  dimension poorly, so it routes to XLA's fused attention, which is already
  optimal there — the kernel is for the long-sequence sites where flash
  fusion pays.

Backward: custom_vjp that recomputes attention with XLA ops (flash-style
remat — no O(S²) residuals are stored), so the kernel is usable in training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_PALLAS_SEQ = 128    # below this, XLA's batched attention wins
_BLOCK_Q = 256   # measured best on v5e across s=256..4096 (512 ties, 128 worse)
_LANE = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _attn_kernel(valid_k_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 masked: bool):
    """One q-tile vs all of K/V for one (batch·head) row.

    q_ref: (1, BQ, D); k_ref/v_ref: (1, Sk_pad, D); o_ref: (1, BQ, D).
    valid_k_ref: SMEM scalar — number of real K rows (rest is padding).

    VPU economy: the softmax scale is folded into the (BQ, D) q tile rather
    than the (BQ, Sk) scores (Sk/D× fewer multiplies), and the padding mask
    (iota + compare + select over the full score matrix) is emitted only when
    K actually was padded (masked=False for lane-aligned self-attention) —
    at S=4096 those two passes cost more than the score matmul itself.
    """
    # keep matmul INPUTS in the storage dtype (bf16 → fast MXU mode) and
    # accumulate fp32 via preferred_element_type; only softmax runs fp32
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (BQ, D)
    k = k_ref[0]                               # (Sk, D)
    v = v_ref[0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                          # (BQ, Sk) fp32

    if masked:
        valid_k = valid_k_ref[0]
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < valid_k, scores, -1e30)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q (B, Sq, H, D), k/v (B, Sk, H, D) → (B, Sq, H, D)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / (d**0.5)

    # fold heads into batch; pad seqs to hardware-friendly multiples
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)

    block_q = min(_BLOCK_Q, _round_up(sq, _LANE))
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, _LANE)
    if sq_pad != sq:
        qf = jnp.pad(qf, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        kf = jnp.pad(kf, ((0, 0), (0, sk_pad - sk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, sk_pad - sk), (0, 0)))

    grid = (b * h, sq_pad // block_q)
    valid_k = jnp.asarray([sk], jnp.int32)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, masked=sk_pad != sk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, qi, *_: (bh, qi, 0)),
                pl.BlockSpec((1, sk_pad, d), lambda bh, qi, *_: (bh, 0, 0)),
                pl.BlockSpec((1, sk_pad, d), lambda bh, qi, *_: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, *_: (bh, qi, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * sk_pad * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq_pad * sk_pad,
        ),
    )(valid_k, qf, kf, vf)

    out = out[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return out


def _xla_reference(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


@jax.custom_vjp
def _flash_attention_p(q, k, v):
    return _flash_forward(q, k, v)


def _fwd(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _bwd(res, g):
    # flash-style rematerialized backward: recompute probabilities in fp32
    # with XLA (fused well by the compiler); nothing O(S²) was saved.
    q, k, v = res

    def ref(q, k, v):
        return _xla_reference(q, k, v)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


_flash_attention_p.defvjp(_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, is_causal: bool = False
) -> jnp.ndarray:
    """Drop-in for jax.nn.dot_product_attention on (B, S, H, D) tensors."""
    if is_causal:
        # causal masking is only used by the CLIP text tower (seq 77) — XLA
        return jax.nn.dot_product_attention(q, k, v, is_causal=True)
    if q.shape[1] < MIN_PALLAS_SEQ:
        return _xla_reference(q, k, v)
    return _flash_attention_p(q, k, v)
