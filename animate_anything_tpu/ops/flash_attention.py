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

Backward: custom_vjp with Pallas dq and dk/dv kernels (see the backward
section below) — O(S) memory like the forward; nothing O(S²) is ever stored
or materialized, which is what lets full-model 512px training fit in 16 GB.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_PALLAS_SEQ = 128    # below this, XLA's batched attention wins
_LOG2E = 1.4426950408889634  # forward softmax runs in the exp2 domain
# (FA2 trick): folding log2(e) into the q scale makes the (BQ, Sk) exp
# pass the VPU-native exp2 instead of exp
_BLOCK_Q = 256   # measured best on v5e across s=256..4096 (512 ties, 128 worse)
_BLOCK_Q_SMALL_SK = 512  # lanes fwd q tile when sk<=1024 (sweepable knob)
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
    # exp2 softmax (FA2 trick): scale carries log2(e), so scores are already
    # in the log2 domain — exp2 is the VPU's native transcendental; exp costs
    # an extra multiply per element at (BQ, Sk) scale
    p = jnp.exp2(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32) / denom
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q (B, Sq, H, D), k/v (B, Sk, H, D) → (B, Sq, H, D)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = _LOG2E / (d**0.5)

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


def _lanes_kernel(valid_k_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                  masked: bool, d: int, odd_last: int):
    """Head-PAIR variant of _attn_kernel on the natural (b, s, h·d) layout.

    One program = one q tile × one 128-lane channel block = TWO d=64 heads,
    indexed straight out of the (b, s, c) array — no (b,s,h,d)→(b·h,s,d)
    transposes (those relayouts cost ~11-15 ms per UNet step at 512px and
    2× lane-pad waste, since a d=64 minor dim pads to 128 lanes). For odd
    head counts (c=320 → 5 heads) the last block hangs past the channel
    edge: its second half reads undefined lanes and computes a garbage head,
    but per-head math is lane-confined and out-of-bounds output lanes are
    discarded by Mosaic's ragged-edge handling.
    """
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (BQ, 128)
    k = k_ref[0]                                   # (Sk, 128)
    v = v_ref[0]

    def head(j):
        sl = slice(j * d, (j + 1) * d)
        scores = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # (BQ, Sk) fp32
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < valid_k_ref[0], scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        # exp2 softmax — scale carries log2(e) (see _attn_kernel)
        p = jnp.exp2(scores - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v[:, sl],
                    preferred_element_type=jnp.float32) / denom
        return o.astype(o_ref.dtype)

    o_ref[0, :, :d] = head(0)
    if odd_last >= 0:
        # odd head count: the last channel block's second half is past the
        # array edge (garbage in, writes discarded) — skip its compute
        @pl.when(pl.program_id(1) != odd_last)
        def _():
            o_ref[0, :, d:] = head(1)
    else:
        o_ref[0, :, d:] = head(1)


def _flash_forward_lanes(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q (B, Sq, H, D), k/v (B, Sk, H, D) → (B, Sq, H, D), transpose-free:
    heads stay folded in the channel dim ((B, S, H·D) bitcast views) and the
    kernel grid blocks the channel dim in 128-lane head pairs."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    c = h * d
    scale = _LOG2E / (d**0.5)

    qf = q.reshape(b, sq, c)   # bitcasts: producer layout is already (.., h·d)
    kf = k.reshape(b, sk, c)
    vf = v.reshape(b, sk, c)

    # On-chip sweep (scripts/lanes_block_sweep.py, v5e): bq256 wins at
    # sk=4096 (11.44 vs 12.65 ms; bq512 OOMs scoped VMEM), bq512 wins at
    # sk≤1024 (3.16 vs 3.40 ms) — the K/V stream is short enough that a
    # taller q tile amortizes its setup without blowing the VMEM budget.
    # Measured on self-attention (sq == sk) sites only; cross-attention
    # shapes with large sq and small sk take the same branch by
    # extrapolation (scores tile 512×sk_pad fp32 stays well under VMEM).
    # q-tile height by K length: tiny K (77-token cross-attn) has almost no
    # per-program compute, so grid overhead dominates — use the tallest tile
    # VMEM allows (scores (2048, 128) fp32 = 1 MB) to cut the program count
    # 4×; the sweep-backed 512/256 tiers cover the self-attention sites.
    if _round_up(sk, _LANE) <= 128:
        bq_target = 2048
    elif sk <= 1024:
        bq_target = _BLOCK_Q_SMALL_SK
    else:
        bq_target = _BLOCK_Q
    block_q = min(bq_target, _round_up(sq, _LANE))
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, _LANE)
    if sq_pad != sq:
        qf = jnp.pad(qf, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        kf = jnp.pad(kf, ((0, 0), (0, sk_pad - sk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, sk_pad - sk), (0, 0)))

    n_pairs = _cdiv(h, 2)
    grid = (b, n_pairs, sq_pad // block_q)
    valid_k = jnp.asarray([sk], jnp.int32)

    out = pl.pallas_call(
        functools.partial(_lanes_kernel, scale=scale, masked=sk_pad != sk, d=d,
                          odd_last=(n_pairs - 1) if h % 2 else -1),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, 2 * d), lambda bb, hp, qi, *_: (bb, qi, hp)),
                pl.BlockSpec((1, sk_pad, 2 * d), lambda bb, hp, qi, *_: (bb, 0, hp)),
                pl.BlockSpec((1, sk_pad, 2 * d), lambda bb, hp, qi, *_: (bb, 0, hp)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, 2 * d), lambda bb, hp, qi, *_: (bb, qi, hp)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * sk_pad * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq_pad * sk_pad,
        ),
    )(valid_k, qf, kf, vf)

    return out[:, :sq].reshape(b, sq, h, d)


def _xla_reference(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


# ---------------------------------------------------------------------------
# Backward kernels.
#
# The original backward rematerialized through XLA's composite attention,
# which materializes the full (S, S) probability matrix in fp32 during the
# grad pass — 5.3 GB for ONE level-0 site at 512px (bh=85, s=4096), blowing
# the 16 GB HBM budget for full-model training. These kernels keep the
# backward O(S) like the forward:
#
# - dq kernel: grid (b·h, q-blocks); one q tile vs the full K/V rows (≤1 MB
#   at S≤4096, d=64). Recomputes the softmax row-wise (nothing was saved),
#   emits dq plus the row stats lse = m + log Σexp and Δ = rowsum(dO ⊙ O)
#   lane-broadcast to (BQ, 128) fp32 — the layout the stock jax flash kernel
#   uses for row stats (last-two-dims rule: (1, x) blocks are not tileable).
# - dk/dv kernel: grid (b·h, k-blocks, q-chunks), q innermost; accumulates
#   dk/dv for one K/V tile across q chunks in fp32 scratch, using the saved
#   lse to renormalize (p = exp(s - lse), already /l) and Δ for ds.
#
# Padding correctness without masks in the dkv kernel: padded q rows have
# dO = 0 and Δ = 0, so their p contributes 0 to both dv (p·0) and dk
# (ds = p⊙(0-0)); padded K columns only produce grads for padded K rows,
# which are sliced away. The dq kernel masks padded K columns exactly as the
# forward does (they must not enter the softmax).
# ---------------------------------------------------------------------------

_BWD_BLOCK_Q = 128    # dq kernel q tile: (BQ, Sk) fp32 temps ×4 ≈ 8 MB VMEM
_BWD_BLOCK_KV = 256   # dkv kernel K/V tile
_BWD_BLOCK_Q2 = 1024  # dkv kernel streamed q chunk


def _divisor_block(total: int, preferred: int) -> int:
    """Largest multiple of _LANE ≤ preferred that divides total (total is a
    multiple of _LANE)."""
    b = min(preferred, total)
    while total % b:
        b -= _LANE
    return b


def _bwd_dq_kernel(valid_k_ref, q_ref, k_ref, v_ref, do_ref, o_ref,
                   dq_ref, lse_ref, delta_ref, *, scale: float, masked: bool):
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (BQ, D)
    k = k_ref[0]                                   # (Sk, D)
    v = v_ref[0]
    do = do_ref[0]                                 # (BQ, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                              # (BQ, Sk) fp32
    if masked:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid_k_ref[0], s, -1e30)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    lse = m + jnp.log(l)                           # (BQ, 1)

    delta = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
        axis=-1, keepdims=True,
    )                                              # (BQ, 1)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                              # (BQ, Sk) fp32
    ds = (p / l) * (dp - delta)
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                      # (BQ, D) fp32
    dq_ref[0] = dq.astype(dq_ref.dtype)
    lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:]).astype(jnp.float32)
    delta_ref[0] = jnp.broadcast_to(delta, delta_ref.shape[1:]).astype(jnp.float32)


def _bwd_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float, nq: int):
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (BQ2, D)
    do = do_ref[0]                                 # (BQ2, D)
    k = k_ref[0]                                   # (BK, D)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                              # (BQ2, BK) fp32
    p = jnp.exp(s - lse_ref[0][:, :1])             # normalized probs
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (BK, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                              # (BQ2, BK) fp32
    ds = p * (dp - delta_ref[0][:, :1])
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # (BK, D) — q pre-scaled

    @pl.when(qi == nq - 1)
    def _emit():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, g):
    """All inputs (B, S, H, D); returns (dq, dk, dv) in the input dtypes."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / (d**0.5)

    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    of = o.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    gf = g.transpose(0, 2, 1, 3).reshape(b * h, sq, d).astype(q.dtype)

    block_q = min(_BWD_BLOCK_Q, _round_up(sq, _LANE))
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, _LANE)
    if sq_pad != sq:
        pad = ((0, 0), (0, sq_pad - sq), (0, 0))
        qf, of, gf = jnp.pad(qf, pad), jnp.pad(of, pad), jnp.pad(gf, pad)
    if sk_pad != sk:
        pad = ((0, 0), (0, sk_pad - sk), (0, 0))
        kf, vf = jnp.pad(kf, pad), jnp.pad(vf, pad)

    valid_k = jnp.asarray([sk], jnp.int32)
    bh = b * h

    dq, lse, delta = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, masked=sk_pad != sk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, sq_pad // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bb, qi, *_: (bb, qi, 0)),
                pl.BlockSpec((1, sk_pad, d), lambda bb, qi, *_: (bb, 0, 0)),
                pl.BlockSpec((1, sk_pad, d), lambda bb, qi, *_: (bb, 0, 0)),
                pl.BlockSpec((1, block_q, d), lambda bb, qi, *_: (bb, qi, 0)),
                pl.BlockSpec((1, block_q, d), lambda bb, qi, *_: (bb, qi, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, d), lambda bb, qi, *_: (bb, qi, 0)),
                pl.BlockSpec((1, block_q, _LANE), lambda bb, qi, *_: (bb, qi, 0)),
                pl.BlockSpec((1, block_q, _LANE), lambda bb, qi, *_: (bb, qi, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq_pad, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((bh, sq_pad, _LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * sq_pad * sk_pad * d,
            bytes_accessed=2 * (qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=bh * sq_pad * sk_pad,
        ),
    )(valid_k, qf, kf, vf, gf, of)

    block_kv = _divisor_block(sk_pad, _BWD_BLOCK_KV)
    block_q2 = _divisor_block(sq_pad, _BWD_BLOCK_Q2)
    nq2 = sq_pad // block_q2

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, nq=nq2),
        grid=(bh, sk_pad // block_kv, nq2),
        in_specs=[
            pl.BlockSpec((1, block_q2, d), lambda bb, ki, qi: (bb, qi, 0)),
            pl.BlockSpec((1, block_q2, d), lambda bb, ki, qi: (bb, qi, 0)),
            pl.BlockSpec((1, block_q2, _LANE), lambda bb, ki, qi: (bb, qi, 0)),
            pl.BlockSpec((1, block_q2, _LANE), lambda bb, ki, qi: (bb, qi, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bb, ki, qi: (bb, ki, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bb, ki, qi: (bb, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, d), lambda bb, ki, qi: (bb, ki, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bb, ki, qi: (bb, ki, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk_pad, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * sq_pad * sk_pad * d,
            bytes_accessed=2 * (qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=bh * sq_pad * sk_pad,
        ),
    )(qf, gf, lse, delta, kf, vf)

    dq = dq[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    dk = dk[:, :sk].reshape(b, h, sk, d).transpose(0, 2, 1, 3)
    dv = dv[:, :sk].reshape(b, h, sk, d).transpose(0, 2, 1, 3)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _bwd_dq_lanes_kernel(valid_k_ref, q_ref, k_ref, v_ref, do_ref, o_ref,
                         dq_ref, lse_ref, delta_ref, *, scale: float,
                         masked: bool, d: int, odd_last: int):
    """Head-pair dq kernel on the natural (b, s, h·d) layout — the backward
    analog of _lanes_kernel; also emits per-head lse/Δ broadcast into each
    head's 64-lane half of a (BQ, 128) stats block."""
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (BQ, 128)
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]

    def head(j):
        sl = slice(j * d, (j + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < valid_k_ref[0], s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        lse = m + jnp.log(l)
        delta = jnp.sum(
            do[:, sl].astype(jnp.float32) * o[:, sl].astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        dp = jax.lax.dot_general(
            do[:, sl], v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p / l) * (dp - delta)
        dq = jax.lax.dot_general(
            ds.astype(k.dtype), k[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        return dq.astype(dq_ref.dtype), lse, delta

    bq = dq_ref.shape[1]
    dq0, lse0, delta0 = head(0)
    dq_ref[0, :, :d] = dq0
    lse_ref[0, :, :d] = jnp.broadcast_to(lse0, (bq, d)).astype(jnp.float32)
    delta_ref[0, :, :d] = jnp.broadcast_to(delta0, (bq, d)).astype(jnp.float32)

    def second():
        dq1, lse1, delta1 = head(1)
        dq_ref[0, :, d:] = dq1
        lse_ref[0, :, d:] = jnp.broadcast_to(lse1, (bq, d)).astype(jnp.float32)
        delta_ref[0, :, d:] = jnp.broadcast_to(delta1, (bq, d)).astype(jnp.float32)

    if odd_last >= 0:
        @pl.when(pl.program_id(1) != odd_last)
        def _():
            second()
    else:
        second()


def _bwd_dkv_lanes_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float,
                          nq: int, d: int, odd_last: int):
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (BQ2, 128)
    do = do_ref[0]
    k = k_ref[0]                                   # (BK, 128)
    v = v_ref[0]

    def head(j):
        sl = slice(j * d, (j + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # (BQ2, BK)
        p = jnp.exp(s - lse_ref[0][:, j * d:j * d + 1])
        dv_acc[:, sl] += jax.lax.dot_general(
            p.astype(do.dtype), do[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do[:, sl], v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0][:, j * d:j * d + 1])
        dk_acc[:, sl] += jax.lax.dot_general(
            ds.astype(q.dtype), q[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    head(0)
    if odd_last >= 0:
        @pl.when(pl.program_id(1) != odd_last)
        def _():
            head(1)
    else:
        head(1)

    @pl.when(qi == nq - 1)
    def _emit():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_backward_lanes(q, k, v, o, g):
    """Transpose-free backward on the natural (B, S, H·D) layout, d=64."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    c = h * d
    scale = 1.0 / (d**0.5)

    qf = q.reshape(b, sq, c)
    kf = k.reshape(b, sk, c)
    vf = v.reshape(b, sk, c)
    of = o.reshape(b, sq, c)
    gf = g.reshape(b, sq, c).astype(q.dtype)

    block_q = min(_BWD_BLOCK_Q, _round_up(sq, _LANE))
    sq_pad = _round_up(sq, block_q)
    sk_pad = _round_up(sk, _LANE)
    if sq_pad != sq:
        pad = ((0, 0), (0, sq_pad - sq), (0, 0))
        qf, of, gf = jnp.pad(qf, pad), jnp.pad(of, pad), jnp.pad(gf, pad)
    if sk_pad != sk:
        pad = ((0, 0), (0, sk_pad - sk), (0, 0))
        kf, vf = jnp.pad(kf, pad), jnp.pad(vf, pad)

    n_pairs = _cdiv(h, 2)
    odd_last = (n_pairs - 1) if h % 2 else -1
    cs = n_pairs * 2 * d           # stats array channel width (pair-padded)
    valid_k = jnp.asarray([sk], jnp.int32)

    dq, lse, delta = pl.pallas_call(
        functools.partial(_bwd_dq_lanes_kernel, scale=scale,
                          masked=sk_pad != sk, d=d, odd_last=odd_last),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, n_pairs, sq_pad // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, 2 * d), lambda bb, hp, qi, *_: (bb, qi, hp)),
                pl.BlockSpec((1, sk_pad, 2 * d), lambda bb, hp, qi, *_: (bb, 0, hp)),
                pl.BlockSpec((1, sk_pad, 2 * d), lambda bb, hp, qi, *_: (bb, 0, hp)),
                pl.BlockSpec((1, block_q, 2 * d), lambda bb, hp, qi, *_: (bb, qi, hp)),
                pl.BlockSpec((1, block_q, 2 * d), lambda bb, hp, qi, *_: (bb, qi, hp)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, 2 * d), lambda bb, hp, qi, *_: (bb, qi, hp)),
                pl.BlockSpec((1, block_q, 2 * d), lambda bb, hp, qi, *_: (bb, qi, hp)),
                pl.BlockSpec((1, block_q, 2 * d), lambda bb, hp, qi, *_: (bb, qi, hp)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, sq_pad, c), q.dtype),
            jax.ShapeDtypeStruct((b, sq_pad, cs), jnp.float32),
            jax.ShapeDtypeStruct((b, sq_pad, cs), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * sq_pad * sk_pad * d,
            bytes_accessed=2 * (qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq_pad * sk_pad,
        ),
    )(valid_k, qf, kf, vf, gf, of)

    block_kv = _divisor_block(sk_pad, _BWD_BLOCK_KV)
    block_q2 = _divisor_block(sq_pad, _BWD_BLOCK_Q2)
    nq2 = sq_pad // block_q2

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_lanes_kernel, scale=scale, nq=nq2, d=d,
                          odd_last=odd_last),
        grid=(b, n_pairs, sk_pad // block_kv, nq2),
        in_specs=[
            pl.BlockSpec((1, block_q2, 2 * d), lambda bb, hp, ki, qi: (bb, qi, hp)),
            pl.BlockSpec((1, block_q2, 2 * d), lambda bb, hp, ki, qi: (bb, qi, hp)),
            pl.BlockSpec((1, block_q2, 2 * d), lambda bb, hp, ki, qi: (bb, qi, hp)),
            pl.BlockSpec((1, block_q2, 2 * d), lambda bb, hp, ki, qi: (bb, qi, hp)),
            pl.BlockSpec((1, block_kv, 2 * d), lambda bb, hp, ki, qi: (bb, ki, hp)),
            pl.BlockSpec((1, block_kv, 2 * d), lambda bb, hp, ki, qi: (bb, ki, hp)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, 2 * d), lambda bb, hp, ki, qi: (bb, ki, hp)),
            pl.BlockSpec((1, block_kv, 2 * d), lambda bb, hp, ki, qi: (bb, ki, hp)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, 2 * d), jnp.float32),
            pltpu.VMEM((block_kv, 2 * d), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sk_pad, c), k.dtype),
            jax.ShapeDtypeStruct((b, sk_pad, c), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * sq_pad * sk_pad * d,
            bytes_accessed=2 * (qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq_pad * sk_pad,
        ),
    )(qf, gf, lse, delta, kf, vf)

    dq = dq[:, :sq].reshape(b, sq, h, d)
    dk = dk[:, :sk].reshape(b, sk, h, d)
    dv = dv[:, :sk].reshape(b, sk, h, d)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _forward_impl(q, k, v):
    # d=64 heads pair exactly into 128-lane channel blocks → the transpose-
    # free lanes kernel wins at every UNet site (measured v5e, CFG batch:
    # s=4096 12.3 vs 13.3 ms; s=1024 3.6 vs 4.8; s=256 2.3 vs 2.7, transposes
    # included). Other head dims use the folded-heads kernel.
    if q.shape[-1] == 64:
        return _flash_forward_lanes(q, k, v)
    return _flash_forward(q, k, v)


@jax.custom_vjp
def _flash_attention_p(q, k, v):
    return _forward_impl(q, k, v)


def _fwd(q, k, v):
    o = _forward_impl(q, k, v)
    return o, (q, k, v, o)


def _bwd(res, g):
    q, k, v, o = res
    if q.shape[-1] == 64:
        return _flash_backward_lanes(q, k, v, o, g)
    return _flash_backward(q, k, v, o, g)


_flash_attention_p.defvjp(_fwd, _bwd)


def _bwd_xla(res, g):
    # rematerialized backward through XLA's composite attention — materializes
    # O(S²) fp32 probabilities in the grad pass; kept only for the dormant
    # packed-heads kernel.
    q, k, v = res

    def ref(q, k, v):
        return _xla_reference(q, k, v)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)



def _blockdiag_small_k(q, k, v):
    """Cross-attention (tiny Sk) without head-split relayouts: heads stay
    folded in the channel dim and the per-head QKᵀ / P·V become ONE batched
    matmul each against a BLOCK-DIAGONAL (h·d, h·skp) K / (h·skp, h·d) V
    built by an einsum with eye(h) (the off-blocks are zeros, so cross-head
    terms vanish). h× redundant MACs, but at sk=77 the useful math is tiny
    (~14 GF/site) and the r4/r5 profiles show the XLA head-split route is
    dominated by {b,h,d,s} relayout copies, not math — this form keeps the
    natural (b, sq, h·d) layout end-to-end. Gated to h·d ≤ 640: at c=1280
    the block-diagonal operand is ~220 MB (h=20), past the bandwidth win."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    skp = _round_up(sk, _LANE)
    c = h * d
    scale = 1.0 / d**0.5
    qf = q.reshape(b, sq, c)
    eye = jnp.eye(h, dtype=k.dtype)
    kp = jnp.pad(k, ((0, 0), (0, skp - sk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, skp - sk), (0, 0), (0, 0)))
    kb = jnp.einsum("bshd,hg->bhdgs", kp, eye).reshape(b, c, h * skp)
    vb = jnp.einsum("bshd,hg->bgshd", vp, eye).reshape(b, h * skp, c)
    scores = jnp.einsum("bqc,bcm->bqm", qf, kb,
                        preferred_element_type=jnp.float32) * scale
    scores = scores.reshape(b, sq, h, skp)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 3)
    scores = jnp.where(col < sk, scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bqm,bmc->bqc", p.reshape(b, sq, h * skp).astype(v.dtype),
                     vb, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(b, sq, h, d)


# 'blockdiag' full-bench A/B (r5, 512px headline): 10.56 s vs 9.61 s for the
# XLA route — a large NEGATIVE. The folded-head form does kill the head-split
# relayouts, but its batched (b, sq, h·d)×(b, h·d, h·skp) matmuls run far
# below the MXU rate the per-head folded-batch XLA dot achieves, and the h×-
# redundant scores/probs (h·skp lanes vs skp) multiply the softmax pass by
# the same factor. Kept opt-in for reference; default stays XLA.
_SMALLK_IMPL = os.environ.get("AA_SMALLK", "xla")


def set_small_k_impl(impl: str) -> None:
    global _SMALLK_IMPL
    if impl not in ("xla", "blockdiag"):
        raise ValueError(impl)
    _SMALLK_IMPL = impl


def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, is_causal: bool = False
) -> jnp.ndarray:
    """Drop-in for jax.nn.dot_product_attention on (B, S, H, D) tensors."""
    if is_causal:
        # causal masking is only used by the CLIP text tower (seq 77) — XLA
        return jax.nn.dot_product_attention(q, k, v, is_causal=True)
    if q.shape[1] < MIN_PALLAS_SEQ or k.shape[1] < MIN_PALLAS_SEQ:
        # tiny q (temporal regime) or tiny K/V (77-token cross-attention):
        # XLA's batched attention wins over the pallas kernels here. Re-
        # measured in r4 with the LANES kernel: small-K lanes dispatch
        # benched 9.90 s headline at block_q=512 and 9.85 s with 2048-row
        # tiles, vs 9.81 s for the XLA route (grid overhead dominates the
        # tiny per-program compute). The BLOCK-DIAGONAL folded-head form
        # (above) instead kills the head-split relayouts while staying on
        # XLA matmuls — dispatched for the large-q/tiny-K cross-attention
        # regime where those relayouts are the dominant cost.
        h, d = q.shape[2], q.shape[3]
        if (_SMALLK_IMPL == "blockdiag" and k.shape[1] < _LANE
                and q.shape[1] >= MIN_PALLAS_SEQ and h * d <= 640 and h > 1):
            return _blockdiag_small_k(q, k, v)
        return _xla_reference(q, k, v)
    return _flash_attention_p(q, k, v)
