"""DORMANT packed-heads flash attention — measured negative result.

All-heads flash on the natural (b, s, h·d) layout: removes the head-fold
transposes but re-streams full-C K/V per q-block; loses to the folded-heads
kernel at every UNet site (13.40 vs 11.62 ms at L0 s=4096, v5e) and is
superseded by the transpose-free LANES kernels in ops/flash_attention.py.
Kept with interpret tests (tests/test_attic_ops.py); see docs/KERNELS.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from animate_anything_tpu.ops.flash_attention import (_BLOCK_Q, _LANE,
                                                      _bwd_xla, _cdiv,
                                                      _round_up)

_BLOCK_K = 1024  # K-chunk for the packed-heads streaming kernel


def _packed_kernel(valid_k_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref,
                   l_ref, *, scale: float, masked: bool, heads: int, d: int,
                   nk: int, block_k: int):
    """All-heads flash attention on the natural (row, h·d) channel layout.

    DORMANT — negative result, kept with tests. The goal was to remove the
    (b,s,h,d)→(b·h,s,d) HBM transposes the folded-heads kernel forces on
    every q/k/v/out (~11-15 ms per UNet step at 512px). It works, but the
    full-C K/V blocks re-stream all of K/V once per q-block (the classic
    flash traffic pattern), which costs more than the transposes saved:
    measured v5e, CFG batch — L0 s=4096: 13.40 ms vs 11.62 ms for the
    folded-heads kernel incl. its transposes; L1 s=1024: 3.57 vs 3.12;
    L2 s=256: 2.31 vs 2.15. A win here needs per-head strided manual DMA
    (K sliced 64 lanes from HBM, held whole per (b,h)) — future work.

    grid = (batch, q-blocks, k-chunks); k is the innermost (arbitrary) axis.
    q_ref: (1, BQ, C); k_ref/v_ref: (1, BK, C); o_ref: (1, BQ, C) with
    C = heads·d. Per-head 64-lane slices happen in VMEM.

    Scratch carries the online-softmax state across k-chunks:
    acc_ref (heads, BQ, d) fp32 unnormalized output accumulator;
    m_ref/l_ref (BQ, 128) fp32 — running max / sum, head h in lane h (column
    vectors stay lane-natural: no cross-layout relayout per chunk).
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]                                   # (BQ, C)
    k = k_ref[0]                                   # (BK, C)
    v = v_ref[0]

    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = (q[:, sl].astype(jnp.float32) * scale).astype(q.dtype)
        s = jax.lax.dot_general(
            qh, k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # (BQ, BK) fp32
        if masked:
            valid = valid_k_ref[0] - ki * block_k
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < valid, s, -1e30)

        m_prev = m_ref[:, h:h + 1]                 # (BQ, 1)
        l_prev = l_ref[:, h:h + 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)                     # (BQ, BK)
        corr = jnp.exp(m_prev - m_new)             # (BQ, 1)
        l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # (BQ, d)
        acc_ref[h] = acc_ref[h] * corr + pv
        m_ref[:, h:h + 1] = m_new
        l_ref[:, h:h + 1] = l_new

    @pl.when(ki == nk - 1)
    def _emit():
        cols = [acc_ref[h] / l_ref[:, h:h + 1] for h in range(heads)]
        o_ref[0] = jnp.concatenate(cols, axis=-1).astype(o_ref.dtype)


def _flash_forward_packed(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q (B, Sq, H, D), k/v (B, Sk, H, D) → (B, Sq, H, D), without ever
    materializing a (B·H, S, D) layout: heads stay folded in the channel dim
    exactly as the QKV projections produce them."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    c = h * d
    scale = 1.0 / (d**0.5)

    qf = q.reshape(b, sq, c)   # bitcasts — producer layout is already (.., h·d)
    kf = k.reshape(b, sk, c)
    vf = v.reshape(b, sk, c)

    block_q = min(_BLOCK_Q, _round_up(sq, _LANE))
    sq_pad = _round_up(sq, block_q)
    block_k = min(_BLOCK_K, _round_up(sk, _LANE))
    sk_pad = _round_up(sk, block_k)
    if sq_pad != sq:
        qf = jnp.pad(qf, ((0, 0), (0, sq_pad - sq), (0, 0)))
    if sk_pad != sk:
        kf = jnp.pad(kf, ((0, 0), (0, sk_pad - sk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, sk_pad - sk), (0, 0)))
    nk = sk_pad // block_k

    grid = (b, sq_pad // block_q, nk)
    valid_k = jnp.asarray([sk], jnp.int32)

    out = pl.pallas_call(
        functools.partial(
            _packed_kernel, scale=scale, masked=sk_pad != sk, heads=h, d=d,
            nk=nk, block_k=block_k,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, c), lambda bb, qi, ki, *_: (bb, qi, 0)),
                pl.BlockSpec((1, block_k, c), lambda bb, qi, ki, *_: (bb, ki, 0)),
                pl.BlockSpec((1, block_k, c), lambda bb, qi, ki, *_: (bb, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, c), lambda bb, qi, ki, *_: (bb, qi, 0)),
            scratch_shapes=[
                pltpu.VMEM((h, block_q, d), jnp.float32),
                pltpu.VMEM((block_q, _LANE), jnp.float32),
                pltpu.VMEM((block_q, _LANE), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * sk_pad * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=b * h * sq_pad * sk_pad,
        ),
    )(valid_k, qf, kf, vf)

    return out[:, :sq].reshape(b, sq, h, d)


@jax.custom_vjp
def _flash_attention_packed_p(q, k, v):
    return _flash_forward_packed(q, k, v)


def _fwd_packed(q, k, v):
    return _flash_forward_packed(q, k, v), (q, k, v)


_flash_attention_packed_p.defvjp(_fwd_packed, _bwd_xla)
