"""Fused LayerNorm + QKV projection + flash attention (spatial self-attn).

The spatial transformer's first half is ``norm1 → to_q/to_k/to_v → attention``
(diffusers BasicTransformerBlock attn1; engaged for every h·w sequence at
/root/reference/models/unet_3d_blocks.py:286-307). Composite, that costs per
L0 site (s=4096, c=320, CFG batch 34): materializing the normed tensor
(89 MB) and q/k/v (3×89 MB) in HBM — ~620 MB of write+read traffic around an
attention kernel whose math is already at the d=64 MXU ceiling (QKᵀ depth 64
= half the systolic depth, P·V width 64 = half the lanes; ~78 TF/s measured).

This kernel keeps all intermediates in VMEM:
- grid (b, head-pairs, q-tiles), q-tiles innermost;
- the whole (s, c) sample rides one input block whose index is constant
  across pairs/tiles (DMA'd once per batch row);
- at tile 0 of each pair, the kernel LayerNorms the whole sample and
  computes that pair's K/V (two (s, c)×(c, 128) matmuls) into persistent
  scratch — reused by all its q-tiles;
- each tile re-norms its q rows (row-local fp32 stats), projects q, and runs
  the head-pair lanes attention (ops/flash_attention.py discipline: per-head
  64-lane halves, exp2 softmax, odd-head garbage half skipped).

Only the attention OUTPUT touches HBM; to_out + residual stay in XLA (the
following norm2 is a row-local LayerNorm — no GN-stats problem there).

Backward: custom_vjp against the exact composite twin (LN → projections →
XLA attention), rematerialization-style — no extra residuals stored.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from animate_anything_tpu.ops.flash_attention import _LOG2E, _cdiv, _round_up

_BLOCK_Q = 256


def _ln_rows(xf, scale, bias, eps):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(valid_k_ref, x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref,
            o_ref, kv_ref, *, scale: float, eps: float, d: int, masked: bool,
            odd_last: int, block_q: int):
    qi = pl.program_id(2)
    lns = lns_ref[0].astype(jnp.float32)
    lnb = lnb_ref[0].astype(jnp.float32)

    @pl.when(qi == 0)
    def _build_kv():
        # row-chunked so the fp32 LN temporaries stay ~1 MB of stack (the
        # whole-sample form blew the scoped-VMEM limit at s=4096)
        s_pad = kv_ref.shape[1]
        chunks = s_pad // block_q

        def body(i, _):
            rows = pl.ds(i * block_q, block_q)
            xf = x_ref[0, rows].astype(jnp.float32)
            ln = _ln_rows(xf, lns, lnb, eps).astype(x_ref.dtype)
            kv_ref[0, rows] = jax.lax.dot_general(
                ln, wk_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(kv_ref.dtype)
            kv_ref[1, rows] = jax.lax.dot_general(
                ln, wv_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(kv_ref.dtype)
            return 0

        jax.lax.fori_loop(0, chunks, body, 0)

    xq = x_ref[0, pl.ds(qi * block_q, block_q)].astype(jnp.float32)
    lnq = _ln_rows(xq, lns, lnb, eps).astype(x_ref.dtype)
    q = jax.lax.dot_general(
        lnq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (bq, 128) fp32
    q = (q * scale).astype(x_ref.dtype)
    k = kv_ref[0]
    v = kv_ref[1]

    def head(j):
        sl = slice(j * d, (j + 1) * d)
        scores = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (bq, s) fp32
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < valid_k_ref[0], scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp2(scores - m)                              # exp2 domain
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v[:, sl],
                    preferred_element_type=jnp.float32) / denom
        return o.astype(o_ref.dtype)

    o_ref[0, :, :d] = head(0)
    if odd_last >= 0:
        @pl.when(pl.program_id(1) != odd_last)
        def _():
            o_ref[0, :, d:] = head(1)
    else:
        o_ref[0, :, d:] = head(1)


def _block_q_for(s: int) -> int:
    # s=4096: a (256, s) fp32 score tile would blow the VMEM budget next to
    # the resident sample + K/V scratch — halve the tile there
    return 128 if s > 2048 else _BLOCK_Q


def _pallas_fwd(x, lns, lnb, wq, wk, wv, heads: int, d: int, eps: float):
    b, s, c = x.shape
    scale = _LOG2E / (d ** 0.5)
    block_q = min(_block_q_for(s), _round_up(s, 128))
    s_pad = _round_up(s, max(block_q, 128))
    xp = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0))) if s_pad != s else x
    n_pairs = _cdiv(heads, 2)
    grid = (b, n_pairs, s_pad // block_q)
    valid_k = jnp.asarray([s], jnp.int32)
    dt = x.dtype
    wq = wq.astype(dt)
    wk = wk.astype(dt)
    wv = wv.astype(dt)

    out = pl.pallas_call(
        functools.partial(
            _kernel, scale=scale, eps=eps, d=d, masked=s_pad != s,
            odd_last=(n_pairs - 1) if heads % 2 else -1, block_q=block_q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, s_pad, c), lambda bb, hp, qi, *_: (bb, 0, 0)),
                pl.BlockSpec((1, c), lambda bb, hp, qi, *_: (0, 0)),
                pl.BlockSpec((1, c), lambda bb, hp, qi, *_: (0, 0)),
                pl.BlockSpec((c, 2 * d), lambda bb, hp, qi, *_: (0, hp)),
                pl.BlockSpec((c, 2 * d), lambda bb, hp, qi, *_: (0, hp)),
                pl.BlockSpec((c, 2 * d), lambda bb, hp, qi, *_: (0, hp)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, 2 * d), lambda bb, hp, qi, *_: (bb, qi, hp)),
            scratch_shapes=[pltpu.VMEM((2, s_pad, 2 * d), dt)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, heads * d), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(4 * b * heads * s_pad * s_pad * d            # attention
                   + 6 * b * s_pad * c * c),                    # qkv projs
            bytes_accessed=2 * b * s_pad * c * dt.itemsize,
            transcendentals=b * heads * s_pad * s_pad,
        ),
    )(valid_k, xp, lns.reshape(1, c), lnb.reshape(1, c), wq, wk, wv)
    return out[:, :s]


def _reference(x, lns, lnb, wq, wk, wv, heads: int, d: int, eps: float):
    """Composite twin: LN → q/k/v projections → XLA attention."""
    b, s, c = x.shape
    xf = x.astype(jnp.float32)
    ln = _ln_rows(xf, lns.astype(jnp.float32), lnb.astype(jnp.float32),
                  eps).astype(x.dtype)
    dt = x.dtype
    q = (ln @ wq.astype(dt)).reshape(b, s, heads, d)
    k = (ln @ wk.astype(dt)).reshape(b, s, heads, d)
    v = (ln @ wv.astype(dt)).reshape(b, s, heads, d)
    o = jax.nn.dot_product_attention(q, k, v)
    return o.reshape(b, s, heads * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _fused_p(x, lns, lnb, wq, wk, wv, heads, d, eps):
    return _pallas_fwd(x, lns, lnb, wq, wk, wv, heads, d, eps)


def _fused_fwd(x, lns, lnb, wq, wk, wv, heads, d, eps):
    return (_pallas_fwd(x, lns, lnb, wq, wk, wv, heads, d, eps),
            (x, lns, lnb, wq, wk, wv))


def _fused_bwd(heads, d, eps, res, g):
    x, lns, lnb, wq, wk, wv = res
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, heads=heads, d=d, eps=eps),
        x, lns, lnb, wq, wk, wv)
    return vjp(g)


_fused_p.defvjp(_fused_fwd, _fused_bwd)


def ln_qkv_attention_ok(s: int, c: int, head_dim: int) -> bool:
    """Eligibility: d=64 lanes discipline; the whole (s, c) sample plus the
    pair K/V scratch and a (block_q, s) fp32 score tile must fit VMEM."""
    if head_dim != 64:
        return False
    s_pad = _round_up(s, 256)
    sample = s_pad * _round_up(c, 128) * 2          # bf16 sample block
    kv = 2 * s_pad * 128 * 2
    scores = _block_q_for(s) * s_pad * 4
    return s >= 256 and sample + kv + 2 * scores <= 11 * 2**20


def ln_qkv_attention(
    x: jnp.ndarray,       # (b, s, c)
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    wq: jnp.ndarray,      # (c, heads·64)
    wk: jnp.ndarray,
    wv: jnp.ndarray,
    *,
    heads: int,
    head_dim: int,
    eps: float = 1e-5,
    impl: str | None = None,
) -> jnp.ndarray:
    """norm1 → to_q/k/v → self-attention, fused; returns (b, s, heads·d)."""
    b, s, c = x.shape
    use_pallas = (
        impl == "pallas"
        and jax.devices()[0].platform in ("tpu", "axon")
        and ln_qkv_attention_ok(s, c, head_dim)
    )
    if use_pallas:
        return _fused_p(x, ln_scale, ln_bias, wq, wk, wv, heads, head_dim, eps)
    return _reference(x, ln_scale, ln_bias, wq, wk, wv, heads=heads,
                      d=head_dim, eps=eps)
