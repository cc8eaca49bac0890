"""Fused GroupNorm→SiLU→temporal-tap-conv kernel.

The pseudo-3D temporal conv (reference: diffusers ``TemporalConvLayer``,
engaged per block at /root/reference/models/unet_3d_blocks.py:276-280) runs
four GN→SiLU→conv(3,1,1) stages. In composite XLA form each stage costs ~6
HBM round-trips of a 90MB activation (GN stats read, GN-apply read+write,
three shifted-einsum reads, accumulate write) and measured ~14% of matmul
peak on v5e — the worst utilization of any UNet module.

This op splits each stage into:
1. an XLA stats pass — per-(batch, group) mean/var, one bandwidth-speed read,
   folded with the affine params into per-(batch, channel) a/b vectors;
2. ONE pallas kernel over a (batch, spatial-chunk) grid with all frames
   resident: normalize + SiLU + the 3-tap frame conv as three MXU matmuls on
   statically shifted row blocks (y[f] = ln[f-1]·W₀ + ln[f]·W₁ + ln[f+1]·W₂),
   plus the layer residual on the last stage — one read, one write.

Net per stage: 3 HBM passes instead of ~6, and the taps' (f·chunk, c)×(c, c)
matmuls keep a dense M instead of XLA's thin shifted windows.

Backward: custom_vjp against an exact XLA twin taking the same folded a/b
inputs (gradients flow through the stats fold outside the custom_vjp), so the
fused path is trainable; the dropout variant (training, p>0 between SiLU and
conv) keeps the composite path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 6 * 2**20   # of the 16MB scoped limit; Mosaic double-buffers
                           # the in/res/out grid blocks on top of the stack


def _rup(a: int, b: int) -> int:
    return -(-a // b) * b


def _pick_chunk(f: int, cin: int, cout: int, s: int = 0) -> int:
    """Rows per grid step. fp32 live set ≈ f·ch·(x + ln + 3·tap-out + y):
    ~f·ch·(6·cin + 10·cout) bytes, after Mosaic's 128-lane padding.

    Prefers the largest multiple-of-8 DIVISOR of ``s`` within the budget:
    a ragged chunk forces jnp.pad + slice + a broadcast_select mask around
    every fused call (profiled ~8 ms/step of pure glue at the 64² level,
    where the budget-only choice was 56 rows against s=4096)."""
    cin_p, cout_p = _rup(cin, 128), _rup(cout, 128)
    ch = _VMEM_BUDGET // (f * (6 * cin_p + 10 * cout_p))
    ch = max(0, (ch // 8) * 8)
    if s and ch >= 8 and s % ch != 0:
        best = 0
        d = 1
        while d * d <= s:
            if s % d == 0:
                for cand in (d, s // d):
                    if cand % 8 == 0 and cand <= ch and cand > best:
                        best = cand
            d += 1
        if best >= 8:
            return best
    return ch


def _kernel(x_ref, a_ref, b_ref, w_ref, bias_ref, res_ref, o_ref,
            s1_ref=None, s2_ref=None, *, f: int):
    x = x_ref[0].astype(jnp.float32)              # (f, ch, cin)
    ln = x * a_ref[0][None] + b_ref[0][None]      # a/b refs: (1, 1, cin)
    # exact tanh-form silu (see ops/group_norm.py note)
    ln = (0.5 * ln * (1.0 + jnp.tanh(0.5 * ln))).astype(x_ref.dtype)
    ch, cin = ln.shape[1], ln.shape[2]
    cout = o_ref.shape[-1]
    l2 = ln.reshape(f * ch, cin)

    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    w = w_ref[...]
    y = dot(l2, w[1])                              # centre tap
    zeros = jnp.zeros((ch, cout), jnp.float32)
    # prev tap: frame i receives ln[i-1]·W0 (zero-padded at i=0)
    y = y + jnp.concatenate([zeros, dot(l2[: (f - 1) * ch], w[0])], axis=0)
    # next tap: frame i receives ln[i+1]·W2 (zero-padded at i=f-1)
    y = y + jnp.concatenate([dot(l2[ch:], w[2]), zeros], axis=0)
    y = y + bias_ref[0][None, :]
    if res_ref is not None:
        y = y + res_ref[0].reshape(f * ch, cout).astype(jnp.float32)
    yc = y.reshape(f, ch, cout).astype(o_ref.dtype)
    o_ref[0] = yc
    if s1_ref is not None:
        # GN-stats epilogue: per-(batch, frame, channel) Σy/Σy² of the STORED
        # output (post-cast), accumulated across the sequential spatial-chunk
        # grid axis. The consumer GroupNorm (next stage / the following
        # spatial transformer's entry norm) takes these precomputed sums, so
        # XLA never emits a standalone transposed-reduce pass over this
        # kernel's output (the r4-profile "standalone GN stats" +
        # {3,0,2,1}-relayout bucket).
        @pl.when(pl.program_id(1) == 0)
        def _():
            s1_ref[...] = jnp.zeros_like(s1_ref)
            s2_ref[...] = jnp.zeros_like(s2_ref)

        yf = yc.astype(jnp.float32)
        s1_ref[0] += jnp.sum(yf, axis=1)
        s2_ref[0] += jnp.sum(yf * yf, axis=1)


def _pallas_stage(x, a, b, w, bias, residual, ch: int, emit_stats: bool = False):
    bsz, f, s, cin = x.shape
    cout = w.shape[-1]
    s_pad = _rup(s, ch)
    assert not (emit_stats and s_pad != s)  # padded garbage rows would pollute
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        x = jnp.pad(x, pad)
        if residual is not None:
            residual = jnp.pad(residual, pad)

    # (b, 1, c) vectors: block (1, 1, c) — last two dims equal the array's,
    # satisfying the Mosaic (8, 128)-or-full block constraint for c % 128 ≠ 0
    blk = lambda ib, isc: (ib, 0, isc, 0)
    vec = lambda c: pl.BlockSpec((1, 1, c), lambda ib, isc: (ib, 0, 0))
    in_specs = [
        pl.BlockSpec((1, f, ch, cin), blk),
        vec(cin),
        vec(cin),
        pl.BlockSpec((3, cin, cout), lambda ib, isc: (0, 0, 0)),
        pl.BlockSpec((1, cout), lambda ib, isc: (0, 0)),
    ]
    args = [x, a.reshape(bsz, 1, cin), b.reshape(bsz, 1, cin), w, bias.reshape(1, cout)]
    has_res = residual is not None
    if has_res:
        in_specs.append(pl.BlockSpec((1, f, ch, cout), blk))
        args.append(residual)

    def kern(*refs):
        xr, ar, br, wr, bi = refs[:5]
        rest = list(refs[5:])
        rr = rest.pop(0) if has_res else None
        orf = rest.pop(0)
        s1r, s2r = (rest if emit_stats else (None, None))
        _kernel(xr, ar, br, wr, bi, rr, orf, s1r, s2r, f=f)

    out_specs = pl.BlockSpec((1, f, ch, cout), blk)
    out_shape = jax.ShapeDtypeStruct((bsz, f, s_pad, cout), x.dtype)
    if emit_stats:
        # accumulated over the sequential chunk axis: block index pinned to 0
        stat_spec = pl.BlockSpec((1, f, cout), lambda ib, isc: (ib, 0, 0))
        stat_shape = jax.ShapeDtypeStruct((bsz, f, cout), jnp.float32)
        out_specs = [out_specs, stat_spec, stat_spec]
        out_shape = [out_shape, stat_shape, stat_shape]

    out = pl.pallas_call(
        kern,
        grid=(bsz, s_pad // ch),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bsz * f * s_pad * cin * cout,
            bytes_accessed=bsz * f * s_pad * (cin + cout) * x.dtype.itemsize,
            transcendentals=bsz * f * s_pad * cin,
        ),
    )(*args)
    if emit_stats:
        return out  # (y, s1, s2); never padded
    return out[:, :, :s] if s_pad != s else out


def _reference_stage(x, a, b, w, bias, residual):
    """Exact XLA twin on the same folded inputs (backward + tests)."""
    ln = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    ln = (0.5 * ln * (1.0 + jnp.tanh(0.5 * ln))).astype(x.dtype)
    prev = jnp.pad(ln[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
    nxt = jnp.pad(ln[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    ein = functools.partial(jnp.einsum, "bfsc,cd->bfsd",
                            preferred_element_type=jnp.float32)
    y = ein(prev, w[0]) + ein(ln, w[1]) + ein(nxt, w[2]) + bias
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)


def _reference_stage_stats(x, a, b, w, bias, residual):
    """Twin of the stats-emitting kernel: (y, Σy, Σy²) per (b, f, c), sums of
    the STORED (post-cast) output, matching the kernel epilogue."""
    y = _reference_stage(x, a, b, w, bias, residual)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=2), jnp.sum(yf * yf, axis=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_stage_p(x, a, b, w, bias, residual, ch, emit_stats=False):
    return _pallas_stage(x, a, b, w, bias, residual, ch, emit_stats)


def _fused_fwd(x, a, b, w, bias, residual, ch, emit_stats):
    return (_pallas_stage(x, a, b, w, bias, residual, ch, emit_stats),
            (x, a, b, w, bias, residual))


def _fused_bwd(ch, emit_stats, res, g):
    x, a, b, w, bias, residual = res
    fn = _reference_stage_stats if emit_stats else _reference_stage
    _, vjp = jax.vjp(fn, x, a, b, w, bias, residual)
    return vjp(g)


_fused_stage_p.defvjp(_fused_fwd, _fused_bwd)


def gn_silu_tap_conv(
    x: jnp.ndarray,          # (b, f, s, c_in)
    gn_scale: jnp.ndarray,   # (c_in,)
    gn_bias: jnp.ndarray,    # (c_in,)
    w: jnp.ndarray,          # (3, c_in, c_out) frame taps
    bias: jnp.ndarray,       # (c_out,)
    *,
    groups: int,
    eps: float = 1e-5,
    residual: jnp.ndarray | None = None,
    impl: str | None = None,
    sums: tuple | None = None,
    want_stats: bool = False,
):
    """One TemporalConvLayer stage: GroupNorm(+affine) → SiLU → 3-tap frame
    conv (zero-padded), optionally + residual. Stats are per (batch, group)
    over (f, s, c/groups) — torch GroupNorm semantics on (b,c,f,h,w).

    ``sums``: precomputed per-(bsz, cin) fp32 (Σx, Σx²) of this stage's INPUT
    (the previous stage's epilogue), skipping the standalone stats read.
    ``want_stats=True``: returns ``(y, stats)`` where stats is per-(bsz, f,
    cout) fp32 ``(Σy, Σy²)`` of the output when the pallas kernel ran (its
    epilogue), else None — chaining temp-conv stages and feeding the next
    module's GroupNorm without any XLA reduce over a pallas output."""
    bsz, f, s, cin = x.shape
    # ---- stats + affine fold (fp32; precomputed sums when the producer's
    # epilogue carried them, else the streaming channel-sums kernel on the
    # perf path — an XLA reduce here would prefer the {3,0,2,1} layout and
    # relayout-copy the producing tensor; see ops/group_norm.py group_affine)
    from animate_anything_tpu.ops.group_norm import group_affine

    a, b = group_affine(x.reshape(bsz, f * s, cin), gn_scale, gn_bias,
                        groups, eps, sums=sums)

    w = w.astype(x.dtype)
    bias = bias.astype(jnp.float32)
    # c ≤ 640: measured 1.75×/1.2× at the 320/640 levels on v5e; at c=1280 the
    # (3c, c) weight block forces tiny spatial chunks and the kernel ties or
    # loses to the composite path — keep XLA there.
    use_pallas = (
        impl == "pallas"
        and jax.devices()[0].platform in ("tpu", "axon")
        and cin <= 640 and w.shape[-1] <= 640
    )
    if use_pallas and f >= 2:
        ch = _pick_chunk(f, cin, w.shape[-1], s)
        if ch >= 8:
            emit = want_stats and (s % ch == 0)
            out = _fused_stage_p(x, a, b, w, bias, residual, ch, emit)
            if emit:
                y, s1, s2 = out
                return y, (s1, s2)
            return (out, None) if want_stats else out
    y = _reference_stage(x, a, b, w, bias, residual)
    return (y, None) if want_stats else y
