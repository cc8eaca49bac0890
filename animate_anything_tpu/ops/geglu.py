"""Fused LayerNorm→GEGLU feed-forward Pallas kernel.

Every transformer block in the UNets ends with ``x + FF(LN(x))`` where FF is
diffusers' GEGLU feed-forward (mult=4): proj to 8c, split, h·gelu(gate), proj
back (reference blocks built from diffusers FeedForward, engaged at
/root/reference/models/unet_3d_blocks.py:286-307). In composite XLA form the
(rows, 8c) projection round-trips HBM between the two matmuls — at the 512px
level that intermediate is ~4× the activation itself.

This kernel tiles rows and keeps the whole chain in VMEM: LN (fp32 stats) →
(R, c)×(c, 8c) MXU matmul → split+gelu(tanh-free, exact erf) → (R, 4c)×(4c, c)
matmul → +bias +residual → one write. HBM traffic per call: read x, read
weights once (DMA-elided across grid steps), write out.

Gated to c ≤ 640: at c=1280 the W1 block alone is 26MB (> VMEM).
Backward: custom_vjp against the XLA twin (flash-style remat — the (R, 8c)
intermediate is never stored).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(a: int, b: int) -> int:
    return -(-a // b) * b


def _pick_rows(c: int, n: int | None = None) -> int:
    # fp32-equivalent live set ≈ R·c·(x 1 + h 8 + act 2 + y 1)·4B ≈ 48·R·c.
    # The tanh-gelu kernel holds fewer fp32 temporaries than the erf form
    # (no t/poly/exp chain), so it sustains ~2× taller row blocks before
    # spilling — measured: tanh rows=512 4.03 ms vs erf rows=512 8.76 (spill)
    # at the L0 site.
    budget = (8 if _GELU_IMPL == "tanh" else 4) * 2**20
    r = budget // (48 * _rup(c, 128))
    cap = max(8, min(512, (r // 8) * 8))
    if n is None:
        return cap
    # prefer a row count that DIVIDES n: the XLA pad(+slice back) around the
    # kernel copies the full activation twice otherwise (~1 ms per L0 call,
    # visible as %pad/%slice pairs in the r2 step profile)
    for rows in range(cap, 63, -8):
        if n % rows == 0:
            return rows
    return cap


def _erf(x):
    """Abramowitz–Stegun 7.1.26 polynomial erf (max err 1.5e-7 ≪ bf16 ulp) —
    Mosaic has no erf primitive, but exp lowers fine."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


# gelu evaluation inside the kernel (sweepable; scripts/geglu_sweep.py):
# - 'erf_fp32': A&S erf on the fp32 matmul output (original; exact-gelu math
#   but ~15-20 VPU ops/element incl. a reciprocal + exp — the kernel is
#   VPU-bound at c=320)
# - 'tanh': tanh-form gelu (the standard 'approximate' variant, and the
#   DEFAULT of jax.nn.gelu/flax) — tanh is a native EUP op; |Δ| vs exact
#   gelu ≤ 3e-3, on par with the bf16 rounding the model path already
#   applies to the GEGLU hidden. r5 sweep at the L0 site (n=139264, c=320):
#   erf rows=136 4.62 ms / tanh rows=136 4.36 / tanh rows=512 4.03 (the erf
#   form's extra fp32 temporaries spill VMEM at rows=512: 8.76 ms). Default;
#   AA_GELU=erf_fp32 restores the exact-erf kernel (the custom_vjp twins
#   follow this flag, so forward/backward stay consistent either way).
_GELU_IMPL = os.environ.get("AA_GELU", "tanh")


def _kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
            eps: float, gelu: str):
    x = x_ref[...].astype(jnp.float32)                     # (R, c)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    ln = ((x - mu) * jax.lax.rsqrt(var + eps) * s_ref[0] + b_ref[0]).astype(x_ref.dtype)

    inner = w2_ref.shape[0]
    # gate half FIRST: its (VPU) gelu chain can overlap the val half's (MXU)
    # matmul in Mosaic's schedule
    dotf = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gate = dotf(ln, w1_ref[:, inner:]) + b1_ref[0, inner:]
    if gelu == "tanh":
        t = jnp.tanh(0.7978845608028654 * (gate + 0.044715 * gate * gate * gate))
        gact = 0.5 * gate * (1.0 + t)
    else:
        gact = 0.5 * gate * (1.0 + _erf(gate * (2.0 ** -0.5)))
    val = dotf(ln, w1_ref[:, :inner]) + b1_ref[0, :inner]
    act = (val * gact).astype(x_ref.dtype)

    y = dotf(act, w2_ref[...]) + b2_ref[0] + x
    o_ref[...] = y.astype(o_ref.dtype)


def _pallas_ln_geglu(x2, s, b, w1, b1, w2, b2, eps, rows):
    n, c = x2.shape
    n_pad = _rup(n, rows)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    i2 = w1.shape[-1]
    inner = w2.shape[0]
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, gelu=_GELU_IMPL),
        grid=(n_pad // rows,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, i2), lambda i: (0, 0)),
            pl.BlockSpec((1, i2), lambda i: (0, 0)),
            pl.BlockSpec((inner, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * c * (i2 + inner),
            bytes_accessed=2 * n_pad * c * x2.dtype.itemsize,
            transcendentals=n_pad * inner,
        ),
    )(x2, s.reshape(1, c), b.reshape(1, c), w1, b1.reshape(1, i2),
      w2, b2.reshape(1, c))
    return out[:n] if n_pad != n else out


def _wide_kernel(x_ref, s_ref, b_ref, w1v_ref, w1g_ref, b1v_ref, b1g_ref,
                 w2_ref, b2_ref, o_ref, ln_buf, acc, *, eps: float, gelu: str,
                 nj: int):
    """One (row-block, inner-block) step of the N-streamed FF: the (R, 8c)
    GEGLU hidden never exists — each inner block's val·gelu(gate) slab is
    folded into the down-projection accumulator immediately."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        x = x_ref[...].astype(jnp.float32)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        ln_buf[...] = ((x - mu) * jax.lax.rsqrt(var + eps) * s_ref[0]
                       + b_ref[0]).astype(ln_buf.dtype)
        acc[...] = x + b2_ref[0]

    ln = ln_buf[...]
    dotf = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gate = dotf(ln, w1g_ref[...]) + b1g_ref[0]
    if gelu == "tanh":
        t = jnp.tanh(0.7978845608028654 * (gate + 0.044715 * gate * gate * gate))
        gact = 0.5 * gate * (1.0 + t)
    else:
        gact = 0.5 * gate * (1.0 + _erf(gate * (2.0 ** -0.5)))
    val = dotf(ln, w1v_ref[...]) + b1v_ref[0]
    act = (val * gact).astype(ln.dtype)
    acc[...] += dotf(act, w2_ref[...])

    @pl.when(j == nj - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def _pick_rows_wide(c: int, n: int, nb: int = 256) -> int:
    """Row block for the N-streamed kernel. The weights re-stream per row
    block (3·c·4c bytes each time), so LARGE row blocks are what makes the
    kernel compute-bound instead of weight-DMA-bound: at c=1280/nb=256 each
    grid step runs 3·2·R·c·nb FLOPs against a 3·c·nb·2·2B weight fetch —
    R≥256 keeps the MXU ahead of HBM. Live VMEM ≈ R·c·12B (x dbuf + ln +
    fp32 acc + out dbuf) + 3·c·nb·4B weight double-buffers, budget ~11MB."""
    cp = _rup(c, 128)
    cap = max(8, min(512, ((11 * 2**20 - 12 * cp * nb) // (12 * cp) // 8) * 8))
    for rows in range(cap, 127, -8):
        if n % rows == 0:
            return rows
    return cap


def _pallas_ln_geglu_wide(x2, s, b, w1, b1, w2, b2, eps, rows, nb=256):
    n, c = x2.shape
    inner = w2.shape[0]
    nj = inner // nb
    n_pad = _rup(n, rows)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    w1v, w1g = w1[:, :inner], w1[:, inner:]
    b1v, b1g = b1[:inner], b1[inner:]
    out = pl.pallas_call(
        functools.partial(_wide_kernel, eps=eps, gelu=_GELU_IMPL, nj=nj),
        grid=(n_pad // rows, nj),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i, j: (i, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((c, nb), lambda i, j: (0, j)),
            pl.BlockSpec((c, nb), lambda i, j: (0, j)),
            pl.BlockSpec((1, nb), lambda i, j: (0, j)),
            pl.BlockSpec((1, nb), lambda i, j: (0, j)),
            pl.BlockSpec((nb, c), lambda i, j: (j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows, c), x2.dtype),
            pltpu.VMEM((rows, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * c * (w1.shape[-1] + inner),
            bytes_accessed=2 * n_pad * c * x2.dtype.itemsize
            + 3 * c * inner * x2.dtype.itemsize,
            transcendentals=n_pad * inner,
        ),
    )(x2, s.reshape(1, c), b.reshape(1, c), w1v, w1g,
      b1v.reshape(1, inner), b1g.reshape(1, inner), w2, b2.reshape(1, c))
    return out[:n] if n_pad != n else out


def _reference(x2, s, b, w1, b1, w2, b2, eps, approximate=False):
    # approximate=False: the composite/default model path keeps EXACT erf
    # gelu (torch-oracle parity). Kernel tests pass approximate=True to
    # compare the tanh-default kernel against tanh-consistent math.
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + eps) * s + b).astype(x2.dtype)
    h = jnp.dot(ln, w1, preferred_element_type=jnp.float32) + b1
    inner = h.shape[-1] // 2
    val, gate = h[:, :inner], h[:, inner:]
    act = (val * jax.nn.gelu(gate, approximate=approximate)).astype(x2.dtype)
    y = jnp.dot(act, w2, preferred_element_type=jnp.float32) + b2 + xf
    return y.astype(x2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _fused_p(x2, s, b, w1, b1, w2, b2, eps, rows):
    return _pallas_ln_geglu(x2, s, b, w1, b1, w2, b2, eps, rows)


def _fwd(x2, s, b, w1, b1, w2, b2, eps, rows):
    return _pallas_ln_geglu(x2, s, b, w1, b1, w2, b2, eps, rows), (x2, s, b, w1, b1, w2, b2)


def _reference_lean(x2, s, b, w1, b1, w2, b2, eps):
    """Gradient twin that stores the (rows, 8c) GEGLU hidden in the compute
    dtype instead of fp32. Under vjp the exact twin's fp32 `h` (and its two
    halves) are the dominant saved/transient values — 0.7 GB per c=320 site
    at 512px during training. Same function, bf16 rounding on h; gradients
    agree to accumulation noise."""
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + eps) * s + b).astype(x2.dtype)
    h = (jnp.dot(ln, w1, preferred_element_type=jnp.float32) + b1).astype(x2.dtype)
    inner = h.shape[-1] // 2
    val, gate = h[:, :inner], h[:, inner:]
    act = (val.astype(jnp.float32)
           * jax.nn.gelu(gate.astype(jnp.float32),
                         approximate=_GELU_IMPL == "tanh")).astype(x2.dtype)
    y = jnp.dot(act, w2, preferred_element_type=jnp.float32) + b2 + xf
    return y.astype(x2.dtype)


def _bwd(eps, rows, res, g):
    _, vjp = jax.vjp(lambda *a: _reference_lean(*a, eps), *res)
    return vjp(g)


_fused_p.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_wide_p(x2, s, b, w1, b1, w2, b2, eps, rows, nb=256):
    return _pallas_ln_geglu_wide(x2, s, b, w1, b1, w2, b2, eps, rows, nb)


def _fwd_wide(x2, s, b, w1, b1, w2, b2, eps, rows, nb=256):
    return (_pallas_ln_geglu_wide(x2, s, b, w1, b1, w2, b2, eps, rows, nb),
            (x2, s, b, w1, b1, w2, b2))


def _bwd_wide(eps, rows, nb, res, g):
    return _bwd(eps, rows, res, g)


_fused_wide_p.defvjp(_fwd_wide, _bwd_wide)


def ln_geglu_ff(
    x: jnp.ndarray,            # (..., c)
    ln_scale: jnp.ndarray,     # (c,) fp32
    ln_bias: jnp.ndarray,      # (c,)
    w1: jnp.ndarray,           # (c, 8c·mult/4) net_0_proj
    b1: jnp.ndarray,
    w2: jnp.ndarray,           # (4c·mult/4, c) net_2
    b2: jnp.ndarray,
    *,
    eps: float = 1e-5,
    impl: str | None = None,
) -> jnp.ndarray:
    """x + GEGLU_FF(LayerNorm(x)) — the transformer-block tail, fused."""
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    dt = x.dtype
    args = (x2, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32),
            w1.astype(dt), b1.astype(jnp.float32), w2.astype(dt),
            b2.astype(jnp.float32))
    use_pallas = (
        impl == "pallas"
        and jax.devices()[0].platform in ("tpu", "axon")
        and c <= 640
    )
    wide_ok = (
        impl == "pallas"
        and os.environ.get("AA_WIDE_FF", "1") == "1"
        and jax.devices()[0].platform in ("tpu", "axon")
        # lane-aligned c only: the on-chip sweep covered c=1280 (both UNets'
        # widest sites); other 128-multiples share its tiling. Non-aligned c
        # or ragged inner blocks take the lean composite below instead.
        and c > 640 and c % 128 == 0 and w2.shape[0] % 256 == 0
    )
    if wide_ok:
        # Floor guard (ADVICE r3): R<128 would make the kernel
        # weight-DMA-bound, contradicting the R>=256 compute-bound design —
        # possible only for very large c where the VMEM budget minus weight
        # double-buffers leaves too few rows.
        wide_rows = _pick_rows_wide(c, x2.shape[0])
        wide_ok = wide_rows >= 128
    if use_pallas:
        out = _fused_p(*args, eps, _pick_rows(c, x2.shape[0]))
    elif wide_ok:
        # c=1280: N-streamed kernel — the (rows, 8c) hidden stays in VMEM one
        # inner-block at a time. XLA's composite form ran these FF dots at
        # 14-18 TF/s (the 10240-lane hidden round-trips HBM between matmul
        # and gelu). On-chip sweep (scripts/geglu_wide_sweep.py): 3.85 vs
        # 4.26 ms (L2sp), 2.21 vs 2.54 ms (midsp); end-to-end headline
        # 10.56 → 9.82 s/video. Default ON; AA_WIDE_FF=0 disables.
        out = _fused_wide_p(*args, eps, wide_rows)
    elif impl == "pallas":
        # perf mode but a geometry neither kernel takes: lean composite —
        # bf16-stored hidden. The exact composite's fp32 (rows, 8c) hidden
        # costs ~10 ms/step at 512px on these sites.
        out = _reference_lean(*args, eps)
    else:
        out = _reference(*args, eps)
    return out.reshape(shape)
