"""Fused affine(+SiLU)→3×3-conv Pallas kernel, v2 (resnet stage).

Second attempt at the resnet conv (the v1 im2col formulation in
ops/conv3x3.py is a documented negative result). The r2 step profile showed
the GN→conv chains still dominating non-attention time: XLA lowers each
GroupNorm site into a stats pass plus a *relayout* fusion producing the conv
emitter's preferred {3,0,2,1} layout (~1.7 ms at the 64²/c320 site vs a
0.5 ms bandwidth floor), then runs the conv itself at ~40% MXU.

Design (what v1 got wrong → what v2 does):
- v1 materialized a 9·cin im2col patch block in VMEM — nine full-tile
  strided stores (pure VPU overhead, 9× data amplification). v2 never
  builds patches: the H-axis taps are **contiguous row windows of the
  row-flattened (ch+2, W) tile** (free slices, the same trick the proven
  temporal tap-conv kernel uses on the frame axis), and only the W-axis
  taps need real VMEM copies — two shifted variants (left/right by one
  column), built once per tile.
- v1 fetched each row-tile three times through neighbour BlockSpecs. v2
  keeps the whole (H, W, cin) sample resident (≤2.7 MB at every UNet
  level) and walks row-chunks internally, so halo rows are VMEM slices.
- the 3×3 conv = 9 matmuls (dy ∈ {0,1,2} row windows × {left, centre,
  right} variants), each a dense (ch·W, cin)×(cin, co) MXU op.

GroupNorm statistics are an XLA reduction (one bandwidth-speed read), folded
with the affine params — and optionally a per-sample extra bias such as the
resnet's time-embedding projection — outside the kernel, exactly like
ops/temporal_conv.py. An optional residual input lets the second resnet
stage fuse the shortcut add.

Large weights: output channels are gridded in `co` chunks (grid order
(co, n) so a weight chunk is fetched once, not per sample); wide inputs
(skip-concat up-block resnets, cin up to 2560) are split on cin outside the
kernel, the second call accumulating onto the first via the residual input.

Backward: custom_vjp against an exact XLA twin on the same folded inputs
(gradients flow through the stats fold outside the custom_vjp).

Reference behavior being replaced: diffusers ResnetBlock2D
(GN→SiLU→conv3×3 ×2), engaged throughout
/root/reference/models/unet_3d_blocks.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def SPATIAL_CONV_OPTIN() -> bool:
    """DORMANT by default. On-chip sweep (scripts/spatial_conv_sweep.py,
    2026-08-19): after VMEM-correct gating the kernel only dispatches at the
    L0 (34, 64², 320→320) geometry, where it measures 4.24 ms vs XLA's
    4.02 ms — at every other site the 2×9·cin·co double-buffered weight
    block exceeds VMEM and the dispatcher falls back. Kept with tests as a
    documented negative result (v2, after ops/conv3x3.py's v1); re-enable
    for experiments with AA_SPATIAL_CONV=1."""
    return os.environ.get("AA_SPATIAL_CONV", "") == "1"


def _rup(a: int, b: int) -> int:
    return -(-a // b) * b


# sweepable (scripts/spatial_conv_sweep.py)
_W_BUDGET = 6 * 2**20      # max weight-block bytes incl. lane padding and the
                           # double buffer Mosaic adds when co is gridded
_VMEM_LIMIT = 15.5 * 2**20   # estimator budget, calibrated on-chip: Mosaic
                           # reported 18.77M for a config this model puts at
                           # 18.9M (x double-buffered; out/residual single;
                           # weights double only when their index map varies)
_CIN_MAX = 1365            # split cin above this (keeps one w chunk in budget)


def _w_bytes(cin: int, co: int, cout: int, dbytes: int = 2) -> int:
    # Mosaic double-buffers every grid-indexed block — including the weight
    # block when its grid axis has size 1 (confirmed on-chip: the 640→640
    # 32² site OOMed the real compiler while the single-buffer estimate
    # passed), so always count the double buffer.
    return 2 * 9 * cin * _rup(co, 128) * dbytes


def _pick_co(cin: int, cout: int, dtype_bytes: int = 2) -> int:
    """Output-channel chunk: cout, halved (while the half stays 128-aligned)
    until the weight block (with lane padding + double buffer) fits."""
    co = cout
    while (_w_bytes(cin, co, cout, dtype_bytes) > _W_BUDGET
           and co % 2 == 0 and (co // 2) % 128 == 0):
        co //= 2
    return co


def _vmem_est(h, w, cin, cout, co_ch, ch, with_res, dbytes=2):
    """Mosaic stack bytes for one program (on-chip-calibrated accounting)."""
    cin_p, co_p = _rup(cin, 128), _rup(co_ch, 128)
    xb = h * w * cin_p * dbytes
    ob = h * w * co_p * dbytes
    wb = _w_bytes(cin, co_ch, cout, dbytes)
    ln3 = 3 * (ch + 2) * w * cin_p * dbytes
    acc = ch * w * co_p * 4
    return 2 * xb + ob + (ob if with_res else 0) + wb + ln3 + acc


def _pick_ch(h: int, w: int, cin: int, cout: int | None = None,
             co_ch: int | None = None, with_res: bool = False,
             dtype_bytes: int = 2) -> int:
    """Row-chunk height: largest divisor of h (multiple of 8, or h itself)
    keeping the whole program inside the VMEM estimate."""
    cout = cout if cout is not None else cin
    co_ch = co_ch if co_ch is not None else cout
    best = 0
    for ch in range(8, h + 1, 8):
        if h % ch == 0 and _vmem_est(h, w, cin, cout, co_ch, ch,
                                     with_res, dtype_bytes) <= _VMEM_LIMIT:
            best = ch
    return best


def _kernel(x_ref, a_ref, b_ref, w_ref, bias_ref, res_ref, o_ref, *,
            ch: int, silu: bool):
    h, w, cin = x_ref.shape[1:]
    co = o_ref.shape[-1]
    a = a_ref[0]                                        # (1, cin)
    b = b_ref[0]
    wk = w_ref[...]                                     # (9, cin, co)
    bias = bias_ref[0].astype(jnp.float32)              # (1, co)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    zrow = jnp.zeros((1, w, cin), x_ref.dtype)
    zcol = None
    for i in range(h // ch):
        lo = i * ch
        top = None if i == 0 else x_ref[0, lo - 1:lo]
        bot = None if lo + ch == h else x_ref[0, lo + ch:lo + ch + 1]
        xt = jnp.concatenate(
            [p for p in (top, x_ref[0, lo:lo + ch], bot) if p is not None], axis=0)
        ln = xt.astype(jnp.float32) * a[None] + b[None]
        if silu:
            ln = ln * jax.nn.sigmoid(ln)
        ln = ln.astype(x_ref.dtype)
        # conv zero-padding applies AFTER the activation: border halo rows
        # must be zero post-SiLU, so append zeros to ln, not to x
        if top is None:
            ln = jnp.concatenate([zrow, ln], axis=0)
        if bot is None:
            ln = jnp.concatenate([ln, zrow], axis=0)    # (ch+2, W, cin)
        if zcol is None:
            zcol = jnp.zeros((ch + 2, 1, cin), ln.dtype)
        # W-axis taps: shifted variants (the only real copies in the kernel)
        v0 = jnp.concatenate([zcol, ln[:, :-1]], axis=1)   # operand[w] = ln[w-1]
        v2 = jnp.concatenate([ln[:, 1:], zcol], axis=1)    # operand[w] = ln[w+1]
        flat = [v.reshape((ch + 2) * w, cin) for v in (v0, ln, v2)]
        # H-axis taps: contiguous row windows of the flattened tile
        acc = bias
        for dy in range(3):
            for dx in range(3):
                acc = acc + dot(flat[dx][dy * w:(dy + ch) * w], wk[dy * 3 + dx])
        if res_ref is not None:
            acc = acc + res_ref[0, lo:lo + ch].reshape(ch * w, co).astype(jnp.float32)
        o_ref[0, lo:lo + ch] = acc.reshape(ch, w, co).astype(o_ref.dtype)


def _pallas_stage(x, a, b, w9, bias_pb, residual, ch: int, co_ch: int, silu: bool):
    n, h, w, cin = x.shape
    cout = w9.shape[-1]
    n_co = cout // co_ch

    xmap = lambda ic, ib: (ib, 0, 0, 0)
    vec = lambda c: pl.BlockSpec((1, 1, c), lambda ic, ib: (ib, 0, 0))
    in_specs = [
        pl.BlockSpec((1, h, w, cin), xmap),
        vec(cin),
        vec(cin),
        pl.BlockSpec((9, cin, co_ch), lambda ic, ib: (0, 0, ic)),
        pl.BlockSpec((1, 1, co_ch), lambda ic, ib: (ib, 0, ic)),
    ]
    args = [x, a.reshape(n, 1, cin), b.reshape(n, 1, cin), w9, bias_pb]
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, h, w, co_ch),
                                     lambda ic, ib: (ib, 0, 0, ic)))
        args.append(residual)
        kern = functools.partial(_kernel, ch=ch, silu=silu)
    else:
        kern = functools.partial(
            lambda xr, ar, br, wr, br2, orf, *, ch, silu: _kernel(
                xr, ar, br, wr, br2, None, orf, ch=ch, silu=silu),
            ch=ch, silu=silu,
        )

    return pl.pallas_call(
        kern,
        grid=(n_co, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, co_ch), lambda ic, ib: (ib, 0, 0, ic)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * cin * cout,
            bytes_accessed=n * h * w * (cin * n_co + cout) * x.dtype.itemsize,
            transcendentals=n * h * w * cin,
        ),
    )(*args)


def _reference_stage(x, a, b, w9, bias_pb, residual, silu: bool):
    """Exact XLA twin on the same folded inputs (backward + tests)."""
    ln = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    if silu:
        ln = ln * jax.nn.sigmoid(ln)
    ln = ln.astype(x.dtype)
    w = w9.reshape(3, 3, w9.shape[1], w9.shape[2]).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        ln, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias_pb[:, None, :, :]
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _fused_p(x, a, b, w9, bias_pb, residual, ch, co_ch, silu):
    return _pallas_stage(x, a, b, w9, bias_pb, residual, ch, co_ch, silu)


def _fused_fwd(x, a, b, w9, bias_pb, residual, ch, co_ch, silu):
    out = _pallas_stage(x, a, b, w9, bias_pb, residual, ch, co_ch, silu)
    return out, (x, a, b, w9, bias_pb, residual)


def _fused_bwd(ch, co_ch, silu, res, g):
    x, a, b, w9, bias_pb, residual = res
    _, vjp = jax.vjp(
        lambda *ops: _reference_stage(*ops, silu=silu),
        x, a, b, w9, bias_pb, residual)
    return vjp(g)


_fused_p.defvjp(_fused_fwd, _fused_bwd)


def _run_split(x, a, b, w9, bias_pb, residual, silu):
    """Dispatch one logical conv, splitting cin when the weight chunk can't
    fit: y = Σ_half conv(ln(x_half)) — the second call accumulates onto the
    first via the residual input."""
    n, h, w, cin = x.shape
    cout = w9.shape[-1]
    if cin > _CIN_MAX:
        half = (cin // 2 + 127) // 128 * 128 if (cin // 2) % 128 else cin // 2
        half = min(half, cin - 1)
        y = _run_split(x[..., :half], a[:, :half], b[:, :half],
                       w9[:, :half], bias_pb, residual, silu)
        return _run_split(x[..., half:], a[:, half:], b[:, half:],
                          w9[:, half:], jnp.zeros_like(bias_pb), y, silu)
    co_ch = _pick_co(cin, cout)
    # fuse the residual only when its blocks fit VMEM; otherwise add outside
    # (one cheap elementwise pass, still saves the relayout)
    add_outside = None
    if residual is not None and _pick_ch(h, w, cin, cout, co_ch, True) < 8:
        add_outside, residual = residual, None
    ch = _pick_ch(h, w, cin, cout, co_ch, residual is not None)
    if ch < 8:
        out = _reference_stage(x, a, b, w9, bias_pb, residual, silu)
        residual = None
    else:
        out = _fused_p(x, a, b, w9, bias_pb, residual, ch, co_ch, silu)
    if add_outside is not None:
        out = (out.astype(jnp.float32) + add_outside.astype(jnp.float32)).astype(out.dtype)
    return out


def gn_silu_spatial_conv(
    x: jnp.ndarray,          # (n, H, W, c_in) — n = b·f spatial batch
    gn_scale: jnp.ndarray,   # (c_in,)
    gn_bias: jnp.ndarray,    # (c_in,)
    w: jnp.ndarray,          # (3, 3, c_in, c_out)
    bias: jnp.ndarray,       # (c_out,)
    *,
    groups: int,
    eps: float = 1e-5,
    silu: bool = True,
    extra_bias: jnp.ndarray | None = None,   # (n, c_out) e.g. time embedding
    residual: jnp.ndarray | None = None,     # (n, H, W, c_out) fused final add
    impl: str | None = None,
) -> jnp.ndarray:
    """One resnet stage: GroupNorm → SiLU → conv3×3 (+ per-sample bias,
    + optional residual). Stats are per (sample, group) over (H, W, c/g) —
    torch GroupNorm semantics on the (b·f, h, w, c) spatial batch."""
    n, h_dim, w_dim, cin = x.shape
    cout = w.shape[-1]
    # ---- stats + affine fold (XLA, fp32; channel-first reduction — see
    # ops/group_norm.py group_affine)
    from animate_anything_tpu.ops.group_norm import group_affine

    a, b = group_affine(x.reshape(n, h_dim * w_dim, cin), gn_scale, gn_bias,
                        groups, eps)

    bias_pb = jnp.broadcast_to(bias.astype(jnp.float32)[None, :], (n, cout))
    if extra_bias is not None:
        bias_pb = bias_pb + extra_bias.astype(jnp.float32)
    bias_pb = bias_pb.reshape(n, 1, cout)
    w9 = w.reshape(9, cin, cout).astype(x.dtype)

    cin_eff = min(cin, _CIN_MAX)
    co_eff = _pick_co(cin_eff, cout)
    sample_bytes = h_dim * w_dim * _rup(cin_eff, 128) * x.dtype.itemsize
    use_pallas = (
        impl == "pallas"
        and jax.devices()[0].platform in ("tpu", "axon")
        and w_dim % 8 == 0
        and _pick_ch(h_dim, w_dim, cin_eff, cout, co_eff) >= 8
        and sample_bytes <= 6 * 2**20   # whole sample resident (×2 buffers)
    )
    if use_pallas:
        return _run_split(x, a, b, w9, bias_pb, residual, silu)
    return _reference_stage(x, a, b, w9, bias_pb, residual, silu)
