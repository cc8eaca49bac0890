"""Fused GroupNorm→SiLU→3×3-conv Pallas kernel (resnet stage).

The UNet's resnets (GN→SiLU→conv3×3 ×2, diffusers ResnetBlock2D — engaged
throughout /root/reference/models/unet_3d_blocks.py) are the largest FLOP
block of the model, and XLA runs the conv at 31-40% MXU utilization with the
GN as 3 extra HBM passes. This kernel fuses one whole stage:

- stats per (b·f, group) are an XLA reduction (one bandwidth-speed read),
  folded with the affine params — and, for stage 1, the per-sample
  time-embedding bias — into per-(sample, channel) a/b/bias vectors;
- the kernel holds the ENTIRE (H, W, c) image of one sample in VMEM (all
  UNet levels fit: 64²·320 ≈ 2.7MB), normalizes + SiLUs it, zero-pads to
  (H+2, W+2), and computes the conv as **9 matmuls on contiguous slices of
  the row-flattened padded image**: output position j = h·(W+2)+w+1 takes
  flat[j + dy·(W+2) + dx - 1] · W[dy,dx] — shifting the flat view by a
  scalar offset shifts (dy, dx) jointly, so every tap is a dense
  (H·(W+2), c_in) × (c_in, c_g) MXU matmul with ~3% pad overhead;
- output channels are gridded in 128-lane groups so the 9·c_in·c_g weight
  block stays small; the image block is constant across groups (DMA elided).

Backward: custom_vjp against the XLA twin on the same folded inputs.

STATUS: DORMANT (negative result, kept with tests for the record). Both the
9-separate-matmul and the VMEM-im2col single-matmul formulations measured
SLOWER than XLA's composite GN+conv at every UNet geometry on v5e (e.g.
64²/c320 resnet: 6.4 ms composite vs 9.8-10.5 ms fused) — XLA's dedicated
conv emitter beats a Pallas reformulation here, unlike the attention/
temporal-conv/GEGLU sites. ResnetBlock2D therefore always uses the
composite path; this op remains callable via impl='pallas' for experiments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(a: int, b: int) -> int:
    return -(-a // b) * b


def _kernel(xt_ref, xm_ref, xb_ref, a_ref, b_ref, w_ref, bias_ref, o_ref,
            patches, *, th: int, W: int):
    """One (sample, row-tile, cout-group) step. xm is the tile's rows; xt/xb
    are the neighbouring tiles (clamped at the edges), from which only the
    adjacent halo row is used (zeroed at the image border)."""
    pid_h = pl.program_id(1)
    nh = pl.num_programs(1)
    xt = jnp.concatenate([xt_ref[0][-1:], xm_ref[0], xb_ref[0][:1]], axis=0)

    ln = xt.astype(jnp.float32) * a_ref[0][None] + b_ref[0][None]
    ln = (ln * jax.nn.sigmoid(ln)).astype(xm_ref.dtype)   # (th+2, W, cin)
    # zero-pad semantics: the conv pads with zeros AFTER the activation, so
    # at the image border the halo row must be zeroed post-SiLU
    th2 = ln.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (th2, 1, 1), 0)
    border = ((pid_h == 0) & (row == 0)) | ((pid_h == nh - 1) & (row == th2 - 1))
    ln = jnp.where(border, jnp.zeros_like(ln), ln)
    cin = ln.shape[-1]
    cg = o_ref.shape[-1]

    cin_p = _rup(cin, 128)
    if cin_p != cin:
        # lane-align so the im2col concat below lands on tile boundaries
        ln = jnp.pad(ln, ((0, 0), (0, 0), (0, cin_p - cin)))
    lnp = jnp.pad(ln, ((0, 0), (1, 1), (0, 0)))       # (th+2, W+2, cin_p)
    flat = lnp.reshape((th + 2) * (W + 2), cin_p)
    # one extra zero row each side so the corner taps' offsets stay in range
    zrow = jnp.zeros((1, cin_p), flat.dtype)
    flat = jnp.concatenate([zrow, flat, zrow], axis=0)

    rows = th * (W + 2)
    # im2col into VMEM scratch: the 9 taps side by side on the lane axis →
    # ONE matmul with a 9·cin contraction (XLA-conv-grade MXU utilization).
    # Stores (not a concat) because the shifted slices have mismatched
    # sublane offsets, which Mosaic's concat lowering rejects.
    for t in range(9):
        k = (t // 3) * (W + 2) + (t % 3)
        patches[:, t * cin_p:(t + 1) * cin_p] = flat[k: k + rows]
    acc = jax.lax.dot_general(
        patches[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias_ref[0]
    y = acc.reshape(th, W + 2, cg)[:, 1: W + 1]
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_cg(cin: int, cout: int) -> int:
    """Output-channel group so weights (9·cin·cg·2B) ≤ ~3MB, 128-aligned."""
    cg = cout
    while cg > 128 and (9 * cin * cg * 2 > 3 * 2**20 or cg % 128):
        cg = max(128, _rup(cg // 2, 128))
    if cg % 128 and cg != cout:
        cg = cout
    return cg


def _pick_th(H: int, W: int, cin: int) -> int:
    """Row-tile height: smallest power-of-two divisor of H keeping the VMEM
    im2col patch block (th·(W+2)·9·cin_p·2B) around 3MB, min 8."""
    cin_p = _rup(cin, 128)
    th = H
    while th > 8 and th % 2 == 0 and 18 * th * (W + 2) * cin_p > 3 * 2**20:
        th //= 2
    return th


def _pallas_stage(x, a, b, w9, bias_pb):
    n, H, W, cin = x.shape
    cout = w9.shape[-1]
    cin_p = _rup(cin, 128)
    cg = _pick_cg(cin, cout)
    cout_pad = _rup(cout, cg)
    if cout_pad != cout:
        w9 = jnp.pad(w9, ((0, 0), (0, 0), (0, cout_pad - cout)))
        bias_pb = jnp.pad(bias_pb, ((0, 0), (0, 0), (0, cout_pad - cout)))
    if cin_p != cin:
        w9 = jnp.pad(w9, ((0, 0), (0, cin_p - cin), (0, 0)))
    w2d = w9.reshape(9 * cin_p, cout_pad)
    th = _pick_th(H, W, cin)

    blk = lambda dh: (lambda ib, hi, gi: (
        ib, jnp.clip(hi + dh, 0, H // th - 1), 0, 0))
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, W=W),
        grid=(n, H // th, cout_pad // cg),
        in_specs=[
            pl.BlockSpec((1, th, W, cin), blk(-1)),
            pl.BlockSpec((1, th, W, cin), blk(0)),
            pl.BlockSpec((1, th, W, cin), blk(1)),
            pl.BlockSpec((1, 1, cin), lambda ib, hi, gi: (ib, 0, 0)),
            pl.BlockSpec((1, 1, cin), lambda ib, hi, gi: (ib, 0, 0)),
            pl.BlockSpec((9 * cin_p, cg), lambda ib, hi, gi: (0, gi)),
            pl.BlockSpec((1, 1, cg), lambda ib, hi, gi: (ib, 0, gi)),
        ],
        out_specs=pl.BlockSpec((1, th, W, cg),
                               lambda ib, hi, gi: (ib, hi, 0, gi)),
        out_shape=jax.ShapeDtypeStruct((n, H, W, cout_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((th * (W + 2), 9 * cin_p), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * H * (W + 2) * 9 * cin_p * cout_pad,
            bytes_accessed=n * H * W * (3 * cin + cout_pad) * x.dtype.itemsize,
            transcendentals=n * H * W * cin,
        ),
    )(x, x, x, a.reshape(n, 1, cin), b.reshape(n, 1, cin), w2d, bias_pb)
    return out[..., :cout] if cout_pad != cout else out


def _reference_stage_exact(x, a, b, w9, bias_pb):
    ln = x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
    ln = (ln * jax.nn.sigmoid(ln)).astype(x.dtype)
    w = w9.reshape(3, 3, w9.shape[1], w9.shape[2]).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        ln, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return (y + bias_pb[:, None, :, :]).astype(x.dtype)


@jax.custom_vjp
def _fused_p(x, a, b, w9, bias_pb):
    return _pallas_stage(x, a, b, w9, bias_pb)


def _fwd(x, a, b, w9, bias_pb):
    return _pallas_stage(x, a, b, w9, bias_pb), (x, a, b, w9, bias_pb)


def _bwd(res, g):
    _, vjp = jax.vjp(_reference_stage_exact, *res)
    return vjp(g)


_fused_p.defvjp(_fwd, _bwd)

_VMEM_IMG = 6 * 2**20   # min-tile working-set budget (Mosaic double-buffers blocks)


def gn_silu_conv3x3(
    x: jnp.ndarray,          # (n, H, W, c_in) — n = b·f spatial batch
    gn_scale: jnp.ndarray,   # (c_in,)
    gn_bias: jnp.ndarray,    # (c_in,)
    w: jnp.ndarray,          # (3, 3, c_in, c_out)
    bias: jnp.ndarray,       # (c_out,)
    *,
    groups: int,
    eps: float = 1e-5,
    extra_bias: jnp.ndarray | None = None,   # (n, c_out) e.g. time embedding
    impl: str | None = None,
) -> jnp.ndarray:
    """One resnet stage: GroupNorm → SiLU → conv3×3 (+ per-sample bias)."""
    n, H, W, cin = x.shape
    cout = w.shape[-1]
    # ---- stats + affine fold (XLA, fp32; channel-first reduction — see
    # ops/group_norm.py group_affine)
    from animate_anything_tpu.ops.group_norm import group_affine

    a, b = group_affine(x.reshape(n, H * W, cin), gn_scale, gn_bias,
                        groups, eps)

    bias_pb = jnp.broadcast_to(bias.astype(jnp.float32)[None, :], (n, cout))
    if extra_bias is not None:
        bias_pb = bias_pb + extra_bias.astype(jnp.float32)
    bias_pb = bias_pb.reshape(n, 1, cout)
    w9 = w.reshape(9, cin, cout).astype(x.dtype)

    use_pallas = (
        impl == "pallas"
        and jax.devices()[0].platform in ("tpu", "axon")
        and H % _pick_th(H, W, cin) == 0
        and 26 * 8 * W * cin <= _VMEM_IMG      # a min-height tile must fit
        and cin % 8 == 0
    )
    if use_pallas:
        return _fused_p(x, a, b, w9, bias_pb)
    return _reference_stage_exact(x, a, b, w9, bias_pb)
