"""Building-block layers for the video UNets, in NHWC / frame-major layout.

Functional equivalents of the reference's diffusers blocks (ResnetBlock2D,
TemporalConvLayer, Down/Upsample2D, Timesteps/TimestepEmbedding — engaged from
/root/reference/models/unet_3d_blocks.py:18-20), redesigned for TPU:

- all convs are NHWC (XLA TPU's native conv layout; channels-last tiles onto
  the 128-lane VPU/MXU without transposes);
- the pseudo-3D temporal conv (kernel (3,1,1)) is expressed as a 2D conv with
  kernel (3, 1) over a (b, f, h·w, c) view — XLA lowers it to an MXU matmul
  with a 3·C contraction instead of a thin conv3d;
- spatial tensors ride a fused (b·f, h, w, c) batch so every frame is pure
  data parallelism.

Param names mirror diffusers attribute paths (conv1, time_emb_proj, norm2, …)
so the torch→flax weight importer is a mechanical rename.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from animate_anything_tpu.ops.group_norm import group_norm_silu


class FusedGroupNorm(nn.Module):
    """GroupNorm with optional fused SiLU (ops/group_norm.py — one-pass
    pallas kernel on TPU, XLA math otherwise). Param tree identical to
    flax nn.GroupNorm ({scale, bias})."""

    groups: int
    eps: float = 1e-5
    silu: bool = False
    dtype: jnp.dtype = jnp.float32
    stats: Optional[str] = None  # 'pallas': streaming stats kernel (for norms
    # whose producer is a custom-call — see ops/group_norm.py::group_affine)

    @nn.compact
    def __call__(self, x: jnp.ndarray, sums=None) -> jnp.ndarray:
        # sums: per-(x.shape[0], c) fp32 (Σx, Σx²) ridden out of the producing
        # kernel's epilogue (ops/group_norm.py::group_affine)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_silu(x, scale, bias, self.groups, self.eps, self.silu,
                               stats=self.stats, sums=sums)


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal embedding, matching diffusers ``Timesteps`` as configured by
    the reference (flip_sin_to_cos=True, shift=0 —
    /root/reference/models/unet_3d_condition_mask.py:148,156). fp32 always."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """MLP over the sinusoidal embedding, with the optional conditioning
    projection the reference uses for motion strength (cond_proj_dim=320,
    /root/reference/models/unet_3d_condition_mask.py:153-161)."""

    time_embed_dim: int
    cond_proj_dim: Optional[int] = None
    out_dim: Optional[int] = None   # diffusers TimestepEmbedding out_dim
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray, condition: Optional[jnp.ndarray] = None):
        if condition is not None:
            if self.cond_proj_dim is None:
                raise ValueError("condition passed but cond_proj_dim not set")
            cond = nn.Dense(sample.shape[-1], use_bias=False, dtype=self.dtype, name="cond_proj")(
                condition
            )
            sample = sample + cond
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        sample = nn.silu(sample)
        sample = nn.Dense(self.out_dim or self.time_embed_dim, dtype=self.dtype, name="linear_2")(sample)
        return sample


class Conv1x1(nn.Module):
    """1×1 conv computed as a dense matmul on the channel axis.

    Param tree identical to nn.Conv(features, (1, 1)) ({kernel (1,1,in,out),
    bias}), but XLA's conv lowering at kernel size 1 measured ~0.6 ms slower
    than the equivalent einsum at the 64×64/c320 site on v5e — the conv path
    pays windowing setup a matmul doesn't."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, cin, self.features), jnp.float32)
        y = jnp.einsum("...c,cd->...d", x, w[0, 0].astype(self.dtype),
                       preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b
        return y.astype(self.dtype)


class _Conv3x3Params(nn.Module):
    """Param-only twin of nn.Conv(features, (3,3)) ({kernel, bias}, fp32)."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_dim, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return w, b


class ResnetBlock2D(nn.Module):
    """GN→SiLU→conv3x3 ×2 with time-embedding bias and 1x1 shortcut.

    Runs on the fused (b·f, h, w, c) spatial batch. Matches diffusers
    ResnetBlock2D (default time_embedding_norm, pre_norm, scale 1.0).
"""

    out_channels: int
    eps: float = 1e-5
    groups: int = 32
    impl: Optional[str] = None   # accepted for call-site uniformity. Both
    # fused conv3×3 kernels are measured negative results (v1 im2col:
    # ops/conv3x3.py; v2 whole-sample row-streaming: ops/spatial_conv.py —
    # ties or loses to XLA's conv emitter at every UNet geometry, see
    # docs/KERNELS.md), so 'pallas' keeps the composite path unless the
    # dormant v2 kernel is explicitly re-enabled via AA_SPATIAL_CONV=1.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None,
                 norm1_sums=None, want_stats: bool = False):
        # norm1_sums: per-(b·f, c) fp32 (Σx, Σx²) ridden out of the producing
        # kernel (transformer fused output projection / temp-conv epilogue) —
        # norm1 then skips its standalone stats reduce over x.
        # want_stats=True → returns (y, out_sums): the final residual add runs
        # as the fused add+stats kernel (ops/add_stats.py) and the sums feed
        # the consumer's GroupNorm (temp-conv stage 1 / spatial entry norm).
        from animate_anything_tpu.ops.attic.spatial_conv import (SPATIAL_CONV_OPTIN,
                                                           gn_silu_spatial_conv)

        in_channels = x.shape[-1]
        if self.impl == "pallas" and SPATIAL_CONV_OPTIN():
            # fused path: both GN→SiLU→conv stages run as single kernels; the
            # time-embedding projection folds into stage 1's bias and the
            # shortcut add into stage 2's residual. Param tree identical to
            # the composite path (param-only twins).
            s1, b1 = _GNParams(in_channels, name="norm1")()
            w1, cb1 = _Conv3x3Params(in_channels, self.out_channels, name="conv1")()
            teb = None
            if temb is not None:
                teb = nn.Dense(self.out_channels, dtype=self.dtype,
                               name="time_emb_proj")(nn.silu(temb))
            h = gn_silu_spatial_conv(
                x, s1, b1, w1, cb1, groups=self.groups, eps=self.eps,
                extra_bias=teb, impl="pallas")
            s2, b2 = _GNParams(self.out_channels, name="norm2")()
            w2, cb2 = _Conv3x3Params(self.out_channels, self.out_channels, name="conv2")()
            shortcut = x
            if in_channels != self.out_channels:
                shortcut = Conv1x1(self.out_channels, dtype=self.dtype,
                                   name="conv_shortcut")(x)
            y = gn_silu_spatial_conv(
                h, s2, b2, w2, cb2, groups=self.groups, eps=self.eps,
                residual=shortcut, impl="pallas")
            return (y, None) if want_stats else y

        # (r5 A/B: routing the sums-less norms through the streaming
        # channel-sums kernel regressed 9.63 -> 9.76 s — the standalone pallas
        # stats read costs more than the XLA reduce that rides the producing
        # conv's kOutput epilogue, re-confirming the r4 negative result. XLA
        # reduces stay at the sites with no producer-epilogue sums.)
        h = FusedGroupNorm(self.groups, self.eps, silu=True, dtype=self.dtype,
                           name="norm1")(x, sums=norm1_sums)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)

        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]

        h = FusedGroupNorm(self.groups, self.eps, silu=True, dtype=self.dtype,
                           name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)

        if in_channels != self.out_channels:
            x = Conv1x1(self.out_channels, dtype=self.dtype, name="conv_shortcut")(x)
        # (r5 A/B: running this add through the fused add+stats kernel
        # (ops/add_stats.py) to feed temp-conv stage 1 regressed the headline
        # 9.63 -> 9.76 s — XLA fuses the residual add into conv2's kOutput
        # epilogue, so the pallas form added a full write+read per resnet.
        # The XLA add stays; stage 1 keeps its XLA stats reduce.)
        y = x + h
        return (y, None) if want_stats else y


class _GNParams(nn.Module):
    """Param-only twin of FusedGroupNorm ({scale, bias}, fp32)."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class _TapConvParams(nn.Module):
    """Param-only twin of TemporalTapConv ({kernel (3,1,in,out), bias})."""

    in_dim: int
    features: int
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        w = self.param("kernel", init, (3, 1, self.in_dim, self.features), self.dtype)
        b = self.param("bias", nn.initializers.zeros, (self.features,), self.dtype)
        return w, b


class TemporalConvLayer(nn.Module):
    """Pseudo-3D temporal conv: four GN→SiLU→conv(3,1,1) stages with a
    zero-initialized final conv (identity at init), residual.

    Reference: diffusers TemporalConvLayer engaged per block
    (/root/reference/models/unet_3d_blocks.py:276-280 etc., dropout=0.1).
    TPU design: kernel (3,1,1) over (b,c,f,h,w) is re-expressed as kernel
    (3,1) over (b, f, h·w, c) — a dense 3C→C contraction on the MXU. With
    impl='pallas' each stage runs as the fused GN+SiLU+tap-conv kernel
    (ops/temporal_conv.py — one read/write pass instead of ~6); param tree
    identical across impls."""

    out_channels: int
    dropout: float = 0.1
    impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int, deterministic: bool = True,
                 want_stats: bool = False, in_sums=None):
        # want_stats=True → returns (y, entry_sums) where entry_sums is a
        # per-(b·f, c) fp32 (Σy, Σy²) pair from the final fused stage's
        # epilogue (or None off the pallas path) — consumed by the following
        # spatial transformer's entry GroupNorm so no XLA reduce ever reads
        # this layer's pallas output (see ops/temporal_conv.py).
        # in_sums: per-(b·f, c) sums of x (the resnet's add+stats epilogue) —
        # stage 1's GroupNorm then skips its standalone reduce too.
        from animate_anything_tpu.ops.temporal_conv import gn_silu_tap_conv

        # x: (b*f, h, w, c)
        bf, hh, ww, c = x.shape
        b = bf // num_frames
        h = x.reshape(b, num_frames, hh * ww, c)
        identity = h

        if self.impl == "pallas" and (deterministic or self.dropout == 0):
            # stage 1 stats are per-(b, c): fold the frame axis of in_sums
            sums = None if in_sums is None else (
                in_sums[0].reshape(b, num_frames, c).sum(1),
                in_sums[1].reshape(b, num_frames, c).sum(1))
            stats = None
            for idx, (cin, feat, zero) in enumerate(
                ((c, self.out_channels, False), (self.out_channels, c, False),
                 (c, c, False), (c, c, True)), start=1):
                gs, gb = _GNParams(cin, name=f"norm{idx}")()
                w, wb = _TapConvParams(cin, feat, zero_init=zero,
                                       dtype=self.dtype, name=f"conv{idx}")()
                h, stats = gn_silu_tap_conv(
                    h.astype(self.dtype), gs, gb, w[:, 0], wb, groups=32,
                    eps=1e-5, residual=identity if idx == 4 else None,
                    impl="pallas", sums=sums, want_stats=True)
                # stage i+1's GN stats are per-(b, c): fold the frame axis
                sums = None if stats is None else (stats[0].sum(1),
                                                   stats[1].sum(1))
            out = h.reshape(bf, hh, ww, c)
            if want_stats:
                entry = None if stats is None else (
                    stats[0].reshape(bf, c), stats[1].reshape(bf, c))
                return out, entry
            return out

        # stage 1 of the composite path (c=1280 levels on TPU) also consumes
        # the producer's sums — its standalone reduce over the resnet output
        # is a {3,0,2,1}-preferring read like any other
        stage1_sums = None if in_sums is None else (
            in_sums[0].reshape(b, num_frames, c).sum(1),
            in_sums[1].reshape(b, num_frames, c).sum(1))

        def stage(h, idx, features, zero_init=False):
            h = FusedGroupNorm(32, 1e-5, silu=True, dtype=self.dtype,
                               name=f"norm{idx}")(
                h, sums=stage1_sums if idx == 1 else None)
            if idx > 1 and self.dropout > 0 and not deterministic:
                h = nn.Dropout(self.dropout, deterministic=False)(h)
            h = TemporalTapConv(
                features, zero_init=zero_init, dtype=self.dtype, name=f"conv{idx}"
            )(h)
            return h

        h = stage(h, 1, self.out_channels)
        h = stage(h, 2, c)
        h = stage(h, 3, c)
        h = stage(h, 4, c, zero_init=True)

        h = identity + h
        out = h.reshape(bf, hh, ww, c)
        return (out, None) if want_stats else out


class TemporalTapConv(nn.Module):
    """Frame-axis conv (kernel 3) on (b, f, s, c) as 3 shifted dense matmuls.

    Param layout stays the conv (3, 1, in, out) kernel for checkpoint
    compatibility; XLA's conv path tiles the (f≈17, h·w) window poorly
    (measured 3-4× slower than this explicit-tap form on v5e)."""

    features: int
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        kernel_init = (
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        )
        w = self.param("kernel", kernel_init, (3, 1, h.shape[-1], self.features), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.dtype)
        prev = jnp.pad(h[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)))
        nxt = jnp.pad(h[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        out = (
            jnp.einsum("bfsc,cd->bfsd", prev, w[0, 0], preferred_element_type=jnp.float32)
            + jnp.einsum("bfsc,cd->bfsd", h, w[1, 0], preferred_element_type=jnp.float32)
            + jnp.einsum("bfsc,cd->bfsd", nxt, w[2, 0], preferred_element_type=jnp.float32)
        )
        return out.astype(self.dtype) + bias


class Downsample2D(nn.Module):
    """conv3x3 stride 2 (diffusers Downsample2D name='op')."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="conv"
        )(x)


class Upsample2D(nn.Module):
    """nearest 2× (or to an explicit size) + conv3x3."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, output_size: Optional[tuple] = None) -> jnp.ndarray:
        bf, h, w, c = x.shape
        target = output_size if output_size is not None else (h * 2, w * 2)
        if target == (h * 2, w * 2):
            # exact 2x nearest via broadcast+reshape — avoids the gather that
            # jax.image.resize can lower to on TPU
            x = jnp.broadcast_to(x[:, :, None, :, None, :], (bf, h, 2, w, 2, c))
            x = x.reshape(bf, h * 2, w * 2, c)
        else:
            x = jax.image.resize(x, (bf, target[0], target[1], c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


def zero_init_conv(features: int, kernel_size: tuple, dtype=jnp.float32, name: str | None = None):
    """Conv with zero-initialized kernel+bias (LayerDiffuse/ControlNet style)."""
    return nn.Conv(
        features,
        kernel_size,
        padding=tuple(((k - 1) // 2, (k - 1) // 2) for k in kernel_size),
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        name=name,
    )
