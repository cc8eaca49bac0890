"""Down/mid/up blocks of the mask-conditioned 3D UNet.

Mirrors the reference block graph exactly (same layer counts, channel plumbing
and op ordering — /root/reference/models/unet_3d_blocks.py):

- CrossAttnDownBlock3D / CrossAttnUpBlock3D: [resnet → temp_conv →
  spatial-attn → temporal-attn] per layer (:513-526, :745-758);
- UNetMidBlock3DCrossAttn: resnet → temp_conv, then [attn → temp_attn →
  resnet → temp_conv] (:372-384);
- DownBlock3D / UpBlock3D: [resnet → temp_conv] (:591-604, :826-836);
- temporal modules are skipped when num_frames == 1 (:516, :525) — num_frames
  is a static module attribute here, so the skip costs nothing under jit.

Gradient checkpointing (the reference's custom wrappers :32-120) is applied
at the same granularity as the reference: per sub-layer (resnet / temp_conv /
spatial-attn / temporal-attn), via the `remat` flag on each block. Block-level
remat (one nn.remat around the whole block) keeps every sub-layer's backward
transients live at once — at 512px that working set is the HBM peak of the
training step; per-sub-layer remat bounds it to one sub-layer.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from animate_anything_tpu.models.attention import SpatialTransformer, TemporalTransformer
from animate_anything_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    TemporalConvLayer,
    Upsample2D,
)


def _sub_layers(remat: bool):
    """(ResnetBlock2D, TemporalConvLayer, SpatialTransformer,
    TemporalTransformer), each wrapped in nn.remat when checkpointing.
    flax static_argnums counts `self` as 0 — num_frames/deterministic are
    Python statics."""
    if not remat:
        return ResnetBlock2D, TemporalConvLayer, SpatialTransformer, TemporalTransformer
    return (
        nn.remat(ResnetBlock2D, static_argnums=(4,)),
        nn.remat(TemporalConvLayer, static_argnums=(2, 3, 4)),
        nn.remat(SpatialTransformer, static_argnums=(5,)),
        nn.remat(TemporalTransformer, static_argnums=(2, 5)),
    )


def _fold_frames(sums, nf: int):
    """Per-(b·f, c) (Σ, Σ²) → per-(b, c): fold the frame axis (the temporal
    transformer's entry GroupNorm normalizes per batch over f·h·w)."""
    if sums is None:
        return None
    s1, s2 = sums
    n, c = s1.shape
    return (s1.reshape(n // nf, nf, c).sum(1),
            s2.reshape(n // nf, nf, c).sum(1))


def _concat_sums(a, b):
    """Channel-concat of two per-(n, c) sums pairs (skip-connection concat:
    stats of concat([x, skip], axis=-1) = per-channel stats side by side)."""
    if a is None or b is None:
        return None
    return (jnp.concatenate([a[0], b[0]], axis=1),
            jnp.concatenate([a[1], b[1]], axis=1))


class CrossAttnDownBlock3D(nn.Module):
    out_channels: int
    num_frames: int
    num_layers: int = 2
    head_dim: int = 64
    cross_attention_dim: int = 1024
    norm_eps: float = 1e-5
    groups: int = 32
    add_downsample: bool = True
    attn_impl: Optional[str] = None
    deterministic: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, pab_reuse=None, in_sums=None):
        # in_sums: per-(b·f, c) (Σx, Σx²) of x from the previous producer's
        # epilogue (resnets_0's norm1 consumes them); the return adds a
        # parallel list of per-skip sums and the block-output sums, all
        # feeding consumer GroupNorms without standalone XLA reduces.
        deterministic = self.deterministic
        ps = None if pab_reuse is None else pab_reuse.get("spatial")
        pt = None if pab_reuse is None else pab_reuse.get("temporal")
        heads = self.out_channels // self.head_dim
        Resnet, TempConv, SpatialT, TemporalT = _sub_layers(self.remat)
        outputs = []
        out_sums = []
        cur = in_sums
        for i in range(self.num_layers):
            x, rs = Resnet(
                self.out_channels, eps=self.norm_eps, groups=self.groups,
                impl=self.attn_impl, dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb, cur, True)
            entry = rs
            if self.num_frames > 1:
                x, entry = TempConv(
                    self.out_channels, impl=self.attn_impl, dtype=self.dtype,
                    name=f"temp_convs_{i}",
                )(x, self.num_frames, deterministic, True, rs)
            x, sp = SpatialT(
                heads, self.head_dim, self.cross_attention_dim,
                groups=self.groups,  # ref passes norm_num_groups=resnet_groups
                attn_impl=self.attn_impl, dtype=self.dtype, name=f"attentions_{i}",
            )(x, context, ps, entry, True)
            cur = sp
            if self.num_frames > 1:
                x, cur = TemporalT(
                    heads, self.head_dim, groups=self.groups,
                    attn_impl=self.attn_impl,
                    dtype=self.dtype, name=f"temp_attentions_{i}",
                )(x, self.num_frames, pt, _fold_frames(sp, self.num_frames),
                  True)
            outputs.append(x)
            out_sums.append(cur)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            outputs.append(x)
            out_sums.append(None)
            cur = None
        return x, outputs, out_sums, cur


class DownBlock3D(nn.Module):
    out_channels: int
    num_frames: int
    num_layers: int = 2
    norm_eps: float = 1e-5
    groups: int = 32
    add_downsample: bool = True
    attn_impl: Optional[str] = None
    deterministic: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, in_sums=None):
        deterministic = self.deterministic
        Resnet, TempConv, _, _ = _sub_layers(self.remat)
        outputs = []
        out_sums = []
        cur = in_sums
        for i in range(self.num_layers):
            x, rs = Resnet(
                self.out_channels, eps=self.norm_eps, groups=self.groups,
                impl=self.attn_impl, dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb, cur, True)
            cur = rs
            if self.num_frames > 1:
                x, cur = TempConv(
                    self.out_channels, impl=self.attn_impl, dtype=self.dtype,
                    name=f"temp_convs_{i}",
                )(x, self.num_frames, deterministic, True, rs)
            outputs.append(x)
            out_sums.append(cur)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            outputs.append(x)
            out_sums.append(None)
            cur = None
        return x, outputs, out_sums, cur


class UNetMidBlock3DCrossAttn(nn.Module):
    in_channels: int
    num_frames: int
    num_layers: int = 1
    head_dim: int = 64
    cross_attention_dim: int = 1024
    norm_eps: float = 1e-5
    groups: int = 32
    attn_impl: Optional[str] = None
    deterministic: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, pab_reuse=None, in_sums=None):
        deterministic = self.deterministic
        ps = None if pab_reuse is None else pab_reuse.get("spatial")
        pt = None if pab_reuse is None else pab_reuse.get("temporal")
        heads = self.in_channels // self.head_dim
        Resnet, TempConv, SpatialT, TemporalT = _sub_layers(self.remat)
        x, rs = Resnet(
            self.in_channels, eps=self.norm_eps, groups=self.groups,
            impl=self.attn_impl, dtype=self.dtype, name="resnets_0",
        )(x, temb, in_sums, True)
        entry = rs
        if self.num_frames > 1:
            x, entry = TempConv(
                self.in_channels, impl=self.attn_impl, dtype=self.dtype,
                name="temp_convs_0",
            )(x, self.num_frames, deterministic, True, rs)
        cur = entry
        for i in range(self.num_layers):
            x, sp = SpatialT(
                heads, self.head_dim, self.cross_attention_dim,
                groups=self.groups,  # linear proj everywhere (ref blocks default)
                attn_impl=self.attn_impl, dtype=self.dtype, name=f"attentions_{i}",
            )(x, context, ps, entry, True)
            cur = sp
            if self.num_frames > 1:
                x, cur = TemporalT(
                    heads, self.head_dim, groups=self.groups,
                    attn_impl=self.attn_impl,
                    dtype=self.dtype, name=f"temp_attentions_{i}",
                )(x, self.num_frames, pt, _fold_frames(sp, self.num_frames),
                  True)
            x, rs = Resnet(
                self.in_channels, eps=self.norm_eps, groups=self.groups,
                impl=self.attn_impl, dtype=self.dtype, name=f"resnets_{i + 1}",
            )(x, temb, cur, True)
            entry = rs
            if self.num_frames > 1:
                x, entry = TempConv(
                    self.in_channels, impl=self.attn_impl, dtype=self.dtype,
                    name=f"temp_convs_{i + 1}",
                )(x, self.num_frames, deterministic, True, rs)
            cur = entry
        return x, cur


class CrossAttnUpBlock3D(nn.Module):
    out_channels: int
    num_frames: int
    num_layers: int = 3
    head_dim: int = 64
    cross_attention_dim: int = 1024
    norm_eps: float = 1e-5
    groups: int = 32
    add_upsample: bool = True
    attn_impl: Optional[str] = None
    output_size: Optional[tuple] = None
    deterministic: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context, pab_reuse=None, in_sums=None,
                 skip_sums=None):
        # skip_sums: list parallel to ``skips`` with each skip tensor's
        # per-(b·f, c) sums (or None) — the channel concat's stats are the
        # channel concat of the parts' stats, so the resnet norm1 can skip
        # its reduce over the concatenated 90-180MB tensor.
        deterministic = self.deterministic
        ps = None if pab_reuse is None else pab_reuse.get("spatial")
        pt = None if pab_reuse is None else pab_reuse.get("temporal")
        heads = self.out_channels // self.head_dim
        Resnet, TempConv, SpatialT, TemporalT = _sub_layers(self.remat)
        cur = in_sums
        for i in range(self.num_layers):
            sk_sums = skip_sums.pop() if skip_sums else None
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x, rs = Resnet(
                self.out_channels, eps=self.norm_eps, groups=self.groups,
                impl=self.attn_impl, dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb, _concat_sums(cur, sk_sums), True)
            entry = rs
            if self.num_frames > 1:
                x, entry = TempConv(
                    self.out_channels, impl=self.attn_impl, dtype=self.dtype,
                    name=f"temp_convs_{i}",
                )(x, self.num_frames, deterministic, True, rs)
            x, sp = SpatialT(
                heads, self.head_dim, self.cross_attention_dim,
                groups=self.groups,  # ref passes norm_num_groups=resnet_groups
                attn_impl=self.attn_impl, dtype=self.dtype, name=f"attentions_{i}",
            )(x, context, ps, entry, True)
            cur = sp
            if self.num_frames > 1:
                x, cur = TemporalT(
                    heads, self.head_dim, groups=self.groups,
                    attn_impl=self.attn_impl,
                    dtype=self.dtype, name=f"temp_attentions_{i}",
                )(x, self.num_frames, pt, _fold_frames(sp, self.num_frames),
                  True)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x, self.output_size)
            cur = None
        return x, cur


class UpBlock3D(nn.Module):
    out_channels: int
    num_frames: int
    num_layers: int = 3
    norm_eps: float = 1e-5
    groups: int = 32
    add_upsample: bool = True
    output_size: Optional[tuple] = None
    attn_impl: Optional[str] = None
    deterministic: bool = True
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, in_sums=None, skip_sums=None):
        deterministic = self.deterministic
        Resnet, TempConv, _, _ = _sub_layers(self.remat)
        cur = in_sums
        for i in range(self.num_layers):
            sk_sums = skip_sums.pop() if skip_sums else None
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x, rs = Resnet(
                self.out_channels, eps=self.norm_eps, groups=self.groups,
                impl=self.attn_impl, dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb, _concat_sums(cur, sk_sums), True)
            cur = rs
            if self.num_frames > 1:
                x, cur = TempConv(
                    self.out_channels, impl=self.attn_impl, dtype=self.dtype,
                    name=f"temp_convs_{i}",
                )(x, self.num_frames, deterministic, True, rs)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x, self.output_size)
            cur = None
        return x, cur
