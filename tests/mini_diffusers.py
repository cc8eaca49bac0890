"""Minimal torch re-implementation of the diffusers-0.24 modules the
reference UNet imports, faithful in MATH and STATE-DICT KEY GRAMMAR.

Purpose: the environment has torch (CPU) but not diffusers, so the reference's
own `models/unet_3d_condition_mask.py` / `models/unet_3d_blocks.py`
(/root/reference) cannot run as a numerical oracle by themselves. Installing
this module under the ``diffusers`` name (see ``install()``) lets the
reference's *unmodified* block-wiring code execute on torch CPU — the
strongest available proxy for real-checkpoint parity in a zero-egress image
(VERDICT r1, Missing #3): the oracle drives the exact call graph and key
names our importer (utils/import_torch.py) must understand.

Implementations follow the public diffusers 0.24.0 sources (Apache-2.0) by
behavior: class/attribute names define the state-dict keys; forward math is
the documented module math. No reference code is copied.
"""

from __future__ import annotations

import math
import sys
import types
from typing import Optional

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------------
# configuration_utils / modeling_utils / utils
# --------------------------------------------------------------------------

class _Config(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def register_to_config(init):
    import functools
    import inspect

    @functools.wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        init(self, *args, **kwargs)
        # after init: nn.Module attributes must not be set pre-__init__
        self._internal_dict = _Config(cfg)

    return wrapper


class ConfigMixin:
    @property
    def config(self):
        return getattr(self, "_internal_dict", _Config())


class ModelMixin(nn.Module):
    _supports_gradient_checkpointing = False

    @property
    def dtype(self) -> torch.dtype:
        for p in self.parameters():
            return p.dtype
        return torch.float32

    @property
    def device(self) -> torch.device:
        for p in self.parameters():
            return p.device
        return torch.device("cpu")


class BaseOutput:
    """Attribute container (diffusers returns dataclass-like outputs with a
    ``.sample`` field; only attribute access is exercised)."""

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)

    # dataclass-decorator compatibility: @dataclass over a BaseOutput subclass
    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)


# the reference decorates `class UNet3DConditionOutput(BaseOutput)` with
# @dataclass — plain dataclass machinery works on this base.


class _Logging:
    @staticmethod
    def get_logger(name=None):
        import logging

        return logging.getLogger(name or "diffusers")


# --------------------------------------------------------------------------
# embeddings
# --------------------------------------------------------------------------

def get_timestep_embedding(
    timesteps: torch.Tensor,
    embedding_dim: int,
    flip_sin_to_cos: bool = False,
    downscale_freq_shift: float = 1,
    scale: float = 1,
    max_period: int = 10000,
) -> torch.Tensor:
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * torch.arange(
        half_dim, dtype=torch.float32, device=timesteps.device
    )
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = torch.exp(exponent)
    emb = timesteps[:, None].float() * emb[None, :]
    emb = scale * emb
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
    if embedding_dim % 2 == 1:
        emb = F.pad(emb, (0, 1, 0, 0))
    return emb


class Timesteps(nn.Module):
    def __init__(self, num_channels: int, flip_sin_to_cos: bool, downscale_freq_shift: float):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift

    def forward(self, timesteps):
        return get_timestep_embedding(
            timesteps, self.num_channels,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.downscale_freq_shift,
        )


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels: int, time_embed_dim: int, act_fn: str = "silu",
                 out_dim: int = None, post_act_fn: Optional[str] = None,
                 cond_proj_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        if cond_proj_dim is not None:
            self.cond_proj = nn.Linear(cond_proj_dim, in_channels, bias=False)
        else:
            self.cond_proj = None
        assert act_fn == "silu"
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim)

    def forward(self, sample, condition=None):
        if condition is not None:
            sample = sample + self.cond_proj(condition)
        sample = self.linear_1(sample)
        sample = self.act(sample)
        sample = self.linear_2(sample)
        return sample


# --------------------------------------------------------------------------
# resnet: ResnetBlock2D / TemporalConvLayer / Downsample2D / Upsample2D
# --------------------------------------------------------------------------

class ResnetBlock2D(nn.Module):
    def __init__(self, *, in_channels, out_channels=None, conv_shortcut=False,
                 dropout=0.0, temb_channels=512, groups=32, groups_out=None,
                 pre_norm=True, eps=1e-6, non_linearity="swish",
                 time_embedding_norm="default", output_scale_factor=1.0,
                 use_in_shortcut=None, **unused):
        super().__init__()
        out_channels = in_channels if out_channels is None else out_channels
        self.output_scale_factor = output_scale_factor
        self.time_embedding_norm = time_embedding_norm
        assert time_embedding_norm == "default"

        self.norm1 = nn.GroupNorm(groups, in_channels, eps=eps, affine=True)
        self.conv1 = nn.Conv2d(in_channels, out_channels, 3, padding=1)
        if temb_channels is not None:
            self.time_emb_proj = nn.Linear(temb_channels, out_channels)
        else:
            self.time_emb_proj = None
        self.norm2 = nn.GroupNorm(groups_out or groups, out_channels, eps=eps, affine=True)
        self.dropout = nn.Dropout(dropout)
        self.conv2 = nn.Conv2d(out_channels, out_channels, 3, padding=1)
        self.nonlinearity = nn.SiLU()

        self.use_in_shortcut = (
            in_channels != out_channels if use_in_shortcut is None else use_in_shortcut
        )
        self.conv_shortcut = (
            nn.Conv2d(in_channels, out_channels, 1) if self.use_in_shortcut else None
        )

    def forward(self, input_tensor, temb):
        hidden = self.norm1(input_tensor)
        hidden = self.nonlinearity(hidden)
        hidden = self.conv1(hidden)
        if temb is not None:
            temb = self.time_emb_proj(self.nonlinearity(temb))[:, :, None, None]
            hidden = hidden + temb
        hidden = self.norm2(hidden)
        hidden = self.nonlinearity(hidden)
        hidden = self.dropout(hidden)
        hidden = self.conv2(hidden)
        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return (input_tensor + hidden) / self.output_scale_factor


class TemporalConvLayer(nn.Module):
    """Pseudo-3D temporal conv (Conv3d kernel (3,1,1)); diffusers 0.24 keeps
    GroupNorm at 32 groups regardless of the block's resnet groups."""

    def __init__(self, in_dim, out_dim=None, dropout=0.0):
        super().__init__()
        out_dim = out_dim or in_dim
        self.in_dim = in_dim
        self.out_dim = out_dim

        self.conv1 = nn.Sequential(
            nn.GroupNorm(32, in_dim), nn.SiLU(),
            nn.Conv3d(in_dim, out_dim, (3, 1, 1), padding=(1, 0, 0)),
        )
        self.conv2 = nn.Sequential(
            nn.GroupNorm(32, out_dim), nn.SiLU(), nn.Dropout(dropout),
            nn.Conv3d(out_dim, in_dim, (3, 1, 1), padding=(1, 0, 0)),
        )
        self.conv3 = nn.Sequential(
            nn.GroupNorm(32, in_dim), nn.SiLU(), nn.Dropout(dropout),
            nn.Conv3d(in_dim, in_dim, (3, 1, 1), padding=(1, 0, 0)),
        )
        self.conv4 = nn.Sequential(
            nn.GroupNorm(32, in_dim), nn.SiLU(), nn.Dropout(dropout),
            nn.Conv3d(in_dim, in_dim, (3, 1, 1), padding=(1, 0, 0)),
        )
        nn.init.zeros_(self.conv4[-1].weight)
        nn.init.zeros_(self.conv4[-1].bias)

    def forward(self, hidden_states, num_frames=1):
        hidden_states = (
            hidden_states[None, :]
            .reshape((-1, num_frames) + hidden_states.shape[1:])
            .permute(0, 2, 1, 3, 4)
        )
        identity = hidden_states
        hidden_states = self.conv1(hidden_states)
        hidden_states = self.conv2(hidden_states)
        hidden_states = self.conv3(hidden_states)
        hidden_states = self.conv4(hidden_states)
        hidden_states = identity + hidden_states
        hidden_states = hidden_states.permute(0, 2, 1, 3, 4).reshape(
            (hidden_states.shape[0] * hidden_states.shape[2], -1)
            + hidden_states.shape[3:]
        )
        return hidden_states


class Downsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, out_channels=None, padding=1, name="conv"):
        super().__init__()
        out_channels = out_channels or channels
        assert use_conv
        self.padding = padding
        # diffusers stores the conv under the `conv` attribute for all names
        self.conv = nn.Conv2d(channels, out_channels, 3, stride=2, padding=padding)

    def forward(self, hidden_states, scale=1.0):
        if self.padding == 0:  # VAE encoder: asymmetric (0,1),(0,1) pad
            hidden_states = F.pad(hidden_states, (0, 1, 0, 1), mode="constant", value=0)
        return self.conv(hidden_states)


class Upsample2D(nn.Module):
    def __init__(self, channels, use_conv=False, use_conv_transpose=False,
                 out_channels=None, name="conv"):
        super().__init__()
        out_channels = out_channels or channels
        assert use_conv and not use_conv_transpose
        self.conv = nn.Conv2d(channels, out_channels, 3, padding=1)

    def forward(self, hidden_states, output_size=None, scale=1.0):
        if output_size is None:
            hidden_states = F.interpolate(hidden_states, scale_factor=2.0, mode="nearest")
        else:
            hidden_states = F.interpolate(hidden_states, size=output_size, mode="nearest")
        return self.conv(hidden_states)


# --------------------------------------------------------------------------
# attention: Attention / FeedForward / BasicTransformerBlock
# --------------------------------------------------------------------------

class Attention(nn.Module):
    def __init__(self, query_dim, cross_attention_dim=None, heads=8, dim_head=64,
                 dropout=0.0, bias=False, upcast_attention=False, out_bias=True,
                 norm_num_groups=None, residual_connection=False,
                 rescale_output_factor=1.0, eps=1e-5, upcast_softmax=False,
                 _from_deprecated_attn_block=False):
        super().__init__()
        inner_dim = dim_head * heads
        cross_attention_dim = cross_attention_dim or query_dim
        self.heads = heads
        self.scale = dim_head**-0.5
        self.residual_connection = residual_connection
        self.rescale_output_factor = rescale_output_factor
        self.group_norm = (nn.GroupNorm(norm_num_groups, query_dim, eps=eps,
                                        affine=True)
                           if norm_num_groups is not None else None)
        self.to_q = nn.Linear(query_dim, inner_dim, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim, inner_dim, bias=bias)
        self.to_out = nn.ModuleList([nn.Linear(inner_dim, query_dim, bias=out_bias),
                                     nn.Dropout(dropout)])

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, temb=None):
        # diffusers AttnProcessor semantics incl. the deprecated-attn-block
        # path: 4-D input flattens to (b, hw, c); group_norm on the
        # channel-first view; residual add + output rescale at the end
        residual = hidden_states
        input_ndim = hidden_states.ndim
        if input_ndim == 4:
            bb, cc, hh, ww = hidden_states.shape
            hidden_states = hidden_states.view(bb, cc, hh * ww).transpose(1, 2)
        if self.group_norm is not None:
            hidden_states = self.group_norm(
                hidden_states.transpose(1, 2)).transpose(1, 2)
        ctx = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        b, sq, _ = hidden_states.shape
        h = self.heads
        q = self.to_q(hidden_states)
        k = self.to_k(ctx)
        v = self.to_v(ctx)
        d = q.shape[-1] // h
        q = q.view(b, -1, h, d).transpose(1, 2)
        k = k.view(b, -1, h, d).transpose(1, 2)
        v = v.view(b, -1, h, d).transpose(1, 2)
        scores = torch.matmul(q, k.transpose(-1, -2)) * self.scale
        probs = scores.softmax(dim=-1)
        out = torch.matmul(probs, v)
        out = out.transpose(1, 2).reshape(b, sq, h * d)
        out = self.to_out[0](out)
        out = self.to_out[1](out)
        if input_ndim == 4:
            out = out.transpose(-1, -2).reshape(bb, cc, hh, ww)
        if self.residual_connection:
            out = out + residual
        return out / self.rescale_output_factor


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, hidden_states):
        hidden_states, gate = self.proj(hidden_states).chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, dim_out=None, mult=4, dropout=0.0, activation_fn="geglu"):
        super().__init__()
        inner_dim = int(dim * mult)
        dim_out = dim_out or dim
        assert activation_fn == "geglu"
        self.net = nn.ModuleList([GEGLU(dim, inner_dim), nn.Dropout(dropout),
                                  nn.Linear(inner_dim, dim_out)])

    def forward(self, hidden_states):
        for module in self.net:
            hidden_states = module(hidden_states)
        return hidden_states


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, num_attention_heads, attention_head_dim, dropout=0.0,
                 cross_attention_dim=None, activation_fn="geglu",
                 attention_bias=False, only_cross_attention=False,
                 double_self_attention=False, upcast_attention=False,
                 norm_elementwise_affine=True, **unused):
        super().__init__()
        assert not only_cross_attention
        self.norm1 = nn.LayerNorm(dim, elementwise_affine=norm_elementwise_affine)
        self.attn1 = Attention(dim, heads=num_attention_heads, dim_head=attention_head_dim,
                               dropout=dropout, bias=attention_bias,
                               upcast_attention=upcast_attention)
        if cross_attention_dim is not None or double_self_attention:
            self.norm2 = nn.LayerNorm(dim, elementwise_affine=norm_elementwise_affine)
            self.attn2 = Attention(
                dim,
                cross_attention_dim=None if double_self_attention else cross_attention_dim,
                heads=num_attention_heads, dim_head=attention_head_dim,
                dropout=dropout, bias=attention_bias, upcast_attention=upcast_attention)
        else:
            self.norm2 = None
            self.attn2 = None
        self.norm3 = nn.LayerNorm(dim, elementwise_affine=norm_elementwise_affine)
        self.ff = FeedForward(dim, dropout=dropout, activation_fn=activation_fn)

    def forward(self, hidden_states, attention_mask=None, encoder_hidden_states=None,
                encoder_attention_mask=None, timestep=None, cross_attention_kwargs=None,
                class_labels=None):
        attn_output = self.attn1(self.norm1(hidden_states))
        hidden_states = attn_output + hidden_states
        if self.attn2 is not None:
            attn_output = self.attn2(self.norm2(hidden_states),
                                     encoder_hidden_states=encoder_hidden_states)
            hidden_states = attn_output + hidden_states
        ff_output = self.ff(self.norm3(hidden_states))
        hidden_states = ff_output + hidden_states
        return hidden_states


# --------------------------------------------------------------------------
# transformer_2d / transformer_temporal
# --------------------------------------------------------------------------

class Transformer2DModel(ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(self, num_attention_heads=16, attention_head_dim=88, in_channels=None,
                 out_channels=None, num_layers=1, dropout=0.0, norm_num_groups=32,
                 cross_attention_dim=None, attention_bias=False, sample_size=None,
                 activation_fn="geglu", use_linear_projection=False,
                 only_cross_attention=False, upcast_attention=False, **unused):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.in_channels = in_channels
        self.use_linear_projection = use_linear_projection
        self.norm = nn.GroupNorm(norm_num_groups, in_channels, eps=1e-6, affine=True)
        if use_linear_projection:
            self.proj_in = nn.Linear(in_channels, inner_dim)
        else:
            self.proj_in = nn.Conv2d(in_channels, inner_dim, 1)
        self.transformer_blocks = nn.ModuleList([
            BasicTransformerBlock(
                inner_dim, num_attention_heads, attention_head_dim, dropout=dropout,
                cross_attention_dim=cross_attention_dim, activation_fn=activation_fn,
                attention_bias=attention_bias, only_cross_attention=only_cross_attention,
                upcast_attention=upcast_attention)
            for _ in range(num_layers)
        ])
        if use_linear_projection:
            self.proj_out = nn.Linear(inner_dim, in_channels)
        else:
            self.proj_out = nn.Conv2d(inner_dim, in_channels, 1)

    def forward(self, hidden_states, encoder_hidden_states=None, timestep=None,
                class_labels=None, cross_attention_kwargs=None,
                attention_mask=None, encoder_attention_mask=None, return_dict=True):
        batch, _, height, width = hidden_states.shape
        residual = hidden_states
        hidden_states = self.norm(hidden_states)
        if not self.use_linear_projection:
            hidden_states = self.proj_in(hidden_states)
            inner_dim = hidden_states.shape[1]
            hidden_states = hidden_states.permute(0, 2, 3, 1).reshape(
                batch, height * width, inner_dim)
        else:
            inner_dim = self.proj_in.in_features
            hidden_states = hidden_states.permute(0, 2, 3, 1).reshape(
                batch, height * width, inner_dim)
            hidden_states = self.proj_in(hidden_states)

        for block in self.transformer_blocks:
            hidden_states = block(hidden_states,
                                  encoder_hidden_states=encoder_hidden_states,
                                  cross_attention_kwargs=cross_attention_kwargs)

        if not self.use_linear_projection:
            hidden_states = hidden_states.reshape(batch, height, width, -1).permute(
                0, 3, 1, 2).contiguous()
            hidden_states = self.proj_out(hidden_states)
        else:
            hidden_states = self.proj_out(hidden_states)
            hidden_states = hidden_states.reshape(batch, height, width, -1).permute(
                0, 3, 1, 2).contiguous()
        output = hidden_states + residual
        if not return_dict:
            return (output,)
        return BaseOutput(sample=output)


class TransformerTemporalModel(ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(self, num_attention_heads=16, attention_head_dim=88, in_channels=None,
                 out_channels=None, num_layers=1, dropout=0.0, norm_num_groups=32,
                 cross_attention_dim=None, attention_bias=False, sample_size=None,
                 activation_fn="geglu", norm_elementwise_affine=True,
                 double_self_attention=True, **unused):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.in_channels = in_channels
        self.norm = nn.GroupNorm(norm_num_groups, in_channels, eps=1e-6, affine=True)
        self.proj_in = nn.Linear(in_channels, inner_dim)
        self.transformer_blocks = nn.ModuleList([
            BasicTransformerBlock(
                inner_dim, num_attention_heads, attention_head_dim, dropout=dropout,
                cross_attention_dim=cross_attention_dim, activation_fn=activation_fn,
                attention_bias=attention_bias,
                double_self_attention=double_self_attention,
                norm_elementwise_affine=norm_elementwise_affine)
            for _ in range(num_layers)
        ])
        self.proj_out = nn.Linear(inner_dim, in_channels)

    def forward(self, hidden_states, encoder_hidden_states=None, timestep=None,
                class_labels=None, num_frames=1, cross_attention_kwargs=None,
                return_dict=True):
        batch_frames, channel, height, width = hidden_states.shape
        batch_size = batch_frames // num_frames
        residual = hidden_states
        hidden_states = hidden_states[None, :].reshape(
            batch_size, num_frames, channel, height, width)
        hidden_states = hidden_states.permute(0, 2, 1, 3, 4)
        hidden_states = self.norm(hidden_states)
        hidden_states = hidden_states.permute(0, 3, 4, 2, 1).reshape(
            batch_size * height * width, num_frames, channel)
        hidden_states = self.proj_in(hidden_states)

        for block in self.transformer_blocks:
            hidden_states = block(hidden_states,
                                  encoder_hidden_states=encoder_hidden_states,
                                  timestep=timestep,
                                  cross_attention_kwargs=cross_attention_kwargs,
                                  class_labels=class_labels)

        hidden_states = self.proj_out(hidden_states)
        hidden_states = (
            hidden_states[None, None, :]
            .reshape(batch_size, height, width, num_frames, channel)
            .permute(0, 3, 4, 1, 2)
            .contiguous()
        )
        hidden_states = hidden_states.reshape(batch_frames, channel, height, width)
        output = hidden_states + residual
        if not return_dict:
            return (output,)
        return BaseOutput(sample=output)


# --------------------------------------------------------------------------
# unet_2d_blocks (diffusers 0.24): the timestep-optional 2D blocks the
# transparent UNet384 builds from (/root/reference/models/layerdiffuse_VAE.py
# imports UNetMidBlock2D/get_down_block/get_up_block), plus the VAE
# encoder/decoder blocks for the AutoencoderKL oracle.
# --------------------------------------------------------------------------

def _attn_block(channels, attention_head_dim, groups, eps, scale_factor=1.0):
    if attention_head_dim is None:
        attention_head_dim = channels
    return Attention(
        channels, heads=channels // attention_head_dim,
        dim_head=attention_head_dim, rescale_output_factor=scale_factor,
        eps=eps, norm_num_groups=groups, residual_connection=True, bias=True,
        upcast_softmax=True, _from_deprecated_attn_block=True)


class DownBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, temb_channels, dropout=0.0,
                 num_layers=1, resnet_eps=1e-6, resnet_act_fn="swish",
                 resnet_groups=32, add_downsample=True, downsample_padding=1):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_channels=in_channels if i == 0 else out_channels,
                          out_channels=out_channels, temb_channels=temb_channels,
                          eps=resnet_eps, groups=resnet_groups, dropout=dropout)
            for i in range(num_layers)])
        self.downsamplers = (nn.ModuleList([
            Downsample2D(out_channels, use_conv=True, out_channels=out_channels,
                         padding=downsample_padding, name="op")])
            if add_downsample else None)

    def forward(self, hidden_states, temb=None, scale=1.0):
        output_states = ()
        for resnet in self.resnets:
            hidden_states = resnet(hidden_states, temb)
            output_states += (hidden_states,)
        if self.downsamplers is not None:
            for d in self.downsamplers:
                hidden_states = d(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class AttnDownBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, temb_channels, dropout=0.0,
                 num_layers=1, resnet_eps=1e-6, resnet_act_fn="swish",
                 resnet_groups=32, attention_head_dim=1, add_downsample=True,
                 downsample_padding=1, downsample_type="conv"):
        super().__init__()
        assert downsample_type == "conv"
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_channels=in_channels if i == 0 else out_channels,
                          out_channels=out_channels, temb_channels=temb_channels,
                          eps=resnet_eps, groups=resnet_groups, dropout=dropout)
            for i in range(num_layers)])
        self.attentions = nn.ModuleList([
            _attn_block(out_channels, attention_head_dim, resnet_groups, resnet_eps)
            for _ in range(num_layers)])
        self.downsamplers = (nn.ModuleList([
            Downsample2D(out_channels, use_conv=True, out_channels=out_channels,
                         padding=downsample_padding, name="op")])
            if add_downsample else None)

    def forward(self, hidden_states, temb=None, upsample_size=None):
        output_states = ()
        for resnet, attn in zip(self.resnets, self.attentions):
            hidden_states = resnet(hidden_states, temb)
            hidden_states = attn(hidden_states)
            output_states += (hidden_states,)
        if self.downsamplers is not None:
            for d in self.downsamplers:
                hidden_states = d(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UpBlock2D(nn.Module):
    def __init__(self, in_channels, prev_output_channel, out_channels,
                 temb_channels, dropout=0.0, num_layers=1, resnet_eps=1e-6,
                 resnet_act_fn="swish", resnet_groups=32, add_upsample=True):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            res_skip_channels = in_channels if (i == num_layers - 1) else out_channels
            resnet_in_channels = prev_output_channel if i == 0 else out_channels
            resnets.append(ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=out_channels, temb_channels=temb_channels,
                eps=resnet_eps, groups=resnet_groups, dropout=dropout))
        self.resnets = nn.ModuleList(resnets)
        self.upsamplers = (nn.ModuleList([
            Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])
            if add_upsample else None)

    def forward(self, hidden_states, res_hidden_states_tuple, temb=None,
                upsample_size=None, scale=1.0):
        for resnet in self.resnets:
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = torch.cat([hidden_states, res_hidden_states], dim=1)
            hidden_states = resnet(hidden_states, temb)
        if self.upsamplers is not None:
            for u in self.upsamplers:
                hidden_states = u(hidden_states, upsample_size)
        return hidden_states


class AttnUpBlock2D(nn.Module):
    def __init__(self, in_channels, prev_output_channel, out_channels,
                 temb_channels, dropout=0.0, num_layers=1, resnet_eps=1e-6,
                 resnet_act_fn="swish", resnet_groups=32, attention_head_dim=1,
                 add_upsample=True, upsample_type="conv"):
        super().__init__()
        assert upsample_type == "conv"
        resnets, attentions = [], []
        for i in range(num_layers):
            res_skip_channels = in_channels if (i == num_layers - 1) else out_channels
            resnet_in_channels = prev_output_channel if i == 0 else out_channels
            resnets.append(ResnetBlock2D(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=out_channels, temb_channels=temb_channels,
                eps=resnet_eps, groups=resnet_groups, dropout=dropout))
            attentions.append(_attn_block(out_channels, attention_head_dim,
                                          resnet_groups, resnet_eps))
        self.resnets = nn.ModuleList(resnets)
        self.attentions = nn.ModuleList(attentions)
        self.upsamplers = (nn.ModuleList([
            Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])
            if add_upsample else None)

    def forward(self, hidden_states, res_hidden_states_tuple, temb=None,
                upsample_size=None):
        for resnet, attn in zip(self.resnets, self.attentions):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = torch.cat([hidden_states, res_hidden_states], dim=1)
            hidden_states = resnet(hidden_states, temb)
            hidden_states = attn(hidden_states)
        if self.upsamplers is not None:
            for u in self.upsamplers:
                hidden_states = u(hidden_states, upsample_size)
        return hidden_states


class UNetMidBlock2D(nn.Module):
    def __init__(self, in_channels, temb_channels, dropout=0.0, num_layers=1,
                 resnet_eps=1e-6, resnet_time_scale_shift="default",
                 resnet_act_fn="swish", resnet_groups=32, attn_groups=None,
                 resnet_pre_norm=True, add_attention=True,
                 attention_head_dim=1, output_scale_factor=1.0):
        super().__init__()
        resnet_groups = resnet_groups if resnet_groups is not None else min(in_channels // 4, 32)
        if attn_groups is None:
            attn_groups = resnet_groups if resnet_time_scale_shift == "default" else None
        resnets = [ResnetBlock2D(
            in_channels=in_channels, out_channels=in_channels,
            temb_channels=temb_channels, eps=resnet_eps, groups=resnet_groups,
            dropout=dropout)]
        attentions = []
        for _ in range(num_layers):
            if add_attention:
                attentions.append(_attn_block(in_channels, attention_head_dim,
                                              attn_groups, resnet_eps,
                                              output_scale_factor))
            else:
                attentions.append(None)
            resnets.append(ResnetBlock2D(
                in_channels=in_channels, out_channels=in_channels,
                temb_channels=temb_channels, eps=resnet_eps,
                groups=resnet_groups, dropout=dropout))
        self.attentions = nn.ModuleList(attentions)
        self.resnets = nn.ModuleList(resnets)

    def forward(self, hidden_states, temb=None):
        hidden_states = self.resnets[0](hidden_states, temb)
        for attn, resnet in zip(self.attentions, self.resnets[1:]):
            if attn is not None:
                hidden_states = attn(hidden_states, temb=temb)
            hidden_states = resnet(hidden_states, temb)
        return hidden_states


def get_down_block(down_block_type, num_layers, in_channels, out_channels,
                   temb_channels, add_downsample, resnet_eps, resnet_act_fn,
                   resnet_groups=None, attention_head_dim=None,
                   downsample_padding=None, resnet_time_scale_shift="default",
                   downsample_type=None, dropout=0.0, **unused):
    if down_block_type == "DownBlock2D":
        return DownBlock2D(in_channels, out_channels, temb_channels,
                           dropout=dropout, num_layers=num_layers,
                           resnet_eps=resnet_eps, resnet_groups=resnet_groups,
                           add_downsample=add_downsample,
                           downsample_padding=downsample_padding)
    if down_block_type == "AttnDownBlock2D":
        return AttnDownBlock2D(in_channels, out_channels, temb_channels,
                               dropout=dropout, num_layers=num_layers,
                               resnet_eps=resnet_eps, resnet_groups=resnet_groups,
                               attention_head_dim=attention_head_dim,
                               add_downsample=add_downsample,
                               downsample_padding=downsample_padding,
                               downsample_type=downsample_type or "conv")
    raise ValueError(down_block_type)


def get_up_block(up_block_type, num_layers, in_channels, out_channels,
                 prev_output_channel, temb_channels, add_upsample, resnet_eps,
                 resnet_act_fn, resnet_groups=None, attention_head_dim=None,
                 resnet_time_scale_shift="default", upsample_type=None,
                 dropout=0.0, **unused):
    if up_block_type == "UpBlock2D":
        return UpBlock2D(in_channels, prev_output_channel, out_channels,
                         temb_channels, dropout=dropout, num_layers=num_layers,
                         resnet_eps=resnet_eps, resnet_groups=resnet_groups,
                         add_upsample=add_upsample)
    if up_block_type == "AttnUpBlock2D":
        return AttnUpBlock2D(in_channels, prev_output_channel, out_channels,
                             temb_channels, dropout=dropout,
                             num_layers=num_layers, resnet_eps=resnet_eps,
                             resnet_groups=resnet_groups,
                             attention_head_dim=attention_head_dim,
                             add_upsample=add_upsample,
                             upsample_type=upsample_type or "conv")
    raise ValueError(up_block_type)


# --------------------------------------------------------------------------
# AutoencoderKL (diffusers 0.24 vae.py): the SD VAE oracle
# --------------------------------------------------------------------------

class DownEncoderBlock2D(nn.Module):
    """VAE encoder block: temb-free resnets + zero-padding downsample."""

    def __init__(self, in_channels, out_channels, dropout=0.0, num_layers=1,
                 resnet_eps=1e-6, resnet_groups=32, add_downsample=True,
                 downsample_padding=0):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_channels=in_channels if i == 0 else out_channels,
                          out_channels=out_channels, temb_channels=None,
                          eps=resnet_eps, groups=resnet_groups, dropout=dropout)
            for i in range(num_layers)])
        self.downsamplers = (nn.ModuleList([
            Downsample2D(out_channels, use_conv=True, out_channels=out_channels,
                         padding=downsample_padding, name="op")])
            if add_downsample else None)

    def forward(self, hidden_states):
        for resnet in self.resnets:
            hidden_states = resnet(hidden_states, temb=None)
        if self.downsamplers is not None:
            for d in self.downsamplers:
                hidden_states = d(hidden_states)
        return hidden_states


class UpDecoderBlock2D(nn.Module):
    def __init__(self, in_channels, out_channels, dropout=0.0, num_layers=1,
                 resnet_eps=1e-6, resnet_groups=32, add_upsample=True):
        super().__init__()
        self.resnets = nn.ModuleList([
            ResnetBlock2D(in_channels=in_channels if i == 0 else out_channels,
                          out_channels=out_channels, temb_channels=None,
                          eps=resnet_eps, groups=resnet_groups, dropout=dropout)
            for i in range(num_layers)])
        self.upsamplers = (nn.ModuleList([
            Upsample2D(out_channels, use_conv=True, out_channels=out_channels)])
            if add_upsample else None)

    def forward(self, hidden_states):
        for resnet in self.resnets:
            hidden_states = resnet(hidden_states, temb=None)
        if self.upsamplers is not None:
            for u in self.upsamplers:
                hidden_states = u(hidden_states)
        return hidden_states


class VAEEncoder(nn.Module):
    def __init__(self, in_channels=3, out_channels=4,
                 block_out_channels=(64,), layers_per_block=2,
                 norm_num_groups=32, double_z=True):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        output_channel = block_out_channels[0]
        for i, ch in enumerate(block_out_channels):
            input_channel = output_channel
            output_channel = ch
            is_final = i == len(block_out_channels) - 1
            self.down_blocks.append(DownEncoderBlock2D(
                input_channel, output_channel, num_layers=layers_per_block,
                resnet_eps=1e-6, resnet_groups=norm_num_groups,
                add_downsample=not is_final, downsample_padding=0))
        self.mid_block = UNetMidBlock2D(
            block_out_channels[-1], temb_channels=None, resnet_eps=1e-6,
            resnet_groups=norm_num_groups, attention_head_dim=None,
            add_attention=True)
        self.conv_norm_out = nn.GroupNorm(norm_num_groups,
                                          block_out_channels[-1], eps=1e-6)
        self.conv_act = nn.SiLU()
        conv_out_channels = 2 * out_channels if double_z else out_channels
        self.conv_out = nn.Conv2d(block_out_channels[-1], conv_out_channels, 3,
                                  padding=1)

    def forward(self, sample):
        sample = self.conv_in(sample)
        for block in self.down_blocks:
            sample = block(sample)
        sample = self.mid_block(sample)
        sample = self.conv_norm_out(sample)
        sample = self.conv_act(sample)
        return self.conv_out(sample)


class VAEDecoder(nn.Module):
    def __init__(self, in_channels=4, out_channels=3,
                 block_out_channels=(64,), layers_per_block=2,
                 norm_num_groups=32):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[-1], 3,
                                 padding=1)
        self.mid_block = UNetMidBlock2D(
            block_out_channels[-1], temb_channels=None, resnet_eps=1e-6,
            resnet_groups=norm_num_groups, attention_head_dim=None,
            add_attention=True)
        self.up_blocks = nn.ModuleList()
        reversed_channels = list(reversed(block_out_channels))
        output_channel = reversed_channels[0]
        for i, ch in enumerate(reversed_channels):
            prev_output_channel = output_channel
            output_channel = ch
            is_final = i == len(block_out_channels) - 1
            self.up_blocks.append(UpDecoderBlock2D(
                prev_output_channel, output_channel,
                num_layers=layers_per_block + 1, resnet_eps=1e-6,
                resnet_groups=norm_num_groups, add_upsample=not is_final))
        self.conv_norm_out = nn.GroupNorm(norm_num_groups,
                                          block_out_channels[0], eps=1e-6)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(block_out_channels[0], out_channels, 3,
                                  padding=1)

    def forward(self, sample):
        sample = self.conv_in(sample)
        sample = self.mid_block(sample)
        for block in self.up_blocks:
            sample = block(sample)
        sample = self.conv_norm_out(sample)
        sample = self.conv_act(sample)
        return self.conv_out(sample)


class AutoencoderKL(ModelMixin, ConfigMixin):
    @register_to_config
    def __init__(self, in_channels=3, out_channels=3,
                 block_out_channels=(64,), layers_per_block=1,
                 latent_channels=4, norm_num_groups=32,
                 scaling_factor=0.18215, **unused):
        super().__init__()
        self.encoder = VAEEncoder(
            in_channels=in_channels, out_channels=latent_channels,
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block,
            norm_num_groups=norm_num_groups, double_z=True)
        self.decoder = VAEDecoder(
            in_channels=latent_channels, out_channels=out_channels,
            block_out_channels=block_out_channels,
            layers_per_block=layers_per_block,
            norm_num_groups=norm_num_groups)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


# --------------------------------------------------------------------------
# sys.modules installation
# --------------------------------------------------------------------------

def install() -> None:
    """Install this module under the diffusers module names the reference
    imports (idempotent; only in-process, for tests)."""
    this = sys.modules[__name__]

    def mod(name, **attrs):
        m = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    root = mod("diffusers")
    cfgu = mod("diffusers.configuration_utils",
               ConfigMixin=ConfigMixin, register_to_config=register_to_config)
    utils = mod("diffusers.utils", BaseOutput=BaseOutput, logging=_Logging())
    models = mod("diffusers.models")
    emb = mod("diffusers.models.embeddings",
              TimestepEmbedding=TimestepEmbedding, Timesteps=Timesteps,
              get_timestep_embedding=get_timestep_embedding)
    mu = mod("diffusers.models.modeling_utils", ModelMixin=ModelMixin)
    tt = mod("diffusers.models.transformer_temporal",
             TransformerTemporalModel=TransformerTemporalModel)
    rn = mod("diffusers.models.resnet",
             Downsample2D=Downsample2D, ResnetBlock2D=ResnetBlock2D,
             TemporalConvLayer=TemporalConvLayer, Upsample2D=Upsample2D)
    t2 = mod("diffusers.models.transformer_2d", Transformer2DModel=Transformer2DModel)
    attn = mod("diffusers.models.attention",
               Attention=Attention, BasicTransformerBlock=BasicTransformerBlock,
               FeedForward=FeedForward, GEGLU=GEGLU)
    u2b = mod("diffusers.models.unet_2d_blocks",
              UNetMidBlock2D=UNetMidBlock2D, get_down_block=get_down_block,
              get_up_block=get_up_block, DownBlock2D=DownBlock2D,
              AttnDownBlock2D=AttnDownBlock2D, UpBlock2D=UpBlock2D,
              AttnUpBlock2D=AttnUpBlock2D,
              DownEncoderBlock2D=DownEncoderBlock2D,
              UpDecoderBlock2D=UpDecoderBlock2D)
    vae_mod = mod("diffusers.models.autoencoder_kl", AutoencoderKL=AutoencoderKL)
    root.models = models
    root.utils = utils
    root.configuration_utils = cfgu
    models.embeddings = emb
    models.modeling_utils = mu
    models.transformer_temporal = tt
    models.resnet = rn
    models.transformer_2d = t2
    models.attention = attn
    models.unet_2d_blocks = u2b
    models.autoencoder_kl = vae_mod
    root.AutoencoderKL = AutoencoderKL
