"""Spatio-temporal UNet for the SVD (Stable Video Diffusion) workload.

The reference finetunes diffusers' ``UNetSpatioTemporalConditionModel`` with a
mask-extended 9-ch input (/root/reference/train_svd.py:93-103, 412-416). This
is a from-scratch flax implementation of that architecture:

- every resnet is a SpatioTemporalResBlock: spatial resnet → temporal resnet
  (frame-axis conv pair) → learned AlphaBlender mix;
- every transformer is a TransformerSpatioTemporalModel: spatial attention
  block + temporal attention block over frames (with a frame-position
  embedding and a learned mix), cross-attending to the CLIP image embedding;
- micro-conditioning ``added_time_ids`` (fps, motion_bucket, noise_aug —
  train_svd.py:418-421) enters through a second embedding added to the time
  embedding;
- channels 320/640/1280/1280, heads 5/10/20/20, cross dim 1024, in 8 or 9 ch
  (mask channel FIRST when present, matching the reference concat order
  train_svd.py:414-416: [mask, c_in·noisy, condition]).

Same NHWC frame-major layout as unet3d; ``image_only_indicator`` is the
all-zero video case (the reference never trains image-only batches).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from animate_anything_tpu.models.attention import BasicTransformerBlock, CrossAttention, GEGLUFeedForward
from animate_anything_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Upsample2D,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class SVDUNetConfig:
    in_channels: int = 8                      # 9 with motion mask
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    projection_class_embeddings_input_dim: int = 768  # 3 ids × 256
    addition_time_embed_dim: int = 256
    norm_eps: float = 1e-5
    attn_impl: Optional[str] = None
    gradient_checkpointing: bool = False

    @classmethod
    def tiny(cls, **kw) -> "SVDUNetConfig":
        d = dict(
            block_out_channels=(32, 64, 64, 64),
            num_attention_heads=(2, 4, 4, 4),
            cross_attention_dim=32,
            addition_time_embed_dim=8,
            projection_class_embeddings_input_dim=24,
        )
        d.update(kw)
        return cls(**d)


class TemporalResnetBlock(nn.Module):
    """Frame-axis resnet: two GN→SiLU→(3,1,1)-conv stages with a mid
    time-embedding bias. Both stages run through ops/temporal_conv.py
    (explicit-tap MXU matmuls; fused pallas pass under impl='pallas' —
    the XLA (3,1)-conv form it replaces tiled the thin frame window 3-4×
    slower on v5e). Param tree identical to the GroupNorm/nn.Conv(3,1)
    composite (norm1/conv1/time_emb_proj/norm2/conv2)."""

    out_channels: int
    impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray, num_frames: int):
        from animate_anything_tpu.models.layers import _GNParams, _TapConvParams
        from animate_anything_tpu.ops.temporal_conv import gn_silu_tap_conv

        # x: (b*f, h, w, c); temb: (b*f, d)
        bf, hh, ww, c = x.shape
        b = bf // num_frames
        h = x.reshape(b, num_frames, hh * ww, c).astype(self.dtype)
        identity = h

        gs1, gb1 = _GNParams(c, name="norm1")()
        w1, wb1 = _TapConvParams(c, self.out_channels, name="conv1")()
        h = gn_silu_tap_conv(h, gs1, gb1, w1[:, 0].astype(self.dtype),
                             wb1, groups=32, eps=1e-6, impl=self.impl)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t.reshape(b, num_frames, 1, self.out_channels)
        gs2, gb2 = _GNParams(self.out_channels, name="norm2")()
        w2, wb2 = _TapConvParams(self.out_channels, self.out_channels, name="conv2")()
        h = gn_silu_tap_conv(h, gs2, gb2, w2[:, 0].astype(self.dtype),
                             wb2, groups=32, eps=1e-6, residual=identity,
                             impl=self.impl)
        return h.reshape(bf, hh, ww, c)


class AlphaBlender(nn.Module):
    """Learned scalar spatial/temporal mix: α=sigmoid(mix_factor);
    out = α·spatial + (1-α)·temporal (diffusers merge_strategy='learned')."""

    @nn.compact
    def __call__(self, x_spatial, x_temporal):
        mix = self.param("mix_factor", nn.initializers.constant(0.5), (1,))
        alpha = jax.nn.sigmoid(mix[0]).astype(x_spatial.dtype)
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class SpatioTemporalResBlock(nn.Module):
    out_channels: int
    num_frames: int
    eps: float = 1e-6
    impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = ResnetBlock2D(self.out_channels, eps=self.eps, dtype=self.dtype,
                          name="spatial_res_block")(x, temb)
        if self.num_frames > 1:
            ht = TemporalResnetBlock(self.out_channels, impl=self.impl,
                                     dtype=self.dtype,
                                     name="temporal_res_block")(h, temb, self.num_frames)
            h = AlphaBlender(name="time_mixer")(h, ht)
        return h


class BroadcastCrossAttention(nn.Module):
    """Cross-attention from (b, f, s, c) queries to a per-batch context
    (b, L, ctx) without any layout transpose: scores are one einsum with
    M = f·s on the MXU. Param tree identical to CrossAttention
    (to_q/to_k/to_v/to_out_0)."""

    heads: int
    head_dim: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, f, s, c = x.shape
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        q = q.reshape(b, f, s, self.heads, self.head_dim)
        k = k.reshape(b, -1, self.heads, self.head_dim)
        v = v.reshape(b, -1, self.heads, self.head_dim)
        scores = jnp.einsum("bfshd,blhd->bfshl", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (1.0 / self.head_dim ** 0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bfshl,blhd->bfshd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, f, s, inner)
        return nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)


class TemporalBasicTransformerBlock(nn.Module):
    """Temporal transformer block (diffusers): ff_in → self-attn over frames →
    cross-attn to the image/text context → ff.

    Computed transpose-free on the (b, f, h·w, c) view; with
    attn_impl='pallas', norm1+attn1 run as the fused packed kernel
    (ops/temporal_block.py). Param tree matches the (b·hw, f, c)
    formulation it replaced."""

    heads: int
    head_dim: int
    context_dim: int
    attn_impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        from animate_anything_tpu.models.attention import (
            TemporalSelfAttention, _GEGLUParams, _LNParams, _TemporalAttnParams)
        from animate_anything_tpu.ops.geglu import ln_geglu_ff
        from animate_anything_tpu.ops.temporal_block import (
            fused_ok, fused_temporal_attn_block, pack_frames, pack_geometry,
            unpack_frames)

        # x: (b, f, s, c); context: (b, L, context_dim)
        b, f, s, c = x.shape
        inner = self.heads * self.head_dim
        if self.attn_impl == "pallas":
            si, bi = _LNParams(c, name="norm_in")()
            w1, bb1, w2, bb2 = _GEGLUParams(c, name="ff_in")()
            x = ln_geglu_ff(x.astype(self.dtype), si, bi, w1, bb1, w2, bb2,
                            impl="pallas")
        else:
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_in")(x)
            x = x + GEGLUFeedForward(dtype=self.dtype, name="ff_in")(h.astype(self.dtype))

        if self.attn_impl == "pallas" and fused_ok(f, inner, self.heads, self.head_dim) and inner == c:
            geom = pack_geometry(f, s)
            s1, b1 = _LNParams(c, name="norm1")()
            wq, wk, wv, wo, bo = _TemporalAttnParams(c, c, name="attn1")()
            xp = pack_frames(x.astype(self.dtype), geom)
            xp = fused_temporal_attn_block(
                xp, s1, b1, wq, wk, wv, wo, bo, geom=geom,
                heads=self.heads, head_dim=self.head_dim)
            x = unpack_frames(xp, geom)
        else:
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
            x = x + TemporalSelfAttention(
                self.heads, self.head_dim, attn_impl=self.attn_impl,
                dtype=self.dtype, name="attn1")(h.astype(self.dtype))

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        x = x + BroadcastCrossAttention(
            self.heads, self.head_dim, context_dim=self.context_dim,
            dtype=self.dtype, name="attn2")(h.astype(self.dtype), context)

        if self.attn_impl == "pallas":
            s3, b3 = _LNParams(c, name="norm3")()
            w1, bb1, w2, bb2 = _GEGLUParams(c, name="ff")()
            return ln_geglu_ff(x.astype(self.dtype), s3, b3, w1, bb1, w2, bb2,
                               impl="pallas")
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x)
        return x + GEGLUFeedForward(dtype=self.dtype, name="ff")(h.astype(self.dtype))


class TransformerSpatioTemporalModel(nn.Module):
    heads: int
    head_dim: int
    context_dim: int
    num_frames: int
    num_layers: int = 1
    attn_impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, pab_reuse=None):
        # pab_reuse: traced bool — reuse this module's cached residual delta
        # instead of recomputing (PAB step caching; see
        # models/attention.py::SpatialTransformer)
        if pab_reuse is None:
            return self._delta(x, context) + x
        cache = self.variable("pab", "delta", jnp.zeros, x.shape, self.dtype)

        def compute(mdl, x_, ctx):
            return mdl._delta(x_, ctx)

        def reuse(mdl, x_, ctx):
            _ = mdl._delta(x_, ctx)   # same variable structure; DCE'd branch
            return cache.value

        delta = nn.cond(pab_reuse, reuse, compute, self, x, context)
        cache.value = delta
        return delta + x

    def _delta(self, x, context):
        # x: (b*f, h, w, c); context: (b, 1, context_dim) image embedding
        bf, hh, ww, c = x.shape
        f = self.num_frames
        b = bf // f
        inner = self.heads * self.head_dim

        h = nn.GroupNorm(32, epsilon=1e-6, dtype=jnp.float32, name="norm")(x)
        h = h.reshape(bf, hh * ww, c)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)

        ctx_spatial = jnp.repeat(context.astype(self.dtype), f, axis=0)      # (bf,1,d)
        ctx_temporal = context.astype(self.dtype)                            # (b,L,d)

        # frame-position embedding added before the temporal block
        # (diffusers TimestepEmbedding(inner, inner*4, out_dim=inner))
        f_emb = timestep_embedding(jnp.arange(f, dtype=jnp.float32), inner).astype(self.dtype)
        f_emb = TimestepEmbedding(inner * 4, out_dim=inner, dtype=self.dtype,
                                  name="time_pos_embed")(f_emb)

        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                self.heads, self.head_dim, context_dim=self.context_dim,
                attn_impl=self.attn_impl, dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, ctx_spatial)
            if f > 1:
                # transpose-free: the temporal block works on (b, f, hw, c)
                hm = h.reshape(b, f, hh * ww, inner) + f_emb[None, :, None, :]
                hm = TemporalBasicTransformerBlock(
                    self.heads, self.head_dim, context_dim=self.context_dim,
                    attn_impl=self.attn_impl, dtype=self.dtype,
                    name=f"temporal_transformer_blocks_{i}",
                )(hm, ctx_temporal)
                hm = hm.reshape(bf, hh * ww, inner)
                h = AlphaBlender(name=f"time_mixer_{i}")(h, hm)

        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(bf, hh, ww, c)


class UNetSpatioTemporalConditionModel(nn.Module):
    config: SVDUNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,          # (b, f, h, w, in_ch)
        timestep: jnp.ndarray,        # () or (b,) — continuous c_noise for EDM
        encoder_hidden_states: jnp.ndarray,  # (b, 1, 1024) CLIP image embedding
        added_time_ids: jnp.ndarray,  # (b, 3) fps/motion_bucket/noise_aug
        pab_reuse: Optional[jnp.ndarray] = None,  # traced bool: PAB reuse
    ) -> jnp.ndarray:
        cfg = self.config
        b, f, hh, ww, _ = sample.shape
        ch0 = cfg.block_out_channels[0]
        time_embed_dim = ch0 * 4

        # time + micro-conditioning embeddings (fp32 sinusoids)
        timesteps = jnp.broadcast_to(jnp.atleast_1d(timestep), (b,))
        t_emb = timestep_embedding(timesteps, ch0).astype(self.dtype)
        emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)
        add_emb = timestep_embedding(
            added_time_ids.reshape(-1).astype(jnp.float32), cfg.addition_time_embed_dim
        ).reshape(b, -1).astype(self.dtype)
        emb = emb + TimestepEmbedding(time_embed_dim, dtype=self.dtype, name="add_embedding")(add_emb)
        emb = jnp.repeat(emb, f, axis=0)

        x = sample.reshape(b * f, hh, ww, cfg.in_channels)
        x = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)

        heads = cfg.num_attention_heads
        head_dims = [c // h for c, h in zip(cfg.block_out_channels, heads)]

        # per-sub-layer gradient checkpointing (reference: torch
        # checkpointing inside UNetSpatioTemporalConditionModel via
        # unet.enable_gradient_checkpointing(), train_svd.py) — frame count
        # and geometry are module attributes, so the remat'd calls take only
        # array arguments
        Res = (nn.remat(SpatioTemporalResBlock)
               if cfg.gradient_checkpointing else SpatioTemporalResBlock)
        Attn = (nn.remat(TransformerSpatioTemporalModel)
                if cfg.gradient_checkpointing else TransformerSpatioTemporalModel)

        def res_block(out_ch, name):
            return Res(out_ch, f, eps=cfg.norm_eps, impl=cfg.attn_impl,
                       dtype=self.dtype, name=name)

        def attn_block(idx, name):
            return Attn(
                heads[idx], head_dims[idx], cfg.cross_attention_dim, f,
                attn_impl=cfg.attn_impl, dtype=self.dtype, name=name,
            )

        # down
        skips = [x]
        n_blocks = len(cfg.block_out_channels)
        for i in range(n_blocks):
            out_ch = cfg.block_out_channels[i]
            has_attn = i < n_blocks - 1
            for j in range(cfg.layers_per_block):
                x = res_block(out_ch, f"down_blocks_{i}_resnets_{j}")(x, emb)
                if has_attn:
                    x = attn_block(i, f"down_blocks_{i}_attentions_{j}")(x, encoder_hidden_states, pab_reuse)
                skips.append(x)
            if i < n_blocks - 1:
                x = Downsample2D(out_ch, dtype=self.dtype,
                                 name=f"down_blocks_{i}_downsample")(x)
                skips.append(x)

        # mid
        x = res_block(cfg.block_out_channels[-1], "mid_resnets_0")(x, emb)
        x = attn_block(n_blocks - 1, "mid_attentions_0")(x, encoder_hidden_states, pab_reuse)
        x = res_block(cfg.block_out_channels[-1], "mid_resnets_1")(x, emb)

        # up
        rev = list(reversed(cfg.block_out_channels))
        for i in range(n_blocks):
            out_ch = rev[i]
            has_attn = i > 0
            n_layers = cfg.layers_per_block + 1
            for j in range(n_layers):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = res_block(out_ch, f"up_blocks_{i}_resnets_{j}")(x, emb)
                if has_attn:
                    x = attn_block(n_blocks - 1 - i, f"up_blocks_{i}_attentions_{j}")(x, encoder_hidden_states, pab_reuse)
            if i < n_blocks - 1:
                output_size = skips[-1].shape[1:3] if skips else None
                x = Upsample2D(out_ch, dtype=self.dtype,
                               name=f"up_blocks_{i}_upsample")(x, output_size)

        x = nn.GroupNorm(32, epsilon=cfg.norm_eps, dtype=jnp.float32, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x.reshape(b, f, hh, ww, cfg.out_channels)
