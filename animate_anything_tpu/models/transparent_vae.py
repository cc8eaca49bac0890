"""Transparent (RGBA) VAE pair — LayerDiffuse-style encoder/decoder.

Reference: /root/reference/models/layerdiffuse_VAE.py (derived from
sd-forge-layerdiffuse):

- ``LatentTransparencyOffsetEncoder``: 9-layer strided CNN mapping RGBA
  pixels → a 4-ch latent OFFSET added to the premultiplied-RGB SD latent
  (zero-init final conv ⇒ no-op at init; usage
  /root/reference/train_transparent_i2v_stage2.py:414-425);
- ``UNet384``: timestep-free 2D UNet (32/64/128/256 ch, GroupNorm(4),
  attention at the 8×-downsampled level) decoding (decoded RGB, latent) →
  RGBA; the latent enters through a zero-init 1×1 conv added before the 4th
  down block (layerdiffuse_VAE.py:68, 148-158).

NHWC; frames ride the batch axis like every 2D module here.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from animate_anything_tpu.models.layers import Downsample2D, ResnetBlock2D, Upsample2D, zero_init_conv
from animate_anything_tpu.models.vae import VAEAttentionBlock


class LatentTransparencyOffsetEncoder(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, rgba: jnp.ndarray) -> jnp.ndarray:
        """(b, h, w, 4) RGBA in [-1,1]-ish → (b, h/8, w/8, 4) latent offset."""
        specs = [(32, 1), (32, 1), (64, 2), (64, 1), (128, 2), (128, 1), (256, 2), (256, 1)]
        h = rgba.astype(self.dtype)
        for i, (ch, stride) in enumerate(specs):
            h = nn.Conv(ch, (3, 3), strides=(stride, stride), padding=1,
                        dtype=self.dtype, name=f"blocks_{2 * i}")(h)
            h = nn.silu(h)
        return zero_init_conv(4, (3, 3), dtype=self.dtype, name="blocks_16")(h)


@dataclasses.dataclass(frozen=True)
class UNet384Config:
    in_channels: int = 3
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (32, 64, 128, 256)
    layers_per_block: int = 2
    norm_num_groups: int = 4
    norm_eps: float = 1e-5
    attention_head_dim: int = 8


class UNet384(nn.Module):
    """Timestep-free decoder UNet: (rgb image, sd latent) → RGBA."""

    config: UNet384Config = UNet384Config()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, latent: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        g = cfg.norm_num_groups
        chans = cfg.block_out_channels
        n = len(chans)

        sample_latent = zero_init_conv(chans[2], (1, 1), dtype=self.dtype,
                                       name="latent_conv_in")(latent.astype(self.dtype))
        h = nn.Conv(chans[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(
            x.astype(self.dtype)
        )

        skips = [h]
        for i in range(n):
            out_ch = chans[i]
            attn = i == n - 1  # AttnDownBlock2D only at the deepest level
            if i == 3:
                h = h + sample_latent  # 8×-downsample latent injection
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(out_ch, eps=cfg.norm_eps, groups=g, dtype=self.dtype,
                                  name=f"down_blocks_{i}_resnets_{j}")(h)
                if attn:
                    h = VAEAttentionBlock(groups=g, head_dim=cfg.attention_head_dim,
                                          eps=cfg.norm_eps,
                                          dtype=self.dtype,
                                          name=f"down_blocks_{i}_attentions_{j}")(h)
                skips.append(h)
            if i < n - 1:
                h = Downsample2D(out_ch, dtype=self.dtype, name=f"down_blocks_{i}_downsample")(h)
                skips.append(h)

        h = ResnetBlock2D(chans[-1], eps=cfg.norm_eps, groups=g, dtype=self.dtype,
                          name="mid_resnets_0")(h)
        h = VAEAttentionBlock(groups=g, head_dim=cfg.attention_head_dim,
                              eps=cfg.norm_eps,
                              dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock2D(chans[-1], eps=cfg.norm_eps, groups=g, dtype=self.dtype,
                          name="mid_resnets_1")(h)

        rev = list(reversed(chans))
        for i in range(n):
            out_ch = rev[i]
            attn = i == 0  # AttnUpBlock2D first
            for j in range(cfg.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock2D(out_ch, eps=cfg.norm_eps, groups=g, dtype=self.dtype,
                                  name=f"up_blocks_{i}_resnets_{j}")(h)
                if attn:
                    h = VAEAttentionBlock(groups=g, head_dim=cfg.attention_head_dim,
                                          eps=cfg.norm_eps,
                                          dtype=self.dtype,
                                          name=f"up_blocks_{i}_attentions_{j}")(h)
            if i < n - 1:
                h = Upsample2D(out_ch, dtype=self.dtype, name=f"up_blocks_{i}_upsample")(
                    h, skips[-1].shape[1:3] if skips else None
                )

        h = nn.GroupNorm(g, epsilon=cfg.norm_eps, dtype=jnp.float32, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


def build_rgba_latents(vae, vae_params, rgba_pixels: jnp.ndarray,
                       offset_encoder: LatentTransparencyOffsetEncoder, offset_params) -> jnp.ndarray:
    """RGBA video → SD latents of premultiplied RGB + transparency offset
    (reference train_transparent_i2v_stage2.py:400-426).

    rgba_pixels: (b, f, h, w, 4) in [-1, 1]; alpha channel in [-1,1] too.
    """
    from animate_anything_tpu.models.vae import encode_video

    rgb = rgba_pixels[..., :3]
    alpha01 = (rgba_pixels[..., 3:] + 1.0) / 2.0
    premul = rgb * alpha01  # premultiplied RGB against black
    latents = encode_video(vae, vae_params, premul)
    b, f, h, w, c = latents.shape
    flat_rgba = rgba_pixels.reshape(b * f, *rgba_pixels.shape[2:])
    offset = offset_encoder.apply(offset_params, flat_rgba)
    return latents + offset.reshape(b, f, h, w, c)


def decode_rgba_video(unet384: UNet384, unet384_params, decoded_rgb: jnp.ndarray,
                      latents: jnp.ndarray) -> jnp.ndarray:
    """Per-frame transparent decode → (b, f, h, w, 4) uint8-style RGBA with
    alpha binarized at 127 and fg rescaled to [0,255]
    (reference pipeline_stage2.py:290-318)."""
    b, f, h, w, _ = decoded_rgb.shape
    x = decoded_rgb.reshape(b * f, h, w, 3)
    lat = latents.reshape(b * f, *latents.shape[2:])
    rgba = unet384.apply(unet384_params, x, lat)
    rgba = rgba.reshape(b, f, h, w, 4)
    alpha = jnp.where(rgba[..., 3:] * 255.0 > 127.0, 255.0, 0.0)
    fg = jnp.clip((rgba[..., :3] + 1.0) * 127.5, 0, 255)
    return jnp.concatenate([fg, alpha], axis=-1)
