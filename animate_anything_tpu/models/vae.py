"""SD VAE (AutoencoderKL): pixel ↔ latent 8× codec.

The reference loads diffusers' pretrained ``AutoencoderKL`` and uses it
frame-flattened with scaling 0.18215 (``tensor_to_vae_latent``
/root/reference/utils/common.py:12-20, loaded at /root/reference/train.py:89).
This is a from-scratch flax implementation of the same architecture
(block_out_channels 128/256/512/512, 2 resnets per encoder block, mid
attention, DiagonalGaussian posterior), NHWC, video-aware:

- ``encode_video`` / ``decode_video`` fold the frame axis into the batch and
  process all frames in one MXU-saturating batch (no per-frame Python loop);
- ``decode_chunk_size``-style chunking (SVD's memory valve,
  /root/reference/models/pipeline.py:456) is unnecessary on TPU for typical
  frame counts but supported via lax.map over frame chunks for long videos.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from animate_anything_tpu.models.layers import Conv1x1, FusedGroupNorm
from animate_anything_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215

    @classmethod
    def tiny(cls, **kw) -> "VAEConfig":
        d = dict(block_out_channels=(16, 32, 32, 32), norm_num_groups=4)
        d.update(kw)
        return cls(**d)


class VAEResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # FusedGroupNorm: stats in fp32, applied as one a·x+b in the storage
        # dtype — the plain fp32 nn.GroupNorm materialized multi-GB fp32
        # intermediates at the 512² decoder levels (profiled on v5e).
        h = FusedGroupNorm(self.groups, eps=1e-6, silu=True, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = FusedGroupNorm(self.groups, eps=1e-6, silu=True, name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = Conv1x1(self.out_channels, dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttentionBlock(nn.Module):
    """Self-attention over h·w (diffusers deprecated-attn-block style
    ``Attention``: group_norm → q/k/v → attn → to_out → residual).

    ``head_dim=None`` → ONE head over all channels (the SD VAE mid-block:
    diffusers passes attention_head_dim=None ⇒ dim_head = channels).
    The transparent UNet384 passes attention_head_dim=8 ⇒ channels/8 heads
    (/root/reference/models/layerdiffuse_VAE.py:60) — heads change both the
    score shape and the softmax scale, so this must mirror diffusers."""

    groups: int = 32
    head_dim: Optional[int] = None
    eps: float = 1e-6  # diffusers plumbs resnet_eps here: 1e-6 for the SD
    # VAE mid-block, norm_eps=1e-5 for UNet384 (layerdiffuse_VAE.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        heads = 1 if self.head_dim is None else c // self.head_dim
        h = FusedGroupNorm(self.groups, eps=self.eps, name="group_norm")(x)
        h = h.reshape(b, hh * ww, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(h)
        s = hh * ww
        out = attention(
            q.reshape(b, s, heads, c // heads),
            k.reshape(b, s, heads, c // heads),
            v.reshape(b, s, heads, c // heads),
            impl="xla",
        ).reshape(b, s, c)
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return x + out.reshape(b, hh, ww, c)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = cfg.norm_num_groups
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnetBlock(ch, groups=g, dtype=self.dtype,
                                   name=f"down_blocks_{i}_resnets_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers VAE downsample: asymmetric pad (0,1),(0,1), stride 2
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down_blocks_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnetBlock(ch, groups=g, dtype=self.dtype, name="mid_resnets_0")(h)
        h = VAEAttentionBlock(groups=g, dtype=self.dtype, name="mid_attn")(h)
        h = VAEResnetBlock(ch, groups=g, dtype=self.dtype, name="mid_resnets_1")(h)
        h = FusedGroupNorm(g, eps=1e-6, silu=True, name="conv_norm_out")(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_num_groups
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = VAEResnetBlock(ch, groups=g, dtype=self.dtype, name="mid_resnets_0")(h)
        h = VAEAttentionBlock(groups=g, dtype=self.dtype, name="mid_attn")(h)
        h = VAEResnetBlock(ch, groups=g, dtype=self.dtype, name="mid_resnets_1")(h)
        rev = list(reversed(cfg.block_out_channels))
        for i, out_ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnetBlock(out_ch, groups=g, dtype=self.dtype,
                                   name=f"up_blocks_{i}_resnets_{j}")(h)
            if i < len(rev) - 1:
                b, hh, ww, c = h.shape
                # nearest 2× as broadcast+reshape (no gather lowering)
                h = jnp.broadcast_to(h[:, :, None, :, None, :],
                                     (b, hh, 2, ww, 2, c)).reshape(b, hh * 2, ww * 2, c)
                h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_blocks_{i}_upsample")(h)
        h = FusedGroupNorm(g, eps=1e-6, silu=True, name="conv_norm_out")(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = Conv1x1(2 * self.config.latent_channels, dtype=self.dtype)
        self.post_quant_conv = Conv1x1(self.config.latent_channels, dtype=self.dtype)

    def __call__(self, x, rng=None):
        mean, logvar = self.encode_moments(x)
        z = mean if rng is None else self.sample(mean, logvar, rng)
        return self.decode(z)

    def encode_moments(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    @staticmethod
    def sample(mean, logvar, rng):
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)

    def encode(self, x, rng=None):
        """Posterior mode (rng=None) or sample, scaled by scaling_factor."""
        mean, logvar = self.encode_moments(x)
        z = mean if rng is None else self.sample(mean, logvar, rng)
        return z * self.config.scaling_factor

    def decode(self, z, unscale: bool = False):
        if unscale:
            z = z / self.config.scaling_factor
        return self.decoder(self.post_quant_conv(z))


def encode_video(vae: AutoencoderKL, params, pixels: jnp.ndarray, rng=None) -> jnp.ndarray:
    """(b, f, h, w, 3) in [-1,1] → (b, f, h/8, w/8, 4) scaled latents.
    Frame-flattened batch — the TPU analog of the reference's
    ``tensor_to_vae_latent`` (/root/reference/utils/common.py:12-20)."""
    b, f, h, w, c = pixels.shape
    flat = pixels.reshape(b * f, h, w, c)
    z = vae.apply(params, flat, rng, method=AutoencoderKL.encode)
    return z.reshape(b, f, h // 8, w // 8, z.shape[-1])


def decode_video(
    vae: AutoencoderKL, params, latents: jnp.ndarray, chunk_size: int | None = None
) -> jnp.ndarray:
    """(b, f, h, w, 4) scaled latents → (b, f, 8h, 8w, 3) pixels in [-1,1].

    chunk_size bounds peak decoder memory for long videos (reference
    decode_chunk_size, /root/reference/models/pipeline.py:456)."""
    b, f, h, w, c = latents.shape
    flat = latents.reshape(b * f, h, w, c)

    def dec(z):
        return vae.apply(params, z, True, method=AutoencoderKL.decode)

    if chunk_size and chunk_size < b * f and (b * f) % chunk_size == 0:
        chunks = flat.reshape(b * f // chunk_size, chunk_size, h, w, c)
        out = jax.lax.map(dec, chunks)
        out = out.reshape(b * f, h * 8, w * 8, -1)
    else:
        out = dec(flat)
    return out.reshape(b, f, h * 8, w * 8, -1)
