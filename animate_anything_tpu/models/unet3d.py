"""Mask + motion-strength conditioned 3D UNet (the flagship denoiser).

TPU-native re-implementation of the reference's ``UNet3DConditionModel``
(/root/reference/models/unet_3d_condition_mask.py). Conditioning semantics are
identical:

- the first-frame latent is concatenated along the FRAME axis and the output
  strips frame 0 (ref :376, :522);
- the motion mask is concatenated along the CHANNEL axis into a 5-ch input
  consumed by a second input conv ``conv_in2`` (ref :140-142, :424-428);
- scalar motion strength is embedded through a second sinusoidal projector and
  fed as the conditioning projection of the time embedding (ref :156-161,
  :414-419; the reference also defines an unused ``motion_embedding`` MLP —
  intentionally not reproduced);
- text states are repeated per frame for cross-attention (ref :421).

Layout is NHWC with a fused (b·(f+1), h, w, c) spatial batch; temporal modules
view it as (b, f+1, …). All shapes are static under jit; CFG is an ordinary
batch doubling by the caller.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from animate_anything_tpu.models.attention import TemporalTransformer
from animate_anything_tpu.models.layers import TimestepEmbedding, timestep_embedding
from animate_anything_tpu.models.unet3d_blocks import (
    CrossAttnDownBlock3D,
    CrossAttnUpBlock3D,
    DownBlock3D,
    UNetMidBlock3DCrossAttn,
    UpBlock3D,
)


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "DownBlock3D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock3D",
        "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64
    motion_mask: bool = False
    motion_strength: bool = False
    # 'frame_concat' (default): condition latent joins the FRAME axis and the
    # output strips frame 0 (ref unet_3d_condition_mask.py:376,522).
    # 'channel_concat': the caller channel-concatenates the condition (the
    # stage-2 9-ch variant, ref pipeline_stage2.py:416) — no frame concat.
    condition_mode: str = "frame_concat"
    attn_impl: Optional[str] = None
    gradient_checkpointing: bool = False

    @classmethod
    def tiny(cls, **kw) -> "UNet3DConfig":
        """Test-size config (same graph, 8× narrower)."""
        defaults = dict(
            block_out_channels=(32, 64, 64, 64),
            cross_attention_dim=32,
            attention_head_dim=8,
            norm_num_groups=8,
        )
        defaults.update(kw)
        return cls(**defaults)


class UNet3DConditionModel(nn.Module):
    config: UNet3DConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,                 # (b, f, h, w, c_in)
        timestep: jnp.ndarray,               # () or (b,)
        encoder_hidden_states: jnp.ndarray,  # (b, seq, cross_dim)
        condition_latent: jnp.ndarray,       # (b, 1, h, w, c_in)
        mask: Optional[jnp.ndarray] = None,  # (b, 1, h, w, 1), 1 = may move
        motion: Optional[jnp.ndarray] = None,  # (b,) scalar strength
        deterministic: bool = True,
        pab_reuse: Optional[dict] = None,    # {'spatial','temporal'}: traced
                                             # bools — reuse cached attention
                                             # deltas this step (PAB caching)
    ) -> jnp.ndarray:
        cfg = self.config
        ch0 = cfg.block_out_channels[0]
        time_embed_dim = ch0 * 4

        # 1. frame-axis condition concat: f → f+1, output strips frame 0
        frame_concat = cfg.condition_mode == "frame_concat"
        if frame_concat:
            sample = jnp.concatenate([condition_latent.astype(sample.dtype), sample], axis=1)
        elif condition_latent is not None:
            cond = jnp.broadcast_to(
                condition_latent.astype(sample.dtype),
                sample.shape[:-1] + condition_latent.shape[-1:],
            )
            sample = jnp.concatenate([cond, sample], axis=-1)
        b, nf, hh, ww, _ = sample.shape

        # 2. time (+ motion-strength) embedding — fp32 sinusoids
        timesteps = jnp.broadcast_to(jnp.atleast_1d(timestep), (b,))
        t_emb = timestep_embedding(timesteps, ch0).astype(self.dtype)
        cond = None
        if cfg.motion_strength and motion is not None:
            cond = timestep_embedding(jnp.broadcast_to(jnp.atleast_1d(motion), (b,)), ch0)
            cond = cond.astype(self.dtype)
        emb = TimestepEmbedding(
            time_embed_dim,
            cond_proj_dim=ch0 if cfg.motion_strength else None,
            dtype=self.dtype,
            name="time_embedding",
        )(t_emb, cond)
        emb = jnp.repeat(emb, nf, axis=0)                       # (b·nf, 1280)
        context = jnp.repeat(encoder_hidden_states.astype(self.dtype), nf, axis=0)

        # 3. input conv (5-ch masked path via conv_in2, else conv_in)
        if cfg.motion_mask and mask is None:
            raise ValueError(
                "motion_mask model requires a mask (pass all-ones to animate "
                "everything — the reference eval does the same, train.py:750-758)"
            )
        if cfg.motion_mask:
            m = jnp.broadcast_to(mask.astype(sample.dtype), (b, nf) + mask.shape[2:])
            # mask channel FIRST (reference cat([mask, sample], dim=channel),
            # unet_3d_condition_mask.py:425) → conv_in2 weights import 1:1
            x = jnp.concatenate([m, sample], axis=-1)
            x = x.reshape(b * nf, hh, ww, x.shape[-1])
            x = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in2")(x)
        else:
            x = sample.reshape(b * nf, hh, ww, sample.shape[-1])
            x = nn.Conv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)

        # Producer-epilogue GN sums ride alongside activations between blocks
        # (the `sums`/`*_sums` plumbing): each pallas producer (fused temp
        # conv, fused transformer output) emits per-(b·f, c) (Σ, Σ²) that the
        # next GroupNorm consumes, so no XLA reduce (which prefers the
        # transposed {3,0,2,1} layout, fighting the pallas calls' required
        # {3,2,1,0} and generating ~4.9 GB/step of relayout copies — r4 HLO)
        # ever reads a hot activation.
        cur_sums = None
        if nf > 1:
            x, cur_sums = TemporalTransformer(
                8, cfg.attention_head_dim, attn_impl=cfg.attn_impl,
                dtype=self.dtype, name="transformer_in",
            )(x, nf, None if pab_reuse is None else pab_reuse.get("temporal"),
              None, True)

        # checkpointing is applied per sub-layer INSIDE the blocks via
        # remat= (the reference's granularity, unet_3d_blocks.py:32-120):
        # block-level remat keeps a whole block's backward transients live
        # at once and was the HBM peak of 512px training.
        # 4. down
        skips = [x]
        skip_sums = [cur_sums]
        down_out = ch0
        for i, block_type in enumerate(cfg.down_block_types):
            down_out = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            if block_type == "CrossAttnDownBlock3D":
                x, outs, outs_sums, cur_sums = CrossAttnDownBlock3D(
                    out_channels=down_out,
                    remat=cfg.gradient_checkpointing,
                    num_frames=nf,
                    num_layers=cfg.layers_per_block,
                    head_dim=cfg.attention_head_dim,
                    cross_attention_dim=cfg.cross_attention_dim,
                    norm_eps=cfg.norm_eps,
                    groups=cfg.norm_num_groups,
                    add_downsample=not is_final,
                    attn_impl=cfg.attn_impl,
                    deterministic=deterministic,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(x, emb, context, pab_reuse, cur_sums)
            elif block_type == "DownBlock3D":
                x, outs, outs_sums, cur_sums = DownBlock3D(
                    out_channels=down_out,
                    remat=cfg.gradient_checkpointing,
                    num_frames=nf,
                    num_layers=cfg.layers_per_block,
                    norm_eps=cfg.norm_eps,
                    groups=cfg.norm_num_groups,
                    add_downsample=not is_final,
                    attn_impl=cfg.attn_impl,
                    deterministic=deterministic,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(x, emb, cur_sums)
            else:
                raise ValueError(block_type)
            skips.extend(outs)
            skip_sums.extend(outs_sums)

        # 5. mid
        x, cur_sums = UNetMidBlock3DCrossAttn(
            in_channels=cfg.block_out_channels[-1],
            remat=cfg.gradient_checkpointing,
            num_frames=nf,
            head_dim=cfg.attention_head_dim,
            cross_attention_dim=cfg.cross_attention_dim,
            norm_eps=cfg.norm_eps,
            groups=cfg.norm_num_groups,
            attn_impl=cfg.attn_impl,
            deterministic=deterministic,
            dtype=self.dtype,
            name="mid_block",
        )(x, emb, context, pab_reuse, cur_sums)

        # 6. up (skip concat; upsample size tracked from the skip stack so odd
        # input sizes round-trip exactly — analog of the reference's
        # forward_upsample_size, unet_3d_condition_mask.py:485-490)
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            is_final = i == len(cfg.up_block_types) - 1
            n_layers = cfg.layers_per_block + 1
            block_skips = skips[-n_layers:]
            del skips[-n_layers:]
            block_skip_sums = skip_sums[-n_layers:]
            del skip_sums[-n_layers:]
            output_size = skips[-1].shape[1:3] if skips else None
            if block_type == "CrossAttnUpBlock3D":
                x, cur_sums = CrossAttnUpBlock3D(
                    out_channels=rev_channels[i],
                    remat=cfg.gradient_checkpointing,
                    num_frames=nf,
                    num_layers=n_layers,
                    head_dim=cfg.attention_head_dim,
                    cross_attention_dim=cfg.cross_attention_dim,
                    norm_eps=cfg.norm_eps,
                    groups=cfg.norm_num_groups,
                    add_upsample=not is_final,
                    attn_impl=cfg.attn_impl,
                    output_size=output_size,
                    deterministic=deterministic,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )(x, block_skips, emb, context, pab_reuse, cur_sums,
                  block_skip_sums)
            elif block_type == "UpBlock3D":
                x, cur_sums = UpBlock3D(
                    out_channels=rev_channels[i],
                    remat=cfg.gradient_checkpointing,
                    num_frames=nf,
                    num_layers=n_layers,
                    norm_eps=cfg.norm_eps,
                    groups=cfg.norm_num_groups,
                    add_upsample=not is_final,
                    output_size=output_size,
                    attn_impl=cfg.attn_impl,
                    deterministic=deterministic,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )(x, block_skips, emb, cur_sums, block_skip_sums)
            else:
                raise ValueError(block_type)

        # 7. out
        from animate_anything_tpu.models.layers import FusedGroupNorm

        x = FusedGroupNorm(cfg.norm_num_groups, cfg.norm_eps, silu=True,
                           dtype=self.dtype, name="conv_norm_out")(x, cur_sums)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)

        x = x.reshape(b, nf, x.shape[1], x.shape[2], cfg.out_channels)
        return x[:, 1:] if frame_concat else x  # strip the condition frame (ref :522)
