"""Torch oracle for the SVD spatio-temporal UNet (VERDICT r3 next #2).

The reference loads diffusers' ``UNetSpatioTemporalConditionModel``
(/root/reference/train_svd.py:96) — a class that exists only in the absent
``diffusers`` package, so unlike the 3D UNet there is no reference source to
run directly. This module reimplements the diffusers==0.24 architecture in
torch, independently of the flax implementation in
``animate_anything_tpu/models/svd_unet.py``, with the EXACT state-dict key
layout diffusers checkpoints use (verified against
``utils/import_torch.py::_rename_svd_unet``'s key grammar, which was written
for real checkpoints). tests/test_torch_parity_svd.py imports its weights
through the production converter and pins full-forward parity.

Reuses mini_diffusers' shared building blocks (ResnetBlock2D, Attention,
BasicTransformerBlock, FeedForward, Timesteps, TimestepEmbedding,
Down/Upsample2D) — all already pinned to the reference's own torch code by
tests/test_torch_parity.py.
"""

import torch
import torch.nn as nn

import mini_diffusers as md


class TemporalResnetBlock(nn.Module):
    """diffusers.models.resnet.TemporalResnetBlock: frame-axis resnet with
    (3,1,1) conv3d stages, operating on (b, c, f, h, w)."""

    def __init__(self, in_channels, out_channels=None, temb_channels=512,
                 eps=1e-6):
        super().__init__()
        out_channels = out_channels or in_channels
        kernel_size = (3, 1, 1)
        padding = [k // 2 for k in kernel_size]
        self.norm1 = nn.GroupNorm(32, in_channels, eps=eps, affine=True)
        self.conv1 = nn.Conv3d(in_channels, out_channels, kernel_size,
                               padding=padding)
        self.time_emb_proj = (nn.Linear(temb_channels, out_channels)
                              if temb_channels is not None else None)
        self.norm2 = nn.GroupNorm(32, out_channels, eps=eps, affine=True)
        self.dropout = nn.Dropout(0.0)
        self.conv2 = nn.Conv3d(out_channels, out_channels, kernel_size,
                               padding=padding)
        self.nonlinearity = nn.SiLU()
        self.use_in_shortcut = in_channels != out_channels
        self.conv_shortcut = (nn.Conv3d(in_channels, out_channels, 1)
                              if self.use_in_shortcut else None)

    def forward(self, input_tensor, temb):
        hidden_states = self.norm1(input_tensor)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.conv1(hidden_states)
        if self.time_emb_proj is not None:
            temb = self.nonlinearity(temb)
            temb = self.time_emb_proj(temb)[:, :, :, None, None]
            temb = temb.permute(0, 2, 1, 3, 4)
            hidden_states = hidden_states + temb
        hidden_states = self.norm2(hidden_states)
        hidden_states = self.nonlinearity(hidden_states)
        hidden_states = self.dropout(hidden_states)
        hidden_states = self.conv2(hidden_states)
        if self.conv_shortcut is not None:
            input_tensor = self.conv_shortcut(input_tensor)
        return input_tensor + hidden_states


class AlphaBlender(nn.Module):
    """merge_strategy='learned_with_images' (the SVD config): per-position
    α = 1 where image_only_indicator, else sigmoid(mix_factor)."""

    def __init__(self, alpha=0.5, merge_strategy="learned_with_images",
                 switch_spatial_to_temporal_mix=False):
        super().__init__()
        self.merge_strategy = merge_strategy
        self.switch_spatial_to_temporal_mix = switch_spatial_to_temporal_mix
        if merge_strategy == "fixed":
            self.register_buffer("mix_factor", torch.Tensor([alpha]))
        else:
            self.register_parameter(
                "mix_factor", nn.Parameter(torch.Tensor([alpha])))

    def get_alpha(self, image_only_indicator, ndims):
        if self.merge_strategy == "learned":
            return torch.sigmoid(self.mix_factor)
        if self.merge_strategy == "fixed":
            return self.mix_factor
        alpha = torch.where(
            image_only_indicator.bool(),
            torch.ones(1, 1, device=image_only_indicator.device),
            torch.sigmoid(self.mix_factor)[..., None],
        )
        if ndims == 5:
            return alpha[:, None, :, None, None]
        if ndims == 3:
            return alpha.reshape(-1)[:, None, None]
        raise ValueError(ndims)

    def forward(self, x_spatial, x_temporal, image_only_indicator=None):
        alpha = self.get_alpha(image_only_indicator, x_spatial.ndim)
        alpha = alpha.to(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class SpatioTemporalResBlock(nn.Module):
    def __init__(self, in_channels, out_channels=None, temb_channels=512,
                 eps=1e-6, merge_factor=0.5):
        super().__init__()
        out_channels = out_channels or in_channels
        self.spatial_res_block = md.ResnetBlock2D(
            in_channels=in_channels, out_channels=out_channels,
            temb_channels=temb_channels, eps=eps)
        self.temporal_res_block = TemporalResnetBlock(
            out_channels, out_channels, temb_channels, eps=eps)
        self.time_mixer = AlphaBlender(
            alpha=merge_factor, merge_strategy="learned_with_images")

    def forward(self, hidden_states, temb, image_only_indicator):
        num_frames = image_only_indicator.shape[-1]
        hidden_states = self.spatial_res_block(hidden_states, temb)
        batch_frames, channels, height, width = hidden_states.shape
        batch_size = batch_frames // num_frames
        hidden_states_mix = (
            hidden_states[None, :]
            .reshape(batch_size, num_frames, channels, height, width)
            .permute(0, 2, 1, 3, 4))
        hidden_states = hidden_states_mix
        if temb is not None:
            temb = temb.reshape(batch_size, num_frames, -1)
        hidden_states = self.temporal_res_block(hidden_states, temb)
        hidden_states = self.time_mixer(
            x_spatial=hidden_states_mix, x_temporal=hidden_states,
            image_only_indicator=image_only_indicator)
        hidden_states = (hidden_states.permute(0, 2, 1, 3, 4)
                         .reshape(batch_frames, channels, height, width))
        return hidden_states


class TemporalBasicTransformerBlock(nn.Module):
    """diffusers.models.attention.TemporalBasicTransformerBlock: ff_in →
    frame-axis self-attn → cross-attn → ff, on (b·hw, f, c)."""

    def __init__(self, dim, time_mix_inner_dim, num_attention_heads,
                 attention_head_dim, cross_attention_dim=None):
        super().__init__()
        self.is_res = dim == time_mix_inner_dim
        self.norm_in = nn.LayerNorm(dim)
        self.ff_in = md.FeedForward(dim, dim_out=time_mix_inner_dim,
                                    activation_fn="geglu")
        self.norm1 = nn.LayerNorm(time_mix_inner_dim)
        self.attn1 = md.Attention(time_mix_inner_dim,
                                  heads=num_attention_heads,
                                  dim_head=attention_head_dim)
        if cross_attention_dim is not None:
            self.norm2 = nn.LayerNorm(time_mix_inner_dim)
            self.attn2 = md.Attention(time_mix_inner_dim,
                                      cross_attention_dim=cross_attention_dim,
                                      heads=num_attention_heads,
                                      dim_head=attention_head_dim)
        else:
            self.norm2 = None
            self.attn2 = None
        self.norm3 = nn.LayerNorm(time_mix_inner_dim)
        self.ff = md.FeedForward(time_mix_inner_dim, activation_fn="geglu")

    def forward(self, hidden_states, num_frames, encoder_hidden_states=None):
        batch_frames, seq_length, channels = hidden_states.shape
        batch_size = batch_frames // num_frames
        hidden_states = (hidden_states[None, :]
                         .reshape(batch_size, num_frames, seq_length, channels)
                         .permute(0, 2, 1, 3)
                         .reshape(batch_size * seq_length, num_frames, channels))
        residual = hidden_states
        hidden_states = self.norm_in(hidden_states)
        if self.is_res:
            hidden_states = self.ff_in(hidden_states) + residual
        else:
            hidden_states = self.ff_in(hidden_states)
        norm_hidden_states = self.norm1(hidden_states)
        hidden_states = self.attn1(norm_hidden_states) + hidden_states
        if self.attn2 is not None:
            norm_hidden_states = self.norm2(hidden_states)
            hidden_states = self.attn2(
                norm_hidden_states,
                encoder_hidden_states=encoder_hidden_states) + hidden_states
        norm_hidden_states = self.norm3(hidden_states)
        if self.is_res:
            hidden_states = self.ff(norm_hidden_states) + hidden_states
        else:
            hidden_states = self.ff(norm_hidden_states)
        hidden_states = (hidden_states[None, :]
                         .reshape(batch_size, seq_length, num_frames, channels)
                         .permute(0, 2, 1, 3)
                         .reshape(batch_frames, seq_length, channels))
        return hidden_states


class TransformerSpatioTemporalModel(nn.Module):
    def __init__(self, num_attention_heads=16, attention_head_dim=88,
                 in_channels=320, out_channels=None, num_layers=1,
                 cross_attention_dim=None):
        super().__init__()
        inner_dim = num_attention_heads * attention_head_dim
        self.inner_dim = inner_dim
        self.norm = nn.GroupNorm(32, in_channels, eps=1e-6, affine=True)
        self.proj_in = nn.Linear(in_channels, inner_dim)
        self.transformer_blocks = nn.ModuleList([
            md.BasicTransformerBlock(
                inner_dim, num_attention_heads, attention_head_dim,
                cross_attention_dim=cross_attention_dim)
            for _ in range(num_layers)])
        time_mix_inner_dim = inner_dim
        self.temporal_transformer_blocks = nn.ModuleList([
            TemporalBasicTransformerBlock(
                inner_dim, time_mix_inner_dim, num_attention_heads,
                attention_head_dim, cross_attention_dim=cross_attention_dim)
            for _ in range(num_layers)])
        time_embed_dim = in_channels * 4
        self.time_pos_embed = md.TimestepEmbedding(
            in_channels, time_embed_dim, out_dim=in_channels)
        self.time_proj = md.Timesteps(in_channels, True, 0.0)
        self.time_mixer = AlphaBlender(
            alpha=0.5, merge_strategy="learned_with_images")
        self.proj_out = nn.Linear(inner_dim, in_channels)

    def forward(self, hidden_states, encoder_hidden_states=None,
                image_only_indicator=None):
        batch_frames, _, height, width = hidden_states.shape
        num_frames = image_only_indicator.shape[-1]
        batch_size = batch_frames // num_frames

        time_context = encoder_hidden_states            # (b·f, 1, d)
        time_context_first_timestep = time_context[None, :].reshape(
            batch_size, num_frames, -1, time_context.shape[-1])[:, 0]
        time_context = time_context_first_timestep[None, :].broadcast_to(
            height * width, batch_size, time_context.shape[-2],
            time_context.shape[-1])
        time_context = time_context.reshape(
            height * width * batch_size, -1, time_context.shape[-1])

        residual = hidden_states
        hidden_states = self.norm(hidden_states)
        inner_dim = hidden_states.shape[1]
        hidden_states = (hidden_states.permute(0, 2, 3, 1)
                         .reshape(batch_frames, height * width, inner_dim))
        hidden_states = self.proj_in(hidden_states)

        num_frames_emb = torch.arange(num_frames)
        num_frames_emb = num_frames_emb.repeat(batch_size, 1).reshape(-1)
        t_emb = self.time_proj(num_frames_emb).to(hidden_states.dtype)
        emb = self.time_pos_embed(t_emb)[:, None, :]

        for block, temporal_block in zip(self.transformer_blocks,
                                         self.temporal_transformer_blocks):
            hidden_states = block(
                hidden_states, encoder_hidden_states=encoder_hidden_states)
            hidden_states_mix = hidden_states + emb
            hidden_states_mix = temporal_block(
                hidden_states_mix, num_frames=num_frames,
                encoder_hidden_states=time_context)
            hidden_states = self.time_mixer(
                x_spatial=hidden_states, x_temporal=hidden_states_mix,
                image_only_indicator=image_only_indicator)

        hidden_states = self.proj_out(hidden_states)
        hidden_states = (hidden_states
                         .reshape(batch_frames, height, width, inner_dim)
                         .permute(0, 3, 1, 2).contiguous())
        return hidden_states + residual


class DownBlockSpatioTemporal(nn.Module):
    def __init__(self, in_channels, out_channels, temb_channels, num_layers=1,
                 add_downsample=True):
        super().__init__()
        self.resnets = nn.ModuleList([
            SpatioTemporalResBlock(
                in_channels if i == 0 else out_channels, out_channels,
                temb_channels, eps=1e-5)
            for i in range(num_layers)])
        self.downsamplers = (nn.ModuleList([
            md.Downsample2D(out_channels, use_conv=True, out_channels=out_channels,
                            name="op")]) if add_downsample else None)

    def forward(self, hidden_states, temb, image_only_indicator):
        output_states = ()
        for resnet in self.resnets:
            hidden_states = resnet(hidden_states, temb, image_only_indicator)
            output_states = output_states + (hidden_states,)
        if self.downsamplers is not None:
            for downsampler in self.downsamplers:
                hidden_states = downsampler(hidden_states)
            output_states = output_states + (hidden_states,)
        return hidden_states, output_states


class CrossAttnDownBlockSpatioTemporal(nn.Module):
    def __init__(self, in_channels, out_channels, temb_channels, num_layers=1,
                 transformer_layers_per_block=1, num_attention_heads=1,
                 cross_attention_dim=1280, add_downsample=True):
        super().__init__()
        self.resnets = nn.ModuleList([
            SpatioTemporalResBlock(
                in_channels if i == 0 else out_channels, out_channels,
                temb_channels, eps=1e-6)
            for i in range(num_layers)])
        self.attentions = nn.ModuleList([
            TransformerSpatioTemporalModel(
                num_attention_heads, out_channels // num_attention_heads,
                in_channels=out_channels, num_layers=transformer_layers_per_block,
                cross_attention_dim=cross_attention_dim)
            for _ in range(num_layers)])
        self.downsamplers = (nn.ModuleList([
            md.Downsample2D(out_channels, use_conv=True, out_channels=out_channels,
                            padding=1, name="op")]) if add_downsample else None)

    def forward(self, hidden_states, temb, encoder_hidden_states,
                image_only_indicator):
        output_states = ()
        for resnet, attn in zip(self.resnets, self.attentions):
            hidden_states = resnet(hidden_states, temb, image_only_indicator)
            hidden_states = attn(hidden_states,
                                 encoder_hidden_states=encoder_hidden_states,
                                 image_only_indicator=image_only_indicator)
            output_states = output_states + (hidden_states,)
        if self.downsamplers is not None:
            for downsampler in self.downsamplers:
                hidden_states = downsampler(hidden_states)
            output_states = output_states + (hidden_states,)
        return hidden_states, output_states


class UNetMidBlockSpatioTemporal(nn.Module):
    def __init__(self, in_channels, temb_channels, num_layers=1,
                 transformer_layers_per_block=1, num_attention_heads=1,
                 cross_attention_dim=1280):
        super().__init__()
        resnets = [SpatioTemporalResBlock(in_channels, in_channels,
                                          temb_channels, eps=1e-5)]
        attentions = []
        for _ in range(num_layers):
            attentions.append(TransformerSpatioTemporalModel(
                num_attention_heads, in_channels // num_attention_heads,
                in_channels=in_channels,
                num_layers=transformer_layers_per_block,
                cross_attention_dim=cross_attention_dim))
            resnets.append(SpatioTemporalResBlock(
                in_channels, in_channels, temb_channels, eps=1e-5))
        self.attentions = nn.ModuleList(attentions)
        self.resnets = nn.ModuleList(resnets)

    def forward(self, hidden_states, temb, encoder_hidden_states,
                image_only_indicator):
        hidden_states = self.resnets[0](hidden_states, temb,
                                        image_only_indicator)
        for attn, resnet in zip(self.attentions, self.resnets[1:]):
            hidden_states = attn(hidden_states,
                                 encoder_hidden_states=encoder_hidden_states,
                                 image_only_indicator=image_only_indicator)
            hidden_states = resnet(hidden_states, temb, image_only_indicator)
        return hidden_states


class UpBlockSpatioTemporal(nn.Module):
    def __init__(self, in_channels, prev_output_channel, out_channels,
                 temb_channels, num_layers=1, add_upsample=True):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            res_skip_channels = in_channels if (i == num_layers - 1) else out_channels
            resnet_in_channels = prev_output_channel if i == 0 else out_channels
            resnets.append(SpatioTemporalResBlock(
                resnet_in_channels + res_skip_channels, out_channels,
                temb_channels, eps=1e-6))
        self.resnets = nn.ModuleList(resnets)
        self.upsamplers = (nn.ModuleList([
            md.Upsample2D(out_channels, use_conv=True,
                          out_channels=out_channels)])
            if add_upsample else None)

    def forward(self, hidden_states, res_hidden_states_tuple, temb,
                image_only_indicator):
        for resnet in self.resnets:
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = torch.cat([hidden_states, res_hidden_states], dim=1)
            hidden_states = resnet(hidden_states, temb, image_only_indicator)
        if self.upsamplers is not None:
            for upsampler in self.upsamplers:
                hidden_states = upsampler(hidden_states)
        return hidden_states


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    def __init__(self, in_channels, out_channels, prev_output_channel,
                 temb_channels, num_layers=1, transformer_layers_per_block=1,
                 num_attention_heads=1, cross_attention_dim=1280,
                 add_upsample=True):
        super().__init__()
        resnets, attentions = [], []
        for i in range(num_layers):
            res_skip_channels = in_channels if (i == num_layers - 1) else out_channels
            resnet_in_channels = prev_output_channel if i == 0 else out_channels
            resnets.append(SpatioTemporalResBlock(
                resnet_in_channels + res_skip_channels, out_channels,
                temb_channels, eps=1e-6))
            attentions.append(TransformerSpatioTemporalModel(
                num_attention_heads, out_channels // num_attention_heads,
                in_channels=out_channels,
                num_layers=transformer_layers_per_block,
                cross_attention_dim=cross_attention_dim))
        self.resnets = nn.ModuleList(resnets)
        self.attentions = nn.ModuleList(attentions)
        self.upsamplers = (nn.ModuleList([
            md.Upsample2D(out_channels, use_conv=True,
                          out_channels=out_channels)])
            if add_upsample else None)

    def forward(self, hidden_states, res_hidden_states_tuple, temb,
                encoder_hidden_states, image_only_indicator):
        for resnet, attn in zip(self.resnets, self.attentions):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = torch.cat([hidden_states, res_hidden_states], dim=1)
            hidden_states = resnet(hidden_states, temb, image_only_indicator)
            hidden_states = attn(hidden_states,
                                 encoder_hidden_states=encoder_hidden_states,
                                 image_only_indicator=image_only_indicator)
        if self.upsamplers is not None:
            for upsampler in self.upsamplers:
                hidden_states = upsampler(hidden_states)
        return hidden_states


class UNetSpatioTemporalConditionModel(nn.Module):
    """diffusers==0.24 UNetSpatioTemporalConditionModel (fixed SVD topology:
    3× CrossAttnDownBlockSpatioTemporal + DownBlockSpatioTemporal,
    UNetMidBlockSpatioTemporal, UpBlockSpatioTemporal + 3× CrossAttnUp)."""

    def __init__(self, in_channels=8, out_channels=4,
                 block_out_channels=(320, 640, 1280, 1280),
                 layers_per_block=2, num_attention_heads=(5, 10, 20, 20),
                 cross_attention_dim=1024, addition_time_embed_dim=256,
                 projection_class_embeddings_input_dim=768):
        super().__init__()
        self.conv_in = nn.Conv2d(in_channels, block_out_channels[0], 3,
                                 padding=1)
        time_embed_dim = block_out_channels[0] * 4
        self.time_proj = md.Timesteps(block_out_channels[0], True, 0.0)
        self.time_embedding = md.TimestepEmbedding(block_out_channels[0],
                                                   time_embed_dim)
        self.add_time_proj = md.Timesteps(addition_time_embed_dim, True, 0.0)
        self.add_embedding = md.TimestepEmbedding(
            projection_class_embeddings_input_dim, time_embed_dim)

        n = len(block_out_channels)
        self.down_blocks = nn.ModuleList()
        output_channel = block_out_channels[0]
        for i in range(n):
            input_channel = output_channel
            output_channel = block_out_channels[i]
            is_final = i == n - 1
            if not is_final:
                self.down_blocks.append(CrossAttnDownBlockSpatioTemporal(
                    input_channel, output_channel, time_embed_dim,
                    num_layers=layers_per_block,
                    num_attention_heads=num_attention_heads[i],
                    cross_attention_dim=cross_attention_dim,
                    add_downsample=True))
            else:
                self.down_blocks.append(DownBlockSpatioTemporal(
                    input_channel, output_channel, time_embed_dim,
                    num_layers=layers_per_block, add_downsample=False))

        self.mid_block = UNetMidBlockSpatioTemporal(
            block_out_channels[-1], time_embed_dim,
            num_attention_heads=num_attention_heads[-1],
            cross_attention_dim=cross_attention_dim)

        self.up_blocks = nn.ModuleList()
        reversed_block_out_channels = list(reversed(block_out_channels))
        reversed_num_attention_heads = list(reversed(num_attention_heads))
        output_channel = reversed_block_out_channels[0]
        for i in range(n):
            prev_output_channel = output_channel
            output_channel = reversed_block_out_channels[i]
            input_channel = reversed_block_out_channels[min(i + 1, n - 1)]
            is_final = i == n - 1
            if i == 0:
                self.up_blocks.append(UpBlockSpatioTemporal(
                    input_channel, prev_output_channel, output_channel,
                    time_embed_dim, num_layers=layers_per_block + 1,
                    add_upsample=not is_final))
            else:
                self.up_blocks.append(CrossAttnUpBlockSpatioTemporal(
                    input_channel, output_channel, prev_output_channel,
                    time_embed_dim, num_layers=layers_per_block + 1,
                    num_attention_heads=reversed_num_attention_heads[i],
                    cross_attention_dim=cross_attention_dim,
                    add_upsample=not is_final))

        self.conv_norm_out = nn.GroupNorm(32, block_out_channels[0], eps=1e-5)
        self.conv_act = nn.SiLU()
        self.conv_out = nn.Conv2d(block_out_channels[0], out_channels, 3,
                                  padding=1)

    def forward(self, sample, timestep, encoder_hidden_states, added_time_ids):
        # sample: (b, f, c, h, w); encoder_hidden_states: (b, 1, d)
        batch_size, num_frames = sample.shape[:2]
        timesteps = timestep.expand(batch_size)
        t_emb = self.time_proj(timesteps).to(sample.dtype)
        emb = self.time_embedding(t_emb)
        time_embeds = self.add_time_proj(added_time_ids.flatten())
        time_embeds = time_embeds.reshape((batch_size, -1)).to(emb.dtype)
        aug_emb = self.add_embedding(time_embeds)
        emb = emb + aug_emb

        sample = sample.flatten(0, 1)
        emb = emb.repeat_interleave(num_frames, dim=0)
        encoder_hidden_states = encoder_hidden_states.repeat_interleave(
            num_frames, dim=0)

        sample = self.conv_in(sample)
        image_only_indicator = torch.zeros(batch_size, num_frames,
                                           dtype=sample.dtype)

        down_block_res_samples = (sample,)
        for block in self.down_blocks:
            if hasattr(block, "attentions"):
                sample, res_samples = block(
                    sample, temb=emb,
                    encoder_hidden_states=encoder_hidden_states,
                    image_only_indicator=image_only_indicator)
            else:
                sample, res_samples = block(
                    sample, temb=emb,
                    image_only_indicator=image_only_indicator)
            down_block_res_samples += res_samples

        sample = self.mid_block(sample, emb, encoder_hidden_states,
                                image_only_indicator)

        for block in self.up_blocks:
            res_samples = down_block_res_samples[-len(block.resnets):]
            down_block_res_samples = down_block_res_samples[:-len(block.resnets)]
            if hasattr(block, "attentions"):
                sample = block(sample, res_samples, emb,
                               encoder_hidden_states=encoder_hidden_states,
                               image_only_indicator=image_only_indicator)
            else:
                sample = block(sample, res_samples, emb,
                               image_only_indicator=image_only_indicator)

        sample = self.conv_norm_out(sample)
        sample = self.conv_act(sample)
        sample = self.conv_out(sample)
        sample = sample.reshape(batch_size, num_frames, *sample.shape[1:])
        return sample
