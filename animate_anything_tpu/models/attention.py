"""Spatial and temporal transformer modules.

Functional equivalents of diffusers' Transformer2DModel /
TransformerTemporalModel as used by the reference blocks
(/root/reference/models/unet_3d_blocks.py:286-307 spatial with conv
projections, :296-307 temporal with linear projections and
double-self-attention).

Two distinct sequence regimes, both fed through ops.attention:
- spatial: seq = h·w per frame (up to 4096 at 512px), batch = b·f;
- temporal: seq = f (≤ 32) per spatial location, batch = b·h·w — many tiny
  attentions that the Pallas kernel folds into its batch grid.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from animate_anything_tpu.models.layers import FusedGroupNorm
from animate_anything_tpu.ops.attention import attention


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None.

    Param layout mirrors diffusers Attention: to_q/to_k/to_v (no bias),
    to_out.0 (bias)."""

    heads: int
    head_dim: int
    context_dim: Optional[int] = None  # None → self-attention dims
    out_dim: Optional[int] = None
    attn_impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inner = self.heads * self.head_dim
        out_dim = self.out_dim or x.shape[-1]
        ctx = x if context is None else context

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.head_dim)
        k = k.reshape(b, sk, self.heads, self.head_dim)
        v = v.reshape(b, sk, self.heads, self.head_dim)

        out = attention(q, k, v, impl=self.attn_impl)
        out = out.reshape(b, sq, inner)
        return nn.Dense(out_dim, dtype=self.dtype, name="to_out_0")(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP (diffusers FeedForward with geglu activation, mult=4)."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        inner = dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    """Pre-LN block: self-attn → (cross or second self) attn → GEGLU ff."""

    heads: int
    head_dim: int
    context_dim: Optional[int] = None
    double_self_attention: bool = False
    attn_impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        x = x + CrossAttention(
            self.heads, self.head_dim, attn_impl=self.attn_impl, dtype=self.dtype, name="attn1"
        )(h)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        ctx = None if self.double_self_attention else context
        x = x + CrossAttention(
            self.heads,
            self.head_dim,
            context_dim=self.context_dim,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            name="attn2",
        )(h, ctx)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x).astype(self.dtype)
        x = x + GEGLUFeedForward(dtype=self.dtype, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """Transformer2DModel over the h·w sequence of each frame.

    use_linear_projection=False (down/up blocks) → 1x1-conv in/out projections;
    True (mid block) → linear projections, matching the reference exactly
    (/root/reference/models/unet_3d_blocks.py:287-296 vs :251)."""

    heads: int
    head_dim: int
    context_dim: int
    num_layers: int = 1
    use_linear_projection: bool = False
    groups: int = 32
    attn_impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        # x: (b*f, h, w, c); context: (b*f, seq, context_dim)
        bf, hh, ww, c = x.shape
        inner = self.heads * self.head_dim
        residual = x

        h = FusedGroupNorm(self.groups, 1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            h = h.reshape(bf, hh * ww, c)
            h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        else:
            h = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(h)
            h = h.reshape(bf, hh * ww, inner)

        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                self.heads,
                self.head_dim,
                context_dim=self.context_dim,
                attn_impl=self.attn_impl,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, context)

        if self.use_linear_projection:
            h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(bf, hh, ww, c)
        else:
            h = h.reshape(bf, hh, ww, inner)
            h = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class TemporalSelfAttention(nn.Module):
    """Self-attention over the FRAME axis of a (b, f, s, c) tensor, computed
    as one dot_general with batch dims (b, s, heads) — no layout transpose.

    The naive formulation (reshape to (b·s, f, c) and call batched attention)
    costs two 90MB+ strided transposes per layer and leaves the MXU idle on
    17×17 score tiles; measured on v5e it was 39% of the whole UNet step.
    Here frames stay in place: scores = einsum('bfshd,bgshd->bshfg').
    Param names/shapes match CrossAttention (to_q/to_k/to_v/to_out_0), so
    checkpoints are interchangeable between the two formulations."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, f, s, c = x.shape
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)
        q = q.reshape(b, f, s, self.heads, self.head_dim)
        k = k.reshape(b, f, s, self.heads, self.head_dim)
        v = v.reshape(b, f, s, self.heads, self.head_dim)

        scale = 1.0 / (self.head_dim ** 0.5)
        scores = jnp.einsum(
            "bfshd,bgshd->bshfg", q, k, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bshfg,bgshd->bfshd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        out = out.reshape(b, f, s, inner)
        return nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)


class TemporalTransformer(nn.Module):
    """TransformerTemporalModel: attention over the frame axis per spatial
    location. Blocks are double-self-attention (diffusers constructs them with
    double_self_attention=True, so attn2 is a second self-attention).

    Computed natively on the (b, f, h·w, c) view via TemporalSelfAttention —
    the transpose-free formulation. Param tree is identical to the
    (b·hw, f, c) formulation it replaced."""

    heads: int
    head_dim: int
    num_layers: int = 1
    groups: int = 32
    attn_impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        # x: (b*f, h, w, c) → (b, f, h·w, c); attention along axis 1
        bf, hh, ww, c = x.shape
        b = bf // num_frames
        inner = self.heads * self.head_dim
        residual = x

        h = x.reshape(b, num_frames, hh, ww, c)
        # GroupNorm stats over (f, h, w, c/groups) — matches torch GN on (b,c,f,h,w)
        h = FusedGroupNorm(self.groups, 1e-6, dtype=self.dtype, name="norm")(h)
        h = h.reshape(b, num_frames, hh * ww, c)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)

        for i in range(self.num_layers):
            h = TemporalBasicBlock(
                self.heads, self.head_dim, dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h)

        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(bf, hh, ww, c) + residual


class TemporalBasicBlock(nn.Module):
    """Double-self-attention transformer block on (b, f, s, c) — the
    transpose-free twin of BasicTransformerBlock(double_self_attention=True);
    identical param tree (norm1/attn1/norm2/attn2/norm3/ff)."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        hn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(h).astype(self.dtype)
        h = h + TemporalSelfAttention(self.heads, self.head_dim, dtype=self.dtype, name="attn1")(hn)
        hn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(h).astype(self.dtype)
        h = h + TemporalSelfAttention(self.heads, self.head_dim, dtype=self.dtype, name="attn2")(hn)
        hn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(h).astype(self.dtype)
        return h + GEGLUFeedForward(dtype=self.dtype, name="ff")(hn)
