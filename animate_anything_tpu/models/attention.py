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

from animate_anything_tpu.models.layers import Conv1x1, FusedGroupNorm
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

        try:
            path = tuple(self.scope.path)
        except Exception:
            path = ()
        out = attention(q, k, v, impl=self.attn_impl,
                        tag=(path, context is not None))
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
        # (r5 negative result: routing norm1+attn1 through the fused
        # LN+QKV+attention kernel (ops/attic/ln_qkv_attention.py) measured
        # 10.08 s vs 9.63 s headline — the VMEM-resident sample + K/V scratch
        # force a 128-row q tile at s=4096 and a serialized grid, costing
        # more than the saved normed/q/k/v HBM round-trips.)
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

        if self.attn_impl == "pallas":
            from animate_anything_tpu.ops.geglu import ln_geglu_ff

            s3, b3 = _LNParams(x.shape[-1], name="norm3")()
            w1, bb1, w2, bb2 = _GEGLUParams(x.shape[-1], name="ff")()
            return ln_geglu_ff(x.astype(self.dtype), s3, b3, w1, bb1, w2, bb2,
                               impl="pallas")
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x).astype(self.dtype)
        x = x + GEGLUFeedForward(dtype=self.dtype, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """Transformer2DModel over the h·w sequence of each frame.

    use_linear_projection defaults True: the reference's get_down_block /
    get_up_block default it True and UNet3DConditionModel never overrides
    (/root/reference/models/unet_3d_blocks.py:136,192), and the mid block's
    own default is True (:251) — so EVERY spatial transformer in this model
    family uses linear proj_in/proj_out (2D linear weights in checkpoints).
    Verified against the reference's own torch forward in
    tests/test_torch_parity.py. False keeps the 1x1-conv variant for other
    diffusers-family configs."""

    heads: int
    head_dim: int
    context_dim: int
    num_layers: int = 1
    use_linear_projection: bool = True
    groups: int = 32
    attn_impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray,
                 pab_reuse: Optional[jnp.ndarray] = None,
                 entry_sums=None, want_stats: bool = False):
        # pab_reuse: traced bool — reuse the cached transformer delta instead
        # of recomputing (Pyramid-Attention-Broadcast-style step caching,
        # arXiv 2408.12588: attention deltas drift slowly across denoise
        # steps). None = always compute (training, default inference).
        # entry_sums: per-(b·f, c) (Σx, Σx²) from the producing kernel's
        # epilogue for the entry GroupNorm (see ops/temporal_conv.py).
        # want_stats=True → returns (y, out_sums) with per-(b·f, c) (Σy, Σy²)
        # of the residual-summed output from the fused projection kernel
        # (ops/proj_residual.py); None when that path didn't run.
        if pab_reuse is None:
            fuse_out = (self.attn_impl == "pallas"
                        and self.use_linear_projection)
            if fuse_out:
                y, sums = self._fused_out(x, context, entry_sums)
                return (y, sums) if want_stats else y
            y = self._delta(x, context, entry_sums) + x
            return (y, None) if want_stats else y
        cache = self.variable("pab", "delta", jnp.zeros, x.shape, self.dtype)

        def compute(mdl, x_, ctx, es):
            return mdl._delta(x_, ctx, es)

        def reuse(mdl, x_, ctx, es):
            _ = mdl._delta(x_, ctx, es)  # same variable structure; DCE'd branch
            return cache.value

        delta = nn.cond(pab_reuse, reuse, compute, self, x, context, entry_sums)
        cache.value = delta
        y = delta + x
        return (y, None) if want_stats else y

    def _hidden(self, x: jnp.ndarray, context: jnp.ndarray,
                entry_sums=None) -> jnp.ndarray:
        # x: (b*f, h, w, c); context: (b*f, seq, context_dim) → pre-proj_out
        # hidden (b*f, h·w, inner)
        bf, hh, ww, c = x.shape
        inner = self.heads * self.head_dim

        h = FusedGroupNorm(self.groups, 1e-6, dtype=self.dtype, name="norm")(
            x, sums=entry_sums)
        if self.use_linear_projection:
            h = h.reshape(bf, hh * ww, c)
            h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        else:
            h = Conv1x1(inner, dtype=self.dtype, name="proj_in")(h)
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
        return h

    def _fused_out(self, x: jnp.ndarray, context: jnp.ndarray,
                   entry_sums=None):
        """proj_out + residual + GN-stats epilogue as one fused kernel."""
        from animate_anything_tpu.ops.proj_residual import proj_residual_stats

        bf, hh, ww, c = x.shape
        h = self._hidden(x, context, entry_sums)
        wk, wb = _DenseParams(h.shape[-1], c, name="proj_out")()
        y, sums = proj_residual_stats(
            h.astype(self.dtype), wk, wb,
            x.reshape(bf, hh * ww, c).astype(self.dtype), impl="pallas")
        return y.reshape(bf, hh, ww, c), sums

    def _delta(self, x: jnp.ndarray, context: jnp.ndarray,
               entry_sums=None) -> jnp.ndarray:
        bf, hh, ww, c = x.shape
        inner = self.heads * self.head_dim
        h = self._hidden(x, context, entry_sums)
        if self.use_linear_projection:
            h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(bf, hh, ww, c)
        else:
            h = h.reshape(bf, hh, ww, inner)
            h = Conv1x1(c, dtype=self.dtype, name="proj_out")(h)
        return h


class TemporalSelfAttention(nn.Module):
    """Self-attention over the FRAME axis of a (b, f, s, c) tensor — no
    (b·s, f, c) layout transpose.

    The naive formulation (reshape to (b·s, f, c) and call batched attention)
    costs two 90MB+ strided transposes per layer and leaves the MXU idle on
    17×17 score tiles; measured on v5e it was 39% of the whole UNet step.
    impl='xla' computes scores in place as einsum('bfshd,bgshd->bshfg');
    impl='pallas' uses the packed kernel (ops/temporal_attention.py) that
    folds ⌊128/f⌋ locations into each MXU tile and keeps scores in VMEM.
    Param names/shapes match CrossAttention (to_q/to_k/to_v/to_out_0), so
    checkpoints are interchangeable between the formulations."""

    heads: int
    head_dim: int
    attn_impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from animate_anything_tpu.ops.attention import default_attn_impl
        from animate_anything_tpu.ops.temporal_attention import temporal_attention

        b, f, s, c = x.shape
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)
        q = q.reshape(b, f, s, self.heads, self.head_dim)
        k = k.reshape(b, f, s, self.heads, self.head_dim)
        v = v.reshape(b, f, s, self.heads, self.head_dim)

        out = temporal_attention(
            q, k, v, impl=self.attn_impl or default_attn_impl()
        ).astype(x.dtype)
        out = out.reshape(b, f, s, inner)
        return nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)


class _LNParams(nn.Module):
    """Param-only twin of nn.LayerNorm — same tree path {scale, bias}, same
    init, no compute (the fused kernel consumes the raw arrays)."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return s, b


class _DenseParams(nn.Module):
    """Param-only twin of nn.Dense — same tree path {kernel[, bias]}, same
    init (lecun_normal / zeros)."""

    in_dim: int
    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_dim, self.out_dim), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32)
             if self.use_bias else None)
        return k, b


class _GEGLUParams(nn.Module):
    """Param-only twin of GEGLUFeedForward (net_0_proj / net_2)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self):
        inner = self.dim * self.mult
        w1, b1 = _DenseParams(self.dim, inner * 2, name="net_0_proj")()
        w2, b2 = _DenseParams(inner, self.dim, name="net_2")()
        return w1, b1, w2, b2


class _TemporalAttnParams(nn.Module):
    """Param-only twin of TemporalSelfAttention (to_q/to_k/to_v/to_out_0)."""

    dim: int
    inner: int

    @nn.compact
    def __call__(self):
        wq, _ = _DenseParams(self.dim, self.inner, use_bias=False, name="to_q")()
        wk, _ = _DenseParams(self.dim, self.inner, use_bias=False, name="to_k")()
        wv, _ = _DenseParams(self.dim, self.inner, use_bias=False, name="to_v")()
        wo, bo = _DenseParams(self.inner, self.dim, name="to_out_0")()
        return wq, wk, wv, wo, bo


class TemporalTransformer(nn.Module):
    """TransformerTemporalModel: attention over the frame axis per spatial
    location. Blocks are double-self-attention (diffusers constructs them with
    double_self_attention=True, so attn2 is a second self-attention).

    Computed natively on the (b, f, h·w, c) view via TemporalSelfAttention —
    the transpose-free formulation — or, with attn_impl='pallas', via the
    fused temporal-block kernel on a packed token layout (packed once around
    both attention blocks and the feed-forward; ops/temporal_block.py). Param
    tree is identical across all three formulations."""

    heads: int
    head_dim: int
    num_layers: int = 1
    groups: int = 32
    attn_impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int,
                 pab_reuse: Optional[jnp.ndarray] = None,
                 entry_sums=None, want_stats: bool = False):
        # pab_reuse: traced bool — reuse the cached delta (see
        # SpatialTransformer; temporal deltas drift slowest across steps, so
        # they broadcast at the widest rate)
        # entry_sums: per-(b, c) (Σx, Σx²) for the entry GroupNorm (per-batch
        # stats over f·h·w — torch GN on (b,c,f,h,w)); want_stats → returns
        # (y, out_sums) with per-(b·f, c) sums of the residual-summed output.
        if pab_reuse is None:
            if self.attn_impl == "pallas":
                y, sums = self._fused_out(x, num_frames, entry_sums)
                return (y, sums) if want_stats else y
            y = self._delta(x, num_frames, entry_sums) + x
            return (y, None) if want_stats else y
        cache = self.variable("pab", "delta", jnp.zeros, x.shape, self.dtype)

        def compute(mdl, x_, es):
            return mdl._delta(x_, num_frames, es)

        def reuse(mdl, x_, es):
            _ = mdl._delta(x_, num_frames, es)  # same variables; DCE'd branch
            return cache.value

        delta = nn.cond(pab_reuse, reuse, compute, self, x, entry_sums)
        cache.value = delta
        y = delta + x
        return (y, None) if want_stats else y

    def _hidden(self, x: jnp.ndarray, num_frames: int,
                entry_sums=None) -> jnp.ndarray:
        from animate_anything_tpu.ops.temporal_block import (
            bfsc_ok, fused_ok, pack_frames, pack_geometry, unpack_frames)

        # x: (b*f, h, w, c) → (b, f, h·w, c); attention along axis 1
        bf, hh, ww, c = x.shape
        b = bf // num_frames
        inner = self.heads * self.head_dim

        h = x.reshape(b, num_frames, hh, ww, c)
        # GroupNorm stats over (f, h, w, c/groups) — matches torch GN on (b,c,f,h,w)
        h = FusedGroupNorm(self.groups, 1e-6, dtype=self.dtype, name="norm")(
            h, sums=entry_sums)
        h = h.reshape(b, num_frames, hh * ww, c)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)

        use_fused = self.attn_impl == "pallas" and fused_ok(
            num_frames, inner, self.heads, self.head_dim)
        # transpose-free variant: kernels read the natural (b, f, s, c)
        # layout directly, no HBM pack/unpack passes
        use_bfsc = use_fused and bfsc_ok(
            num_frames, hh * ww, inner, self.heads, self.head_dim)
        geom = (pack_geometry(num_frames, hh * ww)
                if use_fused and not use_bfsc else None)
        if geom is not None:
            h = pack_frames(h, geom)
        for i in range(self.num_layers):
            h = TemporalBasicBlock(
                self.heads, self.head_dim, attn_impl=self.attn_impl,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(h, packed_geom=geom, bfsc=use_bfsc)
        if geom is not None:
            h = unpack_frames(h, geom)
        return h  # (b, f, h·w, inner)

    def _fused_out(self, x: jnp.ndarray, num_frames: int, entry_sums=None):
        """proj_out + residual + GN-stats epilogue as one fused kernel."""
        from animate_anything_tpu.ops.proj_residual import proj_residual_stats

        bf, hh, ww, c = x.shape
        h = self._hidden(x, num_frames, entry_sums)
        inner = h.shape[-1]
        wk, wb = _DenseParams(inner, c, name="proj_out")()
        y, sums = proj_residual_stats(
            h.reshape(bf, hh * ww, inner).astype(self.dtype), wk, wb,
            x.reshape(bf, hh * ww, c).astype(self.dtype), impl="pallas")
        return y.reshape(bf, hh, ww, c), sums

    def _delta(self, x: jnp.ndarray, num_frames: int,
               entry_sums=None) -> jnp.ndarray:
        bf, hh, ww, c = x.shape
        h = self._hidden(x, num_frames, entry_sums)
        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(bf, hh, ww, c)


class TemporalBasicBlock(nn.Module):
    """Double-self-attention transformer block on (b, f, s, c) — the
    transpose-free twin of BasicTransformerBlock(double_self_attention=True);
    identical param tree (norm1/attn1/norm2/attn2/norm3/ff).

    When called with packed_geom (packed (b, tokens, c) input), norm1+attn1
    and norm2+attn2 each run as ONE fused Pallas kernel; norm3+ff are
    token-local and run on the packed layout directly."""

    heads: int
    head_dim: int
    attn_impl: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, packed_geom=None,
                 bfsc: bool = False) -> jnp.ndarray:
        if packed_geom is not None or bfsc:
            from animate_anything_tpu.ops.temporal_block import (
                fused_temporal_attn_block, fused_temporal_block_bfsc)

            c = h.shape[-1]
            for ln_name, attn_name in (("norm1", "attn1"), ("norm2", "attn2")):
                s, b = _LNParams(c, name=ln_name)()
                wq, wk, wv, wo, bo = _TemporalAttnParams(c, c, name=attn_name)()
                if bfsc:
                    h = fused_temporal_block_bfsc(
                        h.astype(self.dtype), s, b, wq, wk, wv, wo, bo,
                        heads=self.heads, head_dim=self.head_dim,
                    )
                else:
                    h = fused_temporal_attn_block(
                        h.astype(self.dtype), s, b, wq, wk, wv, wo, bo,
                        geom=packed_geom, heads=self.heads, head_dim=self.head_dim,
                    )
            from animate_anything_tpu.ops.geglu import ln_geglu_ff

            s3, b3 = _LNParams(c, name="norm3")()
            w1, bb1, w2, bb2 = _GEGLUParams(c, name="ff")()
            return ln_geglu_ff(h.astype(self.dtype), s3, b3, w1, bb1, w2, bb2,
                               impl="pallas")

        hn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(h).astype(self.dtype)
        h = h + TemporalSelfAttention(
            self.heads, self.head_dim, attn_impl=self.attn_impl, dtype=self.dtype, name="attn1")(hn)
        hn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(h).astype(self.dtype)
        h = h + TemporalSelfAttention(
            self.heads, self.head_dim, attn_impl=self.attn_impl, dtype=self.dtype, name="attn2")(hn)
        hn = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(h).astype(self.dtype)
        return h + GEGLUFeedForward(dtype=self.dtype, name="ff")(hn)
