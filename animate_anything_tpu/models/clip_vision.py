"""Minimal CLIP vision encoder with projection (SVD image conditioning).

The reference uses HF ``CLIPVisionModelWithProjection`` (laion ViT-H/14) for
the SVD image embedding (/root/reference/train_svd.py:85-91, 384-395):
224×224 center image → single projected token (b, 1, 1024) fed to
cross-attention. Self-contained flax implementation; weights import from the
torch checkpoint (utils/import_torch naming conventions).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.ops.attention import attention

# cv2-free 224×224 preprocessing constants (HF CLIPImageProcessor)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    intermediate_size: int = 5120
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 1024
    hidden_act: str = "gelu"  # laion ViT-H (the SVD image encoder); HF's
    # generic CLIPVisionConfig default is quick_gelu

    @classmethod
    def tiny(cls, **kw) -> "CLIPVisionConfig":
        d = dict(hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
                 image_size=32, patch_size=8, projection_dim=32)
        d.update(kw)
        return cls(**d)


class CLIPVisionLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        hd = cfg.hidden_size // cfg.num_heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm1")(x)
        b, s, _ = h.shape
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(h).reshape(b, s, cfg.num_heads, hd)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(h).reshape(b, s, cfg.num_heads, hd)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(h).reshape(b, s, cfg.num_heads, hd)
        o = attention(q, k, v, impl="xla").reshape(b, s, cfg.hidden_size)
        x = x + nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(o)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        from animate_anything_tpu.models.clip_text import _act

        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPVisionModelWithProjection(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values (b, 224, 224, 3) normalized → image_embeds (b, proj_dim)."""
        cfg = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            dtype=self.dtype, name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(self.dtype), patches], axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = nn.Embed(n_pos, cfg.hidden_size, dtype=self.dtype, name="position_embedding")(
            jnp.arange(x.shape[1])
        )
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="pre_layrnorm")(x)
        for i in range(cfg.num_layers):
            x = CLIPVisionLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="post_layernorm")(x[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                        name="visual_projection")(pooled)


def preprocess_clip_image(image: np.ndarray, size: int = 224) -> np.ndarray:
    """uint8 RGB (h, w, 3) → normalized (1, size, size, 3) float32 (bicubic
    resize + CLIP mean/std; the reference resizes with antialiasing,
    train_svd.py:384-395)."""
    from PIL import Image

    img = Image.fromarray(image).resize((size, size), Image.BICUBIC)
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr[None]
