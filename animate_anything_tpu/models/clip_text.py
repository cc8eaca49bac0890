"""Minimal CLIP text encoder (flax) for text conditioning.

The reference loads HF ``CLIPTextModel`` (SD2.x / ModelScope text tower:
hidden 1024, 23 layers, 16 heads, gelu — /root/reference/train.py:87-88) and
feeds ``last_hidden_state`` to UNet cross-attention with a 15% uncond dropout
(/root/reference/train.py:702-717). This is a self-contained implementation of
the same architecture — causal transformer over BPE tokens with final
LayerNorm — so the framework has no dependency on transformers' (deprecated)
flax models; weights import from the torch checkpoint via
utils/import_torch.py.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"  # SD2.x; SD1.x uses quick_gelu

    @classmethod
    def tiny(cls, **kw) -> "CLIPTextConfig":
        d = dict(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                 intermediate_size=64, max_position_embeddings=16)
        d.update(kw)
        return cls(**d)


def _act(name: str):
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    raise ValueError(name)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        head_dim = cfg.hidden_size // cfg.num_heads
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm1")(x)
        b, s, _ = h.shape
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(h)
        q = q.reshape(b, s, cfg.num_heads, head_dim)
        k = k.reshape(b, s, cfg.num_heads, head_dim)
        v = v.reshape(b, s, cfg.num_heads, head_dim)
        o = attention(q, k, v, impl="xla", is_causal=True).reshape(b, s, cfg.hidden_size)
        x = x + nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(o)

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids (b, seq) → last_hidden_state (b, seq, hidden)."""
        cfg = self.config
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding")(
            input_ids
        )
        pos_ids = np.arange(input_ids.shape[1])
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
            name="position_embedding",
        )(jnp.asarray(pos_ids))
        x = tok + pos[None]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_layer_norm")(x)
