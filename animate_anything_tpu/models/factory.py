"""Model assembly from diffusers-layout checkpoints or random init.

The analog of the reference's ``load_primary_models``
(/root/reference/train.py:85-104): loads scheduler/tokenizer/CLIP/VAE/UNet
from a pretrained pipeline dir — including the conv_in 4→5ch surgery when a
non-masked checkpoint is adapted for motion-mask training (:91-102) — or
builds randomly-initialized models when no checkpoint exists (host-side init;
used by tests/bench and from-scratch runs).
"""

from __future__ import annotations

import os
from dataclasses import fields
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.diffusion import make_schedule
from animate_anything_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from animate_anything_tpu.models.unet3d import UNet3DConditionModel, UNet3DConfig
from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig
from animate_anything_tpu.utils.fast_init import init_params_host


class HashTokenizer:
    """Deterministic no-asset tokenizer: stable per-word hashing into the CLIP
    vocab range. Lets the full pipeline run end-to-end without downloaded
    tokenizer files (real runs load the checkpoint's CLIPTokenizer)."""

    def __init__(self, vocab_size: int = 49408, model_max_length: int = 77):
        self.vocab_size = vocab_size
        self.model_max_length = model_max_length
        self._id2word = {}

    def _word_id(self, w: str) -> int:
        import hashlib

        h = int(hashlib.md5(w.encode()).hexdigest(), 16) % (self.vocab_size - 2)
        self._id2word[h] = w
        return h

    def encode(self, text: str):
        """BOS + per-word ids + EOS (CLIPTokenizer.encode-compatible shape)."""
        bos, eos = self.vocab_size - 2, self.vocab_size - 1
        return [bos] + [self._word_id(w) for w in text.lower().split()] + [eos]

    def decode(self, ids) -> str:
        """Best-effort inverse (hash vocab remembers words it has seen)."""
        return " ".join(self._id2word.get(int(i), "") for i in np.atleast_1d(np.asarray(ids)))

    def __call__(self, text, padding=None, truncation=True, max_length=77,
                 return_tensors="np", **kw):
        texts = [text] if isinstance(text, str) else list(text)
        max_length = min(max_length or self.model_max_length, self.model_max_length)
        bos, eos = self.vocab_size - 2, self.vocab_size - 1
        batch = []
        for t in texts:
            ids = [bos] + [self._word_id(w) for w in t.lower().split()[: max_length - 2]]
            ids.append(eos)
            ids += [eos] * (max_length - len(ids))
            batch.append(ids[:max_length])

        class _Out:
            input_ids = np.asarray(batch, np.int32)

        return _Out()


def unet_config_from_json(cfg: dict, **overrides) -> UNet3DConfig:
    keys = {f.name for f in fields(UNet3DConfig)}
    kw = {k: v for k, v in cfg.items() if k in keys}
    for k in ("down_block_types", "up_block_types", "block_out_channels"):
        if k in kw:
            kw[k] = tuple(kw[k])
    if isinstance(kw.get("attention_head_dim"), (list, tuple)):
        kw["attention_head_dim"] = kw["attention_head_dim"][0]
    kw.update(overrides)
    return UNet3DConfig(**kw)


def vae_config_from_json(cfg: dict) -> VAEConfig:
    keys = {f.name for f in fields(VAEConfig)}
    kw = {k: v for k, v in cfg.items() if k in keys}
    if "block_out_channels" in kw:
        kw["block_out_channels"] = tuple(kw["block_out_channels"])
    return VAEConfig(**kw)


def clip_config_from_json(cfg: dict) -> CLIPTextConfig:
    """Accept both HF CLIPTextConfig json keys and our own asdict export."""
    return CLIPTextConfig(
        vocab_size=cfg.get("vocab_size", 49408),
        hidden_size=cfg.get("hidden_size", 1024),
        num_layers=cfg.get("num_hidden_layers", cfg.get("num_layers", 23)),
        num_heads=cfg.get("num_attention_heads", cfg.get("num_heads", 16)),
        intermediate_size=cfg.get("intermediate_size", 4096),
        max_position_embeddings=cfg.get("max_position_embeddings", 77),
        hidden_act=cfg.get("hidden_act", "gelu"),
    )


def schedule_from_json(cfg: dict, rescale: bool = False):
    return make_schedule(
        num_train_timesteps=cfg.get("num_train_timesteps", 1000),
        beta_schedule=cfg.get("beta_schedule", "scaled_linear"),
        beta_start=cfg.get("beta_start", 0.00085),
        beta_end=cfg.get("beta_end", 0.012),
        prediction_type=cfg.get("prediction_type", "epsilon"),
        rescale_betas_zero_snr=rescale,
    )


def _unet_example_args(cfg: UNet3DConfig, dtype):
    hw = 8
    b = 1
    sample = jnp.zeros((b, 2, hw, hw, cfg.in_channels), dtype)
    cond = jnp.zeros((b, 1, hw, hw, cfg.in_channels), dtype)
    mask = jnp.ones((b, 1, hw, hw, 1), dtype) if cfg.motion_mask else None
    embeds = jnp.zeros((b, 77, cfg.cross_attention_dim), dtype)
    motion = jnp.ones((b,), jnp.float32) if cfg.motion_strength else None
    return (sample, jnp.asarray(1), embeds, cond, mask, motion)


def build_models(
    pretrained_model_path: Optional[str] = None,
    motion_mask: bool = False,
    motion_strength: bool = False,
    model_size: str = "full",       # 'full' | 'tiny' (tests)
    compute_dtype=jnp.float32,
    rescale_schedule: bool = False,
    attn_impl: Optional[str] = None,
    gradient_checkpointing: bool = False,
    seed: int = 0,
) -> dict:
    """→ dict(unet, unet_params, unet_config, vae, vae_params, text, text_params,
    tokenizer, schedule).

    ``gradient_checkpointing`` enables per-sub-layer remat in the UNet (the
    reference's ``unet.enable_gradient_checkpointing()`` surface, driven by the
    same yaml key — /root/reference/example/train_mask_motion.yaml)."""
    from_ckpt = bool(pretrained_model_path) and os.path.isdir(pretrained_model_path)
    comp = {}
    if from_ckpt:
        from animate_anything_tpu.train.checkpoint import load_pipeline_components

        comp = load_pipeline_components(pretrained_model_path)

    # ---- configs
    ukw = dict(
        motion_mask=motion_mask, motion_strength=motion_strength,
        attn_impl=attn_impl, gradient_checkpointing=gradient_checkpointing,
    )
    if "unet_config" in comp:
        ucfg = unet_config_from_json(comp["unet_config"], **ukw)
    elif model_size == "tiny":
        ucfg = UNet3DConfig.tiny(**ukw)
    else:
        ucfg = UNet3DConfig(**ukw)
    if "vae_config" in comp:
        vcfg = vae_config_from_json(comp["vae_config"])
    else:
        vcfg = VAEConfig.tiny() if model_size == "tiny" else VAEConfig()
    if "text_config" in comp:
        tcfg = clip_config_from_json(comp["text_config"])
    elif model_size == "tiny":
        tcfg = CLIPTextConfig.tiny(hidden_size=ucfg.cross_attention_dim)
    else:
        tcfg = CLIPTextConfig()

    unet = UNet3DConditionModel(ucfg, dtype=compute_dtype)
    vae = AutoencoderKL(vcfg, dtype=compute_dtype)
    text = CLIPTextModel(tcfg, dtype=compute_dtype)

    # ---- params
    uargs = _unet_example_args(ucfg, compute_dtype)
    unet_params = init_params_host(unet, seed, *uargs)
    vae_params = init_params_host(vae, seed + 1, jnp.zeros((1, 64, 64, 3), compute_dtype))
    text_params = init_params_host(text, seed + 2, jnp.zeros((1, 8), jnp.int32))

    if from_ckpt:
        from animate_anything_tpu.utils.import_torch import (
            align_to_params,
            expand_conv_in_channels,
        )

        if "unet" in comp:
            imported = comp["unet"]
            # conv_in surgery: checkpoint without conv_in2 adapted for masking
            if ucfg.motion_mask and "conv_in2" not in imported and "conv_in" in imported:
                k = imported["conv_in"]["kernel"]
                imported["conv_in2"] = {
                    "kernel": np.concatenate(
                        [np.zeros_like(k[:, :, :1]), k], axis=2
                    ),
                    "bias": imported["conv_in"]["bias"],
                }
            unet_params, miss, unexp = align_to_params(imported, unet_params, strict=False)
            if miss:
                raise ValueError(f"unet checkpoint missing params: {miss[:5]}…({len(miss)})")
        if "vae" in comp:
            vae_params, miss, _ = align_to_params(comp["vae"], vae_params, strict=False)
            if miss:
                raise ValueError(f"vae checkpoint missing params: {miss[:5]}…({len(miss)})")
        if "text_encoder" in comp:
            text_params, miss, _ = align_to_params(comp["text_encoder"], text_params, strict=False)
            if miss:
                raise ValueError(f"text checkpoint missing params: {miss[:5]}…({len(miss)})")

    schedule = schedule_from_json(comp.get("scheduler_config", {}), rescale=rescale_schedule)

    # Tokenizer resolution (reference: CLIPTokenizer, train.py:87-88).
    # A checkpoint's tokenizer/ dir loads through the IN-REPO BPE tokenizer
    # (no transformers needed); a present-but-unloadable dir is a hard error
    # (silently swapping in the hash vocab would feed garbage ids to a real
    # checkpoint); the HashTokenizer remains only for asset-free runs, with
    # a loud warning, or explicit AA_ALLOW_HASH_TOKENIZER=1 opt-in.
    tokenizer = None
    if from_ckpt:
        tok_dir = os.path.join(pretrained_model_path, "tokenizer")
        if os.path.isdir(tok_dir):
            try:
                from animate_anything_tpu.models.clip_tokenizer import (
                    CLIPBPETokenizer)

                tokenizer = CLIPBPETokenizer.from_pretrained(
                    tok_dir, model_max_length=tcfg.max_position_embeddings)
            except Exception as e:
                if os.environ.get("AA_ALLOW_HASH_TOKENIZER") != "1":
                    raise RuntimeError(
                        f"checkpoint tokenizer dir {tok_dir!r} exists but "
                        f"could not be loaded ({e}); refusing to silently "
                        "substitute the hash tokenizer (set "
                        "AA_ALLOW_HASH_TOKENIZER=1 to override)"
                    ) from e
    if tokenizer is None:
        if from_ckpt:
            import warnings

            warnings.warn(
                "no tokenizer/ dir in checkpoint: using the asset-free "
                "HashTokenizer — token ids will NOT match CLIP; prompts on "
                "real checkpoints will be meaningless",
                stacklevel=2,
            )
        tokenizer = HashTokenizer(tcfg.vocab_size, tcfg.max_position_embeddings)

    return dict(
        unet=unet, unet_params=unet_params, unet_config=ucfg,
        vae=vae, vae_params=vae_params, vae_config=vcfg,
        text=text, text_params=text_params, text_config=tcfg,
        tokenizer=tokenizer, schedule=schedule,
    )
