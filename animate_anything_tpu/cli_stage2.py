"""Transparent RGBA i2v stage-2 CLI (eval-centric, like the reference —
training for this stage is not open-sourced there either, header note
/root/reference/train_transparent_i2v_stage2.py:22).

Surface: ``python train_transparent_i2v_stage2.py --config X.yaml --eval``.
Flow (reference :356-547): RGBA image → premultiplied-RGB SD latent + alpha
offset latent → per-frame mask with frame 0 frozen → truncated DDPM init →
Masked(5ch)/Concat(9ch) pipeline by in_channels → RGBA webp outputs.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.core import Config, load_config
from animate_anything_tpu.core.dtypes import policy_from_string
from animate_anything_tpu.models.factory import build_models
from animate_anything_tpu.models.transparent_vae import (
    LatentTransparencyOffsetEncoder,
    UNet384,
    UNet384Config,
    build_rgba_latents,
)
from animate_anything_tpu.pipelines.stage2 import (
    ConcatLatentToVideoPipeline,
    MaskedLatentToVideoPipeline,
    save_rgba_outputs,
)
from animate_anything_tpu.utils import media
from animate_anything_tpu.utils.fast_init import init_params_host


def build_transparent_vae(model_size: str = "full", compute_dtype=jnp.float32, seed: int = 0):
    enc = LatentTransparencyOffsetEncoder(dtype=compute_dtype)
    ucfg = UNet384Config() if model_size != "tiny" else UNet384Config(
        block_out_channels=(8, 16, 16, 16), attention_head_dim=4, norm_num_groups=2
    )
    dec = UNet384(ucfg, dtype=compute_dtype)
    enc_params = init_params_host(enc, seed + 10, jnp.zeros((1, 64, 64, 4), compute_dtype))
    dec_params = init_params_host(
        dec, seed + 11,
        jnp.zeros((1, 64, 64, 3), compute_dtype), jnp.zeros((1, 8, 8, 4), compute_dtype),
    )
    return enc, enc_params, dec, dec_params


def main_eval(**cfg_kw) -> dict:
    from animate_anything_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config(cfg_kw)
    out_dir = cfg.get("output_dir", "./output")
    os.makedirs(out_dir, exist_ok=True)
    policy = policy_from_string(cfg.get("mixed_precision", "bf16"))
    in_channels = int(cfg.get("in_channels", 5))
    motion_mask = in_channels in (5, 9)

    models = build_models(
        cfg.get("pretrained_model_path"),
        motion_mask=motion_mask,
        motion_strength=bool(cfg.get("motion_strength", True)),
        model_size=cfg.get("model_size", "full"),
        compute_dtype=policy.compute_dtype,
        attn_impl=cfg.get("attn_impl"),
    )
    enc, enc_params, dec, dec_params = build_transparent_vae(
        cfg.get("model_size", "full"), policy.compute_dtype, int(cfg.get("seed") or 0)
    )
    # separate state-dict checkpoints, reference :119-128
    # (vae_alpha_encoder.pth / vae_alpha_decoder.pth analog: npz trees)

    pipe_cls = ConcatLatentToVideoPipeline if in_channels == 9 else MaskedLatentToVideoPipeline
    pipe = pipe_cls(
        models["unet"], models["unet_params"], models["vae"], models["vae_params"],
        text_encoder=models["text"], text_params=models["text_params"],
        tokenizer=models["tokenizer"], schedule=models["schedule"],
        unet384=dec, unet384_params=dec_params,
    )

    vd = cfg.get("validation_data", Config())
    img_path = vd.get("prompt_image")
    h, w = int(vd.get("height", 384)), int(vd.get("width", 384))
    if img_path and os.path.exists(img_path):
        rgba = media.load_image_rgba(img_path, size=(h, w))
    else:
        rng0 = np.random.default_rng(0)
        rgba = (rng0.random((h, w, 4)) * 255).astype(np.uint8)
    num_frames = int(vd.get("num_frames", 8))
    steps = int(vd.get("num_inference_steps", 10))

    pixels = jnp.asarray(rgba, jnp.float32)[None, None] / 127.5 - 1.0
    rgba_latent = build_rgba_latents(models["vae"], models["vae_params"], pixels, enc, enc_params)
    hl, wl = rgba_latent.shape[2:4]

    # per-frame mask with frame 0 forced frozen (reference :444-449)
    mask = jnp.ones((1, 1, hl, wl, 1))
    rng = jax.random.PRNGKey(int(cfg.get("seed") or 0))
    ts = pipe.get_timesteps(steps, float(vd.get("t_start_fraction", 0.0)))
    latents = pipe.prepare_init_latents(rgba_latent, num_frames, ts, rng, mask=mask)

    video, out_latents, rgba_out = pipe(
        vd.get("prompt", ""),
        latents=latents,
        condition_latent=rgba_latent,
        mask=mask,
        motion=[float(vd.get("strength", 5))] if cfg.get("motion_strength", True) else None,
        timesteps=ts,
        guidance_scale=float(vd.get("guidance_scale", 9)),
    )
    paths = save_rgba_outputs(out_dir, np.asarray(rgba_out), fps=int(vd.get("fps", 8)))
    from animate_anything_tpu.metrics.motion import latent_motion_score

    paths["latent_motion_score"] = float(latent_motion_score(out_latents)[0])
    print(paths)
    return paths


def cli(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--eval", action="store_true")
    args, unknown = parser.parse_known_args(argv)
    cfg = load_config(args.config, overrides=[u for u in unknown if "=" in u])
    main_eval(**cfg.to_dict())


if __name__ == "__main__":
    cli()
