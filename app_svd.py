#!/usr/bin/env python
"""SVD i2v / video2video demo (reference /root/reference/app_svd.py).

Semantics preserved: if a video is uploaded, its per-frame VAE latents become
the condition latents (v2v path, app_svd.py:76-113); models with
in_channels == 9 get the motion mask (routing :115-133). Headless callable API
+ CLI; gradio UI only when installed.

    python app_svd.py --config configs/train_svd_mask.yaml --image in.png --out out.gif
    python app_svd.py --config ... --video input.gif --out out.gif   # v2v
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


class AnimateController:
    def __init__(self, pretrained_model_path=None, validation_data=None,
                 output_dir="output/app_svd", model_size="full", motion_mask=True):
        from animate_anything_tpu.cli_svd import build_svd_models
        from animate_anything_tpu.core import Config
        from animate_anything_tpu.pipelines.svd import TextStableVideoDiffusionPipeline

        self.validation_data = Config(validation_data or {})
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        models = build_svd_models(pretrained_model_path, motion_mask=motion_mask,
                                  model_size=model_size)
        self.in_channels = models["unet_config"].in_channels
        self.pipeline = TextStableVideoDiffusionPipeline(
            models["unet"], models["unet_params"], models["vae"], models["vae_params"],
            image_encoder=models["image_encoder"],
            image_encoder_params=models["image_encoder_params"],
        )
        self.sample_idx = 0

    def animate(self, image, video_frames=None, mask_img=None, steps=25,
                min_cfg=1.0, max_cfg=3.0, seed=0):
        from animate_anything_tpu.utils import media

        vd = self.validation_data
        num_frames = int(vd.get("num_frames", 14))
        cond = None
        if video_frames is not None:
            cond = self.pipeline.video_to_condition_latent(np.asarray(video_frames))
            num_frames = cond.shape[1]
            image = np.asarray(video_frames[0])
        h8, w8 = image.shape[0] // 8, image.shape[1] // 8
        mask = None
        if self.in_channels == 9:  # mask routing (reference :115-133)
            if mask_img is not None:
                m = (np.asarray(mask_img, np.float32) / 255.0 >= 0.5).astype(np.float32)
                m = np.asarray(jax.image.resize(jnp.asarray(m), (h8, w8), "nearest"))
                mask = jnp.asarray(m)[None, None, :, :, None]
            else:
                mask = jnp.ones((1, 1, h8, w8, 1))
        video, _ = self.pipeline(
            image, condition_latent=cond, mask=mask, num_frames=num_frames,
            num_inference_steps=int(steps), min_guidance_scale=float(min_cfg),
            max_guidance_scale=float(max_cfg),
            decode_chunk_size=int(vd.get("decode_chunk_size", 0)) or None,
            fps=int(vd.get("fps", 7)),
            motion_bucket_id=int(vd.get("motion_bucket_id", 127)),
            rng=jax.random.PRNGKey(int(seed)),
        )
        path = os.path.join(self.output_dir, f"{self.sample_idx}.gif")
        media.save_gif(path, media.to_uint8(np.asarray(video[0])),
                       fps=int(vd.get("fps", 7)))
        self.sample_idx += 1
        return path


def main():
    from animate_anything_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--image", type=str, default=None)
    ap.add_argument("--video", type=str, default=None)
    ap.add_argument("--mask", type=str, default=None)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    args, unknown = ap.parse_known_args()

    cfg = {}
    if args.config:
        from animate_anything_tpu.core import load_config

        cfg = load_config(args.config, overrides=[u for u in unknown if "=" in u]).to_dict()
    controller = AnimateController(
        cfg.get("pretrained_model_path"), cfg.get("validation_data"),
        output_dir=cfg.get("output_dir", "output/app_svd"),
        model_size=cfg.get("model_size", "full"),
        motion_mask=bool(cfg.get("motion_mask", True)),
    )
    from animate_anything_tpu.utils import media

    video = media.load_video_frames(args.video) if args.video else None
    image = media.load_image(args.image) if args.image else video[0]
    mask = np.asarray(media.load_image(args.mask))[..., 0] if args.mask else None
    path = controller.animate(image, video, mask, steps=args.steps, seed=args.seed)
    if args.out:
        os.replace(path, args.out)
        path = args.out
    print(path)


if __name__ == "__main__":
    main()
