#!/usr/bin/env python
"""Interactive masked-animation demo (reference /root/reference/app.py).

``AnimateController.animate`` keeps the reference semantics:
- the motion mask comes from the drawing layer's alpha channel (nonzero →
  255; empty drawing → everything animates — app.py:81-84);
- resolution is snapped to /8 preserving area (:74-78);
- motion strength is the slider scaled by the mask mean (:97);
- sampling starts from DDPM-forward noised image latents (:91-92).

Runs headless (callable API / CLI) on any box; the gradio UI attaches only
when gradio is installed (not in this image).

    python app.py --config configs/train_mask_motion.yaml \
        --image in.png --mask mask.png --prompt "a girl moves" --out out.gif
"""

from __future__ import annotations

import argparse
import math
import os

import jax
import numpy as np


class AnimateController:
    def __init__(self, pretrained_model_path=None, validation_data=None, output_dir="output/app",
                 model_size="full", attn_impl=None):
        from animate_anything_tpu.core import Config
        from animate_anything_tpu.models.factory import build_models
        from animate_anything_tpu.pipelines import LatentToVideoPipeline

        self.validation_data = Config(validation_data or {})
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        models = build_models(
            pretrained_model_path, motion_mask=True, motion_strength=True,
            model_size=model_size, attn_impl=attn_impl,
        )
        self.pipeline = LatentToVideoPipeline(
            models["unet"], models["unet_params"], models["vae"], models["vae_params"],
            text_encoder=models["text"], text_params=models["text_params"],
            tokenizer=models["tokenizer"], schedule=models["schedule"],
        )
        self.sample_idx = 0

    def animate(self, init_img, motion_scale=3.0, prompt="", negative_prompt="",
                sample_steps=25, cfg_scale=9.0, seed=-1):
        """init_img: (h, w, 3) uint8, or dict {background, layers} in the
        gradio-sketch format (mask = layers[0] alpha)."""
        from animate_anything_tpu.utils import media

        if isinstance(init_img, dict):
            image = np.asarray(init_img["background"])[..., :3]
            np_mask = np.asarray(init_img["layers"][0])[..., 3].copy()
            np_mask[np_mask != 0] = 255
            if np_mask.sum() == 0:
                np_mask[:] = 255
        else:
            image = np.asarray(init_img)[..., :3]
            np_mask = np.full(image.shape[:2], 255, np.uint8)

        vd = self.validation_data
        h0, w0 = image.shape[:2]
        scale = math.sqrt(h0 * w0 / (int(vd.get("height", 512)) * int(vd.get("width", 512))))
        h = round(h0 / scale / 8) * 8
        w = round(w0 / scale / 8) * 8
        from PIL import Image

        image = np.asarray(Image.fromarray(image).resize((w, h), Image.LANCZOS))
        np_mask = np.asarray(Image.fromarray(np_mask).resize((w, h), Image.NEAREST))

        motion_strength = float(motion_scale) * float((np_mask / 255.0).mean())
        rng = jax.random.PRNGKey(seed if seed not in (-1, "", "-1") else self.sample_idx)
        video, _ = self.pipeline.animate_image(
            image, prompt, mask_img=np_mask, motion_strength=motion_strength,
            num_frames=int(vd.get("num_frames", 16)),
            num_inference_steps=int(sample_steps),
            guidance_scale=float(cfg_scale),
            rng=rng,
        )
        path = os.path.join(self.output_dir, f"{self.sample_idx}.gif")
        media.save_gif(path, media.to_uint8(np.asarray(video[0])), fps=8)
        self.sample_idx += 1
        return path


def ui(controller):  # pragma: no cover - requires gradio
    import gradio as gr

    with gr.Blocks() as demo:
        gr.Markdown("# AnimateAnything (TPU)")
        with gr.Row():
            init_img = gr.ImageEditor(label="Input image (draw the motion mask)")
            out = gr.Video(label="Result")
        prompt = gr.Textbox(label="Prompt")
        motion = gr.Slider(0, 10, value=3, label="Motion strength")
        steps = gr.Slider(1, 50, value=25, step=1, label="Steps")
        cfg = gr.Slider(1, 15, value=9, label="CFG")
        seed = gr.Textbox(value="-1", label="Seed")
        btn = gr.Button("Animate")
        btn.click(
            lambda img, m, p, st, c, s: controller.animate(
                img, m, p, sample_steps=st, cfg_scale=c, seed=s),
            [init_img, motion, prompt, steps, cfg, seed], out,
        )
    return demo


def main():
    from animate_anything_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--image", type=str, default=None)
    ap.add_argument("--mask", type=str, default=None)
    ap.add_argument("--prompt", type=str, default="")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--cfg", type=float, default=9.0)
    ap.add_argument("--motion", type=float, default=3.0)
    ap.add_argument("--serve", action="store_true", help="launch gradio UI")
    args, unknown = ap.parse_known_args()

    cfg = {}
    if args.config:
        from animate_anything_tpu.core import load_config

        cfg = load_config(args.config, overrides=[u for u in unknown if "=" in u]).to_dict()
    controller = AnimateController(
        cfg.get("pretrained_model_path"), cfg.get("validation_data"),
        output_dir=cfg.get("output_dir", "output/app"),
        model_size=cfg.get("model_size", "full"), attn_impl=cfg.get("attn_impl"),
    )
    if args.serve:
        ui(controller).launch()
        return
    from animate_anything_tpu.utils import media

    image = media.load_image(args.image)
    if args.mask:
        layers = np.zeros(image.shape[:2] + (4,), np.uint8)
        layers[..., 3] = np.asarray(media.load_image(args.mask))[..., 0]
        init = {"background": image, "layers": [layers]}
    else:
        init = image
    path = controller.animate(init, args.motion, args.prompt,
                              sample_steps=args.steps, cfg_scale=args.cfg)
    if args.out:
        os.replace(path, args.out)
        path = args.out
    print(path)


if __name__ == "__main__":
    main()
