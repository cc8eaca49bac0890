"""Training/eval CLI with the reference's exact surface:

    python train.py --config example.yaml [--eval] key.subkey=value ...

(reference: /root/reference/train.py:859-871 — OmegaConf yaml + dotlist; here
core.config). ``main(**cfg)`` trains; ``main_eval(**cfg)`` runs batch
inference with motion metrics. One orchestrator covers base/LoRA workloads
(the reference duplicates this loop per script; SURVEY §1).
"""

from __future__ import annotations

import argparse
import os
import random
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.core import (
    AXIS_DATA,
    AXIS_FRAME,
    AXIS_TENSOR,
    Config,
    create_mesh,
    load_config,
)
from animate_anything_tpu.core.dtypes import policy_from_string
from animate_anything_tpu.core.mesh import shard_batch
from animate_anything_tpu.data import DataLoader, extend_datasets, get_train_dataset
from animate_anything_tpu.data.datasets import ConcatDataset
from animate_anything_tpu.data.loader import device_prefetch
from animate_anything_tpu.metrics.motion import calculate_motion_precision, latent_motion_score
from animate_anything_tpu.models.factory import build_models
from animate_anything_tpu.models.lora import LoraConfig, init_lora_params, load_lora, merge_lora, save_lora
from animate_anything_tpu.parallel import infer_state_shardings
from animate_anything_tpu.pipelines import LatentToVideoPipeline
from animate_anything_tpu.train import TrainConfig, create_train_state, make_train_step
from animate_anything_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    save_pipeline,
)
from animate_anything_tpu.utils import media
from animate_anything_tpu.utils.logging_util import MetricLogger


def _build_pipeline(models, pab=None) -> LatentToVideoPipeline:
    return LatentToVideoPipeline(
        models["unet"], models["unet_params"], models["vae"], models["vae_params"],
        text_encoder=models["text"], text_params=models["text_params"],
        tokenizer=models["tokenizer"], schedule=models["schedule"],
        pab=pab,
    )


def run_validation(models, validation_data: Config, output_dir: str, step: int,
                   motion_mask: bool, motion_strength: bool, rng=None,
                   eval_index: int = 0, pab=None) -> dict:
    """In-training validation sampling (reference train.py:606-610 →
    eval :731-787): animate the validation image, write a gif, report motion
    metrics."""
    pipe = _build_pipeline(models, pab=pab)
    vd = validation_data
    img_path = vd.get("prompt_image")
    h = int(vd.get("height", 512))
    w = int(vd.get("width", 512))
    if img_path and os.path.exists(img_path):
        # reference: rescale the image's NATIVE aspect to the validation
        # area, snapped to /8 (train.py:741-744) — not the config dims
        image = media.fit_image_to_area(img_path, h, w, multiple=8)
    else:
        image = (np.random.default_rng(0).random((h // 8 * 8, w // 8 * 8, 3)) * 255).astype(np.uint8)

    mask_path = vd.get("mask")
    mask_img = None
    if mask_path and os.path.exists(mask_path):
        mask_img = (
            media.read_labelme_mask(mask_path, image.shape[:2])
            if mask_path.endswith(".json")
            else np.asarray(media.load_image(mask_path, image.shape[:2]))[..., 0]
        )
        mask_img = np.where(mask_img != 0, 255, 0).astype(np.uint8)
    elif motion_mask:
        mask_img = np.full(image.shape[:2], 255, np.uint8)

    video, latents = pipe.animate_image(
        image,
        vd.get("prompt", ""),
        mask_img=mask_img,
        # reference default sweeps strength = index+3 across eval ITERS
        # (train.py:766: validation_data.get("strength", index+3); the
        # training loop calls batch_eval with iters=1 ⇒ strength 3)
        motion_strength=float(vd.get("strength", eval_index + 3)) if motion_strength else None,
        num_frames=int(vd.get("num_frames", 16)),
        num_inference_steps=int(vd.get("num_inference_steps", 25)),
        guidance_scale=float(vd.get("guidance_scale", 9)),
        rng=rng if rng is not None else jax.random.PRNGKey(step),
    )
    frames = media.to_uint8(np.asarray(video[0]))
    out = os.path.join(output_dir, "samples", f"step_{step}.gif")
    media.save_gif(out, frames, fps=int(vd.get("fps", 8)))
    # gif + mp4 + mask sidecars, as the reference writes (train.py:757-785)
    media.save_video(os.path.splitext(out)[0] + ".mp4", frames,
                     fps=int(vd.get("fps", 8)))
    if mask_img is not None:
        media.save_image(os.path.splitext(out)[0] + "_mask.jpg", mask_img)

    metrics: dict[str, Any] = {"sample_path": out}
    if mask_img is not None:
        metrics["motion_precision"] = calculate_motion_precision(frames, mask_img)
    metrics["latent_motion_score"] = float(latent_motion_score(latents)[0])
    return metrics


def main(**cfg_kw) -> str:
    from animate_anything_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config(cfg_kw)
    output_dir = cfg.get("output_dir", "./output")
    run_dir = os.path.join(output_dir, time.strftime("%Y-%m-%dT%H-%M-%S"))
    os.makedirs(run_dir, exist_ok=True)
    Config(cfg).save(os.path.join(run_dir, "config.yaml"))
    logger = MetricLogger(run_dir)

    seed = int(cfg.get("seed") or 0)
    random.seed(seed)
    np.random.seed(seed)
    rng = jax.random.PRNGKey(seed)

    policy = policy_from_string(cfg.get("mixed_precision", "bf16"))
    motion_mask = bool(cfg.get("motion_mask", False))
    motion_strength = bool(cfg.get("motion_strength", False))

    models = build_models(
        cfg.get("pretrained_model_path"),
        motion_mask=motion_mask,
        motion_strength=motion_strength,
        model_size=cfg.get("model_size", "full"),
        compute_dtype=policy.compute_dtype,
        rescale_schedule=bool(cfg.get("rescale_schedule", False)),
        attn_impl=cfg.get("attn_impl"),
        gradient_checkpointing=bool(cfg.get("gradient_checkpointing", False)),
        seed=seed,
    )

    # ---- data
    train_data = dict(cfg.get("train_data", {}))
    datasets = get_train_dataset(
        list(cfg.get("dataset_types", ["folder"])), train_data, models["tokenizer"]
    )
    for extra in cfg.get("extra_train_data", []) or []:
        datasets += get_train_dataset(
            list(extra.get("dataset_types", [])), dict(extra.get("train_data", {})),
            models["tokenizer"],
        )
    datasets = extend_datasets(datasets, extend=bool(cfg.get("extend_dataset", False)))
    dataset = ConcatDataset(datasets) if len(datasets) > 1 else datasets[0]

    # latent caching (reference cache_latents/cached_latent_dir,
    # train.py:367,667-670): pre-encode once, then train from npz latents
    if cfg.get("cached_latent_dir"):
        from animate_anything_tpu.data import CachedDataset

        dataset = CachedDataset(cache_dir=cfg.cached_latent_dir)
    elif bool(cfg.get("cache_latents", False)):
        from animate_anything_tpu.data import CachedDataset
        from animate_anything_tpu.models.vae import encode_video

        cache_dir = os.path.join(run_dir, "cached_latents")
        enc = jax.jit(lambda px: encode_video(models["vae"], models["vae_params"], px))
        for i in range(len(dataset)):
            item = dataset[i]
            latents = np.asarray(enc(jnp.asarray(item["pixel_values"])[None])[0])
            CachedDataset.save_item(cache_dir, i, {
                "latents": latents,
                "mask": item["mask"],
                "prompt_ids": item["prompt_ids"],
            })
        dataset = CachedDataset(cache_dir=cache_dir)
        print(f"cached {len(dataset)} latent items → {cache_dir}")

    batch_size = int(cfg.get("train_batch_size", 1))
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=True, seed=seed)

    # ---- trainer
    tconf = TrainConfig(
        learning_rate=float(cfg.get("learning_rate", 5e-6)),
        adam_weight_decay=float(cfg.get("adam_weight_decay", 1e-2)),
        use_8bit_adam=bool(cfg.get("use_8bit_adam", False)),
        max_grad_norm=float(cfg.get("max_grad_norm", 1.0)),
        gradient_accumulation_steps=int(cfg.get("gradient_accumulation_steps", 1)),
        trainable_modules=tuple(cfg.get("trainable_modules", ["all"])),
        not_trainable_modules=tuple(cfg.get("not_trainable_modules", [])),
        motion_mask=motion_mask,
        motion_strength=motion_strength,
        use_offset_noise=bool(cfg.get("use_offset_noise", False)),
        offset_noise_strength=float(cfg.get("offset_noise_strength", 0.1)),
        rescale_schedule=bool(cfg.get("rescale_schedule", False)),
        cache_latents=bool(cfg.get("cache_latents", False)),
    )
    # full mesh from config: data (default: all remaining chips) + optional
    # frame/tensor axes (context/tensor parallelism — SURVEY §2.4)
    mesh_cfg = dict(cfg.get("mesh", {}))
    mesh_shape = {AXIS_DATA: int(mesh_cfg.get("data", -1))}
    for ax in (AXIS_FRAME, AXIS_TENSOR):
        if int(mesh_cfg.get(ax, 1)) != 1:
            mesh_shape[ax] = int(mesh_cfg[ax])
    mesh = create_mesh(mesh_shape)

    # LoRA: the train state holds only the adapter tree(s) (reference
    # train_lora.py workload; both backends' capabilities in models/lora.py).
    # use_text_lora additionally adapts the CLIP text encoder (reference
    # train_lora.py:392-484, text_encoder_lora_modules).
    use_unet_lora = bool(cfg.get("use_unet_lora", False))
    use_text_lora = bool(cfg.get("use_text_lora", False))
    use_lora = use_unet_lora or use_text_lora
    lora_cfg = text_lora_cfg = None
    if use_unet_lora:
        lora_cfg = LoraConfig(
            rank=int(cfg.get("lora_rank", 16)),
            targets=tuple(cfg.get("unet_lora_modules", ["UNet3DConditionModel"])),
            include_convs=bool(cfg.get("lora_include_convs", False)),
            dropout=float(cfg.get("lora_unet_dropout", 0.0)),
        )
    if use_text_lora:
        text_lora_cfg = LoraConfig(
            rank=int(cfg.get("lora_rank", 16)),
            targets=tuple(cfg.get("text_encoder_lora_modules", ["CLIPEncoderLayer"])),
            dropout=float(cfg.get("lora_text_dropout", 0.0)),
        )
    if use_text_lora:
        lora_tree = {}
        if use_unet_lora:
            lora_tree["unet_lora"] = init_lora_params(
                jax.random.PRNGKey(seed + 7), models["unet_params"], lora_cfg)
        lora_tree["text_lora"] = init_lora_params(
            jax.random.PRNGKey(seed + 8), models["text_params"], text_lora_cfg)
        state = create_train_state(lora_tree, tconf)
    elif use_unet_lora:
        lora_tree = init_lora_params(jax.random.PRNGKey(seed + 7),
                                     models["unet_params"], lora_cfg)
        state = create_train_state(lora_tree, tconf)
    else:
        state = create_train_state(models["unet_params"], tconf)
    shardings = infer_state_shardings(state, mesh)
    state = jax.tree_util.tree_map(jax.device_put, state, shardings)

    resume = cfg.get("resume_from_checkpoint")
    if resume:
        path = resume if os.path.basename(resume).startswith("step_") else latest_checkpoint(resume)
        if path:
            state = restore_checkpoint(path, state)
            print(f"resumed from {path} at step {int(state.step)}")

    model_kw = dict(
        vae=models["vae"], vae_params=models["vae_params"],
        text_encoder=models["text"], text_params=models["text_params"],
    )
    if use_lora:
        from animate_anything_tpu.train import make_lora_train_step

        raw_step = make_lora_train_step(
            models["unet"], models["schedule"], tconf,
            base_params=models["unet_params"], lora_config=lora_cfg,
            text_base_params=models["text_params"] if use_text_lora else None,
            text_lora_config=text_lora_cfg, **model_kw,
        )
    else:
        raw_step = make_train_step(models["unet"], models["schedule"], tconf, **model_kw)
    step_fn = jax.jit(raw_step, donate_argnums=(0,))

    uncond_ids = models["tokenizer"]("", padding="max_length", max_length=77).input_ids

    max_steps = int(cfg.get("max_train_steps", 100))
    ckpt_steps = int(cfg.get("checkpointing_steps", max_steps))
    val_steps = int(cfg.get("validation_steps", max_steps * 10))
    sample_preview = bool(cfg.get("validation_data", {}).get("sample_preview", False))

    global_step = int(state.step)
    while global_step < max_steps:
        for batch in device_prefetch(iter(loader), mesh=mesh):
            if global_step >= max_steps:
                break
            batch.pop("text_prompt", None)
            batch.pop("dataset", None)
            batch.pop("motion", None)
            batch["uncond_ids"] = jnp.broadcast_to(
                jnp.asarray(uncond_ids), (batch["prompt_ids"].shape[0],) + tuple(np.shape(uncond_ids)[1:])
            )
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_fn(state, batch, step_rng)
            global_step = int(state.step)
            logger.log(global_step, {k: float(v) for k, v in metrics.items()},
                       echo=global_step % int(cfg.get("log_every", 10)) == 0)

            if global_step % ckpt_steps == 0 or global_step >= max_steps:
                save_checkpoint(os.path.join(run_dir, "ckpt"), state)
                if use_lora:
                    p = jax.device_get(state.params)
                    if use_unet_lora:
                        save_lora(
                            os.path.join(run_dir, f"lora_step_{global_step}.safetensors"),
                            p["unet_lora"] if use_text_lora else p, lora_cfg,
                        )
                    if use_text_lora:
                        # reference lora_handler saves a separate
                        # text_encoder adapter file (lora_handler.py:334-350)
                        save_lora(
                            os.path.join(
                                run_dir,
                                f"lora_step_{global_step}.text_encoder.safetensors"),
                            p["text_lora"], text_lora_cfg, prefix="text_encoder",
                        )
                if not use_lora and bool(cfg.get("save_pretrained_model", True)):
                    save_pipeline(
                        os.path.join(run_dir, f"pipeline_step_{global_step}"),
                        jax.device_get(state.params), models["unet_config"],
                        vae_params=jax.device_get(models["vae_params"]),
                        vae_config=models["vae_config"],
                        text_params=jax.device_get(models["text_params"]),
                        text_config=models["text_config"],
                    )
            if sample_preview and (global_step % val_steps == 0 or global_step == 5):
                if use_lora:
                    p = state.params
                    current = (
                        merge_lora(models["unet_params"],
                                   p["unet_lora"] if use_text_lora else p,
                                   lora_cfg, stop_base_gradient=False)
                        if use_unet_lora else models["unet_params"]
                    )
                    models_now = dict(models, unet_params=current)
                    if use_text_lora:
                        models_now["text_params"] = merge_lora(
                            models["text_params"], p["text_lora"],
                            text_lora_cfg, stop_base_gradient=False)
                else:
                    models_now = dict(models, unet_params=state.params)
                vm = run_validation(models_now, cfg.validation_data, run_dir,
                                    global_step, motion_mask, motion_strength)
                logger.log(global_step, {k: v for k, v in vm.items()
                                         if isinstance(v, (int, float))})
    logger.close()
    return run_dir


def main_eval(**cfg_kw) -> dict:
    from animate_anything_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    """Batch eval (reference main_eval/batch_eval, train.py:793-856)."""
    cfg = Config(cfg_kw)
    output_dir = cfg.get("output_dir", "./output")
    os.makedirs(output_dir, exist_ok=True)
    policy = policy_from_string(cfg.get("mixed_precision", "bf16"))
    motion_mask = bool(cfg.get("motion_mask", False))
    motion_strength = bool(cfg.get("motion_strength", False))
    models = build_models(
        cfg.get("pretrained_model_path"),
        motion_mask=motion_mask,
        motion_strength=motion_strength,
        model_size=cfg.get("model_size", "full"),
        compute_dtype=policy.compute_dtype,
        attn_impl=cfg.get("attn_impl"),
    )
    # inject_inferable_lora analog (reference utils/lora.py:482-526): merge a
    # saved adapter into the base weights before building the pipeline
    lora_path = cfg.get("lora_path")
    if lora_path:
        lora_tree, lcfg = load_lora(lora_path)
        models["unet_params"] = merge_lora(
            models["unet_params"], lora_tree, lcfg, stop_base_gradient=False
        )
    # text-encoder adapter: explicit path, or the sibling file the trainer
    # writes next to the unet adapter (use_text_lora)
    text_lora_path = cfg.get("lora_text_path")
    if not text_lora_path and lora_path:
        cand = os.path.splitext(lora_path)[0] + ".text_encoder.safetensors"
        text_lora_path = cand if os.path.exists(cand) else None
    if text_lora_path:
        tl_tree, tl_cfg = load_lora(text_lora_path, prefix="text_encoder")
        models["text_params"] = merge_lora(
            models["text_params"], tl_tree, tl_cfg, stop_base_gradient=False
        )
    iters = int(cfg.get("eval_iters", 1))
    precisions = []
    out = {}
    for i in range(iters):
        metrics = run_validation(
            models, cfg.get("validation_data", Config()), output_dir, i,
            motion_mask, motion_strength, rng=jax.random.PRNGKey(i),
            eval_index=i,
            pab=(dict(cfg.pab) if cfg.get("pab") else None),
        )
        print(metrics)
        if "motion_precision" in metrics:
            precisions.append(metrics["motion_precision"])
        out = metrics
    if precisions:
        out["mean_motion_precision"] = float(np.mean(precisions))
        print(f"mean motion precision: {out['mean_motion_precision']:.4f}")
    return out


def cli(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--eval", action="store_true")
    args, unknown = parser.parse_known_args(argv)
    cfg = load_config(args.config, overrides=[u for u in unknown if "=" in u])
    if args.eval:
        main_eval(**cfg.to_dict())
    else:
        main(**cfg.to_dict())


if __name__ == "__main__":
    cli()
