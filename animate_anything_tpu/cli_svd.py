"""SVD training/eval CLI (reference surface: ``python train_svd.py --config
X.yaml [--eval] k.v=x`` — /root/reference/train_svd.py:828-840)."""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

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
from animate_anything_tpu.data import DataLoader, extend_datasets, get_train_dataset
from animate_anything_tpu.data.datasets import ConcatDataset
from animate_anything_tpu.data.loader import device_prefetch
from animate_anything_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
    preprocess_clip_image,
)
from animate_anything_tpu.models.svd_unet import SVDUNetConfig, UNetSpatioTemporalConditionModel
from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig
from animate_anything_tpu.parallel import infer_state_shardings
from animate_anything_tpu.pipelines.svd import MaskStableVideoDiffusionPipeline
from animate_anything_tpu.train import create_train_state
from animate_anything_tpu.train.checkpoint import save_checkpoint
from animate_anything_tpu.train.svd_trainer import SVDTrainConfig, make_svd_train_step
from animate_anything_tpu.utils import media
from animate_anything_tpu.utils.fast_init import init_params_host
from animate_anything_tpu.utils.logging_util import MetricLogger


def build_svd_models(
    pretrained_model_path: Optional[str] = None,
    motion_mask: bool = False,
    model_size: str = "full",
    compute_dtype=jnp.float32,
    seed: int = 0,
    attn_impl: Optional[str] = None,
    gradient_checkpointing: bool = False,
) -> dict:
    """SVD analog of factory.build_models. Random host init when no checkpoint
    (weight import for the SVD family lands with the diffusers-SVD key maps)."""
    in_ch = 9 if motion_mask else 8
    ukw = dict(in_channels=in_ch, attn_impl=attn_impl,
               gradient_checkpointing=gradient_checkpointing)
    if model_size == "tiny":
        ucfg = SVDUNetConfig.tiny(**ukw)
        vcfg = VAEConfig.tiny()
        icfg = CLIPVisionConfig.tiny(projection_dim=ucfg.cross_attention_dim)
    else:
        ucfg = SVDUNetConfig(**ukw)
        vcfg = VAEConfig()
        icfg = CLIPVisionConfig()
    unet = UNetSpatioTemporalConditionModel(ucfg, dtype=compute_dtype)
    vae = AutoencoderKL(vcfg, dtype=compute_dtype)
    ienc = CLIPVisionModelWithProjection(icfg, dtype=compute_dtype)

    hw = 8
    uparams = init_params_host(
        unet, seed,
        jnp.zeros((1, 2, hw, hw, in_ch), compute_dtype), jnp.asarray(0.5),
        jnp.zeros((1, 1, ucfg.cross_attention_dim), compute_dtype), jnp.zeros((1, 3)),
    )
    vparams = init_params_host(vae, seed + 1, jnp.zeros((1, 64, 64, 3), compute_dtype))
    iparams = init_params_host(
        ienc, seed + 2, jnp.zeros((1, icfg.image_size, icfg.image_size, 3), compute_dtype)
    )
    return dict(unet=unet, unet_params=uparams, unet_config=ucfg,
                vae=vae, vae_params=vparams, vae_config=vcfg,
                image_encoder=ienc, image_encoder_params=iparams, image_config=icfg)


def main(**cfg_kw) -> str:
    from animate_anything_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config(cfg_kw)
    run_dir = os.path.join(cfg.get("output_dir", "./output"), time.strftime("svd_%Y-%m-%dT%H-%M-%S"))
    os.makedirs(run_dir, exist_ok=True)
    Config(cfg).save(os.path.join(run_dir, "config.yaml"))
    logger = MetricLogger(run_dir)
    seed = int(cfg.get("seed") or 0)
    rng = jax.random.PRNGKey(seed)
    policy = policy_from_string(cfg.get("mixed_precision", "bf16"))
    motion_mask = bool(cfg.get("motion_mask", False))

    models = build_svd_models(
        cfg.get("pretrained_model_path"), motion_mask=motion_mask,
        model_size=cfg.get("model_size", "full"), compute_dtype=policy.compute_dtype,
        seed=seed, attn_impl=cfg.get("attn_impl"),
        gradient_checkpointing=bool(cfg.get("gradient_checkpointing", False)),
    )
    datasets = get_train_dataset(
        list(cfg.get("dataset_types", ["folder"])), dict(cfg.get("train_data", {})), None
    )
    # secondary dataset groups + length balancing, as in the reference
    # (/root/reference/train_svd.py:561-575 extra_train_data / extend_dataset)
    for extra in cfg.get("extra_train_data", []) or []:
        datasets += get_train_dataset(
            list(extra.get("dataset_types", [])), dict(extra.get("train_data", {})), None
        )
    datasets = extend_datasets(datasets, extend=bool(cfg.get("extend_dataset", False)))
    dataset = ConcatDataset(datasets) if len(datasets) > 1 else datasets[0]
    loader = DataLoader(dataset, batch_size=int(cfg.get("train_batch_size", 1)),
                        shuffle=True, seed=seed)

    tconf = SVDTrainConfig(
        learning_rate=float(cfg.get("learning_rate", 5e-6)),
        adam_weight_decay=float(cfg.get("adam_weight_decay", 1e-2)),
        gradient_accumulation_steps=int(cfg.get("gradient_accumulation_steps", 1)),
        trainable_modules=tuple(cfg.get("trainable_modules", ["all"])),
        motion_mask=motion_mask,
    )
    mesh_cfg = dict(cfg.get("mesh", {}))
    mesh_shape = {AXIS_DATA: int(mesh_cfg.get("data", 1))}
    for ax in (AXIS_FRAME, AXIS_TENSOR):
        if int(mesh_cfg.get(ax, 1)) != 1:
            mesh_shape[ax] = int(mesh_cfg[ax])
    mesh = create_mesh(mesh_shape)
    state = create_train_state(models["unet_params"], tconf)
    state = jax.tree_util.tree_map(jax.device_put, state, infer_state_shardings(state, mesh))

    step_fn = jax.jit(make_svd_train_step(
        models["unet"], tconf, vae=models["vae"], vae_params=models["vae_params"],
        image_encoder=models["image_encoder"],
        image_encoder_params=models["image_encoder_params"],
    ), donate_argnums=(0,))

    icfg = models["image_config"]
    max_steps = int(cfg.get("max_train_steps", 100))
    ckpt_steps = int(cfg.get("checkpointing_steps", max_steps))
    global_step = int(state.step)
    while global_step < max_steps:
        for batch in device_prefetch(iter(loader), mesh=mesh):
            if global_step >= max_steps:
                break
            px = np.asarray(batch.pop("pixel_values"))
            clip_px = np.concatenate([
                preprocess_clip_image(
                    media.to_uint8(px[i, 0]), icfg.image_size
                ) for i in range(px.shape[0])
            ])
            dev_batch = {
                "pixel_values": jnp.asarray(px),
                "mask": jnp.asarray(np.asarray(batch["mask"], np.float32)),
                "clip_pixel_values": jnp.asarray(clip_px, jnp.float32),
            }
            rng, sr = jax.random.split(rng)
            state, metrics = step_fn(state, dev_batch, sr)
            global_step = int(state.step)
            logger.log(global_step, {k: float(v) for k, v in metrics.items()},
                       echo=global_step % int(cfg.get("log_every", 10)) == 0)
            if global_step % ckpt_steps == 0 or global_step >= max_steps:
                save_checkpoint(os.path.join(run_dir, "ckpt"), state)
                if bool(cfg.get("save_pretrained_model", True)):
                    _save_svd_pipeline(
                        os.path.join(run_dir, f"pipeline_step_{global_step}"),
                        jax.device_get(state.params), models["unet_config"],
                    )
    logger.close()
    return run_dir


def _save_svd_pipeline(out_dir: str, unet_params, unet_config) -> str:
    """diffusers-layout export for the SVD unet (save_pipe parity)."""
    import dataclasses
    import json

    from safetensors.numpy import save_file

    from animate_anything_tpu.utils.import_torch import export_svd_unet

    os.makedirs(os.path.join(out_dir, "unet"), exist_ok=True)
    cfg = dataclasses.asdict(unet_config)
    cfg["_class_name"] = "UNetSpatioTemporalConditionModel"
    with open(os.path.join(out_dir, "unet", "config.json"), "w") as f:
        json.dump(cfg, f, indent=2, default=str)
    sd = export_svd_unet(unet_params)
    save_file(
        {k: np.ascontiguousarray(np.asarray(v, np.float32)) for k, v in sd.items()},
        os.path.join(out_dir, "unet", "diffusion_pytorch_model.safetensors"),
    )
    return out_dir


def main_eval(**cfg_kw) -> dict:
    from animate_anything_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config(cfg_kw)
    out_dir = cfg.get("output_dir", "./output")
    os.makedirs(out_dir, exist_ok=True)
    policy = policy_from_string(cfg.get("mixed_precision", "bf16"))
    motion_mask = bool(cfg.get("motion_mask", False))
    models = build_svd_models(
        cfg.get("pretrained_model_path"), motion_mask=motion_mask,
        model_size=cfg.get("model_size", "full"), compute_dtype=policy.compute_dtype,
        attn_impl=cfg.get("attn_impl"),
    )
    pipe = MaskStableVideoDiffusionPipeline(
        models["unet"], models["unet_params"], models["vae"], models["vae_params"],
        image_encoder=models["image_encoder"],
        image_encoder_params=models["image_encoder_params"],
    )
    vd = cfg.get("validation_data", Config())
    h, w = int(vd.get("height", 512)), int(vd.get("width", 512))
    num_frames = int(vd.get("num_frames", 14))

    # eval_file: JSON list of [image, prompt] pairs, `iters` samples each
    # (reference batch-eval surface, /root/reference/train_svd.py:810-826)
    eval_file = cfg.get("eval_file")
    if eval_file:
        import json as _json

        with open(eval_file) as f:
            eval_list = _json.load(f)
        iters = int(cfg.get("iters", 5))
    else:
        eval_list = [[vd.get("prompt_image"), vd.get("prompt", "")]]
        iters = 1

    def sample_one(img_path, seed, out_stem=None):
        if img_path and os.path.exists(img_path):
            # area-preserving rescale of the image's NATIVE aspect to the
            # validation area, snapped to 64-multiples (reference
            # train_svd.py:739-742, block_size=64)
            image = media.fit_image_to_area(img_path, h, w, multiple=64)
        else:
            image = (np.random.default_rng(0).random((h, w, 3)) * 255).astype(np.uint8)
        mask = None
        if motion_mask:
            lh, lw = image.shape[0] // 8, image.shape[1] // 8
            # sidecar motion mask: <image>_label.jpg, binarized, else all-ones
            # (reference train_svd.py:744-753)
            # (splitext, not the reference's split('.')[0], which breaks on
            # dotted directories — train_svd.py:744)
            label_path = os.path.splitext(img_path)[0] + "_label.jpg" if img_path else ""
            if label_path and os.path.exists(label_path):
                np_mask = media.load_image(label_path)[..., 0]
                np_mask = (np_mask != 0).astype(np.float32)
                if out_stem:
                    media.save_image(out_stem + "_mask.jpg",
                                     (np_mask * 255).astype(np.uint8))
                from PIL import Image as _Image

                m = _Image.fromarray((np_mask * 255).astype(np.uint8))
                np_mask = np.asarray(m.resize((lw, lh), _Image.NEAREST)) / 255.0
                mask = jnp.asarray(np_mask, jnp.float32)[None, None, :, :, None]
            else:
                mask = jnp.ones((1, 1, lh, lw, 1))
        video, _latents = pipe(
            image, mask=mask,
            num_frames=num_frames,
            num_inference_steps=int(vd.get("num_inference_steps", 25)),
            decode_chunk_size=int(vd.get("decode_chunk_size", 0)) or None,
            fps=int(vd.get("fps", 7)),
            motion_bucket_id=int(vd.get("motion_bucket_id", 127)),
            rng=jax.random.PRNGKey(seed),
        )
        return media.to_uint8(np.asarray(video[0]))

    base_seed = int(cfg.get("seed") or 0)
    paths = []
    for name, _prompt in eval_list:
        stem = os.path.splitext(os.path.basename(name))[0] if name else "svd_sample"
        sub = os.path.join(out_dir, stem) if eval_file else out_dir
        os.makedirs(sub, exist_ok=True)
        for t in range(iters):
            fname = f"{t}.gif" if eval_file else "svd_sample.gif"
            out_path = os.path.join(sub, fname)
            frames = sample_one(name, base_seed + t,
                                out_stem=os.path.splitext(out_path)[0])
            path = media.save_gif(out_path, frames, fps=int(vd.get("fps", 7)))
            print("save file", path)
            paths.append(path)
    print({"sample_path": paths[-1]})
    return {"sample_path": paths[-1], "sample_paths": paths}


def cli(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--eval", action="store_true")
    args, unknown = parser.parse_known_args(argv)
    cfg = load_config(args.config, overrides=[u for u in unknown if "=" in u])
    (main_eval if args.eval else main)(**cfg.to_dict())


if __name__ == "__main__":
    cli()
