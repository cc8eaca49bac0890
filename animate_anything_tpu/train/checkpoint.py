"""Checkpointing: true train-state resume + diffusers-layout pipeline export.

Two formats, two jobs:

1. **Orbax train checkpoints** — params + optimizer state + step, restored
   exactly. This is a real resume, unlike the reference's
   ``resume_from_checkpoint`` which only fast-forwards the dataloader and
   silently drops optimizer state (/root/reference/train.py:555-559).
2. **Diffusers-layout pipeline directories** — the reference's ``save_pipe``
   (/root/reference/train.py:269-308) writes a full pipeline dir every
   ``checkpointing_steps``; we write the same layout (unet/ with config.json +
   safetensors, vae/, text_encoder/) via utils/import_torch exporters so our
   checkpoints remain loadable by the reference stack, and theirs by ours.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np


# --------------------------------------------------------------------------
# Orbax train state
# --------------------------------------------------------------------------

def save_checkpoint(ckpt_dir: str, state, keep: int = 3) -> str:
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    step = int(state.step)
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"params": state.params, "opt_state": state.opt_state,
                          "step": np.asarray(step)})
    # prune old checkpoints
    entries = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    for old in entries[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, old), ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    entries = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, entries[-1]) if entries else None


def restore_checkpoint(path: str, state):
    """Restore into the structure of ``state`` (a TrainState template)."""
    import orbax.checkpoint as ocp

    template = {"params": state.params, "opt_state": state.opt_state,
                "step": np.asarray(int(state.step))}
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), template)
    return state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(int(restored["step"])),
    )


# --------------------------------------------------------------------------
# Diffusers-layout pipeline directories
# --------------------------------------------------------------------------

def _save_safetensors(path: str, sd: dict) -> None:
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32)) for k, v in sd.items()}, path)


def save_pipeline(
    out_dir: str,
    unet_params: Any,
    unet_config,
    vae_params: Any = None,
    vae_config=None,
    text_params: Any = None,
    text_config=None,
) -> str:
    from animate_anything_tpu.utils.import_torch import (
        export_clip_text,
        export_unet3d,
        export_vae,
    )

    os.makedirs(out_dir, exist_ok=True)

    ucfg = dataclasses.asdict(unet_config)
    ucfg["_class_name"] = "UNet3DConditionModel"
    os.makedirs(os.path.join(out_dir, "unet"), exist_ok=True)
    with open(os.path.join(out_dir, "unet", "config.json"), "w") as f:
        json.dump(ucfg, f, indent=2, default=str)
    _save_safetensors(
        os.path.join(out_dir, "unet", "diffusion_pytorch_model.safetensors"),
        export_unet3d(unet_params),
    )

    if vae_params is not None:
        vcfg = dataclasses.asdict(vae_config) if vae_config else {}
        vcfg["_class_name"] = "AutoencoderKL"
        os.makedirs(os.path.join(out_dir, "vae"), exist_ok=True)
        with open(os.path.join(out_dir, "vae", "config.json"), "w") as f:
            json.dump(vcfg, f, indent=2, default=str)
        _save_safetensors(
            os.path.join(out_dir, "vae", "diffusion_pytorch_model.safetensors"),
            export_vae(vae_params),
        )

    if text_params is not None:
        tcfg = dataclasses.asdict(text_config) if text_config else {}
        os.makedirs(os.path.join(out_dir, "text_encoder"), exist_ok=True)
        with open(os.path.join(out_dir, "text_encoder", "config.json"), "w") as f:
            json.dump(tcfg, f, indent=2, default=str)
        _save_safetensors(
            os.path.join(out_dir, "text_encoder", "model.safetensors"),
            export_clip_text(text_params),
        )

    with open(os.path.join(out_dir, "model_index.json"), "w") as f:
        json.dump({"_class_name": "LatentToVideoPipeline",
                   "framework": "animate_anything_tpu"}, f, indent=2)
    return out_dir


def _load_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def load_pipeline_components(model_dir: str):
    """Load a diffusers-layout dir → (unet_config_kwargs, unet_sd_tree,
    vae_sd_tree, text_config_kwargs, text_sd_tree, scheduler_config).

    Works on both reference checkpoints (diffusers torch) and ours."""
    from animate_anything_tpu.utils.import_torch import (
        convert_clip_text,
        convert_unet3d,
        convert_vae,
        load_state_dict,
    )

    out: dict[str, Any] = {}
    unet_dir = os.path.join(model_dir, "unet")
    if os.path.isdir(unet_dir):
        out["unet_config"] = _load_json(os.path.join(unet_dir, "config.json"))
        out["unet"] = convert_unet3d(load_state_dict(unet_dir))
    vae_dir = os.path.join(model_dir, "vae")
    if os.path.isdir(vae_dir):
        out["vae_config"] = _load_json(os.path.join(vae_dir, "config.json"))
        out["vae"] = convert_vae(load_state_dict(vae_dir))
    te_dir = os.path.join(model_dir, "text_encoder")
    if os.path.isdir(te_dir):
        out["text_config"] = _load_json(os.path.join(te_dir, "config.json"))
        out["text_encoder"] = convert_clip_text(load_state_dict(te_dir))
    sched = os.path.join(model_dir, "scheduler", "scheduler_config.json")
    if os.path.exists(sched):
        out["scheduler_config"] = _load_json(sched)
    return out
