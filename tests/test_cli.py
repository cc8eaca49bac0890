"""End-to-end CLI tests: tiny random-init model, real dataset files, a few
train steps with checkpoint + pipeline export, resume, and batch eval —
the framework analog of BASELINE config 1 (CPU-runnable eval slice)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from animate_anything_tpu import cli
from animate_anything_tpu.core.config import load_config

# full train/eval loops with multi-minute compiles on the 1-core box:
# the whole module lives in the slow tier (run `pytest tests/` for it)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    vids = d / "vids"
    vids.mkdir()
    rng = np.random.default_rng(0)
    for name in ("a", "b"):
        base = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        frames = []
        for i in range(6):
            fr = base.copy()
            fr[4:12, (2 + 3 * i) : (8 + 3 * i)] = [255, 0, 0]
            frames.append(Image.fromarray(fr))
        frames[0].save(vids / f"{name}.gif", save_all=True, append_images=frames[1:],
                       duration=100, loop=0)
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(d / "prompt.png")
    return d


def _train_cfg(workdir, out):
    return dict(
        output_dir=str(out),
        model_size="tiny",
        mixed_precision="no",
        motion_mask=True,
        motion_strength=True,
        dataset_types=["folder"],
        train_data=dict(path=str(workdir / "vids"), width=16, height=16,
                        n_sample_frames=4, motion_threshold=0),
        train_batch_size=2,
        max_train_steps=3,
        checkpointing_steps=3,
        learning_rate=1e-4,
        log_every=1,
        validation_data=dict(sample_preview=False),
        mesh=dict(data=1),
    )


def test_train_eval_roundtrip(workdir, tmp_path):
    out = tmp_path / "out"
    run_dir = cli.main(**_train_cfg(workdir, out))
    # training log exists with 3 steps
    lines = [json.loads(l) for l in open(os.path.join(run_dir, "train_log.jsonl"))]
    steps = [l["step"] for l in lines if "loss" in l]
    assert steps and steps[-1] == 3
    assert np.isfinite(lines[-1]["loss"])
    # checkpoint + diffusers-layout pipeline written
    assert os.path.isdir(os.path.join(run_dir, "ckpt", "step_00000003"))
    pipe_dir = os.path.join(run_dir, "pipeline_step_3")
    assert os.path.exists(os.path.join(pipe_dir, "unet", "diffusion_pytorch_model.safetensors"))
    assert os.path.exists(os.path.join(pipe_dir, "unet", "config.json"))

    # eval from the exported pipeline (random tiny weights, just must run)
    metrics = cli.main_eval(
        output_dir=str(tmp_path / "eval"),
        pretrained_model_path=pipe_dir,
        model_size="tiny",
        mixed_precision="no",
        motion_mask=True,
        motion_strength=True,
        validation_data=dict(
            prompt="a red square moves",
            prompt_image=str(workdir / "prompt.png"),
            width=32, height=32, num_frames=4, num_inference_steps=3,
            guidance_scale=9, strength=4,
        ),
    )
    assert "latent_motion_score" in metrics
    assert os.path.exists(metrics["sample_path"])


def test_resume_from_checkpoint(workdir, tmp_path):
    out = tmp_path / "out2"
    cfg = _train_cfg(workdir, out)
    run_dir = cli.main(**cfg)
    cfg["resume_from_checkpoint"] = os.path.join(run_dir, "ckpt")
    cfg["max_train_steps"] = 5
    run_dir2 = cli.main(**cfg)
    lines = [json.loads(l) for l in open(os.path.join(run_dir2, "train_log.jsonl"))]
    steps = [l["step"] for l in lines if "loss" in l]
    assert steps[0] == 4 and steps[-1] == 5  # resumed at true step, not 0


def test_cli_arg_surface(workdir, tmp_path, capsys):
    cfgfile = tmp_path / "c.yaml"
    cfg = _train_cfg(workdir, tmp_path / "out3")
    import yaml

    cfgfile.write_text(yaml.safe_dump(cfg))
    cli.cli(["--config", str(cfgfile), "max_train_steps=1", "log_every=1"])
    # dotlist override applied: exactly 1 step trained
    runs = sorted((tmp_path / "out3").iterdir())
    lines = [json.loads(l) for l in open(os.path.join(runs[-1], "train_log.jsonl"))]
    assert max(l["step"] for l in lines) == 1


def test_lora_cli_text_and_unet(workdir, tmp_path):
    """use_unet_lora + use_text_lora (reference train_lora.py surface): both
    adapter files saved; eval merges both back."""
    import glob

    cfg = _train_cfg(workdir, tmp_path / "out_lora")
    cfg.update(
        use_unet_lora=True,
        use_text_lora=True,
        lora_rank=2,
        unet_lora_modules=["CrossAttention"],
        save_pretrained_model=False,
        max_train_steps=2,
        checkpointing_steps=2,
    )
    run_dir = cli.main(**cfg)
    unet_files = [f for f in glob.glob(os.path.join(run_dir, "lora_step_*.safetensors"))
                  if not f.endswith(".text_encoder.safetensors")]
    text_files = glob.glob(os.path.join(run_dir, "lora_step_*.text_encoder.safetensors"))
    assert unet_files and text_files

    metrics = cli.main_eval(
        output_dir=str(tmp_path / "eval_lora"),
        model_size="tiny",
        mixed_precision="no",
        motion_mask=True,
        motion_strength=True,
        lora_path=unet_files[0],   # .text_encoder sibling is found implicitly
        validation_data=dict(
            prompt="a red square moves",
            prompt_image=str(workdir / "prompt.png"),
            width=32, height=32, num_frames=4, num_inference_steps=2,
            guidance_scale=9, strength=4,
        ),
    )
    assert os.path.exists(metrics["sample_path"])


def test_shipped_yaml_wires_remat_and_mesh(workdir, tmp_path):
    """The flagship yaml must actually reach the model: gradient_checkpointing
    flows config → build_models → UNet3DConfig (VERDICT r1: the key used to be
    dead, making the documented 512px finetune OOM without remat), and the
    mesh block accepts frame/tensor axes (SURVEY §2.4)."""
    from animate_anything_tpu.models.factory import build_models

    cfg = load_config("configs/train_mask_motion.yaml")
    assert bool(cfg.get("gradient_checkpointing")) is True

    models = build_models(
        None,
        motion_mask=bool(cfg.get("motion_mask")),
        motion_strength=bool(cfg.get("motion_strength")),
        model_size="tiny",
        gradient_checkpointing=bool(cfg.get("gradient_checkpointing", False)),
    )
    assert models["unet_config"].gradient_checkpointing is True

    # the SVD factory takes the same key (cli_svd reads it from the yaml)
    from animate_anything_tpu.cli_svd import build_svd_models

    svd = build_svd_models(None, model_size="tiny", gradient_checkpointing=True)
    assert svd["unet_config"].gradient_checkpointing is True

    # and a remat'd tiny train run still steps (full CLI path, yaml-style kwargs)
    cfg_kw = _train_cfg(workdir, tmp_path / "out_remat")
    cfg_kw.update(gradient_checkpointing=True, max_train_steps=1,
                  checkpointing_steps=1, save_pretrained_model=False,
                  mesh=dict(data=2, frame=2))
    run_dir = cli.main(**cfg_kw)
    lines = [json.loads(l) for l in open(os.path.join(run_dir, "train_log.jsonl"))]
    assert np.isfinite(lines[-1]["loss"])
