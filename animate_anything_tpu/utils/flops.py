"""FLOP accounting for the flagship denoise workload (CPU-side lowering).

Run as a module (in a JAX_PLATFORMS=cpu subprocess — HLO cost analysis hangs
through the remote-TPU client):

    python -m animate_anything_tpu.utils.flops --frames 16 --res 512 --steps 25

Prints one line: the total FLOPs of the jitted denoise loop (CFG-doubled UNet
× steps + sampler math), from XLA's own cost model on the lowered HLO.
"""

from __future__ import annotations

# Per-chip bf16 matmul peaks (FLOP/s) for the MFU denominator, keyed on
# substrings of jax's device_kind. Fallback is v5e (this image's chip);
# AA_PEAK_FLOPS overrides everything (e.g. a kind we don't know yet).
_PEAK_BF16 = {
    "v5 lite": 197e12,   # v5e — device_kind reports "TPU v5 lite"
    "v5litepod": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v5": 459e12,        # plain "TPU v5" (v5p) — checked after the lite keys
    "v6 lite": 918e12,   # v6e / Trillium
    "v6e": 918e12,
    "v4": 275e12,
    "v3": 123e12,
    "v2": 45e12,
}
# The honest-baseline estimate: A100 bf16 peak × a realistic diffusion-UNet
# MFU (40% is generous to the reference — measured torch/diffusers UNet MFUs
# cluster at 30-40%). BASELINE.md: no published number exists to cite.
A100_BF16_PEAK = 312e12
A100_MFU_EST = 0.40


def device_peak_flops(device=None) -> float:
    """bf16 peak FLOP/s of the benching chip, for MFU. Env override
    AA_PEAK_FLOPS wins; unknown kinds fall back to v5e (warned)."""
    import os

    if os.environ.get("AA_PEAK_FLOPS"):
        return float(os.environ["AA_PEAK_FLOPS"])
    import jax

    d = device if device is not None else jax.devices()[0]
    kind = str(getattr(d, "device_kind", "")).lower()
    for key, peak in _PEAK_BF16.items():
        if key in kind:
            return peak
    import sys

    print(f"# unknown device_kind {kind!r}: assuming v5e peak "
          "(set AA_PEAK_FLOPS to correct)", file=sys.stderr)
    return 197e12


def a100_baseline_sec(flops: float) -> float:
    """Analytic A100 wall-clock estimate for `flops` (vs_baseline numerator)."""
    return flops / (A100_BF16_PEAK * A100_MFU_EST)


def measured_flops(workload: str, *, frames: int, res: int, steps: int = 25,
                   batch: int = 1, timeout: int = 900) -> float:
    """Lower the named workload in a JAX_PLATFORMS=cpu subprocess and return
    XLA's own FLOP count (HLO cost analysis hangs through the remote-TPU
    client; CPU lowering of the same program is backend-independent math).
    Returns nan on any failure — bench scripts degrade to vs_baseline=1.0."""
    import os
    import subprocess
    import sys

    try:
        # Pin the FLOP count to the math-minimal implementation: the block-
        # diagonal small-K attention (ops/flash_attention.py) trades h×
        # redundant MACs for relayout-free layouts — a wall-clock win that
        # must NOT inflate the analytic A100 baseline, which stands for the
        # model's intrinsic work.
        env = dict(os.environ, JAX_PLATFORMS="cpu", AA_SMALLK="xla")
        out = subprocess.run(
            [sys.executable, "-m", "animate_anything_tpu.utils.flops",
             "--workload", workload, "--batch", str(batch),
             "--frames", str(frames), "--res", str(res), "--steps", str(steps)],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
        )
        return float(out.stdout.strip().splitlines()[-1])
    except Exception:
        return float("nan")


def denoise_flops(frames: int, res: int, steps: int) -> float:
    import jax
    import jax.numpy as jnp

    from animate_anything_tpu.diffusion import make_schedule
    from animate_anything_tpu.models import UNet3DConditionModel, UNet3DConfig
    from animate_anything_tpu.pipelines import LatentToVideoPipeline

    hw = res // 8
    cfg = UNet3DConfig(motion_mask=True, motion_strength=True)
    unet = UNet3DConditionModel(cfg, dtype=jnp.bfloat16)
    S = jax.ShapeDtypeStruct
    lat = S((1, frames, hw, hw, 4), jnp.bfloat16)
    cond = S((1, 1, hw, hw, 4), jnp.bfloat16)
    mask = S((1, 1, hw, hw, 1), jnp.bfloat16)
    embeds = S((2, 77, 1024), jnp.bfloat16)
    motion = S((1,), jnp.float32)
    params = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        lat, S((), jnp.int32), S((1, 77, 1024), jnp.bfloat16), cond, mask, motion,
    )
    pipe = LatentToVideoPipeline(unet, None, None, None, schedule=make_schedule())
    ts = tuple(int(t) for t in pipe.get_timesteps(steps))
    # XLA cost analysis counts a lax.scan body ONCE (verified: 1-step and
    # 3-step lowerings report identical flops), so lower a single-step loop
    # and scale by the step count.
    low = pipe._denoise_jit.lower(
        params, lat, cond, embeds, mask, motion, S((), jnp.float32), ts[:1]
    )
    return float(low.cost_analysis()["flops"]) * steps


def decode_flops(frames: int, res: int) -> float:
    """FLOPs of the frame-batched VAE decode that bench.py times alongside
    the denoise loop (the reference's timed path decodes too:
    /root/reference/models/pipeline.py:200-205)."""
    import jax
    import jax.numpy as jnp

    from animate_anything_tpu.models.vae import (AutoencoderKL, VAEConfig,
                                                 decode_video)

    hw = res // 8
    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    S = jax.ShapeDtypeStruct
    vparams = jax.eval_shape(
        vae.init, jax.random.PRNGKey(0), S((1, res, res, 3), jnp.bfloat16)
    )
    lat = S((1, frames, hw, hw, 4), jnp.bfloat16)
    low = jax.jit(
        lambda p, x: decode_video(vae, p, x)
    ).lower(vparams, lat)
    return float(low.cost_analysis()["flops"])


def train_step_flops(batch: int, frames: int, res: int) -> float:
    """FLOPs of one full-finetune optimizer step (fwd + bwd + remat recompute
    + 8-bit Adam), the workload bench_train.py times."""
    import jax
    import jax.numpy as jnp

    from animate_anything_tpu.diffusion import make_schedule
    from animate_anything_tpu.models import UNet3DConditionModel, UNet3DConfig
    from animate_anything_tpu.train.trainer import (TrainConfig,
                                                    create_train_state,
                                                    make_train_step)

    hw = res // 8
    cfg = UNet3DConfig(motion_mask=True, motion_strength=True,
                       gradient_checkpointing=True)
    unet = UNet3DConditionModel(cfg, dtype=jnp.bfloat16)
    S = jax.ShapeDtypeStruct
    lat = S((batch, frames, hw, hw, 4), jnp.bfloat16)
    params = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), lat, S((), jnp.int32),
        S((batch, 77, 1024), jnp.bfloat16),
        S((batch, 1, hw, hw, 4), jnp.bfloat16),
        S((batch, 1, hw, hw, 1), jnp.bfloat16), S((batch,), jnp.float32),
    )
    tconf = TrainConfig(motion_mask=True, motion_strength=True,
                        use_8bit_adam=True)
    state = jax.eval_shape(lambda p: create_train_state(p, tconf), params)
    batch_d = {
        "latents": lat,
        "mask": S((batch, res, res), jnp.float32),
        "encoder_hidden_states": S((batch, 77, 1024), jnp.bfloat16),
        "uncond_hidden_states": S((batch, 77, 1024), jnp.bfloat16),
    }
    low = jax.jit(make_train_step(unet, make_schedule(), tconf)).lower(
        state, batch_d, jax.random.PRNGKey(0))
    return float(low.cost_analysis()["flops"])


def svd_train_step_flops(batch: int, frames: int, res: int) -> float:
    """FLOPs of one SVD finetune optimizer step (VAE encode + EDM loss fwd +
    bwd + remat recompute + 8-bit Adam) — the workload bench_train_svd.py
    times (reference loop: /root/reference/train_svd.py:347-432)."""
    import jax
    import jax.numpy as jnp

    from animate_anything_tpu.models.svd_unet import (
        SVDUNetConfig, UNetSpatioTemporalConditionModel)
    from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig
    from animate_anything_tpu.train.svd_trainer import (SVDTrainConfig,
                                                        make_svd_train_step)
    from animate_anything_tpu.train.trainer import create_train_state

    hw = res // 8
    ucfg = SVDUNetConfig(in_channels=9, gradient_checkpointing=True)
    unet = UNetSpatioTemporalConditionModel(ucfg, dtype=jnp.bfloat16)
    S = jax.ShapeDtypeStruct
    params = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        S((batch, frames, hw, hw, 9), jnp.bfloat16), S((), jnp.float32),
        S((batch, 1, ucfg.cross_attention_dim), jnp.bfloat16),
        S((batch, 3), jnp.float32),
    )
    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    # vae_params is closure-captured by the step fn, so it must be concrete
    # (zeros — lowering only needs shapes/dtypes, not values)
    vshapes = jax.eval_shape(
        vae.init, jax.random.PRNGKey(1), S((1, res, res, 3), jnp.bfloat16))
    vparams = jax.tree_util.tree_map(
        lambda sh: jnp.zeros(sh.shape, sh.dtype), vshapes)
    tconf = SVDTrainConfig(motion_mask=True, use_8bit_adam=True)
    state = jax.eval_shape(lambda p: create_train_state(p, tconf), params)
    batch_d = {
        "pixel_values": S((batch, frames, res, res, 3), jnp.bfloat16),
        "mask": S((batch, res, res), jnp.float32),
        "image_embeddings": S((batch, 1, ucfg.cross_attention_dim), jnp.bfloat16),
    }
    low = jax.jit(
        make_svd_train_step(unet, tconf, vae=vae, vae_params=vparams)
    ).lower(state, batch_d, jax.random.PRNGKey(0))
    return float(low.cost_analysis()["flops"])


def svd_flops(frames: int, res: int, steps: int) -> float:
    """FLOPs of the SVD denoise scan + chunked decode (bench_svd.py's path)."""
    import jax
    import jax.numpy as jnp

    from animate_anything_tpu.models.svd_unet import (
        SVDUNetConfig, UNetSpatioTemporalConditionModel)
    from animate_anything_tpu.pipelines.svd import (
        MaskStableVideoDiffusionPipeline)

    hw = res // 8
    cfg = SVDUNetConfig(in_channels=8)
    unet = UNetSpatioTemporalConditionModel(cfg, dtype=jnp.bfloat16)
    S = jax.ShapeDtypeStruct
    params = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        S((1, 2, hw, hw, 8), jnp.bfloat16), S((), jnp.float32),
        S((1, 1, cfg.cross_attention_dim), jnp.bfloat16), S((1, 3), jnp.float32),
    )
    pipe = MaskStableVideoDiffusionPipeline(unet, None, None, None)
    lat = S((1, frames, hw, hw, 4), jnp.bfloat16)
    cond2 = S((2, frames, hw, hw, 4), jnp.bfloat16)
    emb2 = S((2, 1, cfg.cross_attention_dim), jnp.bfloat16)
    added2 = S((2, 3), jnp.float32)
    guide = S((1, frames, 1, 1, 1), jnp.float32)
    low = pipe._denoise_jit.lower(
        params, lat, cond2, None, emb2, added2, guide,
        jax.random.PRNGKey(0), num_steps=1)
    return float(low.cost_analysis()["flops"]) * steps + decode_flops(frames, res)


if __name__ == "__main__":
    import argparse
    import os

    assert os.environ.get("JAX_PLATFORMS") == "cpu", "run with JAX_PLATFORMS=cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--workload", choices=("denoise", "train", "svd",
                                           "svd_train"),
                    default="denoise")
    a = ap.parse_args()
    if a.workload == "train":
        print(train_step_flops(a.batch, a.frames, a.res))
    elif a.workload == "svd_train":
        print(svd_train_step_flops(a.batch, a.frames, a.res))
    elif a.workload == "svd":
        print(svd_flops(a.frames, a.res, a.steps))
    else:
        print(denoise_flops(a.frames, a.res, a.steps) + decode_flops(a.frames, a.res))
