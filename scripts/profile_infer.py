"""Capture an op-level TPU profile of the headline denoise loop (512px/16f,
CFG, pallas attention) + VAE decode, and print a per-op rollup.

Usage: python scripts/profile_infer.py [steps]   (default 3 — the scan body
is identical per step, so a short loop profiles the steady state).
"""
import glob
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from animate_anything_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    frames, res = 16, 512
    hw = res // 8

    from animate_anything_tpu.diffusion import make_schedule
    from animate_anything_tpu.models import UNet3DConditionModel, UNet3DConfig
    from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig, decode_video
    from animate_anything_tpu.pipelines import LatentToVideoPipeline
    from animate_anything_tpu.utils.fast_init import init_params_host

    cfg = UNet3DConfig(motion_mask=True, motion_strength=True, attn_impl="pallas")
    unet = UNet3DConditionModel(cfg, dtype=jnp.bfloat16)
    b = 1
    latents = jnp.zeros((b, frames, hw, hw, 4), jnp.bfloat16)
    cond = jnp.zeros((b, 1, hw, hw, 4), jnp.bfloat16)
    mask = jnp.ones((b, 1, hw, hw, 1), jnp.bfloat16)
    embeds = jnp.zeros((2 * b, 77, 1024), jnp.bfloat16)
    motion = jnp.full((b,), 5.0, jnp.float32)
    print("materializing params...", file=sys.stderr, flush=True)
    uparams = init_params_host(unet, 0, latents, jnp.asarray(500), embeds[:b],
                               cond, mask, motion, dtype=np.dtype("bfloat16"))
    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    vparams = init_params_host(vae, 1, jnp.zeros((1, res, res, 3), jnp.bfloat16),
                               dtype=np.dtype("bfloat16"))
    pipe = LatentToVideoPipeline(unet, uparams, vae, vparams, schedule=make_schedule())
    ts = tuple(int(t) for t in pipe.get_timesteps(steps))

    def run(x):
        return pipe._denoise_jit(uparams, x, cond, embeds, mask, motion,
                                 jnp.asarray(9.0, jnp.float32), ts)

    decode = jax.jit(lambda lat: decode_video(vae, vparams, lat))
    print("compiling...", file=sys.stderr, flush=True)
    lat = run(latents)
    vid = decode(lat)
    float(vid.astype(jnp.float32).sum())

    logdir = "/root/repo/output/profile_infer_run"
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        lat = run(latents + 0.01)
        vid = decode(lat)
        float(vid.astype(jnp.float32).sum())

    planes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", planes, flush=True)


if __name__ == "__main__":
    main()
