"""Dump the optimized HLO of the headline jitted denoise step to
/tmp/denoise_hlo.txt (for profiling cross-reference)."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from animate_anything_tpu.core import enable_compilation_cache
    from animate_anything_tpu.diffusion import make_schedule
    from animate_anything_tpu.models import UNet3DConditionModel, UNet3DConfig
    from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig, decode_video
    from animate_anything_tpu.pipelines import LatentToVideoPipeline
    from animate_anything_tpu.utils.fast_init import init_params_host

    enable_compilation_cache()
    import os

    frames, res = 16, 512
    steps = int(os.environ.get("BENCH_STEPS", 25))
    hw = res // 8
    cfg = UNet3DConfig(motion_mask=True, motion_strength=True, attn_impl="pallas")
    unet = UNet3DConditionModel(cfg, dtype=jnp.bfloat16)
    b = 1
    latents = jnp.zeros((b, frames, hw, hw, 4), jnp.bfloat16)
    cond = jnp.zeros((b, 1, hw, hw, 4), jnp.bfloat16)
    mask = jnp.ones((b, 1, hw, hw, 1), jnp.bfloat16)
    embeds = jnp.zeros((2 * b, 77, 1024), jnp.bfloat16)
    motion = jnp.full((b,), 5.0, jnp.float32)
    uparams = init_params_host(
        unet, 0, latents, jnp.asarray(500), embeds[:b], cond, mask, motion,
        dtype=np.dtype("bfloat16"),
    )
    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    vparams = init_params_host(
        vae, 1, jnp.zeros((1, res, res, 3), jnp.bfloat16), dtype=np.dtype("bfloat16")
    )
    pipe = LatentToVideoPipeline(unet, uparams, vae, vparams, schedule=make_schedule())
    ts = tuple(int(t) for t in pipe.get_timesteps(steps))
    lowered = pipe._denoise_jit.lower(
        uparams, latents, cond, embeds, mask, motion,
        jnp.asarray(9.0, jnp.float32), ts)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/denoise_hlo.txt", "w") as f:
        f.write(txt)
    print("wrote /tmp/denoise_hlo.txt", len(txt))


if __name__ == "__main__":
    main()
