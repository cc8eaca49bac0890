"""Measure per-phase wall time of the headline bench: denoise dispatch,
denoise block, decode block, scalar fetch roundtrip — to locate host-side
overhead between device modules (tunnel RTT, pytree dispatch cost)."""
import os
import sys
import time

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
        dtype=np.dtype("bfloat16"))
    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    vparams = init_params_host(
        vae, 1, jnp.zeros((1, res, res, 3), jnp.bfloat16), dtype=np.dtype("bfloat16"))
    pipe = LatentToVideoPipeline(unet, uparams, vae, vparams, schedule=make_schedule())
    ts = tuple(int(t) for t in pipe.get_timesteps(steps))
    decode = jax.jit(lambda lat: decode_video(vae, vparams, lat))

    # warm compile
    print("compiling...", file=sys.stderr)
    lat = pipe._denoise_jit(uparams, latents, cond, embeds, mask, motion,
                            jnp.asarray(9.0, jnp.float32), ts)
    vid = decode(lat)
    float(vid.astype(jnp.float32).sum())

    # tunnel RTT: scalar fetch of an already-ready tiny array
    one = jnp.asarray(1.0)
    one.block_until_ready()
    t0 = time.time(); [float(one) for _ in range(10)]; rtt = (time.time() - t0) / 10
    print(f"scalar fetch RTT            : {rtt*1e3:8.1f} ms")

    for i in range(3):
        x = latents + 0.01 * i
        x.block_until_ready()
        t0 = time.time()
        lat = pipe._denoise_jit(uparams, x, cond, embeds, mask, motion,
                                jnp.asarray(9.0, jnp.float32), ts)
        t1 = time.time()
        lat.block_until_ready()
        t2 = time.time()
        vid = decode(lat)
        t3 = time.time()
        vid.block_until_ready()
        t4 = time.time()
        s = float(vid.astype(jnp.float32).sum())
        t5 = time.time()
        print(f"iter {i}: denoise dispatch={1e3*(t1-t0):7.1f}ms  "
              f"denoise block={t2-t1:7.3f}s  decode dispatch={1e3*(t3-t2):7.1f}ms  "
              f"decode block={t4-t3:7.3f}s  sum+fetch={1e3*(t5-t4):7.1f}ms  "
              f"TOTAL={t5-t0:7.3f}s")


if __name__ == "__main__":
    main()
