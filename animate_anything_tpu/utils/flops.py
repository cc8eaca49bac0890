"""FLOP accounting for the flagship denoise workload (CPU-side lowering).

Run as a module (in a JAX_PLATFORMS=cpu subprocess — HLO cost analysis hangs
through the remote-TPU client):

    python -m animate_anything_tpu.utils.flops --frames 16 --res 512 --steps 25

Prints one line: the total FLOPs of the jitted denoise loop (CFG-doubled UNet
× steps + sampler math), from XLA's own cost model on the lowered HLO.
"""

from __future__ import annotations


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
    a = ap.parse_args()
    print(denoise_flops(a.frames, a.res, a.steps) + decode_flops(a.frames, a.res))
