#!/usr/bin/env python
"""SVD-family benchmark: seconds per 14-frame 512px video at 25 Euler steps
with per-frame linspace CFG — the reference's SVD default inference settings
(/root/reference/example/train_svd.yaml validation_data: 25 steps, 14 frames,
512px, fps 7, motion_bucket 127, decode_chunk_size 7).

Runs the full-width UNetSpatioTemporalConditionModel (the reference's
diffusers SVD denoiser architecture, train_svd.py:96) inside the jitted
Euler denoise scan with attn_impl='pallas', then the chunked VAE decode.
Random weights — wall-clock is weight-independent.

Prints one JSON line like bench.py. Env knobs: BENCH_FRAMES, BENCH_STEPS,
BENCH_RES, BENCH_REPEATS.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from animate_anything_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    frames = int(os.environ.get("BENCH_FRAMES", 14))
    steps = int(os.environ.get("BENCH_STEPS", 25))
    res = int(os.environ.get("BENCH_RES", 512))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    hw = res // 8

    from animate_anything_tpu.models.svd_unet import (
        SVDUNetConfig,
        UNetSpatioTemporalConditionModel,
    )
    from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig, decode_video
    from animate_anything_tpu.pipelines.svd import MaskStableVideoDiffusionPipeline
    from animate_anything_tpu.utils.fast_init import init_params_host

    cfg = SVDUNetConfig(in_channels=8, attn_impl="pallas")
    unet = UNetSpatioTemporalConditionModel(cfg, dtype=jnp.bfloat16)

    b = 1
    print("materializing params on host...", file=sys.stderr)
    uparams = init_params_host(
        unet, 0,
        jnp.zeros((b, 2, hw, hw, 8), jnp.bfloat16), jnp.asarray(0.5),
        jnp.zeros((b, 1, cfg.cross_attention_dim), jnp.bfloat16),
        jnp.zeros((b, 3)), dtype=np.dtype("bfloat16"),
    )
    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    vparams = init_params_host(
        vae, 1, jnp.zeros((1, res, res, 3), jnp.bfloat16), dtype=np.dtype("bfloat16")
    )

    pab = None
    if os.environ.get("BENCH_PAB"):
        pab = {"rate": int(os.environ.get("BENCH_PAB_RATE", 2)),
               "warmup": int(os.environ.get("BENCH_PAB_WARMUP", 5)),
               "tail": int(os.environ.get("BENCH_PAB_TAIL", 1))}
    pipe = MaskStableVideoDiffusionPipeline(unet, uparams, vae, vparams, pab=pab)
    denoise = pipe._denoise_jit  # cached_property → the jitted fn

    cond2 = jnp.zeros((2 * b, frames, hw, hw, 4), jnp.bfloat16)
    embeds2 = jnp.zeros((2 * b, 1, cfg.cross_attention_dim), jnp.bfloat16)
    added2 = jnp.broadcast_to(
        jnp.asarray([[6.0, 127.0, 0.02]], jnp.float32), (2 * b, 3))
    guidance = jnp.linspace(1.0, 3.0, frames).reshape(1, frames, 1, 1, 1)
    latents = jnp.zeros((b, frames, hw, hw, 4), jnp.bfloat16)
    chunk = min(7, frames)

    decode = jax.jit(lambda lat: decode_video(vae, vparams, lat, chunk_size=chunk))

    def run(seed):
        lat = denoise(uparams, latents, cond2, None, embeds2, added2,
                      guidance.astype(jnp.float32), jax.random.PRNGKey(seed),
                      num_steps=steps)
        return decode(lat)

    print("compiling denoise loop + decoder...", file=sys.stderr)
    vid = run(0)
    float(vid.astype(jnp.float32).sum())

    times = []
    for i in range(repeats):
        t0 = time.time()
        vid = run(i + 1)
        float(vid.astype(jnp.float32).sum())  # forces completion via tunnel
        times.append(time.time() - t0)
    sec_per_video = float(np.median(times))
    unet_ms_per_frame = sec_per_video / steps / frames * 1000.0

    # analytic A100 baseline + MFU from the lowered workload's FLOP count,
    # shared constants + subprocess plumbing in utils/flops.py
    from animate_anything_tpu.utils.flops import (a100_baseline_sec,
                                                  device_peak_flops,
                                                  measured_flops)

    flops = measured_flops("svd", frames=frames, res=res, steps=steps)
    t_a100 = a100_baseline_sec(flops) if np.isfinite(flops) else float("nan")
    vs_baseline = (t_a100 / sec_per_video) if np.isfinite(t_a100) else 1.0
    mfu = flops / sec_per_video / device_peak_flops() if np.isfinite(flops) else None

    print(
        f"# times={['%.2f' % t for t in times]} unet_ms_per_frame={unet_ms_per_frame:.1f} "
        f"flops={flops:.3e} mfu={mfu}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"sec per {frames}-frame {res}px SVD video ({steps} Euler steps, CFG{', PAB' if pab else ''})",
        "value": round(sec_per_video, 3),
        "unit": "s",
        "vs_baseline": round(float(vs_baseline), 3),
        **({"mfu": round(mfu, 3)} if mfu is not None else {}),
    }))


if __name__ == "__main__":
    main()
