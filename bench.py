#!/usr/bin/env python
"""Headline benchmark: seconds per 16-frame 512px video at 25 sampler steps
(CFG 9) on one TPU chip — the BASELINE.json target metric.

What runs: the flagship full-width mask+motion 3D UNet (1.41B params, the
reference's animate_anything_512 architecture) inside the framework's jitted
denoise loop (25 steps × CFG-doubled batch, Pallas flash attention on the
spatial/cross sites), then the VAE decode of all 16 frames. Random weights —
wall-clock is weight-independent.

vs_baseline: the reference repo publishes no speed numbers (BASELINE.md) and
no A100 is reachable from this box, so the baseline is an ANALYTIC A100
estimate from the compiled workload's own FLOP count: t_A100 = FLOPs /
(312 TFLOP/s bf16 × 40% util) — 40% is a generous utilization for the
reference's eager PyTorch/xformers loop (measured SD-UNet utils are ~30-45%).
vs_baseline = t_A100_est / t_tpu (>1 ⇒ faster than the estimated A100).

Env knobs for quick runs: BENCH_FRAMES, BENCH_STEPS, BENCH_RES, BENCH_REPEATS.
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
    frames = int(os.environ.get("BENCH_FRAMES", 16))
    steps = int(os.environ.get("BENCH_STEPS", 25))
    res = int(os.environ.get("BENCH_RES", 512))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
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

    print("materializing params on host...", file=sys.stderr)
    uparams = init_params_host(
        unet, 0, latents, jnp.asarray(500), embeds[:b], cond, mask, motion,
        dtype=np.dtype("bfloat16"),
    )

    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    vparams = init_params_host(
        vae, 1, jnp.zeros((1, res, res, 3), jnp.bfloat16), dtype=np.dtype("bfloat16")
    )

    # BENCH_PAB=1: Pyramid-Attention-Broadcast step caching (opt-in — changes
    # outputs slightly, so the honest default headline stays exact; see
    # pipelines/latent2video.py docstring)
    pab = None
    if os.environ.get("BENCH_PAB"):
        pab = {"spatial_rate": int(os.environ.get("BENCH_PAB_SPATIAL", 2)),
               "temporal_rate": int(os.environ.get("BENCH_PAB_TEMPORAL", 3)),
               "warmup": int(os.environ.get("BENCH_PAB_WARMUP", 5)),
               "tail": int(os.environ.get("BENCH_PAB_TAIL", 1))}

    pipe = LatentToVideoPipeline(unet, uparams, vae, vparams,
                                 schedule=make_schedule(), pab=pab)
    ts = tuple(int(t) for t in pipe.get_timesteps(steps))

    from animate_anything_tpu.core import xla_compiler_options

    decode = jax.jit(lambda lat: decode_video(vae, vparams, lat),
                     compiler_options=xla_compiler_options())

    def run(x):
        # split programs (what __call__ runs): measured ~40 ms/video faster
        # than the monolithic denoise+decode jit on v5e — async dispatch
        # already hides the program boundary (see pipeline docstring)
        lat = pipe._denoise_jit(uparams, x, cond, embeds, mask, motion,
                                jnp.asarray(9.0, jnp.float32), ts)
        return decode(lat), lat

    # compile (excluded from timing), then timed runs with forced fetch
    print("compiling denoise loop + decoder...", file=sys.stderr)
    vid, lat = run(latents)
    float(vid.astype(jnp.float32).sum())

    times = []
    for i in range(repeats):
        x = latents + 0.01 * i
        t0 = time.time()
        vid, lat = run(x)
        float(vid.astype(jnp.float32).sum())  # forces completion through the tunnel
        times.append(time.time() - t0)
    sec_per_video = float(np.median(times))

    # PAB quality vs the exact path (VERDICT r1 #8): same seed/input through
    # the cache-free pipeline → latent PSNR + motion-score drift. Reported
    # only when the approximation is opted into.
    pab_quality = {}
    if pab:
        from animate_anything_tpu.metrics.motion import latent_motion_score

        exact_pipe = LatentToVideoPipeline(unet, uparams, vae, vparams,
                                           schedule=make_schedule())
        x = jax.random.normal(jax.random.PRNGKey(0), latents.shape, jnp.bfloat16)
        lat_pab = np.asarray(run(x)[1], np.float32)
        lat_exact = np.asarray(
            exact_pipe._denoise_jit(uparams, x, cond, embeds, mask, motion,
                                    jnp.asarray(9.0, jnp.float32), ts), np.float32)
        mse = float(np.mean((lat_pab - lat_exact) ** 2))
        peak = float(lat_exact.max() - lat_exact.min())
        pab_quality["pab_latent_psnr_db"] = round(
            10 * np.log10(peak**2 / max(mse, 1e-12)), 2)
        ms_e = float(latent_motion_score(jnp.asarray(lat_exact))[0])
        ms_p = float(latent_motion_score(jnp.asarray(lat_pab))[0])
        pab_quality["pab_motion_score_drift"] = round(abs(ms_p - ms_e) / max(abs(ms_e), 1e-9), 4)

    # per-step UNet ms/frame (2×CFG forwards per step)
    unet_ms_per_frame = sec_per_video / steps / frames * 1000.0

    # analytic A100 baseline from the lowered workload's own FLOP count,
    # shared constants + subprocess plumbing in utils/flops.py
    from animate_anything_tpu.utils.flops import (a100_baseline_sec,
                                                  measured_flops)

    flops = measured_flops("denoise", frames=frames, res=res, steps=steps,
                           timeout=600)
    t_a100 = a100_baseline_sec(flops) if np.isfinite(flops) else float("nan")
    vs_baseline = (t_a100 / sec_per_video) if np.isfinite(t_a100) else 1.0

    print(
        f"# times={['%.2f' % t for t in times]} unet_ms_per_frame={unet_ms_per_frame:.1f} "
        f"flops={flops:.3e} t_a100_est={t_a100:.2f}s",
        file=sys.stderr,
    )
    tag = ", PAB" if pab else ""
    print(json.dumps({
        "metric": f"sec per {frames}-frame {res}px video ({steps} steps, CFG{tag})",
        "value": round(sec_per_video, 3),
        "unit": "s",
        "vs_baseline": round(float(vs_baseline), 3),
        **pab_quality,
    }))


if __name__ == "__main__":
    main()
