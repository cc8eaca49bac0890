#!/usr/bin/env python
"""Training-step benchmark: full finetune of the full-width mask+motion 3D
UNet (1.41B params) at 512px / 16 frames on ONE TPU chip.

Reference sizing claim (BASELINE.md): the torch finetune needs ~30 GB GPU
RAM at batch 8 (README.md:167) or 4x16 GB V100 with DeepSpeed ZeRO-2 + CPU
optimizer offload. Here the same workload fits a single 16 GB v5e chip via
bf16 params + blockwise 8-bit Adam moments (ops/adam8bit.py, ~2 B/param)
+ block-level rematerialization — no host offload.

Measures sec per optimizer step on cached latents (reference cache_latents
path, train.py:367) with precomputed text embeddings. Prints one JSON line.
Env knobs: BENCH_BATCH, BENCH_FRAMES, BENCH_RES, BENCH_REPEATS.
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
    batch = int(os.environ.get("BENCH_BATCH", 1))
    frames = int(os.environ.get("BENCH_FRAMES", 16))
    res = int(os.environ.get("BENCH_RES", 512))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    hw = res // 8

    from animate_anything_tpu.diffusion import make_schedule
    from animate_anything_tpu.models import UNet3DConditionModel, UNet3DConfig
    from animate_anything_tpu.train.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )
    from animate_anything_tpu.utils.fast_init import init_params_host

    cfg = UNet3DConfig(
        motion_mask=True, motion_strength=True, attn_impl="pallas",
        gradient_checkpointing=True,
    )
    unet = UNet3DConditionModel(cfg, dtype=jnp.bfloat16)

    print("materializing params on host...", file=sys.stderr)
    latents = jnp.zeros((batch, frames, hw, hw, 4), jnp.bfloat16)
    uparams = init_params_host(
        unet, 0, latents, jnp.asarray(500),
        jnp.zeros((batch, 77, 1024), jnp.bfloat16),
        latents[:, :1], jnp.ones((batch, 1, hw, hw, 1), jnp.bfloat16),
        jnp.ones((batch,), jnp.float32),
        dtype=np.dtype("bfloat16"),
    )

    tconf = TrainConfig(motion_mask=True, motion_strength=True,
                        use_8bit_adam=True)
    state = create_train_state(uparams, tconf)
    state = jax.device_put(state)
    step_fn = jax.jit(
        make_train_step(unet, make_schedule(), tconf), donate_argnums=(0,)
    )

    rng = jax.random.PRNGKey(0)
    dev_batch = {
        "latents": latents,
        "mask": jnp.full((batch, res, res), 255, jnp.float32),
        "encoder_hidden_states": jnp.zeros((batch, 77, 1024), jnp.bfloat16),
        "uncond_hidden_states": jnp.zeros((batch, 77, 1024), jnp.bfloat16),
    }

    print("compiling train step...", file=sys.stderr)
    state, metrics = step_fn(state, dev_batch, rng)
    float(metrics["loss"])

    times = []
    for i in range(repeats):
        r = jax.random.fold_in(rng, i)
        t0 = time.time()
        state, metrics = step_fn(state, dev_batch, r)
        float(metrics["loss"])  # forces completion through the tunnel
        times.append(time.time() - t0)
    sec_per_step = float(np.median(times))

    mem = None
    try:
        stats = jax.devices()[0].memory_stats()
        mem = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
    except Exception:
        pass

    # analytic A100 baseline + MFU from the lowered step's own FLOP count,
    # shared constants + subprocess plumbing in utils/flops.py
    from animate_anything_tpu.utils.flops import (a100_baseline_sec,
                                                  device_peak_flops,
                                                  measured_flops)

    flops = measured_flops("train", batch=batch, frames=frames, res=res)
    t_a100 = a100_baseline_sec(flops) if np.isfinite(flops) else float("nan")
    vs_baseline = (t_a100 / sec_per_step) if np.isfinite(t_a100) else 1.0
    mfu = flops / sec_per_step / device_peak_flops() if np.isfinite(flops) else None

    print(f"# times={['%.2f' % t for t in times]} peak_hbm_gb={mem} "
          f"flops={flops:.3e} mfu={mfu}", file=sys.stderr)
    print(json.dumps({
        "metric": f"sec per train step (bs{batch}, {frames}f, {res}px, 8-bit Adam, remat)",
        "value": round(sec_per_step, 3),
        "unit": "s",
        "vs_baseline": round(float(vs_baseline), 3),
        **({"mfu": round(mfu, 3)} if mfu is not None else {}),
        **({"peak_hbm_gb": mem} if mem else {}),
    }))


if __name__ == "__main__":
    main()
