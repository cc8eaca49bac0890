"""Capture an op-level TPU profile of ONE full-width 512px/16f train step
(bs 1, 8-bit Adam, per-sub-layer remat) and dump hlo_stats/op_profile JSON
for output/profile_probe-style analysis."""
import glob
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from animate_anything_tpu.core import enable_compilation_cache

    print("cache:", enable_compilation_cache(), file=sys.stderr, flush=True)
    batch, frames, res = 1, 16, 512
    hw = res // 8

    from animate_anything_tpu.diffusion import make_schedule
    from animate_anything_tpu.models import UNet3DConditionModel, UNet3DConfig
    from animate_anything_tpu.train.trainer import (
        TrainConfig, create_train_state, make_train_step)
    from animate_anything_tpu.utils.fast_init import init_params_host

    cfg = UNet3DConfig(motion_mask=True, motion_strength=True,
                       attn_impl="pallas", gradient_checkpointing=True)
    unet = UNet3DConditionModel(cfg, dtype=jnp.bfloat16)
    latents = jnp.zeros((batch, frames, hw, hw, 4), jnp.bfloat16)
    print("materializing params...", file=sys.stderr, flush=True)
    uparams = init_params_host(
        unet, 0, latents, jnp.asarray(500),
        jnp.zeros((batch, 77, 1024), jnp.bfloat16),
        latents[:, :1], jnp.ones((batch, 1, hw, hw, 1), jnp.bfloat16),
        jnp.ones((batch,), jnp.float32),
        dtype=np.dtype("bfloat16"),
    )
    tconf = TrainConfig(motion_mask=True, motion_strength=True, use_8bit_adam=True)
    state = jax.device_put(create_train_state(uparams, tconf))
    step_fn = jax.jit(make_train_step(unet, make_schedule(), tconf), donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    dev_batch = {
        "latents": latents,
        "mask": jnp.full((batch, res, res), 255, jnp.float32),
        "encoder_hidden_states": jnp.zeros((batch, 77, 1024), jnp.bfloat16),
        "uncond_hidden_states": jnp.zeros((batch, 77, 1024), jnp.bfloat16),
    }
    print("compiling...", file=sys.stderr, flush=True)
    state, metrics = step_fn(state, dev_batch, rng)
    float(metrics["loss"])

    logdir = "/root/repo/output/profile_train_run"
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        state, metrics = step_fn(state, dev_batch, jax.random.fold_in(rng, 1))
        float(metrics["loss"])

    planes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", planes, file=sys.stderr, flush=True)
    if not planes:
        print("NO XPLANE CAPTURED")
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("hlo_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(planes, tool, {})
            out = os.path.join(logdir, tool + ".json")
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print("wrote", out)
        except Exception as e:
            print(tool, "FAILED:", repr(e))


if __name__ == "__main__":
    main()
