"""Capture an op-level TPU profile of the 16-frame 512px VAE decode alone
(the 284 ms tail of the headline video) and print the xplane path.

Usage: python scripts/profile_decode.py
Then:  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
         python scripts/xplane_family.py <xplane.pb> 60
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
    from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig, decode_video
    from animate_anything_tpu.utils.fast_init import init_params_host

    enable_compilation_cache()
    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    vparams = init_params_host(
        vae, 1, jnp.zeros((1, 512, 512, 3), jnp.bfloat16), dtype=np.dtype("bfloat16")
    )
    lat = jnp.zeros((1, 16, 64, 64, 4), jnp.bfloat16)
    dec = jax.jit(lambda z: decode_video(vae, vparams, z))
    out = dec(lat)
    float(out.astype(jnp.float32).sum())

    logdir = "/root/repo/output/profile_decode_run"
    os.makedirs(logdir, exist_ok=True)
    with jax.profiler.trace(logdir):
        out = dec(lat + 0.01)
        float(out.astype(jnp.float32).sum())

    planes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    print("xplane files:", planes, flush=True)


if __name__ == "__main__":
    main()
