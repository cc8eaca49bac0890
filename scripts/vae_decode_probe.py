"""On-chip probe: 16-frame 512px VAE decode with XLA vs pallas GroupNorm
stats (the decoder's GN stats fusions profiled ~178 ms/decode).

Usage: python scripts/vae_decode_probe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from animate_anything_tpu.core import enable_compilation_cache
    from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig, decode_video
    from animate_anything_tpu.ops import group_norm as gn
    from animate_anything_tpu.utils.fast_init import init_params_host

    enable_compilation_cache()
    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    vparams = init_params_host(vae, 1, jnp.zeros((1, 512, 512, 3), jnp.bfloat16),
                               dtype=np.dtype("bfloat16"))
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 64, 64, 4), jnp.bfloat16)

    for impl in ("xla", "auto"):
        gn.set_default_stats_impl(impl)
        decode = jax.jit(lambda z: decode_video(vae, vparams, z))
        out = decode(lat)
        float(out.astype(jnp.float32).sum())
        ts = []
        for i in range(3):
            t0 = time.time()
            out = decode(lat + 0.001 * i)
            float(out.astype(jnp.float32).sum())
            ts.append(time.time() - t0)
        print(f"decode stats={impl}: {min(ts)*1e3:.1f} ms")
    gn.set_default_stats_impl("xla")


if __name__ == "__main__":
    main()
