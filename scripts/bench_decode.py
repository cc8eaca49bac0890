"""Time the VAE decode of 16 512px frames alone (the tail of bench.py's
headline video). Usage: python scripts/bench_decode.py [repeats]"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from animate_anything_tpu.core import enable_compilation_cache
    from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig, decode_video
    from animate_anything_tpu.utils.fast_init import init_params_host

    enable_compilation_cache()
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    vparams = init_params_host(
        vae, 1, jnp.zeros((1, 512, 512, 3), jnp.bfloat16), dtype=np.dtype("bfloat16")
    )
    lat = jnp.zeros((1, 16, 64, 64, 4), jnp.bfloat16)
    dec = jax.jit(lambda z: decode_video(vae, vparams, z))
    out = dec(lat)
    float(out.astype(jnp.float32).sum())
    times = []
    for i in range(repeats):
        x = lat + 0.01 * i
        t0 = time.time()
        out = dec(x)
        float(out.astype(jnp.float32).sum())
        times.append(time.time() - t0)
    print("decode ms:", ["%.1f" % (t * 1e3) for t in times],
          "median=%.1f" % (np.median(times) * 1e3))


if __name__ == "__main__":
    main()
