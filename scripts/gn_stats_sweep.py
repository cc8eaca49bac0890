"""On-chip micro-bench: XLA composite GroupNorm stats (channel-first reduce)
vs the streaming pallas channel-sums kernel, at the UNet and VAE-decoder
geometries the 512px profile flagged (f32[n,c] stats fusions ~6x over the
bandwidth minimum).

Usage: python scripts/gn_stats_sweep.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from animate_anything_tpu.ops import group_norm as gn


def timed(fn, x, iters=16):
    @jax.jit
    def loop(x):
        def body(h, _):
            a, b = fn(h)
            # fold the tiny affine back in so the loop carries state of x's
            # shape and the stats can't be hoisted out
            return h + (a[:, None, :] * 1e-6).astype(h.dtype), None
        h, _ = jax.lax.scan(body, x, None, length=iters)
        return h

    out = loop(x)
    float(out.astype(jnp.float32).sum())
    t0 = time.time()
    out = loop(x + 0.001)
    s = float(out.astype(jnp.float32).sum())
    return (time.time() - t0) / iters * 1e3, s


def main():
    shapes = [
        (34, 4096, 320, 32),    # UNet L0
        (34, 1024, 640, 32),    # UNet L1
        (34, 256, 1280, 32),    # UNet L2/mid
        (16, 16384, 512, 32),   # VAE decoder 128px level
        (16, 65536, 512, 32),   # VAE decoder 256px level
        (16, 262144, 128, 32),  # VAE decoder 512px level
    ]
    for (n, s, c, groups) in shapes:
        x = (jax.random.normal(jax.random.PRNGKey(0), (n, s, c)) * 0.5
             ).astype(jnp.bfloat16)
        sc = jnp.ones((c,), jnp.float32)
        bi = jnp.zeros((c,), jnp.float32)

        def aff(h):
            return gn.group_affine(h, sc, bi, groups, 1e-5)

        gn.set_default_stats_impl("xla")
        t_x, s_x = timed(aff, x)
        gn.set_default_stats_impl("auto")
        t_p, s_p = timed(aff, x)
        gb = n * s * c * 2 / 1e9
        print(f"({n},{s:6d},{c:4d}): xla {t_x:6.2f} ms ({gb/t_x*1e3:5.0f} GB/s)"
              f"  pallas {t_p:6.2f} ms ({gb/t_p*1e3:5.0f} GB/s)"
              f"  sums {s_x:.1f}/{s_p:.1f}")


if __name__ == "__main__":
    main()
