"""On-chip sweep of the N-streamed wide-FF GEGLU kernel (c=1280 sites).

The c=1280 FF sites run at 14-18 TF/s through XLA's composite form (the
10240-lane hidden round-trips HBM between matmul and gelu). The wide kernel
re-streams the 39MB weight set once per ROW block, so the sweep's job is to
find the (rows, nb) point where the MXU stays ahead of the weight DMA:
per grid step compute = 3·2·R·c·nb FLOPs vs fetch = 3·c·nb·2·2 bytes.

Methodology per docs/KERNELS.md: 16-iter lax.scan in one jit, scalar fetch.
Usage: python scripts/geglu_wide_sweep.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import animate_anything_tpu.ops.geglu as gg


def bench(fn):
    def body(c, _):
        z = (c * 0).astype(jnp.bfloat16)
        o = fn(z)
        return c + o.astype(jnp.float32).mean(), None

    f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), None, length=16)[0])
    float(f())
    t0 = time.perf_counter()
    float(f())
    return (time.perf_counter() - t0) / 16 * 1e3


# c=1280 FF sites at 512px CFG f=17: L2 spatial 34·256 rows, mid/L3 34·64
SITES = [
    (34 * 256, 1280, "L2sp"),
    (34 * 64, 1280, "midsp"),
]


def main():
    for (n, c, tag) in SITES:
        kx = jax.random.PRNGKey(0)
        x = jax.random.normal(kx, (n, c), jnp.bfloat16)
        s = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)
        w1 = jax.random.normal(kx, (c, 8 * c), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((8 * c,), jnp.float32)
        w2 = jax.random.normal(kx, (4 * c, c), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((c,), jnp.float32)
        flops = 2 * n * c * (8 * c + 4 * c)

        t = bench(lambda z, x=x: gg._reference(x + z, s, b, w1, b1, w2, b2, 1e-5))
        print(f"{tag} n={n} c={c}  XLA exact:  {t:6.2f} ms ({flops/t/1e9:5.0f} TF/s)",
              flush=True)
        t = bench(lambda z, x=x: gg._reference_lean(x + z, s, b, w1, b1, w2, b2, 1e-5))
        print(f"{tag} n={n} c={c}  XLA lean:   {t:6.2f} ms ({flops/t/1e9:5.0f} TF/s)",
              flush=True)

        for nb in (256, 512):
            for rows in (136, 256, 272, 384, 512):
                try:
                    t = bench(lambda z, x=x, rows=rows, nb=nb: gg._fused_wide_p(
                        x + z, s, b, w1, b1, w2, b2, 1e-5, rows, nb))
                    print(f"  nb={nb:<4d} rows={rows:<4d} {t:6.2f} ms "
                          f"({flops/t/1e9:5.0f} TF/s)", flush=True)
                except Exception as e:
                    print(f"  nb={nb:<4d} rows={rows:<4d} ERR({type(e).__name__}: "
                          f"{str(e)[:80]})", flush=True)
        print(f"  picker default: rows={gg._pick_rows_wide(c, n)} nb=256", flush=True)


if __name__ == "__main__":
    main()
