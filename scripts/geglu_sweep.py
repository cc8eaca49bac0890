"""On-chip sweep of the fused LN+GEGLU kernel: gelu impl × row-block size.

Profiled r2: the c=320 sites run ~9.6 ms each (36 TF/s) — VPU-bound on the
A&S erf polynomial. Methodology per docs/KERNELS.md: 16-iter lax.scan in one
jit, carry-derived inputs, scalar fetch.
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


# (rows, c) sites at 512px CFG: L0 spatial 34*4096, L0 temporal packed
# ~140640, L1 spatial 34*1024, c=640
SITES = [
    (139264, 320, "L0sp"),
    (140640, 320, "L0tmp"),
    (34 * 1024, 640, "L1sp"),
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

        t = bench(lambda z, x=x: gg._reference(
            x + z, s, b, w1, b1, w2, b2, 1e-5))
        print(f"{tag} n={n} c={c}  XLA composite: {t:6.2f} ms "
              f"({flops/t/1e9:5.0f} TF/s)", flush=True)

        for gelu in ("erf_fp32", "tanh"):
            gg._GELU_IMPL = gelu
            for rows in (128, 224, 256, 384, 512):
                try:
                    t = bench(lambda z, x=x, rows=rows: gg._pallas_ln_geglu(
                        x + z, s, b, w1, b1, w2, b2, 1e-5, rows))
                    print(f"  {gelu:9s} rows={rows:<4d} {t:6.2f} ms "
                          f"({flops/t/1e9:5.0f} TF/s)", flush=True)
                except Exception as e:
                    print(f"  {gelu:9s} rows={rows:<4d} ERR({type(e).__name__})",
                          flush=True)
        gg._GELU_IMPL = "erf_fp32"


if __name__ == "__main__":
    main()
