"""On-chip block-size sweep for the lanes flash-attention kernels.

Times the lanes forward at _BLOCK_Q ∈ {128, 256, 512} and the backward at a
small grid of (BWD_BLOCK_Q, BWD_BLOCK_KV, BWD_BLOCK_Q2), per UNet site.
Methodology per docs/KERNELS.md: 16-iteration lax.scan inside ONE jit, every
input derived from the carry (+z) so nothing is hoisted, scalar fetch to
force completion through the tunnel.
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp

import animate_anything_tpu.ops.flash_attention as fa


def bench(make_fn, q, k, v):
    def body(c, _):
        z = (c * 0).astype(jnp.bfloat16)
        o = make_fn(q + z, k + z, v + z)
        return c + o.astype(jnp.float32).mean(), None

    f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), None, length=16)[0])
    float(f())  # compile
    t0 = time.perf_counter()
    float(f())
    return (time.perf_counter() - t0) / 16 * 1e3


SITES = [
    (34, 4096, 5, 64, "L0"),
    (34, 1024, 10, 64, "L1"),
    (34, 256, 20, 64, "L2"),
]


def main():
    for (b, s, h, d, tag) in SITES:
        kx = jax.random.PRNGKey(0)
        q = jax.random.normal(kx, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(kx, (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(kx, (b, s, h, d), jnp.bfloat16)

        row = [f"{tag} fwd:"]
        for bq in (128, 256, 384, 512):
            # drive BOTH knobs: _flash_forward_lanes picks _BLOCK_Q_SMALL_SK
            # when sk<=1024 and _BLOCK_Q otherwise — overriding only one
            # would silently re-benchmark the default on half the sites
            fa._BLOCK_Q = fa._BLOCK_Q_SMALL_SK = bq
            try:
                t = bench(fa._flash_forward_lanes, q, k, v)
                row.append(f"bq{bq}={t:6.2f}ms")
            except Exception as e:
                row.append(f"bq{bq}=ERR({type(e).__name__})")
        fa._BLOCK_Q, fa._BLOCK_Q_SMALL_SK = 256, 512
        print(" ".join(row), flush=True)

        def grad_fn(q_, k_, v_):
            f = lambda a, b2, c: fa.flash_attention(a, b2, c).astype(jnp.float32).sum()
            return jax.grad(f, argnums=(0, 1, 2))(q_, k_, v_)[0]

        row = [f"{tag} bwd:"]
        for (bq, bkv, bq2) in [(128, 256, 1024), (128, 256, 2048), (128, 512, 1024),
                               (256, 256, 1024), (128, 128, 1024)]:
            fa._BWD_BLOCK_Q, fa._BWD_BLOCK_KV, fa._BWD_BLOCK_Q2 = bq, bkv, bq2
            try:
                t = bench(grad_fn, q, k, v)
                row.append(f"({bq},{bkv},{bq2})={t:6.2f}ms")
            except Exception as e:
                row.append(f"({bq},{bkv},{bq2})=ERR({type(e).__name__})")
        fa._BWD_BLOCK_Q, fa._BWD_BLOCK_KV, fa._BWD_BLOCK_Q2 = 128, 256, 1024
        print(" ".join(row), flush=True)


if __name__ == "__main__":
    main()
