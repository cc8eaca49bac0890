"""On-chip probe: conv -> GN-stats -> GN-apply -> conv chains at UNet resnet
geometries, comparing stats formulations:

  fused    : stats reduce fused into the conv's kOutput fusion (current
             default) — forces the conv output into a {3,0,2,1} layout
             (r5 HLO), c=320/640 convs measured ~89-98 TF/s in-model.
  barrier  : optimization_barrier between conv output and the stats reduce —
             conv keeps its own (standard) layout; stats become a separate
             pass (possibly with an XLA relayout copy).
  barrier2 : barrier + two-stage reduce (H-only fused stage, then collapse).

Each variant times an 8-deep chain of conv3x3 + GN(+SiLU) at the site
geometry; prints ms/chain and implied conv TF/s.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.ops.group_norm import group_affine


def conv3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def gn_apply(x, a, b):
    y = x * a[:, None, None, :].astype(x.dtype) + b[:, None, None, :].astype(x.dtype)
    return y * jax.nn.sigmoid(y)


def stats_fused(y):
    n, c = y.shape[0], y.shape[-1]
    yf = y.reshape(n, -1, c).astype(jnp.float32)
    return jnp.sum(yf, axis=1), jnp.sum(yf * yf, axis=1)


def stats_barrier(y):
    y = jax.lax.optimization_barrier(y)
    return stats_fused(y)


def stats_barrier2(y):
    y = jax.lax.optimization_barrier(y)
    n, c = y.shape[0], y.shape[-1]
    w = y.shape[-2]
    yf = y.reshape(n, -1, w, c).astype(jnp.float32)
    p1 = jnp.sum(yf, axis=1)
    p2 = jnp.sum(yf * yf, axis=1)
    p1, p2 = jax.lax.optimization_barrier((p1, p2))
    return jnp.sum(p1, axis=1), jnp.sum(p2, axis=1)


STATS = {"fused": stats_fused, "barrier": stats_barrier, "barrier2": stats_barrier2}
DEPTH = 8


def chain(stats_fn, groups, x, w, scale, bias):
    for i in range(DEPTH):
        y = conv3(x, w)
        s1, s2 = stats_fn(y)
        a, b = group_affine(y.reshape(y.shape[0], -1, y.shape[-1]), scale, bias,
                            groups, 1e-5, sums=(s1, s2))
        x = gn_apply(y, a, b)
    return x


def bench(fn, *args):
    f = jax.jit(fn)
    o = f(*args)
    float(o.astype(jnp.float32).sum())
    ts = []
    for i in range(4):
        a0 = args[0] + 0.001 * i
        t0 = time.perf_counter()
        o = f(a0, *args[1:])
        float(o.astype(jnp.float32).sum())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


SITES = [
    (34, 64, 320, "L0"),
    (34, 32, 640, "L1"),
    (34, 16, 1280, "L2"),
    (16, 512, 128, "VAEdec-up3"),
    (16, 256, 256, "VAEdec-up2"),
]


def main():
    rng = np.random.RandomState(0)
    for n, hw, c, tag in SITES:
        x = jnp.asarray(rng.randn(n, hw, hw, c).astype(np.float32), jnp.bfloat16) * 0.1
        w = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32), jnp.bfloat16) * 0.02
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)
        gflops = 2 * 9 * c * c * hw * hw * n * DEPTH / 1e9
        line = [f"{tag:12s} ({n},{hw}²,{c})  conv GF/chain={gflops:.0f}"]
        for name, fn in STATS.items():
            ms = bench(functools.partial(chain, fn, 32), x, w, scale, bias)
            line.append(f"{name}={ms:7.2f} ms ({gflops / ms:6.1f} TF/s)")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
