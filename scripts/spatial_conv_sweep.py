"""On-chip correctness + speed sweep of ops/spatial_conv.py vs the XLA
composite GN→SiLU→conv chain, at every 512px/16f UNet resnet geometry.

Usage: python scripts/spatial_conv_sweep.py [quick]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.ops.attic import spatial_conv as sc


def bench(fn, *args):
    @jax.jit
    def f(*ops):
        def body(c, _):
            z = (c * 0).astype(ops[0].dtype)
            o = fn(ops[0] + z, *ops[1:])
            return c + o.astype(jnp.float32).mean(), None
        return jax.lax.scan(body, jnp.float32(0), None, length=16)[0]

    float(f(*args))
    t0 = time.perf_counter()
    float(f(*args))
    return (time.perf_counter() - t0) / 16 * 1e3


# (n, hw, cin, cout, tag) — every distinct resnet chain in the 512px UNet
# (34 = b·(f+1) with CFG batch 2·17) + VAE decoder chains
SITES = [
    (34, 64, 320, 320, "L0"),
    (34, 64, 640, 320, "L0up_a"),      # up skip-concat 320+320
    (34, 64, 960, 320, "L0up_b"),      # 640+320
    (34, 32, 640, 640, "L1"),
    (34, 32, 960, 640, "L1up_a"),      # 320+640
    (34, 32, 1280, 640, "L1up_b"),     # 640+640
    (34, 32, 1920, 640, "L1up_c"),     # 1280+640
    (34, 16, 1280, 1280, "L2/3/mid"),
    (34, 16, 1920, 1280, "L2up_a"),    # 640+1280
    (34, 16, 2560, 1280, "L2up_b"),    # 1280+1280
    (34, 8, 1280, 1280, "L3dn"),
    (16, 512, 128, 128, "VAEdec0"),
    (16, 256, 256, 256, "VAEdec1"),
    (16, 128, 512, 512, "VAEdec2"),
]


def main():
    quick = "quick" in sys.argv[1:]
    for (n, hw, cin, cout, tag) in SITES:
        if quick and "up" in tag:
            continue
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (n, hw, hw, cin), jnp.bfloat16)
        s = jax.random.normal(jax.random.PRNGKey(1), (cin,), jnp.float32) * 0.1 + 1
        bb = jax.random.normal(jax.random.PRNGKey(2), (cin,), jnp.float32) * 0.1
        w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, cin, cout), jnp.bfloat16) * 0.02
        b = jax.random.normal(jax.random.PRNGKey(4), (cout,), jnp.float32) * 0.1
        res = jax.random.normal(jax.random.PRNGKey(5), (n, hw, hw, cout), jnp.bfloat16)
        g = 32
        call = functools.partial(sc.gn_silu_spatial_conv, groups=g)
        flops = 2 * n * hw * hw * 9 * cin * cout

        # correctness (with residual + extra_bias exercised)
        eb = jax.random.normal(jax.random.PRNGKey(6), (n, cout), jnp.float32) * 0.1
        ref = jax.jit(functools.partial(call, impl="xla", residual=res, extra_bias=eb))(
            x, s, bb, w, b)
        try:
            got = jax.jit(functools.partial(call, impl="pallas", residual=res,
                                            extra_bias=eb))(x, s, bb, w, b)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
            ok = f"relerr={err / scale:.1e}"
        except Exception as e:
            ok = f"ERR({type(e).__name__}: {str(e)[:80]})"

        rows = [ok]
        if not ok.startswith("ERR"):
            for name, impl in (("xla", "xla"), ("pallas", "pallas")):
                t = bench(functools.partial(call, impl=impl), x, s, bb, w, b)
                rows.append(f"{name}={t:6.2f}ms({flops/t/1e9:4.0f}TF)")
        print(f"{tag:9s} ({n},{hw}²,{cin}->{cout}): " + "  ".join(rows), flush=True)


if __name__ == "__main__":
    main()
