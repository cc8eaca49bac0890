"""On-chip micro-bench: packed fused temporal block (HBM pack/unpack around
the kernel, as the model calls it) vs the bfsc in-kernel-shuffle variant.

Times each as a 16-iteration lax.scan inside one jit with a scalar fetch
(tunnel ignores block_until_ready). Usage: python scripts/bfsc_sweep.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, x, iters=16):
    @jax.jit
    def loop(x):
        def body(h, _):
            return fn(h), None
        h, _ = jax.lax.scan(body, x, None, length=iters)
        return h

    out = loop(x)
    float(out.astype(jnp.float32).sum())
    t0 = time.time()
    out = loop(x + 0.001)
    s = float(out.astype(jnp.float32).sum())
    dt = (time.time() - t0) / iters * 1e3
    return dt, s


def main():
    from animate_anything_tpu.ops.temporal_block import (
        bfsc_ok, fused_temporal_attn_block, fused_temporal_block_bfsc,
        pack_frames, pack_geometry, unpack_frames)

    for (c, heads, d, f, s) in [
        (320, 5, 64, 17, 4096),
        (512, 8, 64, 17, 4096),
        (640, 10, 64, 17, 1024),
    ]:
        ks = jax.random.split(jax.random.PRNGKey(0), 8)
        x = (jax.random.normal(ks[0], (2, f, s, c)) * 0.5).astype(jnp.bfloat16)
        lns = jnp.ones((c,), jnp.float32)
        lnb = jnp.zeros((c,), jnp.float32)
        ws = [(jax.random.normal(k, (c, c)) * c ** -0.5).astype(jnp.bfloat16)
              for k in ks[3:7]]
        bo = jnp.zeros((c,), jnp.float32)
        g = pack_geometry(f, s)

        def packed(h):
            hp = pack_frames(h, g)
            hp = fused_temporal_attn_block(
                hp, lns, lnb, *ws, bo, geom=g, heads=heads, head_dim=d)
            return unpack_frames(hp, g)

        def bfsc(h):
            return fused_temporal_block_bfsc(
                h, lns, lnb, *ws, bo, heads=heads, head_dim=d)

        t_packed, s1 = timed(packed, x)
        ok = bfsc_ok(f, s, c, heads, d)
        if not ok:
            print(f"c={c:4d} f={f} s={s:5d}: packed {t_packed:6.2f} ms; bfsc gated OFF")
            continue
        t_bfsc, s2 = timed(bfsc, x)
        print(f"c={c:4d} f={f} s={s:5d}: packed(+HBM pack) {t_packed:6.2f} ms  "
              f"bfsc {t_bfsc:6.2f} ms  sums {s1:.1f}/{s2:.1f}")


if __name__ == "__main__":
    main()
