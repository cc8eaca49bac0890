"""On-chip bench: GroupNorm+SiLU → conv3x3 resnet chain at UNet geometries.

Hypothesis (r2 profile): XLA's conv wants a {3,0,2,1} input layout, so every
GN site pays a fused stats+RELAYOUT pass (~1.7 ms at L0 vs 0.5 ms BW floor),
then the conv itself runs ~41 TF/s. A conv expressed as 9 shifted matmuls
consumes the natural NHWC row-major layout — no relayout, MXU-friendly.

Variants per site:
  xla_conv    : group_norm_silu (folded affine) → nn-style lax conv
  tap9        : group_norm_silu → 9-shift matmul conv (same params)
  tap9_fused  : folded-affine GN applied inline in the 9-tap read (no
                separate apply pass)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from animate_anything_tpu.ops.group_norm import group_norm_silu


def bench(fn, *args):
    def body(c, _):
        z = (c * 0).astype(args[0].dtype)
        o = fn(args[0] + z, *args[1:])
        return c + o.astype(jnp.float32).mean(), None

    f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), None, length=16)[0])
    float(f())
    t0 = time.perf_counter()
    float(f())
    return (time.perf_counter() - t0) / 16 * 1e3


def conv_xla(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b.astype(x.dtype)


def conv_tap9(x, w, b):
    """3x3 conv as 9 shifted (N·H·W, Cin)x(Cin, Cout) matmuls on the natural
    NHWC layout. Shifts via pad+slice on H/W (XLA folds these into the
    matmul's operand windows)."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy:dy + h, dx:dx + wd, :]
            y = jnp.einsum("nhwc,cd->nhwd", xs, w[dy, dx],
                           preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    return acc.astype(x.dtype) + b.astype(x.dtype)


def chain_xla(x, s, bb, w, b, groups):
    h = group_norm_silu(x, s, bb, groups, 1e-5, True)
    return conv_xla(h, w, b)


def chain_tap9(x, s, bb, w, b, groups):
    h = group_norm_silu(x, s, bb, groups, 1e-5, True)
    return conv_tap9(h, w, b)


SITES = [
    (34, 64, 320, 320, 32, "L0"),
    (34, 32, 640, 640, 32, "L1"),
    (34, 16, 1280, 1280, 32, "L2/3"),
    (34, 64, 640, 320, 32, "L0up(skip)"),
    (16, 512, 128, 128, 32, "VAEdec"),
    (16, 256, 256, 256, 32, "VAEdec2"),
]


def main():
    for (n, hw, cin, cout, g, tag) in SITES:
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (n, hw, hw, cin), jnp.bfloat16)
        s = jnp.ones((cin,), jnp.float32)
        bb = jnp.zeros((cin,), jnp.float32)
        w = jax.random.normal(k, (3, 3, cin, cout), jnp.bfloat16) * 0.02
        b = jnp.zeros((cout,), jnp.float32)
        flops = 2 * n * hw * hw * 9 * cin * cout
        rows = []
        for name, fn in (("xla_conv", chain_xla), ("tap9", chain_tap9)):
            try:
                t = bench(functools.partial(fn, groups=g), x, s, bb, w, b)
                rows.append(f"{name}={t:6.2f}ms({flops/t/1e9:4.0f}TF)")
            except Exception as e:
                rows.append(f"{name}=ERR({type(e).__name__})")
        print(f"{tag:11s} ({n},{hw}²,{cin}->{cout}): " + "  ".join(rows), flush=True)


if __name__ == "__main__":
    main()
