"""Kernel-level op tests (interpret mode on CPU; real-chip validation is part
of bench/probes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from animate_anything_tpu.ops.flash_attention import _flash_attention_p, flash_attention
from animate_anything_tpu.ops.group_norm import _pick_chunk, group_norm_silu


def test_flash_attention_interpret_matches_xla():
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 2, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 96, 2, 64))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 96, 2, 64))
    ref = jax.nn.dot_product_attention(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = _flash_attention_p(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_small_seq_routes_to_xla():
    q = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 2, 64))
    out = flash_attention(q, q, q)  # seq < MIN_PALLAS_SEQ → pure XLA, no pallas
    ref = jax.nn.dot_product_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_flash_attention_short_kv_routes_to_xla():
    # 77-token cross-attention routes to XLA's batched attention — re-measured
    # in r4 with the lanes kernel (9.85-9.90 s headline vs 9.81 s on XLA: the
    # per-program grid overhead dominates tiny-K compute). No interpret ctx:
    # must not enter Mosaic.
    for d in (64, 32):
        q = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 2, d))
        kv = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 2, d))
        out = flash_attention(q, kv, kv)
        ref = jax.nn.dot_product_attention(q, kv, kv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_short_kv_lanes_grad():
    # the lanes fwd+bwd stay numerics-correct at masked s_k=77 (odd heads)
    # even though dispatch prefers XLA there — direct-call coverage.
    from animate_anything_tpu.ops.flash_attention import _flash_attention_p

    q = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 3, 64))  # odd heads
    kv = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 3, 64))

    def loss_pallas(q, k, v):
        return (_flash_attention_p(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (jax.nn.dot_product_attention(q, k, v) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():  # fwd and bwd are both Pallas
        g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, kv, kv)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kv, kv)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_flash_attention_grad():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 1, 64))

    def loss(q):
        return (_flash_attention_p(q, q, q) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():  # backward is Pallas too now
        g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


@pytest.mark.parametrize("h", [1, 2, 5])  # odd h → ragged last channel block
def test_flash_attention_lanes_kernel_matches_xla(h):
    """Transpose-free head-pair kernel on the natural (b, s, h·d) layout —
    the d=64 forward path."""
    from animate_anything_tpu.ops.flash_attention import _flash_forward_lanes

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(h), 3)
    q = jax.random.normal(kq, (2, 256, h, 64))
    k = jax.random.normal(kk, (2, 300, h, 64))   # K padding → masked softmax
    v = jax.random.normal(kv, (2, 300, h, 64))
    with pltpu.force_tpu_interpret_mode():
        out = _flash_forward_lanes(q, k, v)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize(
    "b,sq,sk,h",
    [
        (2, 256, 256, 3),   # aligned, multi-head/batch
        (1, 256, 300, 2),   # K padding → masked softmax in the dq kernel
        (1, 384, 384, 2),   # sq not a multiple of the dkv q-chunk preference
    ],
)
def test_flash_attention_pallas_backward_matches_xla(b, sq, sk, h):
    """The Pallas dq + dk/dv kernels must match XLA attention grads exactly
    (fp32): this is the O(S)-memory backward that lets 512px training fit.
    d=64 routes through the transpose-free lanes backward."""
    d = 64
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(kq, (b, sq, h, d))
    k = jax.random.normal(kk, (b, sk, h, d))
    v = jax.random.normal(kv, (b, sk, h, d))
    g = jax.random.normal(kg, (b, sq, h, d))

    with pltpu.force_tpu_interpret_mode():
        out, vjp = jax.vjp(_flash_attention_p, q, k, v)
        grads = vjp(g)
    out_r, vjp_r = jax.vjp(
        lambda q, k, v: jax.nn.dot_product_attention(q, k, v), q, k, v
    )
    grads_r = vjp_r(g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=2e-5)
    for a, r in zip(grads, grads_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-5)


@pytest.mark.parametrize("h", [1, 2, 5])
def test_flash_attention_folded_backward_matches_xla(h):
    """The folded-heads backward (non-64 head dims) stays correct; exercised
    directly since d=64 routes to the lanes backward."""
    from animate_anything_tpu.ops.flash_attention import _flash_backward, _flash_forward

    d = 64  # kernels are d-agnostic; folded path tested at d=64 for speed
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(kq, (1, 256, h, d))
    k = jax.random.normal(kk, (1, 300, h, d))
    v = jax.random.normal(kv, (1, 300, h, d))
    g = jax.random.normal(kg, (1, 256, h, d))
    _, vjp_r = jax.vjp(lambda q, k, v: jax.nn.dot_product_attention(q, k, v), q, k, v)
    grads_r = vjp_r(g)
    with pltpu.force_tpu_interpret_mode():
        o = _flash_forward(q, k, v)
        grads = _flash_backward(q, k, v, o, g)
    for a, r in zip(grads, grads_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=3e-5)


def test_group_norm_pick_chunk():
    assert 4096 % _pick_chunk(4096, 320) == 0
    assert _pick_chunk(17 * 4096, 320) % 8 == 0
    assert _pick_chunk(7, 320) == 0  # prime, no divisor → fallback


def test_group_norm_stats_kernel_parity_and_grad():
    """Streaming channel-sums stats kernel (opt-in; default stays XLA — see
    set_default_stats_impl) must match the XLA composite reduction
    bit-for-bit — values AND gradients — and odd row counts must fall back
    instead of mis-chunking."""
    from animate_anything_tpu.ops import group_norm as gn

    x = (jax.random.normal(jax.random.PRNGKey(0), (3, 64, 320)) * 2 + 0.3
         ).astype(jnp.bfloat16)
    scale = jnp.linspace(0.5, 1.5, 320)
    bias = jnp.linspace(-1, 1, 320)

    def affine_sum(x, impl):
        gn.set_default_stats_impl(impl)
        try:
            a, b = gn.group_affine(x, scale, bias, 32, 1e-5)
            return jnp.sum(a * 1.7 + b * 0.3)
        finally:
            gn.set_default_stats_impl("xla")

    gn.set_default_stats_impl("xla")
    a0, b0 = gn.group_affine(x, scale, bias, 32, 1e-5)
    g0 = jax.grad(lambda x: affine_sum(x, "xla"))(x)
    gn.set_default_stats_impl("pallas")
    try:
        with pltpu.force_tpu_interpret_mode():
            a1, b1 = gn.group_affine(x, scale, bias, 32, 1e-5)
            g1 = jax.grad(lambda x: affine_sum(x, "pallas"))(x)
    finally:
        gn.set_default_stats_impl("xla")
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a0))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b0))
    np.testing.assert_array_equal(
        np.asarray(g1, np.float32), np.asarray(g0, np.float32))

    # prime row count → no aligned chunk → kernel ineligible (XLA fallback)
    gn.set_default_stats_impl("pallas")
    try:
        assert not gn.stats_ok(jnp.zeros((2, 7, 320), jnp.bfloat16))
    finally:
        gn.set_default_stats_impl("xla")


def test_group_norm_matches_flax():
    import flax.linen as nn

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64))

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.GroupNorm(16, epsilon=1e-5)(x)

    scale = jnp.linspace(0.5, 1.5, 64)
    bias = jnp.linspace(-1, 1, 64)
    fl = M().apply({"params": {"GroupNorm_0": {"scale": scale, "bias": bias}}}, x)
    ours = group_norm_silu(x, scale, bias, groups=16, silu=False, impl="xla")
    np.testing.assert_allclose(np.asarray(ours), np.asarray(fl), atol=1e-5)


def test_temporal_attention_packed_matches_einsum():
    from animate_anything_tpu.ops.temporal_attention import (
        _einsum_reference, _temporal_attention_p)

    # f=17 (16 frames + condition), s NOT divisible by the pack size → padding
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 17, 33, 2, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 17, 33, 2, 64))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 17, 33, 2, 64))
    ref = _einsum_reference(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = _temporal_attention_p(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("f", [2, 14])
def test_temporal_attention_packed_other_frame_counts(f):
    from animate_anything_tpu.ops.temporal_attention import (
        _einsum_reference, _temporal_attention_p)

    q = jax.random.normal(jax.random.PRNGKey(3), (2, f, 40, 1, 32))
    ref = _einsum_reference(q, q, q)
    with pltpu.force_tpu_interpret_mode():
        out = _temporal_attention_p(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_temporal_attention_grad_finite():
    from animate_anything_tpu.ops.temporal_attention import _temporal_attention_p

    q = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 16, 1, 32))

    def loss(q):
        with pltpu.force_tpu_interpret_mode():
            return (_temporal_attention_p(q, q, q) ** 2).sum()

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_temporal_attention_dispatch_xla_on_cpu():
    from animate_anything_tpu.ops.temporal_attention import (
        _einsum_reference, temporal_attention)

    q = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 64, 2, 32))
    out = temporal_attention(q, q, q, impl="pallas")  # CPU → einsum fallback
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_einsum_reference(q, q, q)), atol=1e-6
    )


def test_fused_temporal_block_pack_roundtrip():
    from animate_anything_tpu.ops.temporal_block import (
        pack_frames, pack_geometry, unpack_frames)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 17, 33, 16))
    g = pack_geometry(17, 33)
    assert g.p == 7 and g.R == 119 and g.Rp == 120
    y = unpack_frames(pack_frames(x, g), g)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))


def test_fused_temporal_block_kernel_matches_reference():
    from animate_anything_tpu.ops.temporal_block import (
        _reference, fused_temporal_attn_block, pack_frames, pack_geometry)

    c, heads, d, f, s = 128, 2, 64, 5, 26   # p=25, R=125, Rp=128, ragged s
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (2, f, s, c))
    g = pack_geometry(f, s)
    xp = pack_frames(x, g)
    lns = jax.random.normal(ks[1], (c,)) * 0.1 + 1
    lnb = jax.random.normal(ks[2], (c,)) * 0.1
    ws = [jax.random.normal(k, (c, c)) * c ** -0.5 for k in ks[3:7]]
    bo = jax.random.normal(ks[7], (c,)) * 0.1

    ref = fused_temporal_attn_block(
        xp, lns, lnb, *ws, bo, geom=g, heads=heads, head_dim=d, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        out = fused_temporal_attn_block(
            xp, lns, lnb, *ws, bo, geom=g, heads=heads, head_dim=d, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_fused_temporal_block_lean_backward_matches_exact():
    """The memory-lean per-location gradient twin (used in the custom_vjp
    backward) must match the exact packed twin's gradients on real rows and
    produce zero pad-row discrepancy (pad cotangents are always zero)."""
    import functools
    from animate_anything_tpu.ops.temporal_block import (
        _reference, _reference_lean, pack_frames, pack_geometry, unpack_frames)

    c, heads, d, f, s = 64, 8, 8, 17, 24    # p=7, R=119, Rp=120 (pad row)
    g = pack_geometry(f, s)
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    x = jax.random.normal(ks[0], (2, f, s, c))
    xp = pack_frames(x, g)
    lns = jax.random.normal(ks[1], (1, c)) * 0.1 + 1
    lnb = jax.random.normal(ks[2], (1, c)) * 0.1
    ws = [jax.random.normal(k, (c, c)) * c ** -0.5 for k in ks[3:7]]
    bo = jax.random.normal(ks[7], (1, c)) * 0.1
    args = (xp, lns, lnb, *ws, bo)

    def loss(fn, *a):  # consumer drops pad rows, like every real consumer
        return (unpack_frames(fn(*a), g) ** 2).sum()

    for fn in (_reference, _reference_lean):
        fn_g = functools.partial(fn, geom=g, heads=heads, d=d)
        grads = jax.grad(functools.partial(loss, fn_g), argnums=tuple(range(8)))(*args)
        if fn is _reference:
            exact = grads
        else:
            for a, b in zip(exact, grads):
                scale = float(jnp.abs(a).max()) + 1e-6
                np.testing.assert_allclose(
                    np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-5)


@pytest.mark.slow  # full-forward/compile-heavy; fast tier keeps the smaller variants
def test_fused_temporal_block_equals_unfused_module(exact_gelu):
    """TemporalTransformer: pallas (fused, CPU → reference math on packed
    layout) and xla (einsum) paths share one param tree and agree."""
    from animate_anything_tpu.models.attention import TemporalTransformer

    f, hh, ww, c = 5, 4, 6, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (2 * f, hh, ww, c))
    m_x = TemporalTransformer(2, 64, attn_impl="xla", dtype=jnp.float32)
    m_p = TemporalTransformer(2, 64, attn_impl="pallas", dtype=jnp.float32)
    p_x = m_x.init(jax.random.PRNGKey(1), x, f)
    p_p = m_p.init(jax.random.PRNGKey(1), x, f)
    assert jax.tree_util.tree_structure(p_x) == jax.tree_util.tree_structure(p_p)
    diffs = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), p_x, p_p)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
    np.testing.assert_allclose(
        np.asarray(m_p.apply(p_p, x, f)), np.asarray(m_x.apply(p_x, x, f)), atol=5e-5)

    g = jax.grad(lambda p: (m_p.apply(p, x, f) ** 2).sum())(p_p)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_fused_temporal_block_bfsc_kernel_matches_reference():
    """Transpose-free (b, f, s, c) kernel (in-VMEM pack shuffle) vs the
    per-location XLA twin, on a geometry with a pad row (f=17 → Rp>R) and a
    ragged s edge (s not divisible by nblk·p)."""
    from animate_anything_tpu.ops.temporal_block import (
        _bfsc_geometry, _reference_bfsc, fused_temporal_block_bfsc)

    c, heads, d, f, s = 128, 2, 64, 17, 120   # p=7 → ragged s edge
    geo = _bfsc_geometry(f, s, c)
    assert geo is not None and geo[0] == 7 and geo[3] * geo[0] < s
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (2, f, s, c))
    lns = jax.random.normal(ks[1], (c,)) * 0.1 + 1
    lnb = jax.random.normal(ks[2], (c,)) * 0.1
    ws = [jax.random.normal(k, (c, c)) * c ** -0.5 for k in ks[3:7]]
    bo = jax.random.normal(ks[7], (c,)) * 0.1

    ref = fused_temporal_block_bfsc(
        x, lns, lnb, *ws, bo, heads=heads, head_dim=d, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        out = fused_temporal_block_bfsc(
            x, lns, lnb, *ws, bo, heads=heads, head_dim=d, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    # the bfsc reference equals the packed-layout reference on real rows
    from animate_anything_tpu.ops.temporal_block import (
        _reference, pack_frames, pack_geometry, unpack_frames)

    g = pack_geometry(f, s)
    packed = unpack_frames(_reference(
        pack_frames(x, g), lns.reshape(1, c), lnb.reshape(1, c), *ws,
        bo.reshape(1, c), geom=g, heads=heads, d=d), g)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(packed), atol=2e-4)


@pytest.mark.slow  # full-forward/compile-heavy; fast tier keeps the smaller variants
def test_fused_temporal_block_bfsc_module_wiring():
    """TemporalTransformer picks the bfsc path when the geometry allows and
    matches the xla module; gradients flow and are finite."""
    from animate_anything_tpu.models.attention import TemporalTransformer
    from animate_anything_tpu.ops.temporal_block import bfsc_ok

    f, hh, ww, c = 16, 8, 8, 128              # p=8, base=1 → bfsc eligible
    assert bfsc_ok(f, hh * ww, c, 2, 64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2 * f, hh, ww, c))
    m_x = TemporalTransformer(2, 64, attn_impl="xla", dtype=jnp.float32)
    m_p = TemporalTransformer(2, 64, attn_impl="pallas", dtype=jnp.float32)
    p_x = m_x.init(jax.random.PRNGKey(1), x, f)
    p_p = m_p.init(jax.random.PRNGKey(1), x, f)
    assert jax.tree_util.tree_structure(p_x) == jax.tree_util.tree_structure(p_p)
    np.testing.assert_allclose(
        np.asarray(m_p.apply(p_p, x, f)), np.asarray(m_x.apply(p_x, x, f)), atol=5e-5)

    g = jax.grad(lambda p: (m_p.apply(p, x, f) ** 2).sum())(p_p)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


# ---- fused temporal conv (ops/temporal_conv.py) ----------------------------

def test_gn_silu_tap_conv_reference_matches_composite():
    """The folded-stats reference path equals FusedGroupNorm+TemporalTapConv."""
    from animate_anything_tpu.models.layers import TemporalConvLayer

    b, f, res, c = 2, 5, 8, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (b * f, res, res, c))
    m_ref = TemporalConvLayer(c)
    m_fus = TemporalConvLayer(c, impl="pallas")  # CPU → reference math path
    p = m_ref.init(jax.random.PRNGKey(1), x, f)
    p2 = m_fus.init(jax.random.PRNGKey(1), x, f)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
    # perturb the zero-init conv4 so the final stage contributes
    p = jax.tree_util.tree_map(lambda a: a + 0.01 if a.ndim == 4 else a, p)
    a = m_ref.apply(p, x, f)
    bb = m_fus.apply(p, x, f)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-4)


def test_gn_silu_tap_conv_pallas_kernel_interpret():
    from animate_anything_tpu.ops.temporal_conv import (
        _pallas_stage, _reference_stage)

    b, f, s, cin, cout = 2, 5, 24, 128, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (b, f, s, cin))
    a = jax.random.normal(jax.random.PRNGKey(1), (b, cin)) * 0.1 + 1.0
    bv = jax.random.normal(jax.random.PRNGKey(2), (b, cin)) * 0.1
    w = jax.random.normal(jax.random.PRNGKey(3), (3, cin, cout)) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(4), (cout,)) * 0.1
    res = jax.random.normal(jax.random.PRNGKey(5), (b, f, s, cout))
    ref = _reference_stage(x, a, bv, w, bias, res)
    with pltpu.force_tpu_interpret_mode():
        got = _pallas_stage(x, a, bv, w, bias, res, ch=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_gn_silu_tap_conv_stats_epilogue_interpret():
    """The stats-emitting kernel returns (y, Σy, Σy²) per (b, f, c) matching
    the XLA twin — the epilogue that lets consumer GroupNorms skip their
    standalone reduce over this kernel's output."""
    from animate_anything_tpu.ops.temporal_conv import (
        _pallas_stage, _reference_stage_stats)

    b, f, s, cin, cout = 2, 5, 24, 128, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (b, f, s, cin))
    a = jax.random.normal(jax.random.PRNGKey(1), (b, cin)) * 0.1 + 1.0
    bv = jax.random.normal(jax.random.PRNGKey(2), (b, cin)) * 0.1
    w = jax.random.normal(jax.random.PRNGKey(3), (3, cin, cout)) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(4), (cout,)) * 0.1
    res = jax.random.normal(jax.random.PRNGKey(5), (b, f, s, cout))
    ref_y, ref_s1, ref_s2 = _reference_stage_stats(x, a, bv, w, bias, res)
    with pltpu.force_tpu_interpret_mode():
        y, s1, s2 = _pallas_stage(x, a, bv, w, bias, res, ch=8,
                                  emit_stats=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(ref_s1), rtol=2e-5,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(ref_s2), rtol=2e-5,
                               atol=1e-3)


def test_gn_silu_tap_conv_sums_input_matches_recompute():
    """Feeding precomputed (Σx, Σx²) into gn_silu_tap_conv yields the same
    output as letting it reduce the input itself (the inter-stage chaining
    path in TemporalConvLayer)."""
    from animate_anything_tpu.ops.temporal_conv import gn_silu_tap_conv

    b, f, s, c = 2, 4, 16, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (b, f, s, c))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, c, c)) * 0.05
    xf = x.astype(jnp.float32).reshape(b, f * s, c)
    sums = (xf.sum(1), (xf * xf).sum(1))
    y0 = gn_silu_tap_conv(x, jnp.ones((c,)), jnp.zeros((c,)), w,
                          jnp.zeros((c,)), groups=8)
    y1 = gn_silu_tap_conv(x, jnp.ones((c,)), jnp.zeros((c,)), w,
                          jnp.zeros((c,)), groups=8, sums=sums)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)


def test_gn_silu_tap_conv_grad_finite():
    from animate_anything_tpu.ops.temporal_conv import gn_silu_tap_conv

    b, f, s, c = 1, 4, 16, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (b, f, s, c))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, c, c)) * 0.05

    def loss(x, w):
        y = gn_silu_tap_conv(x, jnp.ones((c,)), jnp.zeros((c,)), w,
                             jnp.zeros((c,)), groups=8)
        return (y ** 2).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert np.isfinite(np.asarray(gx)).all() and float(jnp.abs(gx).sum()) > 0
    assert np.isfinite(np.asarray(gw)).all() and float(jnp.abs(gw).sum()) > 0


# ---- fused LN+GEGLU feed-forward (ops/geglu.py) -----------------------------

def test_ln_geglu_reference_matches_composite():
    import flax.linen as nn

    from animate_anything_tpu.models.attention import GEGLUFeedForward
    from animate_anything_tpu.ops.geglu import ln_geglu_ff

    c = 64
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, c))
    ff = GEGLUFeedForward()
    ln = nn.LayerNorm(epsilon=1e-5)
    pl_ = ln.init(jax.random.PRNGKey(1), x)
    pf = ff.init(jax.random.PRNGKey(2), x)
    want = x + ff.apply(pf, ln.apply(pl_, x))
    got = ln_geglu_ff(
        x, pl_["params"]["scale"], pl_["params"]["bias"],
        pf["params"]["net_0_proj"]["kernel"], pf["params"]["net_0_proj"]["bias"],
        pf["params"]["net_2"]["kernel"], pf["params"]["net_2"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ln_geglu_pallas_kernel_interpret():
    from animate_anything_tpu.ops.geglu import _pallas_ln_geglu, _reference

    c = 128
    x = jax.random.normal(jax.random.PRNGKey(0), (40, c))
    s = jnp.ones((c,)) + 0.1
    b = jnp.zeros((c,)) + 0.05
    w1 = jax.random.normal(jax.random.PRNGKey(1), (c, 8 * c)) * 0.05
    b1 = jax.random.normal(jax.random.PRNGKey(2), (1, 8 * c)) * 0.1
    w2 = jax.random.normal(jax.random.PRNGKey(3), (4 * c, c)) * 0.05
    b2 = jax.random.normal(jax.random.PRNGKey(4), (1, c)) * 0.1
    # the kernel's gelu follows _GELU_IMPL (tanh default) — compare against
    # the matching reference form
    from animate_anything_tpu.ops import geglu as gg

    ref = _reference(x, s, b, w1, b1, w2, b2, 1e-5,
                     approximate=gg._GELU_IMPL == "tanh")
    with pltpu.force_tpu_interpret_mode():
        got = _pallas_ln_geglu(x, s, b, w1, b1, w2, b2, 1e-5, rows=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


@pytest.mark.slow  # full-forward/compile-heavy; fast tier keeps the smaller variants
def test_ln_geglu_wide_kernel_interpret():
    """N-streamed wide-FF kernel (c>640 sites): per-inner-block val·gelu(gate)
    folded straight into the down-projection accumulator — must match the
    lean composite (bf16-stored hidden) it replaces, ragged rows included."""
    from animate_anything_tpu.ops.geglu import (_fused_wide_p, _pick_rows_wide,
                                                _reference_lean)

    c, inner = 256, 1024                     # wide-path shapes at test scale
    for n in (272, 204):                     # divisor-aligned / ragged rows
        # (204 has no multiple-of-8 divisor → exercises the pad+slice path)
        ks = jax.random.split(jax.random.PRNGKey(n), 6)
        x = (jax.random.normal(ks[0], (n, c)) * 0.5).astype(jnp.bfloat16)
        s = jnp.ones((c,), jnp.float32) + 0.1
        b = jnp.zeros((c,), jnp.float32) + 0.05
        w1 = (jax.random.normal(ks[1], (c, 2 * inner)) * 0.05).astype(jnp.bfloat16)
        b1 = jax.random.normal(ks[2], (2 * inner,)) * 0.1
        w2 = (jax.random.normal(ks[3], (inner, c)) * 0.05).astype(jnp.bfloat16)
        b2 = jax.random.normal(ks[4], (c,)) * 0.1
        ref = _reference_lean(x, s, b, w1, b1, w2, b2, 1e-5)
        rows = _pick_rows_wide(c, n)
        with pltpu.force_tpu_interpret_mode():
            got = _fused_wide_p(x, s, b, w1, b1, w2, b2, 1e-5, rows)
            g = jax.grad(lambda x: jnp.sum(
                _fused_wide_p(x, s, b, w1, b1, w2, b2, 1e-5, rows
                              ).astype(jnp.float32) ** 2))(x)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=3e-2, rtol=1e-2)  # bf16 accumulator-order noise
        assert np.isfinite(np.asarray(g, np.float32)).all()


def test_ln_geglu_grad_finite():
    from animate_anything_tpu.ops.geglu import ln_geglu_ff

    c = 32
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, c))
    w1 = jax.random.normal(jax.random.PRNGKey(1), (c, 8 * c)) * 0.05
    w2 = jax.random.normal(jax.random.PRNGKey(2), (4 * c, c)) * 0.05

    def loss(x, w1, w2):
        y = ln_geglu_ff(x, jnp.ones((c,)), jnp.zeros((c,)), w1, jnp.zeros((8 * c,)),
                        w2, jnp.zeros((c,)))
        return (y ** 2).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2))(x, w1, w2)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_fused_temporal_block_head_grouped_matches_reference():
    """c=1280-style site: per-head-group kernels + XLA partial sum ==
    single reference (interpret mode)."""
    from animate_anything_tpu.ops import temporal_block as tb

    f, s, c, heads, d = 5, 12, 256, 4, 64
    geom = tb.pack_geometry(f, s)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, f, s, c))
    xp = tb.pack_frames(x, geom)
    lns = jnp.ones((1, c)); lnb = jnp.zeros((1, c))
    ws = [jax.random.normal(jax.random.PRNGKey(i), (c, c)) * 0.05 for i in range(4)]
    bo = jnp.zeros((1, c))
    ref = tb._reference(xp, lns, lnb, *ws, bo, geom=geom, heads=heads, d=d)
    hg = heads // 2
    with pltpu.force_tpu_interpret_mode():
        part = tb._build(geom, hg, d, c, 1e-5, fuse_residual=False)
        acc = None
        for gi in range(2):
            sl = slice(gi * hg * d, (gi + 1) * hg * d)
            y = part(xp, lns, lnb, ws[0][:, sl], ws[1][:, sl], ws[2][:, sl],
                     ws[3][sl, :], bo).astype(jnp.float32)
            acc = y if acc is None else acc + y
    got = (acc + bo + xp.astype(jnp.float32)).astype(xp.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)
    assert tb._n_head_groups(1280, 20) == 2
    assert tb.fused_ok(17, 1280, 20, 64)


# ---- fused GN+SiLU+conv3x3 (ops/conv3x3.py) --------------------------------


# ---- fused spatial conv3x3 v2 (ops/spatial_conv.py) -------------------------


# ---- fused proj_out + residual + stats (ops/proj_residual.py) ---------------

def test_proj_residual_stats_interpret():
    """Kernel matches the XLA twin: y = h@w + bias + residual, stats per
    (n, c) of the stored output."""
    from animate_anything_tpu.ops.proj_residual import (_pallas_proj,
                                                        _reference)

    n, s, k, c = 3, 32, 64, 128
    h = jax.random.normal(jax.random.PRNGKey(0), (n, s, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, c)) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1
    r = jax.random.normal(jax.random.PRNGKey(3), (n, s, c))
    ref_y, ref_s1, ref_s2 = _reference(h, w, bias, r)
    with pltpu.force_tpu_interpret_mode():
        y, s1, s2 = _pallas_proj(h, w, bias, r, ch=8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(ref_s1), rtol=2e-5,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(ref_s2), rtol=2e-5,
                               atol=1e-3)


def test_proj_residual_grad_matches_composite():
    """custom_vjp backward equals grads of the composite Dense+add."""
    from animate_anything_tpu.ops.proj_residual import proj_residual_stats

    n, s, k, c = 2, 16, 32, 64
    h = jax.random.normal(jax.random.PRNGKey(0), (n, s, k))
    w = jax.random.normal(jax.random.PRNGKey(1), (k, c)) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1
    r = jax.random.normal(jax.random.PRNGKey(3), (n, s, c))

    def loss_fused(h, w, bias, r):
        y, (s1, s2) = proj_residual_stats(h, w, bias, r)
        # consume y AND the stats (the consumer GN uses them)
        return (y.astype(jnp.float32) ** 2).sum() + 0.1 * s1.sum() + 0.01 * s2.sum()

    def loss_comp(h, w, bias, r):
        y = jnp.einsum("nsk,kc->nsc", h, w) + bias + r
        yf = y.astype(jnp.float32)
        return (yf ** 2).sum() + 0.1 * yf.sum() + 0.01 * (yf * yf).sum()

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(h, w, bias, r)
    g_c = jax.grad(loss_comp, argnums=(0, 1, 2, 3))(h, w, bias, r)
    for a, b in zip(g_f, g_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4)


def test_spatial_transformer_fused_out_matches_composite(exact_gelu):
    """SpatialTransformer attn_impl='pallas' (fused proj_out+residual path on
    the CPU reference twin) equals the composite XLA path, and the returned
    sums equal the output's true sums."""
    from animate_anything_tpu.models.attention import SpatialTransformer

    bf, hh, ww, c = 4, 8, 8, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (bf, hh, ww, c))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (bf, 7, 32))
    m_x = SpatialTransformer(2, 32, context_dim=32, groups=8, attn_impl="xla")
    m_p = SpatialTransformer(2, 32, context_dim=32, groups=8, attn_impl="pallas")
    p = m_x.init(jax.random.PRNGKey(2), x, ctx)
    p2 = m_p.init(jax.random.PRNGKey(2), x, ctx)
    assert (jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2))
    y_x = m_x.apply(p, x, ctx)
    y_p, sums = m_p.apply(p, x, ctx, None, None, True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=5e-5)
    yf = np.asarray(y_p, np.float64).reshape(bf, hh * ww, c)
    np.testing.assert_allclose(np.asarray(sums[0]), yf.sum(1), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(sums[1]), (yf * yf).sum(1),
                               rtol=1e-4, atol=1e-3)


def test_temporal_transformer_fused_out_matches_composite(exact_gelu):
    from animate_anything_tpu.models.attention import TemporalTransformer

    f, hh, ww, c = 5, 4, 6, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (2 * f, hh, ww, c))
    m_x = TemporalTransformer(2, 64, attn_impl="xla", dtype=jnp.float32)
    m_p = TemporalTransformer(2, 64, attn_impl="pallas", dtype=jnp.float32)
    p = m_x.init(jax.random.PRNGKey(1), x, f)
    y_x = m_x.apply(p, x, f)
    y_p, sums = m_p.apply(p, x, f, None, None, True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=5e-5)
    assert sums is not None and sums[0].shape == (2 * f, c)
    # entry_sums consumption: feeding the true input sums reproduces the
    # default output exactly
    xf = np.asarray(x, np.float64).reshape(2, f * hh * ww, c)
    es = (jnp.asarray(xf.sum(1), jnp.float32),
          jnp.asarray((xf * xf).sum(1), jnp.float32))
    y_es = m_x.apply(p, x, f, None, es)
    np.testing.assert_allclose(np.asarray(y_es), np.asarray(y_x), atol=5e-5)



def test_resnet_want_stats_matches_plain():
    """ResnetBlock2D want_stats path (CPU → XLA add, stats None) returns the
    same output as the plain call; with explicit sums fed to norm1 the output
    is unchanged too."""
    from animate_anything_tpu.models.layers import ResnetBlock2D

    bf, hh, ww, c = 4, 8, 8, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (bf, hh, ww, c))
    temb = jax.random.normal(jax.random.PRNGKey(1), (bf, 32))
    m = ResnetBlock2D(out_channels=c, groups=8)
    p = m.init(jax.random.PRNGKey(2), x, temb)
    y0 = m.apply(p, x, temb)
    y1, sums = m.apply(p, x, temb, None, True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-6)
    assert sums is None  # CPU path: no pallas add → no sums (by design)
    xf = np.asarray(x, np.float64).reshape(bf, hh * ww, c)
    es = (jnp.asarray(xf.sum(1), jnp.float32),
          jnp.asarray((xf * xf).sum(1), jnp.float32))
    y2 = m.apply(p, x, temb, es)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y0), atol=2e-5)

