"""Attic kernels (ops/attic/): dormant, measured-negative-result kernels.

Numerics stay pinned even though dispatch never engages them (docs/KERNELS.md
records the on-chip measurements). Marked slow — off the fast tier.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from animate_anything_tpu.ops.group_norm import group_norm_silu

pytestmark = pytest.mark.slow


def test_flash_attention_packed_heads_interpret_matches_xla():
    # dormant packed-heads kernel (natural (b,s,h·d) layout, streamed K):
    # numerics stay verified even though dispatch doesn't engage it.
    from animate_anything_tpu.ops.attic.packed_flash import _flash_forward_packed

    for (b, sq, sk, h) in [(2, 256, 256, 5), (1, 300, 77, 2)]:
        q = jax.random.normal(jax.random.PRNGKey(0), (b, sq, h, 64))
        k = jax.random.normal(jax.random.PRNGKey(1), (b, sk, h, 64))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, sk, h, 64))
        ref = jax.nn.dot_product_attention(q, k, v)
        with pltpu.force_tpu_interpret_mode():
            out = _flash_forward_packed(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("silu", [True, False])
def test_group_norm_streaming_kernel_parity(silu):
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 48, 128))
    scale = jnp.linspace(0.5, 1.5, 128)
    bias = jnp.linspace(-1, 1, 128)
    ref = group_norm_silu(x, scale, bias, groups=32, silu=silu, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        out = group_norm_silu(x, scale, bias, groups=32, silu=silu, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gn_silu_conv3x3_folded_stats_match_composite():
    """The op's folded-stats formulation equals FusedGroupNorm+SiLU+nn.Conv
    (the op itself is dormant in the model — see ops/conv3x3.py STATUS)."""
    import flax.linen as nn

    from animate_anything_tpu.models.layers import FusedGroupNorm
    from animate_anything_tpu.ops.attic.conv3x3 import gn_silu_conv3x3

    n, res, c = 4, 10, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (n, res, res, c))
    gnorm = FusedGroupNorm(8, 1e-5, silu=True)
    conv = nn.Conv(c, (3, 3), padding=1)
    pg = gnorm.init(jax.random.PRNGKey(1), x)
    pc = conv.init(jax.random.PRNGKey(2), x)
    want = conv.apply(pc, gnorm.apply(pg, x))
    got = gn_silu_conv3x3(
        x, pg["params"]["scale"], pg["params"]["bias"],
        pc["params"]["kernel"], pc["params"]["bias"], groups=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_gn_silu_conv3x3_pallas_kernel_interpret():
    from animate_anything_tpu.ops.attic.conv3x3 import _pallas_stage, _reference_stage_exact

    n, H, W, cin, cout = 2, 6, 9, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (n, H, W, cin))
    a = jax.random.normal(jax.random.PRNGKey(1), (n, cin)) * 0.1 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (n, cin)) * 0.1
    w9 = jax.random.normal(jax.random.PRNGKey(3), (9, cin, cout)) * 0.1
    bias = jax.random.normal(jax.random.PRNGKey(4), (n, 1, cout)) * 0.1
    ref = _reference_stage_exact(x, a, b, w9, bias)
    with pltpu.force_tpu_interpret_mode():
        got = _pallas_stage(x, a, b, w9, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_gn_silu_conv3x3_grad_finite():
    from animate_anything_tpu.ops.attic.conv3x3 import gn_silu_conv3x3

    n, res, c = 2, 6, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (n, res, res, c))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c)) * 0.1

    def loss(x, w):
        y = gn_silu_conv3x3(x, jnp.ones((c,)), jnp.zeros((c,)), w,
                            jnp.zeros((c,)), groups=4)
        return (y ** 2).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert np.isfinite(np.asarray(gx)).all() and float(jnp.abs(gx).sum()) > 0
    assert np.isfinite(np.asarray(gw)).all() and float(jnp.abs(gw).sum()) > 0


def test_spatial_conv_reference_matches_composite(monkeypatch):
    """Folded-stats XLA twin equals FusedGroupNorm→SiLU→nn.Conv semantics,
    and the fused ResnetBlock2D path shares the composite path's param tree.
    (The kernel is dormant — a measured negative result — so the fused
    ResnetBlock2D routing needs the AA_SPATIAL_CONV=1 opt-in.)"""
    from animate_anything_tpu.models.layers import ResnetBlock2D

    monkeypatch.setenv("AA_SPATIAL_CONV", "1")
    n, res, c = 3, 16, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (n, res, res, c))
    temb = jax.random.normal(jax.random.PRNGKey(1), (n, 32))
    m_ref = ResnetBlock2D(c, groups=8)
    m_fus = ResnetBlock2D(c, groups=8, impl="pallas")  # CPU → XLA twin path
    p = m_ref.init(jax.random.PRNGKey(2), x, temb)
    p2 = m_fus.init(jax.random.PRNGKey(2), x, temb)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
    a = m_ref.apply(p, x, temb)
    b = m_fus.apply(p, x, temb)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize("hw,cin,cout", [(16, 64, 48), (24, 128, 128)])
def test_spatial_conv_pallas_kernel_interpret(hw, cin, cout):
    from animate_anything_tpu.ops.attic import spatial_conv as sc

    n = 2
    x = jax.random.normal(jax.random.PRNGKey(0), (n, hw, hw, cin))
    a = jax.random.normal(jax.random.PRNGKey(1), (n, cin)) * 0.1 + 1.0
    bv = jax.random.normal(jax.random.PRNGKey(2), (n, cin)) * 0.1
    w9 = jax.random.normal(jax.random.PRNGKey(3), (9, cin, cout)) * 0.05
    bias = jax.random.normal(jax.random.PRNGKey(4), (n, 1, cout)) * 0.1
    res = jax.random.normal(jax.random.PRNGKey(5), (n, hw, hw, cout))
    ref = sc._reference_stage(x, a, bv, w9, bias, res, silu=True)
    with pltpu.force_tpu_interpret_mode():
        got = sc._pallas_stage(x, a, bv, w9, bias, res, ch=8, co_ch=cout, silu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_spatial_conv_cin_split_interpret():
    """cin > _CIN_MAX splits into two accumulating kernel calls."""
    from unittest import mock

    from animate_anything_tpu.ops.attic import spatial_conv as sc

    n, hw, cin, cout = 2, 16, 96, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (n, hw, hw, cin))
    s = jax.random.normal(jax.random.PRNGKey(1), (cin,)) * 0.1 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (cin,)) * 0.1
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, cin, cout)) * 0.05
    cb = jax.random.normal(jax.random.PRNGKey(4), (cout,)) * 0.1
    ref = sc.gn_silu_spatial_conv(x, s, b, w, cb, groups=8, impl="xla")
    fake_tpu = lambda: [type("D", (), {"platform": "tpu"})()]
    with mock.patch.object(sc, "_CIN_MAX", 80), \
         mock.patch.object(sc.jax, "devices", fake_tpu), \
         pltpu.force_tpu_interpret_mode():
        got = sc.gn_silu_spatial_conv(x, s, b, w, cb, groups=8, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_spatial_conv_grad_finite():
    from animate_anything_tpu.ops.attic.spatial_conv import gn_silu_spatial_conv

    n, hw, c = 1, 16, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (n, hw, hw, c))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c)) * 0.05

    def loss(x, w):
        y = gn_silu_spatial_conv(x, jnp.ones((c,)), jnp.zeros((c,)), w,
                                 jnp.zeros((c,)), groups=8)
        return (y ** 2).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert np.isfinite(np.asarray(gx)).all() and float(jnp.abs(gx).sum()) > 0
    assert np.isfinite(np.asarray(gw)).all() and float(jnp.abs(gw).sum()) > 0


# ---- fused LN+QKV+attention (ops/attic/ln_qkv_attention.py) — r5 negative
# result: 10.08 vs 9.63 s headline (VMEM-forced 128-row q tiles + serialized
# grid cost more than the saved normed/q/k/v HBM round-trips) ----------------

def test_ln_qkv_attention_interpret_matches_reference():
    from animate_anything_tpu.ops.attic.ln_qkv_attention import (_pallas_fwd,
                                                           _reference)

    for b, s, c, heads in [(2, 256, 128, 2), (1, 300, 192, 3)]:  # odd heads +
        d = 64                                                   # ragged s
        ks = jax.random.split(jax.random.PRNGKey(heads), 6)
        x = jax.random.normal(ks[0], (b, s, c))
        lns = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
        lnb = 0.1 * jax.random.normal(ks[2], (c,))
        wq = jax.random.normal(ks[3], (c, heads * d)) * 0.05
        wk = jax.random.normal(ks[4], (c, heads * d)) * 0.05
        wv = jax.random.normal(ks[5], (c, heads * d)) * 0.05
        ref = _reference(x, lns, lnb, wq, wk, wv, heads=heads, d=d, eps=1e-5)
        with pltpu.force_tpu_interpret_mode():
            out = _pallas_fwd(x, lns, lnb, wq, wk, wv, heads, d, 1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_ln_qkv_attention_grad_matches_composite():
    from animate_anything_tpu.ops.attic.ln_qkv_attention import _fused_p, _reference

    b, s, c, heads, d = 1, 256, 128, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, s, c))
    lns = 1.0 + 0.1 * jax.random.normal(ks[1], (c,))
    lnb = 0.1 * jax.random.normal(ks[2], (c,))
    wq = jax.random.normal(ks[3], (c, heads * d)) * 0.05
    wk = jax.random.normal(ks[4], (c, heads * d)) * 0.05
    wv = jax.random.normal(ks[5], (c, heads * d)) * 0.05

    def loss_f(*a):
        return (_fused_p(*a, heads, d, 1e-5) ** 2).sum()

    def loss_r(*a):
        return (_reference(*a, heads=heads, d=d, eps=1e-5) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(loss_f, argnums=tuple(range(6)))(x, lns, lnb, wq, wk, wv)
    g_r = jax.grad(loss_r, argnums=tuple(range(6)))(x, lns, lnb, wq, wk, wv)
    for a, bb in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=2e-4,
                                   atol=2e-4)


# ---- fused residual add + stats (ops/attic/add_stats.py) — r5 negative
# result: +0.13 s headline (XLA fuses the resnet residual add into conv2's
# kOutput epilogue; the pallas form added a full write+read per resnet) ------

def test_add_with_stats_interpret():
    from animate_anything_tpu.ops.attic.add_stats import _pallas_add, _reference

    n, s, c = 3, 32, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (n, s, c))
    r = jax.random.normal(jax.random.PRNGKey(1), (n, s, c))
    ref_y, ref_s1, ref_s2 = _reference(x, r)
    with pltpu.force_tpu_interpret_mode():
        y, s1, s2 = _pallas_add(x, r, ch=8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(ref_s1), rtol=1e-5,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(ref_s2), rtol=1e-5,
                               atol=1e-3)


def test_add_with_stats_grad():
    from animate_anything_tpu.ops.attic.add_stats import _add_p

    n, s, c = 2, 16, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (n, s, c))
    r = jax.random.normal(jax.random.PRNGKey(1), (n, s, c))

    def loss(x, r):
        y, s1, s2 = _add_p(x, r, 8)
        return (y ** 2).sum() + 0.1 * s1.sum() + 0.01 * s2.sum()

    def loss_ref(x, r):
        y = x + r
        return (y ** 2).sum() + 0.1 * y.sum() + 0.01 * (y * y).sum()

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss, argnums=(0, 1))(x, r)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(x, r)
    for a, b in zip(g, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5)
