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


def test_flash_attention_grad():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 1, 64))

    def loss(q):
        with pltpu.force_tpu_interpret_mode():
            return (_flash_attention_p(q, q, q) ** 2).sum()

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_group_norm_pick_chunk():
    assert 4096 % _pick_chunk(4096, 320) == 0
    assert _pick_chunk(17 * 4096, 320) % 8 == 0
    assert _pick_chunk(7, 320) == 0  # prime, no divisor → fallback


@pytest.mark.parametrize("silu", [True, False])
def test_group_norm_streaming_kernel_parity(silu):
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 48, 128))
    scale = jnp.linspace(0.5, 1.5, 128)
    bias = jnp.linspace(-1, 1, 128)
    ref = group_norm_silu(x, scale, bias, groups=32, silu=silu, impl="xla")
    with pltpu.force_tpu_interpret_mode():
        out = group_norm_silu(x, scale, bias, groups=32, silu=silu, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


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
