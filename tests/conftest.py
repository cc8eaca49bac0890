"""Test environment: force an 8-device virtual CPU platform.

This is the idiomatic JAX substitute for multi-node testing without a cluster
(the reference only exercises multi-GPU by actually launching DeepSpeed,
/root/reference/README.md:188-194 — we instead unit-test sharding on host
devices).

Note: this image pre-imports jax from sitecustomize (TPU backend plugin), so
env vars alone are too late; we set XLA_FLAGS before any backend initializes
and switch the platform through jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache — this box has 1 CPU core; re-JITing the UNet
# on every pytest run dominates wall-clock otherwise.
os.makedirs("/root/.cache/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


import pytest  # noqa: E402


@pytest.fixture
def exact_gelu(monkeypatch):
    """Pin the fused GEGLU kernels to exact-erf gelu for structural-parity
    tests that assert pallas-path == composite-path at ~1e-5 tolerances.
    The kernels default to tanh-form gelu (a measured perf win, |Δ| ≤ 3e-3 —
    docs/KERNELS.md r5); these tests verify the fusion STRUCTURE (param
    trees, packing, sums epilogues), so they compare like-for-like math."""
    from animate_anything_tpu.ops import geglu

    monkeypatch.setattr(geglu, "_GELU_IMPL", "erf_fp32")
