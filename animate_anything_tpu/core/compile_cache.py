"""Persistent XLA compilation cache.

The reference's torch stack pays a CUDA-kernel warmup per process; the XLA
equivalent is a full UNet re-JIT (minutes for the 512px graph on a small
host). Enabling JAX's persistent compile cache makes every CLI / bench /
app invocation after the first start in seconds. Opt out with
ANIMATE_ANYTHING_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser(os.environ.get("XDG_CACHE_HOME", "~/.cache")),
    "animate_anything_tpu", "xla_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a writable directory.

    Safe to call multiple times; returns the directory in use (None when
    disabled via env or when JAX already has a cache dir configured, e.g.
    the test suite's conftest)."""
    if os.environ.get("ANIMATE_ANYTHING_NO_COMPILE_CACHE"):
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    cache_dir = cache_dir or _DEFAULT_DIR
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return cache_dir


def xla_compiler_options() -> dict | None:
    """Per-jit XLA compiler options from AA_XLA_OPTS="k=v,k2=v2".

    The axon client rejects unknown entries in XLA_FLAGS at process start,
    but jax.jit(compiler_options=...) forwards options to the remote
    compiler (validated there — bogus keys raise at compile time). Used by
    the hot-path jits (pipeline denoise/decode, bench) for A/B-ing compiler
    knobs like xla_tpu_scoped_vmem_limit_kib without code changes."""
    s = os.environ.get("AA_XLA_OPTS", "")
    if not s:
        return None
    return dict(kv.split("=", 1) for kv in s.split(",") if "=" in kv)
