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
