"""Host-side parameter materialization.

``model.init`` of the 1.4B-param UNet is one giant fused XLA program — on the
remote-compile TPU path it costs ~12 minutes of compile for a one-time init.
For benchmarking, smoke tests, and randomly-initialized training we instead
materialize parameters on host from ``jax.eval_shape`` structure: norms get
scale=1/bias=0, kernels get N(0, 0.02), embeddings N(0, 0.02). (Real
checkpoints go through utils/import_torch instead; exact init distributions
only matter for from-scratch training quality, not for any of those paths.)
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def init_params_host(model, rng_or_seed, *args, dtype=None, **kw) -> Any:
    seed = rng_or_seed if isinstance(rng_or_seed, int) else 0
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args, **kw)
    rng = np.random.default_rng(seed)

    def fill(path, s):
        name = str(getattr(path[-1], "key", path[-1]))
        dt = dtype or s.dtype
        if name in ("scale",):
            return np.ones(s.shape, dt)
        if name in ("bias",):
            return np.zeros(s.shape, dt)
        return rng.normal(0.0, 0.02, s.shape).astype(dt)

    host = jax.tree_util.tree_map_with_path(fill, shapes)
    return jax.tree_util.tree_map(jax.device_put, host)
