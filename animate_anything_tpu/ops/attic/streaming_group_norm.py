"""DORMANT streaming GroupNorm+SiLU kernel — measured negative result.

One-pass GN (stats + normalize + SiLU with double-buffered HBM streaming):
loses to the composite XLA path at every production shape (6.7 vs 10.6 ms at
the VAE-decoder size was the one standalone win; in-model it un-fuses the
producers' epilogues). Kept opt-in via group_norm_silu(impl='pallas');
interpret tests in tests/test_attic_ops.py; measurements in docs/KERNELS.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from animate_anything_tpu.ops.group_norm import _onehot

def _gn_stream_kernel(x_hbm, scale_ref, bias_ref, onehot_ref, o_hbm,
                      xbuf, ybuf, sem_in, sem_out, *, eps: float, silu: bool,
                      group_size: int, chunks: int, ch: int):
    """Streaming GN+SiLU for one (S, C) sample: pass 1 accumulates per-group
    Σx/Σx² over DMA'd chunks, pass 2 normalizes each chunk and DMAs it out.
    Double-buffered in both directions; VMEM = 2 chunks each way."""
    onehot = onehot_ref[...]
    g = onehot.shape[1]
    n = float(chunks * ch * group_size)

    pid = pl.program_id(0)

    def in_dma(slot, i):
        return pltpu.make_async_copy(
            x_hbm.at[pid, pl.ds(i * ch, ch), :], xbuf.at[slot], sem_in.at[slot]
        )

    def out_dma(slot, i):
        return pltpu.make_async_copy(
            ybuf.at[slot], o_hbm.at[pid, pl.ds(i * ch, ch), :], sem_out.at[slot]
        )

    # ---- pass 1: statistics
    in_dma(0, 0).start()

    def stat_body(i, acc):
        slot = i % 2

        @pl.when(i + 1 < chunks)
        def _():
            in_dma((i + 1) % 2, i + 1).start()

        in_dma(slot, i).wait()
        xb = xbuf[slot].astype(jnp.float32)
        s1 = jax.lax.dot_general(
            xb, onehot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        s2 = jax.lax.dot_general(
            xb * xb, onehot, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc[0] + jnp.sum(s1, axis=0), acc[1] + jnp.sum(s2, axis=0)

    sums, sqs = jax.lax.fori_loop(
        0, chunks, stat_body, (jnp.zeros((g,), jnp.float32), jnp.zeros((g,), jnp.float32))
    )
    mean = sums / n
    inv = jax.lax.rsqrt(jnp.maximum(sqs / n - mean * mean, 0.0) + eps)
    # fold everything into per-channel affine: y = x·a + b
    mean_c = jnp.dot(onehot, mean, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(onehot, inv, preferred_element_type=jnp.float32)
    a = inv_c * scale_ref[...].astype(jnp.float32)
    b = bias_ref[...].astype(jnp.float32) - mean_c * a

    # ---- pass 2: normalize + activate + write
    in_dma(0, 0).start()

    def norm_body(i, _):
        slot = i % 2

        @pl.when(i + 1 < chunks)
        def _():
            in_dma((i + 1) % 2, i + 1).start()

        in_dma(slot, i).wait()

        @pl.when(i >= 2)
        def _():
            out_dma(slot, i - 2).wait()

        xb = xbuf[slot].astype(jnp.float32)
        y = xb * a[None, :] + b[None, :]
        if silu:
            y = y * jax.nn.sigmoid(y)
        ybuf[slot] = y.astype(ybuf.dtype)
        out_dma(slot, i).start()
        return 0

    jax.lax.fori_loop(0, chunks, norm_body, 0)
    out_dma((chunks - 1) % 2, chunks - 1).wait()

    @pl.when(chunks >= 2)
    def _():
        out_dma(chunks % 2, chunks - 2).wait()


def _pallas_group_norm(x2, scale, bias, groups, eps, silu, ch):
    n, s, c = x2.shape
    onehot = _onehot(c, groups)
    chunks = s // ch
    return pl.pallas_call(
        functools.partial(
            _gn_stream_kernel, eps=eps, silu=silu,
            group_size=c // groups, chunks=chunks, ch=ch,
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # full (n, s, c), sliced by pid
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x2.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, ch, c), x2.dtype),
            pltpu.VMEM((2, ch, c), x2.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(x2, scale, bias, onehot)
