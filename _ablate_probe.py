import time, jax, jax.numpy as jnp, numpy as np
import animate_anything_tpu.models.unet3d_blocks as B
import animate_anything_tpu.models.unet3d as U
from animate_anything_tpu.utils.fast_init import init_params_host

frames, hw, b = 16, 64, 2
lat = jnp.zeros((b, frames, hw, hw, 4), jnp.bfloat16)
cond = jnp.zeros((b, 1, hw, hw, 4), jnp.bfloat16)
mask = jnp.ones((b, 1, hw, hw, 1), jnp.bfloat16)
emb = jnp.zeros((b, 77, 1024), jnp.bfloat16)
mot = jnp.full((b,), 5.0, jnp.float32)

orig = dict(TT_b=B.TemporalTransformer, TC=B.TemporalConvLayer, ST=B.SpatialTransformer, TT_u=U.TemporalTransformer)

def identity_factory(*a, **k):
    return lambda x, *aa, **kk: x

def measure(label):
    cfg = U.UNet3DConfig(motion_mask=True, motion_strength=True, attn_impl="pallas")
    unet = U.UNet3DConditionModel(cfg, dtype=jnp.bfloat16)
    params = init_params_host(unet, 0, lat[:1,:2], jnp.asarray(500), emb[:1], cond[:1], mask[:1], mot[:1], dtype=np.dtype("bfloat16"))
    fwd = jax.jit(lambda p, x: unet.apply(p, x, jnp.asarray(500), emb, cond, mask, mot).astype(jnp.float32).sum())
    float(fwd(params, lat))
    ts = []
    for i in range(3):
        t0=time.time(); float(fwd(params, lat+0.01*i)); ts.append(time.time()-t0)
    print(f"{label}: {min(ts)*1000:.0f} ms", flush=True)

measure("full")
B.TemporalTransformer = identity_factory; U.TemporalTransformer = identity_factory
measure("no temporal attention")
B.TemporalConvLayer = identity_factory
measure("no temporal attention+convs")
B.TemporalTransformer = orig["TT_b"]; U.TemporalTransformer = orig["TT_u"]; B.TemporalConvLayer = orig["TC"]
B.SpatialTransformer = identity_factory
measure("no spatial transformers")
