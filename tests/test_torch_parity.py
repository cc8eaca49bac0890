"""Torch-oracle forward-parity tests for the core UNet path.

The strongest available proxy for real-checkpoint fidelity in this zero-egress
image (VERDICT r1, Missing #3): run the reference's OWN torch modules
(/root/reference/models/unet_3d_blocks.py, unet_3d_condition_mask.py) on torch
CPU — with tests/mini_diffusers.py standing in for the absent diffusers
package — export their state dicts through utils/import_torch.py, and assert
our flax forward matches to float32 tolerance. This exercises BOTH the
diffusers key grammar the importer assumes and the math of every sub-layer
(ResnetBlock2D / TemporalConvLayer / spatial & temporal transformers / full
tiny UNet3D with frame-concat + mask + motion conditioning).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import mini_diffusers  # noqa: E402  (tests/ dir is on sys.path under pytest)

mini_diffusers.install()
sys.path.insert(0, "/root/reference")
try:
    from models import unet_3d_blocks as ref_blocks  # noqa: E402
    from models.unet_3d_condition_mask import (  # noqa: E402
        UNet3DConditionModel as RefUNet3D,
    )
finally:
    sys.path.remove("/root/reference")

from animate_anything_tpu.models import attention as fx_attn  # noqa: E402
from animate_anything_tpu.models import layers as fx_layers  # noqa: E402
from animate_anything_tpu.models.unet3d import (  # noqa: E402
    UNet3DConditionModel,
    UNet3DConfig,
)
from animate_anything_tpu.utils.import_torch import (  # noqa: E402
    align_to_params,
    convert_unet3d,
)

ATOL = 5e-5
RTOL = 2e-4


def _randomize(module: torch.nn.Module, seed: int = 0) -> torch.nn.Module:
    """Fill every param with seeded noise so zero-init layers (temporal conv4)
    and default-1.0 norm scales actually exercise the import."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.uniform_(-0.4, 0.4, generator=g)
    return module.eval()


def _import(tmodule: torch.nn.Module, fparams, strict=True, prefix=False):
    """prefix=True: standalone sub-modules sit at the state-dict root, where
    the importer's dotted regexes (e.g. ``.conv1.0.``) wouldn't anchor — wrap
    them under a dummy parent the way they appear inside the full UNet."""
    sd = {k: v.detach().numpy() for k, v in tmodule.state_dict().items()}
    if prefix:
        sd = {f"down_blocks.0.{k}": v for k, v in sd.items()}
    imported = convert_unet3d(sd)
    if prefix:
        imported = imported["down_blocks_0"]
    new, missing, unexpected = align_to_params(imported, fparams, strict=strict)
    return new, missing, unexpected


def _close(torch_out, flax_out):
    np.testing.assert_allclose(
        np.asarray(torch_out.detach()), np.asarray(flax_out), atol=ATOL, rtol=RTOL
    )


def test_resnet_block_parity():
    tm = _randomize(mini_diffusers.ResnetBlock2D(
        in_channels=32, out_channels=64, temb_channels=128, groups=8, eps=1e-5,
        non_linearity="silu"))
    fm = fx_layers.ResnetBlock2D(out_channels=64, eps=1e-5, groups=8)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 32, 8, 8), np.float32)  # (bf, c, h, w)
    temb = rng.standard_normal((4, 128), np.float32)

    fparams = fm.init(jax.random.PRNGKey(0), jnp.moveaxis(jnp.asarray(x), 1, -1),
                      jnp.asarray(temb))
    fparams, _, _ = _import(tm, fparams, strict=True, prefix=True)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), torch.from_numpy(temb))
    f_out = fm.apply(fparams, jnp.moveaxis(jnp.asarray(x), 1, -1), jnp.asarray(temb))
    _close(t_out, jnp.moveaxis(f_out, -1, 1))


def test_temporal_conv_layer_parity():
    tm = _randomize(mini_diffusers.TemporalConvLayer(32, 64, dropout=0.1))
    fm = fx_layers.TemporalConvLayer(out_channels=64)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 32, 8, 8), np.float32)  # (b*f, c, h, w), f=4

    x_nhwc = jnp.moveaxis(jnp.asarray(x), 1, -1)
    fparams = fm.init(jax.random.PRNGKey(0), x_nhwc, 4, True)
    fparams, _, _ = _import(tm, fparams, strict=True, prefix=True)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), num_frames=4)
    f_out = fm.apply(fparams, x_nhwc, 4, True)
    _close(t_out, jnp.moveaxis(f_out, -1, 1))


@pytest.mark.parametrize("linear_proj", [False, True])
def test_spatial_transformer_parity(linear_proj):
    heads, head_dim, c, cross = 2, 8, 32, 48
    tm = _randomize(mini_diffusers.Transformer2DModel(
        heads, head_dim, in_channels=c, num_layers=1, cross_attention_dim=cross,
        norm_num_groups=8, use_linear_projection=linear_proj), seed=2)
    fm = fx_attn.SpatialTransformer(heads, head_dim, cross,
                                    use_linear_projection=linear_proj, groups=8)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, c, 8, 8), np.float32)
    ctx = rng.standard_normal((2, 7, cross), np.float32)

    x_nhwc = jnp.moveaxis(jnp.asarray(x), 1, -1)
    fparams = fm.init(jax.random.PRNGKey(0), x_nhwc, jnp.asarray(ctx))
    fparams, _, _ = _import(tm, fparams, strict=True, prefix=True)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), encoder_hidden_states=torch.from_numpy(ctx)).sample
    f_out = fm.apply(fparams, x_nhwc, jnp.asarray(ctx))
    _close(t_out, jnp.moveaxis(f_out, -1, 1))


def test_temporal_transformer_parity():
    heads, head_dim, c = 2, 8, 32  # inner 16 != c exercises proj_in/out
    tm = _randomize(mini_diffusers.TransformerTemporalModel(
        heads, head_dim, in_channels=c, num_layers=1, norm_num_groups=8), seed=3)
    fm = fx_attn.TemporalTransformer(heads, head_dim, groups=8)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((8, c, 4, 4), np.float32)  # f=4, b=2

    x_nhwc = jnp.moveaxis(jnp.asarray(x), 1, -1)
    fparams = fm.init(jax.random.PRNGKey(0), x_nhwc, 4)
    fparams, _, _ = _import(tm, fparams, strict=True, prefix=True)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), num_frames=4).sample
    f_out = fm.apply(fparams, x_nhwc, 4)
    _close(t_out, jnp.moveaxis(f_out, -1, 1))


def _tiny_ref_unet(**kw):
    return RefUNet3D(
        block_out_channels=(32, 64, 64, 64),
        layers_per_block=2,
        norm_num_groups=8,
        norm_eps=1e-5,
        cross_attention_dim=32,
        attention_head_dim=8,
        **kw,
    )


def test_full_unet3d_parity_mask_motion():
    """Reference-code-driven full forward: frame-axis condition concat, 5-ch
    mask conv_in2, motion-strength time conditioning, frame-0 strip."""
    tm = _randomize(_tiny_ref_unet(motion_mask=True, motion_strength=True), seed=4)
    cfg = UNet3DConfig.tiny(motion_mask=True, motion_strength=True)
    fm = UNet3DConditionModel(cfg)

    rng = np.random.default_rng(4)
    b, f, hw = 1, 2, 16
    sample = rng.standard_normal((b, 4, f, hw, hw), np.float32)
    cond = rng.standard_normal((b, 4, 1, hw, hw), np.float32)
    mask = (rng.random((b, 1, 1, hw, hw)) > 0.5).astype(np.float32)
    ehs = rng.standard_normal((b, 7, 32), np.float32)
    motion = np.asarray([5.0], np.float32)

    f_sample = jnp.moveaxis(jnp.asarray(sample), 1, -1)   # (b, f, h, w, c)
    f_cond = jnp.moveaxis(jnp.asarray(cond), 1, -1)
    f_mask = jnp.moveaxis(jnp.asarray(mask), 1, -1)       # (b, 1, h, w, 1)
    fparams = fm.init(jax.random.PRNGKey(0), f_sample, jnp.asarray(500),
                      jnp.asarray(ehs), f_cond, f_mask, jnp.asarray(motion))
    fparams, missing, unexpected = _import(tm, fparams, strict=False)
    assert not missing, f"importer missed model params: {missing[:8]}"
    # torch defines conv_in (unused on the masked path); everything else maps
    assert set(unexpected) <= {"conv_in.kernel", "conv_in.bias"}, unexpected[:8]

    with torch.no_grad():
        t_out = tm(
            torch.from_numpy(sample), torch.tensor(500), torch.from_numpy(ehs),
            condition_latent=torch.from_numpy(cond), mask=torch.from_numpy(mask),
            motion=torch.from_numpy(motion),
        ).sample
    f_out = fm.apply(fparams, f_sample, jnp.asarray(500), jnp.asarray(ehs),
                     f_cond, f_mask, jnp.asarray(motion))
    # torch layout (b, c, f, h, w) ← flax (b, f, h, w, c)
    _close(t_out, jnp.moveaxis(f_out, -1, 1))


def test_full_unet3d_parity_plain():
    """No mask / no motion: conv_in path + plain time embedding."""
    tm = _randomize(_tiny_ref_unet(motion_mask=False, motion_strength=False), seed=5)
    cfg = UNet3DConfig.tiny(motion_mask=False, motion_strength=False)
    fm = UNet3DConditionModel(cfg)

    rng = np.random.default_rng(5)
    b, f, hw = 1, 2, 16
    sample = rng.standard_normal((b, 4, f, hw, hw), np.float32)
    cond = rng.standard_normal((b, 4, 1, hw, hw), np.float32)
    ehs = rng.standard_normal((b, 7, 32), np.float32)

    f_sample = jnp.moveaxis(jnp.asarray(sample), 1, -1)
    f_cond = jnp.moveaxis(jnp.asarray(cond), 1, -1)
    fparams = fm.init(jax.random.PRNGKey(0), f_sample, jnp.asarray(123),
                      jnp.asarray(ehs), f_cond)
    fparams, missing, unexpected = _import(tm, fparams, strict=False)
    assert not missing, f"importer missed model params: {missing[:8]}"
    assert set(unexpected) <= {"conv_in2.kernel", "conv_in2.bias",
                               "time_embedding.cond_proj.kernel"}, unexpected[:8]

    with torch.no_grad():
        t_out = tm(
            torch.from_numpy(sample), torch.tensor(123), torch.from_numpy(ehs),
            condition_latent=torch.from_numpy(cond), mask=None,
        ).sample
    f_out = fm.apply(fparams, f_sample, jnp.asarray(123), jnp.asarray(ehs), f_cond)
    _close(t_out, jnp.moveaxis(f_out, -1, 1))
