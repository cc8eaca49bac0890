"""Torch-oracle forward parity for the SD VAE and the transparent
(LayerDiffuse) VAE pair (VERDICT r3 next #3).

- ``AutoencoderKL``: mini_diffusers now carries a faithful torch port of
  diffusers==0.24's VAE (DownEncoderBlock2D / UpDecoderBlock2D /
  UNetMidBlock2D with the deprecated-attn-block Attention); weights travel
  through utils/import_torch.py::convert_vae and both the ENCODER MOMENTS
  and the DECODED PIXELS must match our flax VAE.
- Transparent pair: the reference's OWN torch code
  (/root/reference/models/layerdiffuse_VAE.py — LatentTransparencyOffsetEncoder
  + UNet384) runs against mini_diffusers' 2D blocks; weights import through
  the new convert_offset_encoder / convert_unet384 and full forwards must
  match models/transparent_vae.py. This is reference-code-driven, like the
  3D-UNet tests.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import mini_diffusers  # noqa: E402

mini_diffusers.install()
sys.path.insert(0, "/root/reference")
try:
    from models.layerdiffuse_VAE import (  # noqa: E402
        UNet384 as RefUNet384,
        LatentTransparencyOffsetEncoder as RefOffsetEncoder,
    )
finally:
    sys.path.remove("/root/reference")

from animate_anything_tpu.models import transparent_vae as fx_tv  # noqa: E402
from animate_anything_tpu.models.vae import (  # noqa: E402
    AutoencoderKL,
    VAEConfig,
)
from animate_anything_tpu.utils.import_torch import (  # noqa: E402
    align_to_params,
    convert_offset_encoder,
    convert_unet384,
    convert_vae,
)

ATOL = 5e-5
RTOL = 2e-4


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.uniform_(-0.3, 0.3, generator=g)
    return module.eval()


def _close(torch_out, flax_out, atol=ATOL):
    np.testing.assert_allclose(
        np.asarray(torch_out.detach()), np.asarray(flax_out),
        atol=atol, rtol=RTOL)


def test_vae_encode_decode_parity():
    """Tiny AutoencoderKL: moments AND pixels pinned against the 0.24 port
    — covers asymmetric downsample padding, mid-block single-head attention
    (group_norm'd, residual, bias=True), nearest-2× upsampling, and the
    quant/post_quant 1×1 convs."""
    tm = _randomize(mini_diffusers.AutoencoderKL(
        block_out_channels=(16, 32, 32, 32), layers_per_block=2,
        latent_channels=4, norm_num_groups=4), seed=0)
    fm = AutoencoderKL(VAEConfig.tiny())

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 32, 32), np.float32)
    z = rng.standard_normal((2, 4, 4, 4), np.float32)

    x_nhwc = jnp.moveaxis(jnp.asarray(x), 1, -1)
    fparams = fm.init(jax.random.PRNGKey(0), x_nhwc)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    fparams, missing, unexpected = align_to_params(
        convert_vae(sd), fparams, strict=True)

    with torch.no_grad():
        t_moments = tm.encode_moments(torch.from_numpy(x))
        t_pixels = tm.decode(torch.from_numpy(z))
    f_mean, f_logvar = fm.apply(fparams, x_nhwc, method=fm.encode_moments)
    f_pixels = fm.apply(fparams, jnp.moveaxis(jnp.asarray(z), 1, -1),
                        method=fm.decode)
    _close(t_moments[:, :4], jnp.moveaxis(f_mean, -1, 1))
    _close(t_moments[:, 4:], jnp.moveaxis(f_logvar, -1, 1))
    _close(t_pixels, jnp.moveaxis(f_pixels, -1, 1))


def test_offset_encoder_parity():
    tm = _randomize(RefOffsetEncoder(), seed=1)
    # zero-init tail must actually exercise the import: randomized above
    fm = fx_tv.LatentTransparencyOffsetEncoder()
    rng = np.random.default_rng(1)
    rgba = rng.standard_normal((2, 4, 32, 32), np.float32)

    x_nhwc = jnp.moveaxis(jnp.asarray(rgba), 1, -1)
    fparams = fm.init(jax.random.PRNGKey(0), x_nhwc)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    fparams, missing, unexpected = align_to_params(
        convert_offset_encoder(sd), fparams, strict=True)

    with torch.no_grad():
        t_out = tm(torch.from_numpy(rgba))
    f_out = fm.apply(fparams, x_nhwc)
    _close(t_out, jnp.moveaxis(f_out, -1, 1))


@pytest.mark.slow  # full-forward/compile-heavy; fast tier keeps the smaller variants
def test_unet384_parity():
    """Reference-code-driven: the reference's own UNet384 (default config —
    32/64/128/256, GroupNorm(4), 32-head dim-8 attention at the deepest
    level, zero-init latent injection before down block 3) vs our flax
    UNet384 at 64px."""
    tm = _randomize(RefUNet384(), seed=2)
    fm = fx_tv.UNet384()

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 64, 64), np.float32)
    latent = rng.standard_normal((2, 4, 8, 8), np.float32)

    x_nhwc = jnp.moveaxis(jnp.asarray(x), 1, -1)
    lat_nhwc = jnp.moveaxis(jnp.asarray(latent), 1, -1)
    fparams = fm.init(jax.random.PRNGKey(0), x_nhwc, lat_nhwc)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    fparams, missing, unexpected = align_to_params(
        convert_unet384(sd), fparams, strict=True)

    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), torch.from_numpy(latent))
    f_out = fm.apply(fparams, x_nhwc, lat_nhwc)
    _close(t_out, jnp.moveaxis(f_out, -1, 1))
