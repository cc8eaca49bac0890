"""Transparent RGBA workload tests: LayerDiffuse VAE pair + stage-2 eval."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from animate_anything_tpu.models.transparent_vae import (
    LatentTransparencyOffsetEncoder,
    UNet384,
    UNet384Config,
    build_rgba_latents,
    decode_rgba_video,
)
from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig


@pytest.fixture(scope="module")
def tvae():
    enc = LatentTransparencyOffsetEncoder()
    enc_params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)))
    cfg = UNet384Config(block_out_channels=(8, 16, 16, 16), attention_head_dim=4,
                        norm_num_groups=2)
    dec = UNet384(cfg)
    dec_params = dec.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                          jnp.zeros((1, 4, 4, 4)))
    return enc, enc_params, dec, dec_params


def test_offset_encoder_zero_at_init(tvae):
    """Zero-init final conv ⇒ the offset is exactly zero at init (LayerDiffuse
    zero_module semantics, layerdiffuse_VAE.py:11,38)."""
    enc, enc_params, *_ = tvae
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 4))
    out = enc.apply(enc_params, x)
    assert out.shape == (2, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_unet384_shapes_and_latent_injection(tvae):
    *_, dec, dec_params = tvae
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 4))
    out = dec.apply(dec_params, x, lat)
    assert out.shape == (2, 32, 32, 4)
    # latent_conv_in is zero-init → latent has no effect at init
    out2 = dec.apply(dec_params, x, lat * 100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_build_rgba_latents(tvae):
    enc, enc_params, *_ = tvae
    vae = AutoencoderKL(VAEConfig.tiny())
    vparams = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    rgba = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 32, 32, 4), minval=-1, maxval=1)
    lat = build_rgba_latents(vae, vparams, rgba, enc, enc_params)
    assert lat.shape == (1, 2, 4, 4, 4)
    # offset encoder zero at init → equals plain premultiplied-RGB encode
    from animate_anything_tpu.models.vae import encode_video

    premul = rgba[..., :3] * (rgba[..., 3:] + 1) / 2
    np.testing.assert_allclose(
        np.asarray(lat), np.asarray(encode_video(vae, vparams, premul)), atol=1e-5
    )


def test_decode_rgba_video_binarized_alpha(tvae):
    *_, dec, dec_params = tvae
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 32, 32, 3), minval=-1, maxval=1)
    lat = jnp.zeros((1, 2, 4, 4, 4))
    rgba = decode_rgba_video(dec, dec_params, rgb, lat)
    assert rgba.shape == (1, 2, 32, 32, 4)
    alpha = np.asarray(rgba[..., 3])
    assert set(np.unique(alpha)).issubset({0.0, 255.0})
    assert np.asarray(rgba[..., :3]).min() >= 0 and np.asarray(rgba[..., :3]).max() <= 255


@pytest.mark.slow
def test_stage2_eval_end_to_end(tmp_path):
    from animate_anything_tpu import cli_stage2

    rgba = (np.random.default_rng(0).random((64, 64, 4)) * 255).astype(np.uint8)
    img = tmp_path / "in.png"
    Image.fromarray(rgba, "RGBA").save(img)
    out = cli_stage2.main_eval(
        output_dir=str(tmp_path / "out"),
        model_size="tiny",
        mixed_precision="no",
        in_channels=5,
        motion_strength=True,
        validation_data=dict(
            prompt="x", prompt_image=str(img), height=32, width=32,
            num_frames=2, num_inference_steps=2,
        ),
    )
    import os

    assert os.path.exists(out["rgba"]) and os.path.exists(out["alpha"])
    assert np.isfinite(out["latent_motion_score"])
    # RGBA webp reloads with alpha intact
    back = Image.open(out["rgba"])
    assert back.mode in ("RGBA", "P")
