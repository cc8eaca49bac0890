"""SVD workload tests: unet shapes/structure, pipeline end-to-end, EDM trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# SVD pipeline/train compiles are multi-minute on this box; architecture
# parity coverage lives in the fast tests/test_torch_parity_svd.py
pytestmark = pytest.mark.slow

from animate_anything_tpu.models.clip_vision import (
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
    preprocess_clip_image,
)
from animate_anything_tpu.models.svd_unet import SVDUNetConfig, UNetSpatioTemporalConditionModel
from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig
from animate_anything_tpu.pipelines.svd import (
    MaskStableVideoDiffusionPipeline,
    TextStableVideoDiffusionPipeline,
)
from animate_anything_tpu.train import create_train_state
from animate_anything_tpu.train.svd_trainer import SVDTrainConfig, make_svd_train_step


@pytest.fixture(scope="module")
def svd_setup():
    cfg = SVDUNetConfig.tiny(in_channels=9)
    unet = UNetSpatioTemporalConditionModel(cfg)
    sample = jnp.zeros((1, 4, 8, 8, 9))
    emb = jnp.zeros((1, 1, 32))
    ids = jnp.zeros((1, 3))
    params = unet.init(jax.random.PRNGKey(0), sample, jnp.array(0.5), emb, ids)
    vae = AutoencoderKL(VAEConfig.tiny())
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    icfg = CLIPVisionConfig.tiny()
    ienc = CLIPVisionModelWithProjection(icfg)
    iparams = ienc.init(jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)))
    return unet, params, vae, vparams, ienc, iparams


def test_svd_unet_shapes_and_structure(svd_setup):
    unet, params, *_ = svd_setup
    p = params["params"]
    assert "conv_in" in p and p["conv_in"]["kernel"].shape[2] == 9
    assert "add_embedding" in p
    db0 = p["down_blocks_0_resnets_0"]
    assert "spatial_res_block" in db0 and "temporal_res_block" in db0 and "time_mixer" in db0
    attn = p["down_blocks_0_attentions_0"]
    assert "transformer_blocks_0" in attn and "temporal_transformer_blocks_0" in attn
    assert "ff_in" in attn["temporal_transformer_blocks_0"]
    out = unet.apply(params, jnp.zeros((1, 4, 8, 8, 9)), jnp.array(0.5),
                     jnp.zeros((1, 1, 32)), jnp.zeros((1, 3)))
    assert out.shape == (1, 4, 8, 8, 4)


def test_svd_unet_continuous_timestep_and_microcond(svd_setup):
    unet, params, *_ = svd_setup
    args = (jnp.ones((1, 2, 8, 8, 9)), jnp.zeros((1, 1, 32)))
    o1 = unet.apply(params, args[0], jnp.array(0.1), args[1], jnp.zeros((1, 3)))
    o2 = unet.apply(params, args[0], jnp.array(2.0), args[1], jnp.zeros((1, 3)))
    o3 = unet.apply(params, args[0], jnp.array(0.1), args[1], jnp.asarray([[6.0, 127.0, 0.02]]))
    assert float(jnp.abs(o1 - o2).max()) > 1e-6  # timestep matters
    assert float(jnp.abs(o1 - o3).max()) > 1e-6  # micro-conditioning matters


def test_clip_vision_embedding(svd_setup):
    *_, ienc, iparams = svd_setup
    img = (np.random.default_rng(0).random((48, 64, 3)) * 255).astype(np.uint8)
    px = preprocess_clip_image(img, size=32)
    assert px.shape == (1, 32, 32, 3)
    emb = ienc.apply(iparams, jnp.asarray(px))
    assert emb.shape == (1, 32)


@pytest.mark.slow
def test_mask_svd_pipeline_end_to_end(svd_setup):
    unet, params, vae, vparams, ienc, iparams = svd_setup
    pipe = MaskStableVideoDiffusionPipeline(
        unet, params, vae, vparams, image_encoder=ienc, image_encoder_params=iparams
    )
    img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    mask = jnp.ones((1, 1, 8, 8, 1))
    video, lat = pipe(
        img, mask=mask, num_frames=4, num_inference_steps=3,
        decode_chunk_size=2, rng=jax.random.PRNGKey(0),
    )
    assert video.shape == (1, 4, 64, 64, 3)
    assert lat.shape == (1, 4, 8, 8, 4)
    assert np.isfinite(np.asarray(video)).all()


@pytest.mark.slow
def test_text_svd_v2v_pipeline(svd_setup):
    unet, params, vae, vparams, ienc, iparams = svd_setup
    pipe = TextStableVideoDiffusionPipeline(
        unet, params, vae, vparams, image_encoder=ienc, image_encoder_params=iparams
    )
    vid = (np.random.default_rng(0).random((4, 64, 64, 3)) * 255).astype(np.uint8)
    cond = pipe.video_to_condition_latent(vid)
    assert cond.shape == (1, 4, 8, 8, 4)
    img = vid[0]
    video, lat = pipe(
        img, condition_latent=cond, mask=jnp.ones((1, 1, 8, 8, 1)),
        num_frames=4, num_inference_steps=2, rng=jax.random.PRNGKey(1),
    )
    assert video.shape == (1, 4, 64, 64, 3)


@pytest.mark.slow
def test_svd_train_step(svd_setup):
    unet, params, vae, vparams, ienc, iparams = svd_setup
    tconf = SVDTrainConfig(motion_mask=True, learning_rate=1e-4)
    step = jax.jit(make_svd_train_step(
        unet, tconf, vae=vae, vae_params=vparams,
        image_encoder=ienc, image_encoder_params=iparams,
    ))
    state = create_train_state(params, tconf)
    batch = {
        "pixel_values": jax.random.uniform(jax.random.PRNGKey(0), (1, 4, 64, 64, 3),
                                           minval=-1, maxval=1),
        "mask": jnp.full((1, 64, 64), 255.0),
        "clip_pixel_values": jnp.zeros((1, 32, 32, 3)),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert "mask_consistency_loss" in metrics
    assert int(new_state.step) == 1


def test_svd_temporal_block_impl_parity(exact_gelu):
    """xla (einsum) and pallas (fused/packed reference on CPU) paths of the
    transpose-free temporal block share a param tree and agree."""
    import jax
    import jax.numpy as jnp

    from animate_anything_tpu.models.svd_unet import TemporalBasicTransformerBlock

    b, f, s, c = 2, 5, 12, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (b, f, s, c))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, 3, 32))
    m_x = TemporalBasicTransformerBlock(2, 64, context_dim=32, attn_impl="xla", dtype=jnp.float32)
    m_p = TemporalBasicTransformerBlock(2, 64, context_dim=32, attn_impl="pallas", dtype=jnp.float32)
    p_x = m_x.init(jax.random.PRNGKey(2), x, ctx)
    p_p = m_p.init(jax.random.PRNGKey(2), x, ctx)
    assert jax.tree_util.tree_structure(p_x) == jax.tree_util.tree_structure(p_p)
    a = m_x.apply(p_x, x, ctx)
    bb = m_p.apply(p_p, x, ctx)
    np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=5e-5)


@pytest.mark.slow
def test_svd_pab_rate1_exact_and_fast_runs(svd_setup):
    """PAB on the spatio-temporal UNet: rate=1 through the cache machinery is
    bit-exact vs the plain path; real rates run and deviate."""
    unet, params, vae, vparams, ienc, iparams = svd_setup
    common = dict(image_encoder=ienc, image_encoder_params=iparams)
    base = MaskStableVideoDiffusionPipeline(unet, params, vae, vparams, **common)
    exact = MaskStableVideoDiffusionPipeline(unet, params, vae, vparams,
                                             pab={"rate": 1}, **common)
    fast = MaskStableVideoDiffusionPipeline(
        unet, params, vae, vparams, pab={"rate": 2, "warmup": 1, "tail": 1},
        **common)

    b, f, hw = 1, 4, 8
    latents = jnp.zeros((b, f, hw, hw, 4))
    cond2 = jnp.zeros((2 * b, f, hw, hw, 4))
    mask2 = jnp.ones((2 * b, f, hw, hw, 1))
    emb2 = jnp.zeros((2 * b, 1, 32))
    ids2 = jnp.zeros((2 * b, 3))
    g = jnp.ones((b, f, 1, 1, 1))
    rng = jax.random.PRNGKey(0)

    o_base = base._denoise_jit(params, latents, cond2, mask2, emb2, ids2, g, rng, 5)
    o_exact = exact._denoise_jit(params, latents, cond2, mask2, emb2, ids2, g, rng, 5)
    o_fast = fast._denoise_jit(params, latents, cond2, mask2, emb2, ids2, g, rng, 5)
    assert jnp.array_equal(o_base, o_exact)
    assert bool(jnp.isfinite(o_fast).all())
    assert float(jnp.abs(o_fast - o_base).max()) > 0
