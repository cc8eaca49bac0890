import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animate_anything_tpu.models import UNet3DConditionModel, UNet3DConfig
from animate_anything_tpu.models.attention import (
    BasicTransformerBlock,
    CrossAttention,
    SpatialTransformer,
    TemporalTransformer,
)
from animate_anything_tpu.models.layers import (
    ResnetBlock2D,
    TemporalConvLayer,
    TimestepEmbedding,
    timestep_embedding,
)


def _init_and_apply(module, *args, **kw):
    params = module.init(jax.random.PRNGKey(0), *args, **kw)
    return params, module.apply(params, *args, **kw)


def test_timestep_embedding_flip():
    emb = timestep_embedding(jnp.array([0.0, 10.0]), 64)
    assert emb.shape == (2, 64)
    # t=0 → cos part all ones (flip_sin_to_cos puts cos first), sin part zeros
    np.testing.assert_allclose(np.asarray(emb[0, :32]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 32:]), 0.0, atol=1e-6)


def test_timestep_embedding_cond_proj():
    m = TimestepEmbedding(128, cond_proj_dim=32)
    t = jnp.ones((2, 32))
    c = jnp.ones((2, 32))
    params, out = _init_and_apply(m, t, c)
    assert out.shape == (2, 128)
    # cond_proj has no bias
    assert "bias" not in params["params"]["cond_proj"]


def test_resnet_block_shapes_and_shortcut():
    m = ResnetBlock2D(out_channels=16, groups=4)
    x = jnp.ones((2, 8, 8, 8))
    temb = jnp.ones((2, 32))
    params, out = _init_and_apply(m, x, temb)
    assert out.shape == (2, 8, 8, 16)
    assert "conv_shortcut" in params["params"]
    # same channels → no shortcut
    m2 = ResnetBlock2D(out_channels=8, groups=4)
    params2, out2 = _init_and_apply(m2, x, temb)
    assert "conv_shortcut" not in params2["params"]


def test_temporal_conv_identity_at_init():
    """Final conv zero-init ⇒ the layer is an identity at init (diffusers
    TemporalConvLayer semantics)."""
    m = TemporalConvLayer(out_channels=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 32))  # b=2, f=2
    params, out = _init_and_apply(m, x, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_cross_attention_shapes():
    m = CrossAttention(heads=4, head_dim=8, context_dim=16)
    x = jnp.ones((2, 10, 32))
    ctx = jnp.ones((2, 7, 16))
    _, out = _init_and_apply(m, x, ctx)
    assert out.shape == (2, 10, 32)


def test_basic_transformer_block_double_self_attention():
    m = BasicTransformerBlock(heads=2, head_dim=8, double_self_attention=True)
    x = jnp.ones((2, 5, 16))
    params, out = _init_and_apply(m, x)
    assert out.shape == x.shape
    # attn2 must have self-attention dims (to_k in = query dim)
    assert params["params"]["attn2"]["to_k"]["kernel"].shape == (16, 16)


def test_spatial_transformer_conv_vs_linear_proj():
    x = jnp.ones((2, 4, 4, 16))
    ctx = jnp.ones((2, 7, 8))
    # linear projections are the DEFAULT — the reference's block factory
    # defaults use_linear_projection=True and the UNet never overrides it
    # (ref unet_3d_blocks.py:136,192; verified via tests/test_torch_parity.py)
    m = SpatialTransformer(heads=2, head_dim=8, context_dim=8, groups=4)
    params, out = _init_and_apply(m, x, ctx)
    assert out.shape == x.shape
    assert params["params"]["proj_in"]["kernel"].ndim == 2  # linear
    m2 = SpatialTransformer(heads=2, head_dim=8, context_dim=8, groups=4, use_linear_projection=False)
    params2, out2 = _init_and_apply(m2, x, ctx)
    assert params2["params"]["proj_in"]["kernel"].ndim == 4  # conv 1x1


def test_temporal_transformer_mixes_frames_not_space():
    """Temporal attention mixes along the frame axis per spatial location;
    cross-location leakage only happens through the entrance GroupNorm's
    pooled statistics (same as torch GN over (c,f,h,w)) and must be orders of
    magnitude smaller than the direct path."""
    m = TemporalTransformer(heads=2, head_dim=8, groups=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1 * 4, 2, 2, 16))  # b=1, f=4
    params = m.init(jax.random.PRNGKey(1), x, 4)
    out1 = m.apply(params, x, 4)
    # perturb one spatial location of one frame
    x2 = x.at[0, 0, 0, :].add(100.0)
    out2 = m.apply(params, x2, 4)
    delta = np.asarray(jnp.abs(out2 - out1).sum(axis=(0, 3)))
    assert delta[0, 0] > 100  # direct path (incl. residual)
    assert delta[1, 1] < delta[0, 0] * 0.05  # only GN-stat leakage elsewhere


@pytest.fixture(scope="module")
def tiny_unet_io():
    cfg = UNet3DConfig.tiny(motion_mask=True, motion_strength=True)
    model = UNet3DConditionModel(cfg)
    sample = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 4))
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 16, 16, 4))
    mask = jnp.ones((1, 1, 16, 16, 1))
    text = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 32))
    args = (sample, jnp.array(10), text, cond, mask, jnp.array([5.0]))
    params = model.init(jax.random.PRNGKey(3), *args)
    return cfg, model, params, args


def test_unet3d_output_shape_strips_condition_frame(tiny_unet_io):
    _, model, params, args = tiny_unet_io
    out = model.apply(params, *args)
    assert out.shape == (1, 2, 16, 16, 4)  # f frames out, condition frame stripped


def test_unet3d_param_structure(tiny_unet_io):
    _, _, params, _ = tiny_unet_io
    p = params["params"]
    for key in (
        "conv_in2", "time_embedding", "transformer_in", "mid_block",
        "conv_norm_out", "conv_out",
    ):
        assert key in p, key
    assert "cond_proj" in p["time_embedding"]
    # 4 down, 4 up blocks
    assert all(f"down_blocks_{i}" in p for i in range(4))
    assert all(f"up_blocks_{i}" in p for i in range(4))
    # down block layer structure: 2 resnets + 2 attn + downsampler
    db0 = p["down_blocks_0"]
    assert "attentions_1" in db0 and "temp_attentions_1" in db0 and "downsamplers_0" in db0
    # up block has 3 layers
    assert "resnets_2" in p["up_blocks_1"]


def test_unet3d_no_mask_path_uses_conv_in():
    cfg = UNet3DConfig.tiny()  # motion_mask=False, motion_strength=False
    model = UNet3DConditionModel(cfg)
    sample = jnp.zeros((1, 2, 16, 16, 4))
    cond = jnp.zeros((1, 1, 16, 16, 4))
    text = jnp.zeros((1, 7, 32))
    params = model.init(jax.random.PRNGKey(0), sample, jnp.array(1), text, cond)
    assert "conv_in" in params["params"]
    assert "conv_in2" not in params["params"]
    assert "cond_proj" not in params["params"]["time_embedding"]
    out = model.apply(params, sample, jnp.array(1), text, cond)
    assert out.shape == (1, 2, 16, 16, 4)


@pytest.mark.slow
def test_unet3d_single_frame_skips_temporal():
    """num_frames==1 case: reference skips temporal modules entirely when the
    (condition-concatenated) sequence has 1 frame — here f=0 is impossible, so
    the closest parity case is a model run at nf=f+1=2 vs structure: temporal
    modules exist whenever nf>1. Verify a 1-frame *image* input still works."""
    cfg = UNet3DConfig.tiny()
    model = UNet3DConditionModel(cfg)
    sample = jnp.zeros((1, 1, 16, 16, 4))
    cond = jnp.zeros((1, 1, 16, 16, 4))
    text = jnp.zeros((1, 7, 32))
    params = model.init(jax.random.PRNGKey(0), sample, jnp.array(1), text, cond)
    out = model.apply(params, sample, jnp.array(1), text, cond)
    assert out.shape == (1, 1, 16, 16, 4)


@pytest.mark.slow
def test_unet3d_odd_resolution_roundtrip():
    """Non-multiple-of-8 spatial size must round-trip through down/up path
    (reference forward_upsample_size behavior)."""
    cfg = UNet3DConfig.tiny()
    model = UNet3DConditionModel(cfg)
    sample = jnp.zeros((1, 2, 24, 8, 4))
    cond = jnp.zeros((1, 1, 24, 8, 4))
    text = jnp.zeros((1, 7, 32))
    params = model.init(jax.random.PRNGKey(0), sample, jnp.array(1), text, cond)
    out = model.apply(params, sample, jnp.array(1), text, cond)
    assert out.shape == (1, 2, 24, 8, 4)


@pytest.mark.slow
def test_unet3d_remat_matches_no_remat(tiny_unet_io):
    import dataclasses

    cfg, model, params, args = tiny_unet_io
    cfg_r = dataclasses.replace(cfg, gradient_checkpointing=True)
    model_r = UNet3DConditionModel(cfg_r)
    out = model.apply(params, *args)
    out_r = model_r.apply(params, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)


def test_unet3d_motion_changes_output(tiny_unet_io):
    _, model, params, args = tiny_unet_io
    sample, t, text, cond, mask, motion = args
    out1 = model.apply(params, sample, t, text, cond, mask, jnp.array([5.0]))
    out2 = model.apply(params, sample, t, text, cond, mask, jnp.array([50.0]))
    assert float(jnp.abs(out1 - out2).max()) > 1e-6


@pytest.mark.slow
def test_unet3d_grad_flows(tiny_unet_io):
    _, model, params, args = tiny_unet_io

    def loss(p):
        return (model.apply(p, *args) ** 2).mean()

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0
