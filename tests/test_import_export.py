"""VAE / CLIP model tests + torch-interop round-trip tests.

The round-trip (flax params → diffusers-named torch state dict → import →
strict align) proves the naming/layout maps are mutually consistent and cover
every parameter; loading a real reference checkpoint exercises the same path.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animate_anything_tpu.models import UNet3DConditionModel, UNet3DConfig
from animate_anything_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from animate_anything_tpu.models.vae import (
    AutoencoderKL,
    VAEConfig,
    decode_video,
    encode_video,
)
from animate_anything_tpu.utils.import_torch import (
    align_to_params,
    convert_clip_text,
    convert_unet3d,
    convert_vae,
    expand_conv_in_channels,
    export_clip_text,
    export_unet3d,
    export_vae,
)


@pytest.fixture(scope="module")
def tiny_vae():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), x)
    return cfg, vae, params


def test_vae_shapes(tiny_vae):
    cfg, vae, params = tiny_vae
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    z = vae.apply(params, x, method=AutoencoderKL.encode)
    assert z.shape == (2, 4, 4, 4)
    y = vae.apply(params, z, True, method=AutoencoderKL.decode)
    assert y.shape == (2, 32, 32, 3)


def test_vae_video_roundtrip_shapes(tiny_vae):
    cfg, vae, params = tiny_vae
    vid = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 32, 32, 3))
    z = encode_video(vae, params, vid)
    assert z.shape == (1, 4, 4, 4, 4)
    out = decode_video(vae, params, z)
    assert out.shape == (1, 4, 32, 32, 3)
    out_chunked = decode_video(vae, params, z, chunk_size=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_chunked), atol=1e-5)


def test_vae_posterior_sampling(tiny_vae):
    _, vae, params = tiny_vae
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    z_mode = vae.apply(params, x, method=AutoencoderKL.encode)
    z_samp = vae.apply(params, x, jax.random.PRNGKey(7), method=AutoencoderKL.encode)
    assert float(jnp.abs(z_mode - z_samp).max()) > 0


def test_clip_text_shapes():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids = jnp.array([[1, 2, 3, 4, 0, 0, 0, 0]])
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (1, 8, 32)


def test_clip_text_causal():
    """Changing a later token must not affect earlier positions."""
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids1 = jnp.array([[1, 2, 3, 4]])
    ids2 = jnp.array([[1, 2, 3, 9]])
    params = model.init(jax.random.PRNGKey(0), ids1)
    o1 = model.apply(params, ids1)
    o2 = model.apply(params, ids2)
    np.testing.assert_allclose(np.asarray(o1[0, :3]), np.asarray(o2[0, :3]), atol=1e-5)
    assert float(jnp.abs(o1[0, 3] - o2[0, 3]).max()) > 1e-4


def _roundtrip(params, export_fn, convert_fn):
    sd = export_fn(params)
    # all torch-side names must use diffusers list syntax, not flax underscores
    for k in sd:
        assert "blocks_" not in k and "resnets_" not in k and "layers_" not in k, k
    imported = convert_fn(sd)
    aligned, missing, unexpected = align_to_params(imported, params, strict=True)
    chex = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
            aligned["params"],
            params["params"],
        )
    )
    assert chex
    return sd


@pytest.mark.slow
def test_unet3d_torch_roundtrip():
    cfg = UNet3DConfig.tiny(motion_mask=True, motion_strength=True)
    model = UNet3DConditionModel(cfg)
    sample = jnp.zeros((1, 2, 16, 16, 4))
    cond = jnp.zeros((1, 1, 16, 16, 4))
    mask = jnp.ones((1, 1, 16, 16, 1))
    text = jnp.zeros((1, 7, 32))
    params = model.init(
        jax.random.PRNGKey(0), sample, jnp.array(1), text, cond, mask, jnp.array([1.0])
    )
    sd = _roundtrip(params, export_unet3d, convert_unet3d)
    # spot-check diffusers-exact key names and layouts
    assert "conv_in2.weight" in sd and sd["conv_in2.weight"].shape[1] == 5
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight" in sd
    assert "down_blocks.0.temp_convs.0.conv1.0.weight" in sd  # GN inside Sequential
    assert sd["down_blocks.0.temp_convs.0.conv1.2.weight"].ndim == 5
    assert "time_embedding.cond_proj.weight" in sd
    assert "transformer_in.proj_in.weight" in sd


def test_vae_torch_roundtrip(tiny_vae):
    _, _, params = tiny_vae
    sd = _roundtrip(params, export_vae, convert_vae)
    assert "encoder.down_blocks.0.downsamplers.0.conv.weight" in sd
    assert "decoder.mid_block.attentions.0.to_q.weight" in sd
    assert "quant_conv.weight" in sd


def test_clip_torch_roundtrip():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.array([[1, 2, 3]]))
    sd = _roundtrip(params, export_clip_text, convert_clip_text)
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in sd
    assert "text_model.embeddings.token_embedding.weight" in sd
    assert "text_model.final_layer_norm.weight" in sd


def test_import_drops_unused_reference_params():
    from animate_anything_tpu.utils.import_torch import _rename_unet3d

    assert _rename_unet3d("motion_embedding.0.weight") is None
    assert _rename_unet3d("down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.1.weight") is None


def test_expand_conv_in_channels():
    k = np.ones((3, 3, 4, 8), np.float32)
    k2 = expand_conv_in_channels(k, 5)
    assert k2.shape == (3, 3, 5, 8)
    np.testing.assert_allclose(k2[:, :, :4], 1.0)
    np.testing.assert_allclose(k2[:, :, 4:], 0.0)


@pytest.mark.slow
def test_svd_unet_torch_roundtrip():
    from animate_anything_tpu.models.svd_unet import SVDUNetConfig, UNetSpatioTemporalConditionModel
    from animate_anything_tpu.utils.import_torch import convert_svd_unet, export_svd_unet

    cfg = SVDUNetConfig.tiny(in_channels=9)
    model = UNetSpatioTemporalConditionModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 8, 8, 9)), jnp.array(0.5),
        jnp.zeros((1, 1, 32)), jnp.zeros((1, 3)),
    )
    sd = _roundtrip(params, export_svd_unet, convert_svd_unet)
    assert "down_blocks.0.resnets.0.spatial_res_block.conv1.weight" in sd
    assert sd["down_blocks.0.resnets.0.temporal_res_block.conv1.weight"].ndim == 5
    assert "down_blocks.0.resnets.0.time_mixer.mix_factor" in sd
    assert "down_blocks.0.attentions.0.time_mixer.mix_factor" in sd
    assert "down_blocks.0.attentions.0.temporal_transformer_blocks.0.ff_in.net.0.proj.weight" in sd
    assert "down_blocks.0.attentions.0.time_pos_embed.linear_2.weight" in sd
    assert "add_embedding.linear_1.weight" in sd
    assert "mid_block.attentions.0.proj_in.weight" in sd


def test_clip_vision_torch_roundtrip():
    from animate_anything_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionModelWithProjection
    from animate_anything_tpu.utils.import_torch import convert_clip_vision

    cfg = CLIPVisionConfig.tiny()
    model = CLIPVisionModelWithProjection(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    # forward-direction only: craft diffusers-style keys and verify strict fit
    from animate_anything_tpu.utils.import_torch import align_to_params
    import numpy as np

    p = params["params"]
    sd = {}
    sd["visual_projection.weight"] = np.asarray(p["visual_projection"]["kernel"]).T
    sd["vision_model.embeddings.class_embedding"] = np.asarray(p["class_embedding"])
    sd["vision_model.embeddings.patch_embedding.weight"] = np.asarray(
        p["patch_embedding"]["kernel"]).transpose(3, 2, 0, 1)
    sd["vision_model.embeddings.position_embedding.weight"] = np.asarray(
        p["position_embedding"]["embedding"])
    sd["vision_model.embeddings.position_ids"] = np.arange(17)[None]
    for which in ("pre_layrnorm", "post_layernorm"):
        sd[f"vision_model.{which}.weight"] = np.asarray(p[which]["scale"])
        sd[f"vision_model.{which}.bias"] = np.asarray(p[which]["bias"])
    for i in range(cfg.num_layers):
        lp = p[f"layers_{i}"]
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"vision_model.encoder.layers.{i}.self_attn.{proj}.weight"] = np.asarray(lp[proj]["kernel"]).T
            sd[f"vision_model.encoder.layers.{i}.self_attn.{proj}.bias"] = np.asarray(lp[proj]["bias"])
        for fc in ("fc1", "fc2"):
            sd[f"vision_model.encoder.layers.{i}.mlp.{fc}.weight"] = np.asarray(lp[fc]["kernel"]).T
            sd[f"vision_model.encoder.layers.{i}.mlp.{fc}.bias"] = np.asarray(lp[fc]["bias"])
        for ln in ("layer_norm1", "layer_norm2"):
            sd[f"vision_model.encoder.layers.{i}.{ln}.weight"] = np.asarray(lp[ln]["scale"])
            sd[f"vision_model.encoder.layers.{i}.{ln}.bias"] = np.asarray(lp[ln]["bias"])
    imported = convert_clip_vision(sd)
    aligned, missing, unexpected = align_to_params(imported, params, strict=True)
    assert not missing and not unexpected


@pytest.mark.slow
def test_import_dryrun_tool(tmp_path, capsys):
    """scripts/import_dryrun.py (VERDICT r1 #10): the audit must print its
    full key/shape report BEFORE any strict import can crash — including on
    deliberately broken checkpoints — and exit nonzero on problems."""
    import importlib.util

    from animate_anything_tpu.models.factory import build_models
    from animate_anything_tpu.train.checkpoint import save_pipeline

    spec = importlib.util.spec_from_file_location(
        "import_dryrun",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "import_dryrun.py"),
    )
    dryrun = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dryrun)

    models = build_models(model_size="tiny", motion_mask=True,
                          motion_strength=True)
    pipe_dir = tmp_path / "pipe"
    save_pipeline(
        str(pipe_dir), models["unet_params"], models["unet_config"],
        models["vae_params"], models["vae_config"],
        models["text_params"], models["text_config"],
    )

    # clean self-exported checkpoint → audit green, forward smoke runs
    import sys
    argv = sys.argv
    try:
        sys.argv = ["import_dryrun.py", str(pipe_dir)]
        rc = dryrun.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert rc == 0
    assert "missing (model param not in checkpoint): 0" in out
    assert "shape mismatches:                        0" in out
    assert "forward smoke" in out and "finite=True" in out

    # corrupt the unet safetensors: drop one tensor, break another's shape —
    # the report must still print (the old tool crashed in build_models first)
    from safetensors import safe_open
    from safetensors.numpy import save_file

    st_path = pipe_dir / "unet" / "diffusion_pytorch_model.safetensors"
    with safe_open(str(st_path), framework="np") as f:
        sd = {k: f.get_tensor(k) for k in f.keys()}
    keys = sorted(sd)
    del sd[keys[0]]
    sd[keys[1]] = np.zeros((3, 3), np.float32)
    save_file(sd, str(st_path))

    try:
        sys.argv = ["import_dryrun.py", str(pipe_dir)]
        rc = dryrun.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert rc == 1
    assert "== unet ==" in out  # audit report printed despite the breakage
