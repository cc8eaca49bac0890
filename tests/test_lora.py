"""LoRA tests: targeting, identity-at-init, training, persistence, collapse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from animate_anything_tpu.diffusion import make_schedule
from animate_anything_tpu.models import UNet3DConditionModel, UNet3DConfig
from animate_anything_tpu.models.lora import (
    LoraConfig,
    init_lora_params,
    load_lora,
    merge_lora,
    save_lora,
)
from animate_anything_tpu.train import TrainConfig, create_train_state, make_lora_train_step


@pytest.fixture(scope="module")
def unet_setup():
    cfg = UNet3DConfig.tiny(motion_mask=True, motion_strength=True)
    unet = UNet3DConditionModel(cfg)
    b, f, hw = 1, 2, 2
    args = (
        jax.random.normal(jax.random.PRNGKey(0), (b, f, hw, hw, 4)),
        jnp.array(5),
        jax.random.normal(jax.random.PRNGKey(1), (b, 7, 32)),
        jax.random.normal(jax.random.PRNGKey(2), (b, 1, hw, hw, 4)),
        jnp.ones((b, 1, hw, hw, 1)),
        jnp.ones((b,)),
    )
    params = unet.init(jax.random.PRNGKey(3), *args)
    return unet, params, args


def test_lora_targets_cross_attention_only(unet_setup):
    _, params, _ = unet_setup
    cfg = LoraConfig(rank=4, targets=("CrossAttention",))
    lora = init_lora_params(jax.random.PRNGKey(0), params, cfg)
    assert lora
    assert all("attn1" in k or "attn2" in k for k in lora)
    # linear-only by default: every down factor is (fan_in, 4)
    for ab in lora.values():
        assert ab["down"].shape[1] == 4 and ab["up"].shape[0] == 4


def test_lora_targets_everything_and_convs(unet_setup):
    _, params, _ = unet_setup
    cfg = LoraConfig(rank=2, targets=("UNet3DConditionModel",), include_convs=True)
    lora = init_lora_params(jax.random.PRNGKey(0), params, cfg)
    assert any("conv1" in k for k in lora)  # convs included
    assert any("to_q" in k for k in lora)


def test_merge_identity_at_init(unet_setup):
    unet, params, args = unet_setup
    cfg = LoraConfig(rank=4, targets=("CrossAttention",))
    lora = init_lora_params(jax.random.PRNGKey(0), params, cfg)
    merged = merge_lora(params, lora, cfg, stop_base_gradient=False)
    out0 = unet.apply(params, *args)
    out1 = unet.apply(merged, *args)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)


@pytest.mark.slow
def test_lora_train_step_moves_output(unet_setup):
    unet, params, args = unet_setup
    lcfg = LoraConfig(rank=4, targets=("CrossAttention",))
    lora = init_lora_params(jax.random.PRNGKey(0), params, lcfg)
    tconf = TrainConfig(motion_mask=True, motion_strength=True, cache_latents=True,
                        learning_rate=1e-2, adam_weight_decay=0.0)
    step = jax.jit(make_lora_train_step(
        unet, make_schedule(), tconf, base_params=params, lora_config=lcfg,
    ))
    state = create_train_state(lora, tconf)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 2, 4)),
        "mask": jnp.full((1, 16, 16), 255.0),
        "encoder_hidden_states": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 32)),
        "uncond_hidden_states": jnp.zeros((1, 7, 32)),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    # up factors moved away from zero → adapter active
    up_norm = sum(float(jnp.abs(ab["up"]).sum()) for ab in new_state.params.values())
    assert up_norm > 0
    merged = merge_lora(params, new_state.params, lcfg, stop_base_gradient=False)
    out0 = unet.apply(params, *args)
    out1 = unet.apply(merged, *args)
    assert float(jnp.abs(out1 - out0).max()) > 0


def test_lora_save_load_roundtrip(unet_setup, tmp_path):
    _, params, _ = unet_setup
    cfg = LoraConfig(rank=4, alpha=8.0, targets=("CrossAttention",))
    lora = init_lora_params(jax.random.PRNGKey(0), params, cfg)
    # give "up" nonzero values so the roundtrip is nontrivial
    lora = jax.tree_util.tree_map(lambda x: x + 0.5, lora)
    p = save_lora(str(tmp_path / "lora.safetensors"), lora, cfg)
    lora2, cfg2 = load_lora(p)
    assert cfg2.rank == 4 and cfg2.alpha == 8.0 and cfg2.targets == ("CrossAttention",)
    assert set(lora2) == set(lora)
    for k in lora:
        np.testing.assert_allclose(np.asarray(lora[k]["down"]), np.asarray(lora2[k]["down"]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(lora[k]["up"]), np.asarray(lora2[k]["up"]), atol=1e-7)


def test_lora_scale_and_collapse(unet_setup):
    unet, params, args = unet_setup
    cfg = LoraConfig(rank=4, targets=("CrossAttention",))
    lora = init_lora_params(jax.random.PRNGKey(0), params, cfg)
    lora = jax.tree_util.tree_map(lambda x: x + 0.1, lora)
    merged = merge_lora(params, lora, cfg, stop_base_gradient=False)
    # collapse == merge once; applying zero-scale returns base exactly
    zero = merge_lora(params, lora, cfg, scale=0.0, stop_base_gradient=False)
    out_base = unet.apply(params, *args)
    np.testing.assert_allclose(
        np.asarray(unet.apply(zero, *args)), np.asarray(out_base), atol=1e-6
    )
    assert float(jnp.abs(unet.apply(merged, *args) - out_base).max()) > 1e-6


@pytest.mark.slow
def test_text_lora_train_step_and_persistence(tmp_path):
    """use_text_lora (reference train_lora.py:392-484): the text-encoder
    adapter trains through the prompt-ids path, merges into the text params,
    and round-trips through the text_encoder-prefixed safetensors file."""
    from animate_anything_tpu.models.factory import build_models

    models = build_models(None, motion_mask=True, motion_strength=True,
                          model_size="tiny")
    unet, uparams = models["unet"], models["unet_params"]
    text, tparams = models["text"], models["text_params"]

    lcfg = LoraConfig(rank=4, targets=("CrossAttention",))
    tcfg = LoraConfig(rank=4, targets=("CLIPEncoderLayer",))
    tree = {
        "unet_lora": init_lora_params(jax.random.PRNGKey(0), uparams, lcfg),
        "text_lora": init_lora_params(jax.random.PRNGKey(1), tparams, tcfg),
    }
    assert all("layers_" in k for k in tree["text_lora"])

    tconf = TrainConfig(motion_mask=True, motion_strength=True, cache_latents=True,
                        learning_rate=1e-2, adam_weight_decay=0.0)
    step = jax.jit(make_lora_train_step(
        unet, models["schedule"], tconf, base_params=uparams, lora_config=lcfg,
        text_base_params=tparams, text_lora_config=tcfg,
        text_encoder=text, text_params=tparams,
    ))
    state = create_train_state(tree, tconf)
    ids = jnp.asarray(models["tokenizer"](["a cat moves"], padding="max_length",
                                          max_length=77).input_ids)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 2, 4)),
        "mask": jnp.full((1, 16, 16), 255.0),
        "prompt_ids": ids,
        "uncond_ids": jnp.asarray(models["tokenizer"]("", padding="max_length",
                                                      max_length=77).input_ids),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    text_up = sum(float(jnp.abs(ab["up"]).sum())
                  for ab in new_state.params["text_lora"].values())
    assert text_up > 0  # gradient reached the text adapter

    merged = merge_lora(tparams, new_state.params["text_lora"], tcfg,
                        stop_base_gradient=False)
    e0 = text.apply(tparams, ids)
    e1 = text.apply(merged, ids)
    assert float(jnp.abs(e1 - e0).max()) > 0

    # persistence under the text_encoder prefix
    p = save_lora(str(tmp_path / "l.text_encoder.safetensors"),
                  jax.device_get(new_state.params["text_lora"]), tcfg,
                  prefix="text_encoder")
    back, bcfg = load_lora(p, prefix="text_encoder")
    assert set(back) == set(new_state.params["text_lora"])
    assert bcfg.rank == 4


def test_text_lora_rejects_cached_embeds():
    """Cached text embeddings must not silently bypass the text adapter."""
    from animate_anything_tpu.models.factory import build_models

    models = build_models(None, motion_mask=True, motion_strength=True,
                          model_size="tiny")
    tcfg = LoraConfig(rank=2, targets=("CLIPEncoderLayer",))
    tree = {"text_lora": init_lora_params(
        jax.random.PRNGKey(0), models["text_params"], tcfg)}
    tconf = TrainConfig(motion_mask=True, cache_latents=True)
    step = make_lora_train_step(
        models["unet"], models["schedule"], tconf,
        base_params=models["unet_params"], lora_config=None,
        text_base_params=models["text_params"], text_lora_config=tcfg,
        text_encoder=models["text"], text_params=models["text_params"],
    )
    state = create_train_state(tree, tconf)
    batch = {
        "latents": jnp.zeros((1, 2, 2, 2, 4)),
        "mask": jnp.full((1, 16, 16), 255.0),
        "encoder_hidden_states": jnp.zeros((1, 77, 32)),
        "uncond_hidden_states": jnp.zeros((1, 77, 32)),
    }
    with pytest.raises(ValueError, match="text LoRA"):
        step(state, batch, jax.random.PRNGKey(0))


def test_lora_rank_dropout():
    """dropout_lora: per-rank-column inverted dropout, unbiased, identity at
    p=0 (train-only analog of reference lora_unet_dropout/lora_text_dropout)."""
    from animate_anything_tpu.models.lora import dropout_lora

    cfg = LoraConfig(rank=8, dropout=0.5, targets=("CrossAttention",))
    lora = {"x.kernel": {"down": jnp.ones((4, 8)), "up": jnp.ones((8, 4))}}
    d = dropout_lora(jax.random.PRNGKey(0), lora, cfg)
    col = np.asarray(d["x.kernel"]["down"])[0]
    assert set(np.round(col, 4).tolist()) <= {0.0, 2.0}   # kept cols scaled 1/(1-p)
    np.testing.assert_array_equal(np.asarray(d["x.kernel"]["up"]),
                                  np.asarray(lora["x.kernel"]["up"]))
    means = [float(np.asarray(
        dropout_lora(jax.random.PRNGKey(i), lora, cfg)["x.kernel"]["down"]).mean())
        for i in range(200)]
    assert abs(np.mean(means) - 1.0) < 0.1                # unbiased in expectation
    assert dropout_lora(jax.random.PRNGKey(0), lora,
                        LoraConfig(rank=8, dropout=0.0)) is lora


@pytest.mark.slow
def test_lora_train_step_with_dropout(unet_setup):
    unet, params, _ = unet_setup
    lcfg = LoraConfig(rank=4, targets=("CrossAttention",), dropout=0.25)
    lora = init_lora_params(jax.random.PRNGKey(0), params, lcfg)
    tconf = TrainConfig(motion_mask=True, motion_strength=True, cache_latents=True,
                        learning_rate=1e-2, adam_weight_decay=0.0)
    step = jax.jit(make_lora_train_step(
        unet, make_schedule(), tconf, base_params=params, lora_config=lcfg,
    ))
    state = create_train_state(lora, tconf)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 2, 4)),
        "mask": jnp.full((1, 16, 16), 255.0),
        "encoder_hidden_states": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 32)),
        "uncond_hidden_states": jnp.zeros((1, 7, 32)),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    up_norm = sum(float(jnp.abs(ab["up"]).sum()) for ab in new_state.params.values())
    assert up_norm > 0
