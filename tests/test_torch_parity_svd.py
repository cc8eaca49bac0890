"""Torch-oracle forward parity for the SVD spatio-temporal UNet
(VERDICT r3 next #2).

tests/mini_diffusers_svd.py reimplements diffusers==0.24's
``UNetSpatioTemporalConditionModel`` in torch (the class the reference
finetunes, /root/reference/train_svd.py:93-103) with the exact diffusers
state-dict layout; weights travel through the PRODUCTION importer
(utils/import_torch.py::convert_svd_unet) into our flax model and the full
forward must agree to fp32 tolerance. Covers: SpatioTemporalResBlock
(spatial resnet → (3,1,1) temporal resnet → AlphaBlender),
TransformerSpatioTemporalModel (spatial + temporal transformer blocks,
frame-position embedding, learned mix), added_time_ids micro-conditioning,
and the 8/9-channel conv_in routing.

Batch is 1 throughout: upstream 0.24 flattens the temporal cross-attn
context (hw, b)-major — a known batch-ordering quirk our per-batch
broadcast does not reproduce; at b=1 the layouts coincide and every weight
mapping is still exercised.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import mini_diffusers_svd as mds  # noqa: E402

from animate_anything_tpu.models import svd_unet as fx_svd  # noqa: E402
from animate_anything_tpu.utils.import_torch import (  # noqa: E402
    align_to_params,
    convert_svd_unet,
)

ATOL = 5e-5
RTOL = 2e-4


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.uniform_(-0.4, 0.4, generator=g)
    return module.eval()


def _import(tmodule, fparams, prefix=None, strict=True):
    sd = {k: v.detach().numpy() for k, v in tmodule.state_dict().items()}
    if prefix:
        sd = {f"{prefix}.{k}": v for k, v in sd.items()}
    imported = convert_svd_unet(sd)
    if prefix:
        imported = imported[prefix.replace(".", "_")]
    return align_to_params(imported, fparams, strict=strict)


def _close(torch_out, flax_out):
    np.testing.assert_allclose(
        np.asarray(torch_out.detach()), np.asarray(flax_out),
        atol=ATOL, rtol=RTOL)


def test_spatio_temporal_res_block_parity():
    c_in, c_out, temb_c, f = 32, 64, 64, 3  # c_in != c_out → conv_shortcut
    tm = _randomize(mds.SpatioTemporalResBlock(c_in, c_out, temb_c), seed=0)
    fm = fx_svd.SpatioTemporalResBlock(c_out, num_frames=f)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((f, c_in, 8, 8), np.float32)   # b=1
    temb = rng.standard_normal((f, temb_c), np.float32)

    x_nhwc = jnp.moveaxis(jnp.asarray(x), 1, -1)
    fparams = fm.init(jax.random.PRNGKey(0), x_nhwc, jnp.asarray(temb))
    fparams, missing, unexpected = _import(
        tm, fparams, prefix="down_blocks.0.resnets.0")
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]

    with torch.no_grad():
        t_out = tm(torch.from_numpy(x), torch.from_numpy(temb),
                   image_only_indicator=torch.zeros(1, f))
    f_out = fm.apply(fparams, x_nhwc, jnp.asarray(temb))
    _close(t_out, jnp.moveaxis(f_out, -1, 1))


def test_transformer_spatio_temporal_parity():
    heads, head_dim, c, cross, f = 2, 16, 32, 48, 3
    tm = _randomize(mds.TransformerSpatioTemporalModel(
        heads, head_dim, in_channels=c, num_layers=1,
        cross_attention_dim=cross), seed=1)
    fm = fx_svd.TransformerSpatioTemporalModel(
        heads, head_dim, context_dim=cross, num_frames=f)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((f, c, 8, 8), np.float32)      # b=1, per-frame
    ctx = rng.standard_normal((1, 1, cross), np.float32)

    x_nhwc = jnp.moveaxis(jnp.asarray(x), 1, -1)
    fparams = fm.init(jax.random.PRNGKey(0), x_nhwc, jnp.asarray(ctx))
    fparams, missing, unexpected = _import(
        tm, fparams, prefix="down_blocks.0.attentions.0")
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]

    with torch.no_grad():
        # the UNet repeat_interleaves the context per frame before the block
        t_out = tm(torch.from_numpy(x),
                   encoder_hidden_states=torch.from_numpy(ctx)
                   .repeat_interleave(f, dim=0),
                   image_only_indicator=torch.zeros(1, f))
    f_out = fm.apply(fparams, x_nhwc, jnp.asarray(ctx))
    _close(t_out, jnp.moveaxis(f_out, -1, 1))


@pytest.mark.parametrize("in_channels", [8, 9])
@pytest.mark.slow  # full-forward/compile-heavy; fast tier keeps the smaller variants
def test_full_svd_unet_parity(in_channels):
    """Full-forward parity of the tiny SVD UNet (both 8-ch and the
    mask-extended 9-ch input of /root/reference/train_svd.py:93-103)."""
    tm = _randomize(mds.UNetSpatioTemporalConditionModel(
        in_channels=in_channels, block_out_channels=(32, 64, 64, 64),
        layers_per_block=2, num_attention_heads=(2, 4, 4, 4),
        cross_attention_dim=32, addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=24), seed=2)
    cfg = fx_svd.SVDUNetConfig.tiny(in_channels=in_channels)
    fm = fx_svd.UNetSpatioTemporalConditionModel(cfg)

    rng = np.random.default_rng(2)
    b, f, hw = 1, 3, 16
    sample = rng.standard_normal((b, f, in_channels, hw, hw), np.float32)
    ehs = rng.standard_normal((b, 1, 32), np.float32)
    added = np.asarray([[6.0, 127.0, 0.02]], np.float32)
    t = 0.25  # continuous EDM c_noise

    f_sample = jnp.moveaxis(jnp.asarray(sample), 2, -1)    # (b, f, h, w, c)
    fparams = fm.init(jax.random.PRNGKey(0), f_sample, jnp.asarray(t),
                      jnp.asarray(ehs), jnp.asarray(added))
    fparams, missing, unexpected = _import(tm, fparams, strict=False)
    assert not missing, f"importer missed model params: {missing[:8]}"
    assert not unexpected, f"unmapped torch params: {unexpected[:8]}"

    with torch.no_grad():
        t_out = tm(torch.from_numpy(sample), torch.tensor(t),
                   torch.from_numpy(ehs), torch.from_numpy(added))
    f_out = fm.apply(fparams, f_sample, jnp.asarray(t), jnp.asarray(ehs),
                     jnp.asarray(added))
    _close(t_out, jnp.moveaxis(f_out, -1, 2))
