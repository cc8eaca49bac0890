"""Frame/batch-sharded inference on the virtual 8-device mesh + profiling
utilities + dataset fault tolerance."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.core import AXIS_DATA, AXIS_FRAME, create_mesh
from animate_anything_tpu.models import UNet3DConditionModel, UNet3DConfig
from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig
from animate_anything_tpu.pipelines import LatentToVideoPipeline


@pytest.mark.slow
def test_pipeline_sharded_matches_single_device():
    ucfg = UNet3DConfig.tiny(motion_mask=True, motion_strength=True)
    unet = UNet3DConditionModel(ucfg)
    b, f, hw = 2, 4, 8
    sample = jnp.zeros((1, 2, hw, hw, 4))
    cond1 = jnp.zeros((1, 1, hw, hw, 4))
    uparams = unet.init(
        jax.random.PRNGKey(0), sample, jnp.array(1), jnp.zeros((1, 7, 32)),
        cond1, jnp.ones((1, 1, hw, hw, 1)), jnp.ones((1,)),
    )
    vae = AutoencoderKL(VAEConfig.tiny())
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))

    mesh = create_mesh({AXIS_DATA: 2, AXIS_FRAME: 4})
    kwargs = dict(text_encoder=None, text_params=None, tokenizer=None)
    pipe_single = LatentToVideoPipeline(unet, uparams, vae, vparams, **kwargs)
    pipe_sharded = LatentToVideoPipeline(unet, uparams, vae, vparams, mesh=mesh, **kwargs)

    rng = jax.random.PRNGKey(0)
    img_latent = jax.random.normal(rng, (b, 1, hw, hw, 4))
    ts = pipe_single.get_timesteps(3)
    latents = pipe_single.prepare_init_latents(img_latent, f, ts, rng)
    embeds = jnp.zeros((b, 7, 32))
    call_kw = dict(
        prompt_embeds=embeds, negative_prompt_embeds=embeds,
        condition_latent=img_latent, mask=jnp.ones((b, 1, hw, hw, 1)),
        motion=[3.0, 3.0], timesteps=ts, output_type="latent",
    )
    _, out_single = pipe_single(latents=latents, **call_kw)
    _, out_sharded = pipe_sharded(latents=latents, **call_kw)
    # sharded reductions reassociate float sums (GroupNorm stats) —
    # tolerance covers reduction-order noise, not semantic drift
    np.testing.assert_allclose(
        np.asarray(out_single), np.asarray(out_sharded), rtol=2e-3, atol=5e-3
    )


def test_profiling_section_and_memory_stats(capsys):
    from animate_anything_tpu.utils import profiling

    with profiling.section("unit", echo=True):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert "unit" in profiling.section_totals()
    stats = profiling.device_memory_stats()
    assert len(stats) == len(jax.devices())


def test_dataset_fault_tolerance(tmp_path):
    from animate_anything_tpu.data import FolderDataset
    from PIL import Image

    d = tmp_path / "vids"
    d.mkdir()
    # one good gif, one corrupt file with a video extension
    frames = [Image.fromarray(np.full((16, 16, 3), i * 30, np.uint8)) for i in range(4)]
    frames[0].save(d / "good.gif", save_all=True, append_images=frames[1:])
    (d / "bad.gif").write_bytes(b"not a gif at all")
    ds = FolderDataset(path=str(d), width=16, height=16, n_sample_frames=2,
                       motion_threshold=0)
    assert len(ds) == 2
    # every index returns a valid item (corrupt one resampled away)
    for i in range(len(ds)):
        item = ds[i]
        assert item["pixel_values"].shape == (2, 16, 16, 3)
