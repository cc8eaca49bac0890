import pytest
import jax
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.models import UNet3DConditionModel, UNet3DConfig
from animate_anything_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from animate_anything_tpu.models.factory import HashTokenizer
from animate_anything_tpu.models.vae import AutoencoderKL, VAEConfig
from animate_anything_tpu.pipelines import LatentToVideoPipeline
from animate_anything_tpu.pipelines.long_video import generate_long_video

# full train/eval loops with multi-minute compiles on the 1-core box:
# the whole module lives in the slow tier (run `pytest tests/` for it)
pytestmark = pytest.mark.slow


def test_long_video_autoregressive_chunks():
    ucfg = UNet3DConfig.tiny(motion_mask=True, motion_strength=True)
    unet = UNet3DConditionModel(ucfg)
    hw = 8
    uparams = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, hw, hw, 4)), jnp.array(1),
        jnp.zeros((1, 7, 32)), jnp.zeros((1, 1, hw, hw, 4)),
        jnp.ones((1, 1, hw, hw, 1)), jnp.ones((1,)),
    )
    vae = AutoencoderKL(VAEConfig.tiny())
    vparams = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    tcfg = CLIPTextConfig.tiny()
    text = CLIPTextModel(tcfg)
    tparams = text.init(jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.int32))
    pipe = LatentToVideoPipeline(
        unet, uparams, vae, vparams, text_encoder=text, text_params=tparams,
        tokenizer=HashTokenizer(tcfg.vocab_size, tcfg.max_position_embeddings),
    )
    image = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    video, latents = generate_long_video(
        pipe, image, "a thing moves", total_frames=7, chunk_frames=3, overlap=1,
        mask_img=np.full((64, 64), 255, np.uint8), motion_strength=3.0,
        num_inference_steps=2, rng=jax.random.PRNGKey(0),
    )
    assert latents.shape == (1, 7, 8, 8, 4)
    assert video.shape == (1, 7, 64, 64, 3)
    assert np.isfinite(np.asarray(video)).all()
