"""Long-video generation by autoregressive chunking.

The reference sketches (and disables, loop over ``range(0)``) an
overlap-continuation scheme that reuses the last ``num_frames//3`` latents of
a chunk as conditioning for the next chunk
(/root/reference/train_transparent_i2v_stage2.py:477-497). This is a working
implementation on top of LatentToVideoPipeline:

- chunk 0: normal masked animation from the image latent;
- chunk k: the first ``overlap`` latents are the RE-NOISED tail of chunk k-1
  (same truncated-schedule forward the pipeline already uses), and the
  condition latent becomes the last generated frame — so content flows
  across chunk boundaries;
- all chunks share one jitted denoise program (same shapes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.diffusion.schedule import add_noise
from animate_anything_tpu.models.vae import decode_video, encode_video


def generate_long_video(
    pipe,
    image: np.ndarray,
    prompt: str,
    total_frames: int,
    chunk_frames: int = 16,
    overlap: Optional[int] = None,
    mask_img: Optional[np.ndarray] = None,
    motion_strength: Optional[float] = None,
    num_inference_steps: int = 25,
    guidance_scale: float = 9.0,
    t_start_fraction: float = 0.0,
    rng: Optional[jax.Array] = None,
    decode: bool = True,
):
    """→ (video (1, total_frames, H, W, 3) or None, latents)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    overlap = overlap if overlap is not None else chunk_frames // 3

    pixels = jnp.asarray(image, jnp.float32)[None, None] / 127.5 - 1.0
    cond_latent = encode_video(pipe.vae, pipe.vae_params, pixels)
    h8, w8 = cond_latent.shape[2], cond_latent.shape[3]

    mask = None
    if mask_img is not None:
        m = jnp.asarray(np.asarray(mask_img, np.float32) / 255.0)
        m = jax.image.resize(m, (h8, w8), method="nearest")
        mask = (m >= 0.5).astype(jnp.float32)[None, None, :, :, None]
    prompt_embeds, neg_embeds = pipe.encode_prompt(prompt)
    ts = pipe.get_timesteps(num_inference_steps, t_start_fraction)
    motion = None if motion_strength is None else jnp.asarray([motion_strength], jnp.float32)

    chunks = []
    produced = 0
    prev_tail = None
    while produced < total_frames:
        rng, r_init = jax.random.split(rng)
        init = pipe.prepare_init_latents(cond_latent, chunk_frames, ts, r_init, mask=mask)
        if prev_tail is not None:
            # continue from the previous chunk: re-noise its tail at ts[0]
            rng, r_n = jax.random.split(rng)
            noise = jax.random.normal(r_n, prev_tail.shape, jnp.float32)
            t0 = jnp.broadcast_to(jnp.asarray(int(ts[0])), (prev_tail.shape[0],))
            renoised = add_noise(pipe.schedule, prev_tail, noise, t0)
            init = jnp.concatenate([renoised, init[:, overlap:]], axis=1)
        _, lat = pipe(
            prompt_embeds=prompt_embeds,
            negative_prompt_embeds=neg_embeds,
            latents=init,
            condition_latent=cond_latent,
            mask=mask,
            motion=motion,
            timesteps=ts,
            guidance_scale=guidance_scale,
            output_type="latent",
        )
        keep = lat if not chunks else lat[:, overlap:]
        chunks.append(keep)
        produced += keep.shape[1]
        prev_tail = lat[:, -overlap:] if overlap > 0 else None
        cond_latent = lat[:, -1:]  # last generated frame conditions the next chunk

    latents = jnp.concatenate(chunks, axis=1)[:, :total_frames]
    if not decode:
        return None, latents
    video = decode_video(pipe.vae, pipe.vae_params, latents)
    return video, latents
