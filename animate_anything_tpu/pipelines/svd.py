"""SVD pipelines: masked image→video and text/v2v variants.

TPU-native equivalents of the reference's
``MaskStableVideoDiffusionPipeline`` (/root/reference/models/pipeline.py:223-466)
and ``TextStableVideoDiffusionPipeline`` (:468-731). Semantics preserved:

- conditioning: CLIP image embedding (uncond branch = zeros) + VAE image
  latents repeated per frame (uncond = zeros), channel-concatenated with the
  noisy latents each step; optional motion mask as the FIRST channel (9-ch
  unets, :422 and :607 in_channels routing);
- per-frame linspace guidance scale min→max (:405-408);
- EulerDiscrete sampling over Karras sigmas with EDM preconditioning;
- micro-conditioning added_time_ids (fps-1, motion_bucket, noise_aug);
- v2v: per-frame condition latents precomputed from an input video (:624-633);
- condition_type image/text/both for the encoder states (:596-606).

The whole denoise loop is one jitted lax.scan; chunked VAE decode available
via decode_video(chunk_size=...).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.diffusion.euler_edm import (
    EulerSchedule,
    euler_step,
    make_euler_schedule,
    scale_model_input,
)
from animate_anything_tpu.models.vae import AutoencoderKL, decode_video, encode_video


class MaskStableVideoDiffusionPipeline:
    def __init__(
        self,
        unet,
        unet_params,
        vae: AutoencoderKL,
        vae_params,
        image_encoder=None,
        image_encoder_params=None,
        text_encoder=None,
        text_params=None,
        tokenizer=None,
        pab: Optional[dict] = None,
    ):
        """pab: optional PAB step caching — {'rate': 2, 'warmup': 4,
        'tail': 1}: between warmup and tail, each spatio-temporal transformer
        recomputes its residual delta only every rate-th Euler step (see
        pipelines/latent2video.py for the full description)."""
        self.pab = dict(pab) if pab else None
        self.unet = unet
        self.unet_params = unet_params
        self.vae = vae
        self.vae_params = vae_params
        self.image_encoder = image_encoder
        self.image_encoder_params = image_encoder_params
        self.text_encoder = text_encoder
        self.text_params = text_params
        self.tokenizer = tokenizer

    # ------------------------------------------------------------------
    def encode_image_embedding(self, image_uint8: np.ndarray) -> jnp.ndarray:
        from animate_anything_tpu.models.clip_vision import preprocess_clip_image

        if self.image_encoder is None:
            raise ValueError("pipeline built without an image encoder")
        px = jnp.asarray(preprocess_clip_image(
            image_uint8, self.image_encoder.config.image_size
        ))
        emb = self.image_encoder.apply(self.image_encoder_params, px)
        return emb[:, None, :]  # (1, 1, d)

    def encode_text_embedding(self, prompt: str) -> jnp.ndarray:
        ids = self.tokenizer(
            [prompt], padding="max_length", truncation=True, max_length=77,
            return_tensors="np",
        ).input_ids
        return self.text_encoder.apply(self.text_params, jnp.asarray(ids))

    # ------------------------------------------------------------------
    @functools.cached_property
    def _denoise_jit(self):
        unet = self.unet
        pab = self.pab

        @functools.partial(jax.jit, static_argnames=("num_steps",))
        def denoise(unet_params, latents, cond_latents2, mask2, embeds2,
                    added_time_ids2, guidance, rng, num_steps):
            """latents (b,f,h,w,4); cond_latents2/mask2/embeds2: CFG-doubled.
            guidance: (b, f, 1, 1, 1) per-frame linspace scale."""
            b = latents.shape[0]
            es = make_euler_schedule(num_steps)
            noise = jax.random.normal(rng, latents.shape, jnp.float32)
            x = (noise * es.init_noise_sigma).astype(latents.dtype)

            def make_input(x, sigma):
                inp = scale_model_input(jnp.concatenate([x, x]), sigma)
                inp = jnp.concatenate([inp, cond_latents2], axis=-1)
                if mask2 is not None:
                    inp = jnp.concatenate([mask2, inp], axis=-1)
                return inp

            if pab is None:
                def body(x, i):
                    sigma, sigma_next = es.sigmas[i], es.sigmas[i + 1]
                    t = es.timesteps[i]
                    out = unet.apply(unet_params, make_input(x, sigma), t,
                                     embeds2, added_time_ids2)
                    uncond, cond = out[:b], out[b:]
                    pred = uncond + guidance * (cond - uncond)
                    return euler_step(x, pred, sigma, sigma_next), None

                x, _ = jax.lax.scan(body, x, jnp.arange(num_steps))
                return x

            # PAB: step-indexed reuse schedule + delta cache in the carry
            rate = int(pab.get("rate", 2))
            warm = int(pab.get("warmup", 4))
            tail = int(pab.get("tail", 1))
            idx = np.arange(num_steps)
            mid = (idx >= warm) & (idx < num_steps - tail)
            flags = jnp.asarray(mid & (idx % rate != 0)) if rate > 1 else \
                jnp.zeros(num_steps, bool)

            def apply_pab(variables, inp, t, flag):
                return unet.apply(variables, inp, t, embeds2, added_time_ids2,
                                  pab_reuse=flag, mutable=["pab"])

            _, mut_struct = jax.eval_shape(
                apply_pab, dict(unet_params),
                make_input(x, es.sigmas[0]), jnp.zeros((), jnp.float32),
                jnp.zeros((), bool),
            )
            cache0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), mut_struct["pab"])

            def body(carry, i):
                x, cache = carry
                sigma, sigma_next = es.sigmas[i], es.sigmas[i + 1]
                t = es.timesteps[i]
                out, mut = apply_pab({**unet_params, "pab": cache},
                                     make_input(x, sigma), t, flags[i])
                uncond, cond = out[:b], out[b:]
                pred = uncond + guidance * (cond - uncond)
                return (euler_step(x, pred, sigma, sigma_next), mut["pab"]), None

            (x, _c), _ = jax.lax.scan(body, (x, cache0), jnp.arange(num_steps))
            return x

        return denoise

    # ------------------------------------------------------------------
    def __call__(
        self,
        image: Optional[np.ndarray] = None,           # (h, w, 3) uint8
        *,
        image_embeddings: Optional[jnp.ndarray] = None,  # (1, 1, d)
        condition_latent: Optional[jnp.ndarray] = None,  # (b,1or f,h,w,4) scaled
        mask: Optional[jnp.ndarray] = None,           # (b, 1, h, w, 1), 1=moves
        prompt: Optional[str] = None,
        condition_type: str = "image",                # image | text | both
        num_frames: int = 14,
        num_inference_steps: int = 25,
        min_guidance_scale: float = 1.0,
        max_guidance_scale: float = 3.0,
        fps: int = 7,
        motion_bucket_id: int = 127,
        noise_aug_strength: float = 0.02,
        decode_chunk_size: Optional[int] = None,
        rng: Optional[jax.Array] = None,
        output_type: str = "np",
    ):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        r_aug, r_noise = jax.random.split(rng)

        # conditioning states (image / text / both — ref pipeline.py:596-606)
        if image_embeddings is None:
            if condition_type == "text" or (condition_type == "both" and image is None):
                image_embeddings = self.encode_text_embedding(prompt or "")
            else:
                image_embeddings = self.encode_image_embedding(image)
                if condition_type == "both" and prompt:
                    image_embeddings = jnp.concatenate(
                        [image_embeddings, self.encode_text_embedding(prompt)], axis=1
                    )
        embeds2 = jnp.concatenate([jnp.zeros_like(image_embeddings), image_embeddings])

        # VAE condition latents (noise-augmented image, or v2v per-frame video)
        if condition_latent is None:
            pixels = jnp.asarray(image, jnp.float32)[None, None] / 127.5 - 1.0
            pixels = pixels + noise_aug_strength * jax.random.normal(r_aug, pixels.shape)
            condition_latent = encode_video(self.vae, self.vae_params, pixels)
        scaling = self.vae.config.scaling_factor
        cond = condition_latent / scaling  # unet consumes UNSCALED latents (ref :413)
        if cond.shape[1] == 1:
            cond = jnp.repeat(cond, num_frames, axis=1)
        cond2 = jnp.concatenate([jnp.zeros_like(cond), cond])

        b, _, h, w, _ = cond.shape
        latents = jnp.zeros((b, num_frames, h, w, 4), cond.dtype)

        mask2 = None
        if mask is not None:
            m = jnp.broadcast_to(mask.astype(cond.dtype), (b, num_frames, h, w, 1))
            mask2 = jnp.concatenate([m, m])

        added = jnp.asarray([[fps - 1, motion_bucket_id, noise_aug_strength]], jnp.float32)
        added2 = jnp.concatenate([added, added]).astype(jnp.float32)
        added2 = jnp.broadcast_to(added2, (2 * b, 3))

        guidance = jnp.linspace(min_guidance_scale, max_guidance_scale, num_frames)
        guidance = guidance.reshape(1, num_frames, 1, 1, 1).astype(jnp.float32)

        lat = self._denoise_jit(
            self.unet_params, latents, cond2, mask2, embeds2, added2,
            guidance, r_noise, num_inference_steps,
        )
        if output_type == "latent":
            return None, lat
        video = decode_video(self.vae, self.vae_params, lat * 1.0, chunk_size=decode_chunk_size)
        return video, lat


class TextStableVideoDiffusionPipeline(MaskStableVideoDiffusionPipeline):
    """v2v + text-conditioned variant: supply ``condition_latent`` computed
    per frame from an input video (reference :624-633) and/or
    condition_type ∈ {image, text, both}. Motion-mask routing by
    unet.config.in_channels == 9 (ref :607) is the caller passing ``mask``."""

    def video_to_condition_latent(self, video_uint8: np.ndarray) -> jnp.ndarray:
        """(f, h, w, 3) uint8 → (1, f, h/8, w/8, 4) scaled latents."""
        pixels = jnp.asarray(video_uint8, jnp.float32)[None] / 127.5 - 1.0
        return encode_video(self.vae, self.vae_params, pixels)
