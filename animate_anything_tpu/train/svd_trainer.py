"""SVD training step: EDM objective with mask conditioning.

Mirrors the reference ``finetune_unet`` in /root/reference/train_svd.py:347-432:

- latents = VAE posterior mode × scaling; image latent = frame 0 with
  lognormal noise augmentation exp(N(-3, 0.5));
- motion_mask ⇒ condition latents are the real frames blended with the frozen
  first frame, mask[:,0]=0 (first frame always given, :369-381);
- CLIP-image conditioning with 15% zero-dropout (:395-401);
- EDM: σ ~ exp(N(0.7, 1.6)), c_skip/c_out/c_in/c_noise, λ(σ)=(σ²+1)/σ²
  weighting (:402-410), all in fp32;
- input channels [mask?, c_in·noisy, condition/scaling] (:412-416);
- added_time_ids = (fps=7, motion_bucket=127, noise_aug) (:418-421);
- loss = λ·MSE(x̂0, latents) + MSE over the frozen region (:428-431).

(The reference's in-loss ``accelerator.wait_for_everyone()`` barrier at :426
has no analog — XLA's SPMD execution is already bulk-synchronous.)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from animate_anything_tpu.diffusion.euler_edm import edm_precondition, edm_sample_sigmas
from animate_anything_tpu.models.vae import encode_video
from animate_anything_tpu.train.trainer import TrainConfig, prepare_mask_for_latents


@dataclasses.dataclass(frozen=True)
class SVDTrainConfig(TrainConfig):
    p_mean: float = 0.7
    p_std: float = 1.6
    fps: int = 7
    motion_bucket_id: int = 127
    image_dropout: float = 0.15


def make_svd_train_step(
    unet,
    config: SVDTrainConfig,
    vae=None,
    vae_params=None,
    image_encoder=None,
    image_encoder_params=None,
    param_transform: Optional[Callable] = None,
) -> Callable:
    """train_step(state, batch, rng) → (state, metrics).

    batch: 'pixel_values' (b,f,H,W,3) in [-1,1]; 'mask' (b,H,W) 0..255;
    'clip_pixel_values' (b,224,224,3) preprocessed for the image encoder OR
    precomputed 'image_embeddings' (b,1,d)."""
    import optax

    scaling = vae.config.scaling_factor

    def loss_fn(params, batch, rng):
        if param_transform is not None:
            params = param_transform(params)
        r_aug, r_sigma, r_noise, r_drop = jax.random.split(rng, 4)

        pixel_values = batch["pixel_values"]
        b, f = pixel_values.shape[:2]
        latents = encode_video(vae, vae_params, pixel_values)      # scaled
        h, w = latents.shape[2:4]

        # image latent of frame 0 with lognormal noise aug (ref :364-367)
        noise_aug = jnp.exp(-3.0 + 0.5 * jax.random.normal(r_aug, ()))
        image = pixel_values[:, 0] + noise_aug * jax.random.normal(
            jax.random.fold_in(r_aug, 1), pixel_values[:, 0].shape
        )
        image_latent = encode_video(vae, vae_params, image[:, None])  # (b,1,h,w,4)

        if config.motion_mask:
            mask = prepare_mask_for_latents(batch["mask"], h, w)
            mask = jnp.broadcast_to(mask, (b, f, h, w, 1))
            mask = mask.at[:, 0].set(0.0)  # first frame always given (ref :381)
            freeze = jnp.broadcast_to(image_latent, latents.shape)
            condition_latent = latents * (1.0 - mask) + freeze * mask
        else:
            mask = None
            condition_latent = jnp.broadcast_to(image_latent, latents.shape)

        # CLIP image embedding with zero-dropout (ref :384-401)
        if "image_embeddings" in batch:
            embeds = batch["image_embeddings"]
        else:
            emb = image_encoder.apply(image_encoder_params, batch["clip_pixel_values"])
            embeds = emb[:, None, :]
        drop = jax.random.bernoulli(r_drop, config.image_dropout)
        embeds = jnp.where(drop, jnp.zeros_like(embeds), embeds)

        # EDM forward + preconditioning (fp32 σ math)
        sigma = edm_sample_sigmas(r_sigma, b, config.p_mean, config.p_std)
        c = edm_precondition(sigma)
        lat32 = latents.astype(jnp.float32)
        noisy = lat32 + jax.random.normal(r_noise, latents.shape, jnp.float32) * c.sigma

        inp = jnp.concatenate(
            [(c.c_in * noisy).astype(latents.dtype), condition_latent / scaling], axis=-1
        )
        if config.motion_mask:
            inp = jnp.concatenate([mask.astype(latents.dtype), inp], axis=-1)

        added = jnp.stack([
            jnp.full((b,), float(config.fps), jnp.float32),
            jnp.full((b,), float(config.motion_bucket_id), jnp.float32),
            jnp.broadcast_to(noise_aug, (b,)).astype(jnp.float32),
        ], axis=1)

        pred = unet.apply(params, inp, c.c_noise, embeds, added)
        x0 = c.c_out * pred.astype(jnp.float32) + c.c_skip * noisy

        loss = jnp.mean((x0 - lat32) ** 2 * c.loss_weight)
        metrics = {"edm_loss": loss}
        if config.motion_mask:
            frozen = jnp.mean(((x0 - condition_latent.astype(jnp.float32)) * (1.0 - mask)) ** 2)
            loss = loss + frozen
            metrics["mask_consistency_loss"] = frozen
        metrics["loss"] = loss
        return loss, metrics

    def train_step(state, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        new_state = state.apply_gradients(grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step
