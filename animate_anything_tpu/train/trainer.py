"""Trainer core for the mask+motion video-diffusion workload.

One functional trainer replaces the reference's four ~70%-identical training
scripts (SURVEY §1 note; /root/reference/train.py:328-728 is the canonical
one). Training-step semantics mirror ``finetune_unet``
(/root/reference/train.py:658-728) exactly:

- latents from cached batch or on-device VAE encode (frame-flattened);
- condition latent = frame 0; mask resized to latent res, binarized at 0.5;
- motion_mask ⇒ latents freeze-blended outside the mask (:684-686);
- motion conditioning = realized ``latent_motion_score`` of the (blended)
  clip (:688), with aux loss 0.001·MSE(score(x̂0), score) when
  motion_strength (:722-726);
- ε / v target per schedule; offset noise XOR zero-SNR rescale (:690);
- 15% whole-batch text-conditioning dropout (:716-717).

TPU design: the whole step (encode→noise→forward→loss→grads→Adam) is one jit;
DP grad reduction is XLA psum from shardings; optimizer state is ZeRO-sharded
(parallel/partition.py); grad accumulation is optax.MultiSteps; freezing is an
optax mask built from the same name-substring semantics as the reference's
``handle_trainable_modules`` (/root/reference/train.py:232-252).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from animate_anything_tpu.diffusion import schedule as dsched
from animate_anything_tpu.diffusion.schedule import (
    DiffusionSchedule,
    add_noise,
    get_velocity,
    pred_x0,
    sample_noise,
)
from animate_anything_tpu.metrics.motion import latent_motion_score
from animate_anything_tpu.models.vae import encode_video


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 5e-6
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8
    adam_weight_decay: float = 1e-2
    use_8bit_adam: bool = False
    max_grad_norm: float = 1.0
    gradient_accumulation_steps: int = 1
    trainable_modules: Tuple[str, ...] = ("all",)
    not_trainable_modules: Tuple[str, ...] = ()
    text_dropout: float = 0.15
    motion_mask: bool = False
    motion_strength: bool = False
    use_offset_noise: bool = False
    offset_noise_strength: float = 0.1
    rescale_schedule: bool = False
    cache_latents: bool = False
    motion_loss_weight: float = 0.001


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def trainable_label_tree(params: Any, trainable_modules: Tuple[str, ...],
                         not_trainable_modules: Tuple[str, ...] = ()) -> Any:
    """'train'/'freeze' labels by path-substring match — same semantics as the
    reference's handle_trainable_modules ('all' unfreezes everything; a module
    is trainable if any pattern is a substring of its dotted path; 'lora'
    paths are excluded from substring matching, train.py:246).
    not_trainable_modules is the stage-2 trainer's deny-list, applied AFTER
    the allow-list (train_transparent_i2v_stage2.py:279-302)."""

    def label(path, _):
        p = ".".join(str(getattr(k, "key", k)) for k in path)
        for tm in not_trainable_modules:
            if tm in p:
                return "freeze"
        for tm in trainable_modules:
            if tm == "all":
                return "train"
            if tm in p and "lora" not in p:
                return "train"
        return "freeze"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(config: TrainConfig, params: Any) -> optax.GradientTransformation:
    if config.use_8bit_adam:
        # bitsandbytes AdamW8bit parity (reference train.py:204-215):
        # blockwise int8/uint8 moments, ~2 bytes/param optimizer state
        from animate_anything_tpu.ops.adam8bit import adamw_8bit

        inner = adamw_8bit(
            config.learning_rate,
            b1=config.adam_beta1,
            b2=config.adam_beta2,
            eps=config.adam_eps,
            weight_decay=config.adam_weight_decay,
        )
    else:
        inner = optax.adamw(
            config.learning_rate,
            b1=config.adam_beta1,
            b2=config.adam_beta2,
            eps=config.adam_eps,
            weight_decay=config.adam_weight_decay,
        )
    adamw = optax.chain(optax.clip_by_global_norm(config.max_grad_norm), inner)
    labels = trainable_label_tree(params, config.trainable_modules,
                                  config.not_trainable_modules)
    tx = optax.multi_transform({"train": adamw, "freeze": optax.set_to_zero()}, labels)
    if config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, config.gradient_accumulation_steps)
    return tx


def create_train_state(params: Any, config: TrainConfig) -> TrainState:
    tx = make_optimizer(config, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx
    )


def prepare_mask_for_latents(mask: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(b, H, W) float 0..255 → (b, 1, h, w, 1) binary at latent resolution
    (reference :675-683: /255, nearest resize, threshold 0.5)."""
    m = mask.astype(jnp.float32) / 255.0
    m = jax.image.resize(m, (m.shape[0], h, w), method="nearest")
    m = (m >= 0.5).astype(jnp.float32)
    return m[:, None, :, :, None]


def make_train_step(
    unet,
    schedule: DiffusionSchedule,
    config: TrainConfig,
    vae=None,
    vae_params=None,
    text_encoder=None,
    text_params=None,
    param_transform: Optional[Callable] = None,
    text_param_transform: Optional[Callable] = None,
    trainable_transform: Optional[Callable] = None,
) -> Callable:
    """Returns train_step(state, batch, rng) → (state, metrics).

    param_transform: optional pure map from the *trainable* tree to the model
    params (LoRA: state holds the adapter tree, transform merges it into the
    frozen base — see make_lora_train_step).
    text_param_transform: same, for the text-encoder params (text LoRA,
    reference use_text_lora — train_lora.py:392-484). When set, prompts MUST
    arrive as token ids (cached embeds would bypass the trained adapter).

    batch keys (all device arrays):
    - 'pixel_values' (b,f,H,W,3) in [-1,1]  OR 'latents' (b,f,h,w,4) if cached
    - 'mask' (b,H,W) 0..255
    - 'prompt_ids' (b,77) int32 (when text_encoder given) or
      'encoder_hidden_states' (b,77,d) precomputed
    - 'uncond_hidden_states' (b,77,d) or uncond ids under 'uncond_ids'
    """
    use_offset = config.use_offset_noise and not config.rescale_schedule

    def loss_fn(params, batch, rng):
        rng, r_train = jax.random.split(rng)
        if trainable_transform is not None:
            # per-step stochastic view of the trainable tree (LoRA dropout)
            params = trainable_transform(params, r_train)
        raw_params = params
        if param_transform is not None:
            params = param_transform(params)
        r_noise, r_t, r_drop = jax.random.split(rng, 3)

        if "latents" in batch:
            latents = batch["latents"].astype(jnp.float32)
        else:
            latents = encode_video(vae, vae_params, batch["pixel_values"])
        b, f, h, w, _ = latents.shape
        condition_latent = latents[:, 0:1]

        mask = prepare_mask_for_latents(batch["mask"], h, w)
        if config.motion_mask:
            freeze = jnp.broadcast_to(condition_latent, latents.shape)
            latents = freeze * (1.0 - mask) + latents * mask

        latent_motion = latent_motion_score(latents)

        noise = sample_noise(
            r_noise, latents.shape,
            config.offset_noise_strength if use_offset else 0.0,
        )
        t = jax.random.randint(r_t, (b,), 0, schedule.num_train_timesteps)
        noisy = add_noise(schedule, latents, noise, t)

        if "encoder_hidden_states" in batch and text_param_transform is None:
            embeds = batch["encoder_hidden_states"]
            uncond = batch["uncond_hidden_states"]
        else:
            if text_param_transform is not None:
                if "prompt_ids" not in batch:
                    raise ValueError(
                        "text LoRA needs token ids in the batch; cached text "
                        "embeddings would bypass the trained adapter"
                    )
                tparams = text_param_transform(raw_params)
            else:
                tparams = text_params
            embeds = text_encoder.apply(tparams, batch["prompt_ids"])
            uncond = text_encoder.apply(tparams, batch["uncond_ids"])
        # whole-batch conditioning dropout (reference flips the entire batch
        # with python random < 0.15, train.py:716)
        drop = jax.random.bernoulli(r_drop, config.text_dropout)
        embeds = jnp.where(drop, uncond, embeds)

        pred = unet.apply(
            params, noisy, t, embeds, condition_latent,
            mask if config.motion_mask else None,
            latent_motion if config.motion_strength else None,
        )

        if schedule.prediction_type == "epsilon":
            target = noise
        elif schedule.prediction_type == "v_prediction":
            target = get_velocity(schedule, latents, noise, t)
        else:
            raise ValueError(schedule.prediction_type)

        loss = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
        metrics = {"mse_loss": loss}
        if config.motion_strength:
            x0 = pred_x0(schedule, pred, noisy, t)
            motion_loss = jnp.mean((latent_motion - latent_motion_score(x0)) ** 2)
            loss = loss + config.motion_loss_weight * motion_loss
            metrics["motion_loss"] = motion_loss
        metrics["loss"] = loss
        return loss, metrics

    def train_step(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch, rng)
        new_state = state.apply_gradients(grads)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_lora_train_step(
    unet,
    schedule: DiffusionSchedule,
    config: TrainConfig,
    base_params,
    lora_config,
    text_base_params=None,
    text_lora_config=None,
    **model_kw,
) -> Callable:
    """LoRA training: the TrainState holds ONLY the adapter tree(s); the
    frozen base params are closed over (constants in the compiled program)
    and the merge W+(α/r)BA happens inside the jitted loss (reference
    workload: /root/reference/train_lora.py:461-476 + utils/lora_handler.py).

    UNet-only (text_lora_config None): state.params IS the unet adapter tree
    (back-compat). With text LoRA (reference use_text_lora): state.params =
    {"unet_lora": ..., "text_lora": ...}; either key may be absent when only
    one model is adapted."""
    from animate_anything_tpu.models.lora import dropout_lora, merge_lora

    if text_lora_config is None:
        def transform(lora_tree):
            return merge_lora(base_params, lora_tree, lora_config)

        trainable = None
        if lora_config.dropout:
            def trainable(tree, rng):
                return dropout_lora(rng, tree, lora_config)

        return make_train_step(
            unet, schedule, config, param_transform=transform,
            trainable_transform=trainable, **model_kw
        )

    def transform(tree):
        if lora_config is None or "unet_lora" not in tree:
            return jax.tree_util.tree_map(jax.lax.stop_gradient, base_params)
        return merge_lora(base_params, tree["unet_lora"], lora_config)

    def text_transform(tree):
        return merge_lora(text_base_params, tree["text_lora"], text_lora_config)

    trainable = None
    if (lora_config is not None and lora_config.dropout) or text_lora_config.dropout:
        def trainable(tree, rng):
            r_u, r_t = jax.random.split(rng)
            out = dict(tree)
            if lora_config is not None and "unet_lora" in tree and lora_config.dropout:
                out["unet_lora"] = dropout_lora(r_u, tree["unet_lora"], lora_config)
            if text_lora_config.dropout:
                out["text_lora"] = dropout_lora(r_t, tree["text_lora"], text_lora_config)
            return out

    return make_train_step(
        unet, schedule, config, param_transform=transform,
        text_param_transform=text_transform, trainable_transform=trainable,
        **model_kw
    )

