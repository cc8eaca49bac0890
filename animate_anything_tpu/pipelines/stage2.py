"""Stage-2 transparent (RGBA) video pipelines.

Equivalents of the reference's ``MaskedLatentToVideoPipeline`` and
``ConcatLatentToVideoPipeline`` (/root/reference/models/pipeline_stage2.py:171,
339): the same denoise loop as LatentToVideo, but finishing by running every
decoded frame + its latent through the transparent VAE decoder (UNet384) to
produce RGBA (alpha binarized at 127, fg rescaled —
pipeline_stage2.py:290-318). The Concat variant feeds a 9-ch UNet whose
condition latents are channel-concatenated pre-CFG (:415-417;
UNet3DConfig.condition_mode='channel_concat').
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from animate_anything_tpu.models.transparent_vae import UNet384, decode_rgba_video
from animate_anything_tpu.models.vae import decode_video
from animate_anything_tpu.pipelines.latent2video import LatentToVideoPipeline


class MaskedLatentToVideoPipeline(LatentToVideoPipeline):
    """5-ch (mask) model → RGB video + per-frame RGBA decode."""

    def __init__(self, *args, unet384: Optional[UNet384] = None,
                 unet384_params=None, **kw):
        super().__init__(*args, **kw)
        self.unet384 = unet384
        self.unet384_params = unet384_params

    def __call__(self, *args, **kw):
        decode_rgba = kw.pop("decode_rgba", True)
        video, latents = super().__call__(*args, **kw)
        if not decode_rgba or self.unet384 is None or video is None:
            return video, latents, None
        rgba = decode_rgba_video(
            self.unet384, self.unet384_params,
            jnp.asarray(video), latents / self.vae.config.scaling_factor,
        )
        return video, latents, rgba


class ConcatLatentToVideoPipeline(MaskedLatentToVideoPipeline):
    """9-ch variant: condition latents concatenated on the channel axis each
    step (the UNet must be built with condition_mode='channel_concat')."""

    # The base class denoise already passes condition_latent through to the
    # unet; with condition_mode='channel_concat' the model concatenates it on
    # the channel axis instead of the frame axis — no loop changes needed.
    pass


def save_rgba_outputs(out_dir: str, rgba: np.ndarray, fps: int = 8) -> dict:
    """Write .gif + decoded_rgba.webp + decoded_alpha.webp (reference
    train_transparent_i2v_stage2.py:535-543)."""
    import os

    from PIL import Image

    from animate_anything_tpu.utils.media import save_gif

    os.makedirs(out_dir, exist_ok=True)
    rgba8 = np.clip(np.asarray(rgba[0]), 0, 255).astype(np.uint8)  # (f,h,w,4)
    paths = {}
    paths["gif"] = save_gif(os.path.join(out_dir, "decoded.gif"), rgba8[..., :3], fps=fps)
    frames = [Image.fromarray(fr, "RGBA") for fr in rgba8]
    paths["rgba"] = os.path.join(out_dir, "decoded_rgba.webp")
    frames[0].save(paths["rgba"], save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)
    alpha = [Image.fromarray(fr[..., 3], "L") for fr in rgba8]
    paths["alpha"] = os.path.join(out_dir, "decoded_alpha.webp")
    alpha[0].save(paths["alpha"], save_all=True, append_images=alpha[1:],
                  duration=int(1000 / fps), loop=0)
    return paths
