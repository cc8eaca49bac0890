"""Motion metrics: strength score, moved-area masks, precision, PSNR.

Same math as the reference's proxy quality metrics, without cv2:
- ``latent_motion_score`` — 10·Σ_c mean|Δ_t latents|
  (/root/reference/utils/common.py:296-300), here on (b,f,h,w,c) tensors;
- ``motion_mask_loss`` — frame-difference magnitude outside the mask
  (/root/reference/utils/common.py:302-305);
- ``get_moved_area_mask`` — frame differencing + dilation + bounding boxes of
  connected moved regions (/root/reference/utils/common.py:88-134, cv2
  replaced by scipy.ndimage);
- ``calculate_motion_precision`` — moved-pixels-inside-requested-mask
  (/root/reference/utils/common.py:136-141);
- ``calculate_motion_score`` — HSV mean-pixel-distance per frame pair ×10
  (/root/reference/utils/common.py:307-337), cv2 HSV convention (H∈[0,180]).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import ndimage


# --------------------------------------------------------------------------
# Latent-space metrics (jax, differentiable)
# --------------------------------------------------------------------------

def latent_motion_score(latents: jnp.ndarray) -> jnp.ndarray:
    """latents (b, f, h, w, c) → (b,). 10 · Σ_c mean_{f-1,h,w} |Δ_t|."""
    diff = jnp.abs(latents[:, 1:] - latents[:, :-1])
    return jnp.sum(jnp.mean(diff, axis=(1, 2, 3)), axis=-1) * 10.0


def motion_mask_loss(latents: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Penalize motion outside the mask. mask broadcastable, 1 = may move."""
    diff = jnp.abs(latents[:, 1:] - latents[:, :-1])
    return jnp.sum(jnp.mean(diff * (1.0 - mask), axis=(1, 2, 3)), axis=-1)


def masked_psnr(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray | None = None,
                max_val: float = 2.0) -> jnp.ndarray:
    """PSNR over masked region (the BASELINE parity gate metric).
    a, b in [-1,1] by default (max_val=2)."""
    if mask is None:
        mse = jnp.mean((a - b) ** 2)
    else:
        w = jnp.broadcast_to(mask, a.shape)
        mse = jnp.sum(w * (a - b) ** 2) / jnp.maximum(jnp.sum(w), 1.0)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


# --------------------------------------------------------------------------
# Pixel-space metrics (numpy, host-side)
# --------------------------------------------------------------------------

def _dilate(binary: np.ndarray, iterations: int, size: int = 3) -> np.ndarray:
    struct = np.ones((size, size), bool)
    return ndimage.binary_dilation(binary, structure=struct, iterations=iterations)


def get_moved_area_mask(
    frames: np.ndarray,
    move_th: float = 5.0,
    th: float = -1.0,
    use_native: bool = True,
) -> np.ndarray:
    """frames (f, h, w, 3) uint8 → mask (h, w) uint8 {0,255} of moved boxes.

    Pipeline (mirrors the reference's cv2 version): per-pair abs-diff vs first
    frame and vs previous frame, threshold, accumulate, dilate, then paint the
    bounding box of every connected component above an area threshold.

    Uses the native C++ kernel (native/motionkit.cpp) when built; this numpy
    path is the always-available fallback with identical output.
    """
    if use_native and frames.dtype == np.uint8:
        from animate_anything_tpu.data import native

        out = native.moved_area_mask(frames, move_th, int(th if th >= 0 else 0))
        if out is not None:
            return out
    f = frames.astype(np.int32)
    gray = f.mean(axis=-1)
    ref = gray[0]
    acc = np.zeros_like(ref, dtype=bool)
    prev = ref
    for i in range(1, len(gray)):
        cur = gray[i]
        moved = (np.abs(cur - ref) > move_th) | (np.abs(cur - prev) > move_th)
        acc |= moved
        prev = cur
    acc = _dilate(acc, iterations=2)
    labels, n = ndimage.label(acc)
    mask = np.zeros(ref.shape, np.uint8)
    area_th = th if th >= 0 else 0
    for sl in ndimage.find_objects(labels):
        if sl is None:
            continue
        h = sl[0].stop - sl[0].start
        w = sl[1].stop - sl[1].start
        if h * w <= area_th:
            continue
        mask[sl] = 255
    return mask


def calculate_motion_precision(frames: np.ndarray, mask: np.ndarray) -> float:
    """Fraction of actually-moved pixels that fall inside the requested mask."""
    moved = get_moved_area_mask(frames, move_th=20, th=0) == 255
    gt = mask == 255
    denom = moved.sum()
    if denom == 0:
        return 1.0
    return float((moved & gt).sum() / denom)


def _rgb_to_hsv_cv2(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cv2-convention HSV from uint8 RGB: H∈[0,180], S,V∈[0,255]."""
    rgb = img.astype(np.float32) / 255.0
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = rgb.max(-1)
    c = v - rgb.min(-1)
    s = np.where(v > 0, c / np.maximum(v, 1e-12), 0.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        h = np.select(
            [c == 0, v == r, v == g],
            [0.0,
             60.0 * ((g - b) / np.maximum(c, 1e-12)),
             120.0 + 60.0 * ((b - r) / np.maximum(c, 1e-12))],
            240.0 + 60.0 * ((r - g) / np.maximum(c, 1e-12)),
        )
    h = np.mod(h, 360.0) / 2.0
    return h.astype(np.float32), (s * 255).astype(np.float32), (v * 255).astype(np.float32)


def _mean_pixel_distance(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.abs(a.astype(np.float32) - b.astype(np.float32)).mean())


def calculate_motion_score(frames: np.ndarray, use_native: bool = True) -> int:
    """frames (f, h, w, 3) uint8 RGB → rounded 10× mean HSV pixel distance.

    Native C++ path when available (numpy fallback below is bit-compatible)."""
    if len(frames) < 2:
        return 0
    if use_native and np.asarray(frames).dtype == np.uint8:
        from animate_anything_tpu.data import native

        score = native.motion_score(np.asarray(frames))
        if score is not None:
            return score
    last = None
    score = 0.0
    for frame in frames:
        hsv = _rgb_to_hsv_cv2(frame)
        if last is not None:
            score += sum(_mean_pixel_distance(x, y) for x, y in zip(hsv, last)) / 3.0
        last = hsv
    return round(score / (len(frames) - 1) * 10)
