"""Host-side media IO: images, gifs, mp4s, masks.

Replaces the reference's imageio/cv2/labelme plumbing
(/root/reference/train.py:731-787, /root/reference/utils/common.py:202-249)
with PIL/imageio-based equivalents (this image has no cv2/ffmpeg; mp4 export
is gated on an available imageio backend and falls back to gif).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
from PIL import Image, ImageDraw


def load_image(path: str, size: tuple[int, int] | None = None) -> np.ndarray:
    """→ (h, w, 3) uint8 RGB. RGBA is alpha-composited onto white
    (matching the reference's RGBA→RGB handling, train.py:738-741)."""
    img = Image.open(path)
    if img.mode == "RGBA":
        bg = Image.new("RGBA", img.size, (255, 255, 255, 255))
        img = Image.alpha_composite(bg, img)
    img = img.convert("RGB")
    if size is not None:
        img = img.resize((size[1], size[0]), Image.LANCZOS)
    return np.asarray(img)


def save_image(path: str, arr: np.ndarray) -> str:
    Image.fromarray(np.asarray(arr)).save(path)
    return path


def fit_image_to_area(path: str, target_h: int, target_w: int,
                      multiple: int = 8) -> np.ndarray:
    """Load an image rescaled so its NATIVE aspect fits the target AREA, with
    each side snapped to `multiple` (reference eval sizing: train.py:741-744
    snaps to 8, train_svd.py:739-742 to block_size=64)."""
    with Image.open(path) as im:
        nw, nh = im.size
    scale = float(np.sqrt(nw * nh / (target_h * target_w)))
    th = max(multiple, round(nh / scale / multiple) * multiple)
    tw = max(multiple, round(nw / scale / multiple) * multiple)
    return load_image(path, size=(th, tw))


def load_image_rgba(path: str, size: tuple[int, int] | None = None) -> np.ndarray:
    img = Image.open(path).convert("RGBA")
    if size is not None:
        img = img.resize((size[1], size[0]), Image.LANCZOS)
    return np.asarray(img)


def snap_resolution(h: int, w: int, multiple: int = 8, preserve_area: bool = True) -> tuple[int, int]:
    """Snap H/W to a multiple of 8 approximately preserving area
    (reference train.py:742-744)."""
    if preserve_area:
        area = h * w
        aspect = h / w
        new_h = int(round((area * aspect) ** 0.5 / multiple) * multiple)
        new_w = int(round((area / aspect) ** 0.5 / multiple) * multiple)
        return max(new_h, multiple), max(new_w, multiple)
    return (h // multiple) * multiple, (w // multiple) * multiple


def to_uint8(video: np.ndarray) -> np.ndarray:
    """[-1, 1] float video → uint8."""
    return np.clip((np.asarray(video, np.float32) + 1.0) * 127.5, 0, 255).astype(np.uint8)


def save_gif(path: str, frames: np.ndarray | Sequence[np.ndarray], fps: int = 8) -> str:
    frames = [Image.fromarray(np.asarray(f)) for f in frames]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames[0].save(
        path, save_all=True, append_images=frames[1:],
        duration=int(1000 / fps), loop=0,
    )
    return path


def save_video(path: str, frames: np.ndarray, fps: int = 8) -> str:
    """mp4 if an imageio ffmpeg backend exists, else .gif fallback."""
    if path.endswith(".mp4"):
        try:
            import imageio.v3 as iio

            iio.imwrite(path, np.asarray(frames), fps=fps, extension=".mp4")
            return path
        except Exception:
            path = path[:-4] + ".gif"
            if os.path.exists(path):
                # caller already wrote the gif (mp4 was requested as a
                # sidecar) — don't re-encode the identical file
                return path
    return save_gif(path, frames, fps=fps)


def load_video_frames(path: str, max_frames: int | None = None) -> np.ndarray:
    """Read frames from gif/webp/mp4 (backend permitting) → (f, h, w, 3)."""
    try:
        import imageio.v3 as iio

        frames = iio.imread(path, index=None)
    except Exception as e:  # pragma: no cover - backend dependent
        raise RuntimeError(
            f"no decoder available for {path}; this image lacks ffmpeg — "
            "use gif/webp/png-sequence datasets or precomputed latents"
        ) from e
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[None]
    if frames.shape[-1] == 4:
        frames = frames[..., :3]
    if max_frames is not None:
        frames = frames[:max_frames]
    return frames


def read_labelme_mask(path: str, shape: tuple[int, int] | None = None) -> np.ndarray:
    """labelme JSON → (h, w) uint8 {0,255} polygon mask
    (reference ``read_mask`` /root/reference/utils/common.py:237-249)."""
    with open(path) as f:
        data = json.load(f)
    h = data.get("imageHeight") or (shape and shape[0])
    w = data.get("imageWidth") or (shape and shape[1])
    img = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(img)
    for sh in data.get("shapes", []):
        pts = [tuple(p) for p in sh["points"]]
        if sh.get("shape_type", "polygon") == "rectangle":
            draw.rectangle([pts[0], pts[1]], fill=255)
        else:
            draw.polygon(pts, fill=255)
    mask = np.asarray(img)
    if shape is not None and mask.shape != tuple(shape):
        mask = np.asarray(Image.fromarray(mask).resize((shape[1], shape[0]), Image.NEAREST))
    return mask


def generate_random_mask(h: int, w: int, rng: np.random.Generator | None = None) -> np.ndarray:
    """Random rectangle mask (reference generate_random_mask,
    /root/reference/utils/common.py:202-220)."""
    rng = rng or np.random.default_rng()
    mh = int(rng.integers(h // 4, 3 * h // 4))
    mw = int(rng.integers(w // 4, 3 * w // 4))
    top = int(rng.integers(0, h - mh))
    left = int(rng.integers(0, w - mw))
    mask = np.zeros((h, w), np.uint8)
    mask[top : top + mh, left : left + mw] = 255
    return mask


def generate_center_mask(h: int, w: int, frac: float = 0.5) -> np.ndarray:
    mask = np.zeros((h, w), np.uint8)
    mh, mw = int(h * frac), int(w * frac)
    top, left = (h - mh) // 2, (w - mw) // 2
    mask[top : top + mh, left : left + mw] = 255
    return mask


def slerp(a: np.ndarray, b: np.ndarray, t: float, eps: float = 1e-7) -> np.ndarray:
    """Spherical interpolation between latents (reference common.py:252+)."""
    a_n = a / max(np.linalg.norm(a.ravel()), eps)
    b_n = b / max(np.linalg.norm(b.ravel()), eps)
    dot = float(np.clip((a_n.ravel() @ b_n.ravel()), -1.0, 1.0))
    if abs(dot) > 1 - eps:
        return (1 - t) * a + t * b
    theta = np.arccos(dot)
    return (np.sin((1 - t) * theta) * a + np.sin(t * theta) * b) / np.sin(theta)
