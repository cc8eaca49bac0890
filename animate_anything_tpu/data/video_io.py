"""Host-side video reading + frame sampling.

Replaces the reference's decord dependency (/root/reference/utils/dataset.py:2)
with a backend-agnostic reader: gif/webp/apng via PIL, mp4/webm via imageio
when a plugin exists (this image ships none — datasets of gif/webp/image
sequences and cached latents are the supported paths), and directories of
numbered frames.

Frame sampling matches ``get_frame_batch`` (/root/reference/utils/dataset.py:92-105):
stride = round(native_fps / sample_fps); if too few frames, linspace over the
whole clip; take the LAST max_frames window.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


class VideoReader:
    """Uniform access to frames of a clip: len(), fps, get_batch(indices)."""

    def __init__(self, path: str):
        self.path = path
        self._frames: np.ndarray | None = None
        self._fps = 8.0
        ext = os.path.splitext(path)[1].lower()
        if os.path.isdir(path):
            self._files = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
            )
            if not self._files:
                raise FileNotFoundError(f"no frames in {path}")
            self._n = len(self._files)
        elif ext in (".gif", ".webp", ".apng", ".png"):
            img = Image.open(path)
            self._n = getattr(img, "n_frames", 1)
            dur = img.info.get("duration") or 125
            self._fps = 1000.0 / max(float(dur), 1.0)
            self._pil = img
            self._files = None
        else:
            from animate_anything_tpu.utils.media import load_video_frames

            self._frames = load_video_frames(path)
            self._n = len(self._frames)
            self._files = None

    def __len__(self) -> int:
        return self._n

    @property
    def fps(self) -> float:
        return self._fps

    def get_batch(self, indices) -> np.ndarray:
        if self._frames is not None:
            return self._frames[np.asarray(indices)]
        if self._files is not None:
            out = []
            for i in indices:
                out.append(np.asarray(Image.open(self._files[int(i)]).convert("RGB")))
            return np.stack(out)
        out = []
        for i in indices:
            self._pil.seek(int(i))
            out.append(np.asarray(self._pil.convert("RGB")))
        return np.stack(out)


def sample_frame_indices(n_total: int, max_frames: int, native_fps: float, sample_fps: float) -> np.ndarray:
    step = max(1, round(native_fps / max(sample_fps, 1e-6)))
    rng = np.arange(0, n_total, step)
    if len(rng) < max_frames:
        rng = np.linspace(0, n_total - 1, max_frames).astype(int)
    start = max(0, len(rng) - max_frames)
    return np.asarray(rng[start : start + max_frames])


def resize_center_crop(frames: np.ndarray, height: int, width: int) -> np.ndarray:
    """T.Resize(min side) + CenterCrop equivalent (reference transform,
    dataset.py:151-155), PIL-based, uint8 in/out."""
    out = []
    for fr in frames:
        img = Image.fromarray(fr)
        w0, h0 = img.size
        scale = max(height / h0, width / w0)
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        img = img.resize((nw, nh), Image.BILINEAR)
        top, left = (nh - height) // 2, (nw - width) // 2
        img = img.crop((left, top, left + width, top + height))
        out.append(np.asarray(img))
    return np.stack(out)


def read_video_clip(
    path: str,
    num_frames: int,
    height: int,
    width: int,
    sample_fps: float = 8.0,
    use_bucketing: bool = False,
) -> np.ndarray:
    """→ (f, h, w, 3) uint8, fps-resampled, resized+center-cropped."""
    vr = VideoReader(path)
    idx = sample_frame_indices(len(vr), num_frames, vr.fps, sample_fps)
    frames = vr.get_batch(idx)
    if use_bucketing:
        from animate_anything_tpu.data.bucketing import sensible_buckets

        width, height = sensible_buckets(width, height, frames.shape[2], frames.shape[1])
    return resize_center_crop(frames, height, width)


def normalize_input(frames: np.ndarray) -> np.ndarray:
    """uint8 → float32 in [-1, 1] (reference normalize_input, dataset.py:23-42
    simple-norm branch)."""
    return frames.astype(np.float32) / 127.5 - 1.0
