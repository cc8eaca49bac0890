"""LaMa large-mask inpainting (Fourier convolutions) — watermark removal.

Capability parity with the reference's offline watermark-removal tool
(/root/reference/utils/lama.py, the big-lama generator of Suvorov et al.,
arXiv 2109.07161): an FFC (fast Fourier convolution) generator that inpaints
masked regions, used to scrub watermarks from training videos.

TPU-native design: NHWC layout end-to-end; the Fourier unit is
``jnp.fft.rfft2`` over (h, w) → 1×1 conv on stacked real/imag channels →
``irfft2``, which XLA runs on-device; BatchNorm is inference-mode (running
stats — the published checkpoint is eval-only here, as in the reference).
``import_lama_torch_state`` maps the published ``best.ckpt`` generator
state dict onto this module (OIHW→HWIO transposes, ConvTranspose spatial
flip); no downloading is built in (zero-egress environments) — pass a local
checkpoint path.

Architecture constants follow the published big-lama config the reference
hardcodes (lama.py:258-301): ngf=64, 3 downsamplings, 18 FFC resnet blocks
at ratio 0.75, reflect padding, sigmoid output.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return x
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


class _BN(nn.Module):
    """Inference-mode BatchNorm over NHWC channels (running stats as params,
    so the torch importer can fill them; the tool is eval-only, matching the
    reference's torch.inference_mode usage)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv + bias


class _ConvTranspose2x(nn.Module):
    """torch-exact ConvTranspose2d(k=3, s=2, p=1, output_padding=1) as an
    input-dilated conv (padding (k-1-p, k-1-p+op)), kernel stored pre-flipped
    in HWIO — verified bit-exact vs torch."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, in_ch, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1, 1),
            padding=((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b


class FourierUnit(nn.Module):
    """rfft2 → 1×1 conv on (real‖imag) channels → BN → ReLU → irfft2
    (reference lama.py:54-91)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        f = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        f = jnp.concatenate([f.real, f.imag], axis=-1)          # (n, h, w/2+1, 2c)
        f = nn.Conv(self.out_channels * 2, (1, 1), use_bias=False, name="conv")(f)
        f = nn.relu(_BN(self.out_channels * 2, name="bn")(f))
        re, im = jnp.split(f, 2, axis=-1)
        out = jnp.fft.irfft2(jax.lax.complex(re, im), s=(h, w), axes=(1, 2), norm="ortho")
        return out.astype(x.dtype)


class SpectralTransform(nn.Module):
    """(optional 2× avgpool) → 1×1 conv/BN/ReLU → FourierUnit → residual 1×1
    conv (reference lama.py:93-115)."""

    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        if self.stride == 2:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = nn.Conv(self.out_channels // 2, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(_BN(self.out_channels // 2, name="bn1")(h))
        fu = FourierUnit(self.out_channels // 2, name="fu")(h)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv2")(h + fu)


class FFC(nn.Module):
    """Fast Fourier convolution: local/global channel split with four paths
    l2l, l2g, g2l (spatial convs) and g2g (spectral transform)
    (reference lama.py:118-187)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    ratio_gin: float = 0.0
    ratio_gout: float = 0.0
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x: Tuple[Any, Any]):
        x_l, x_g = x if isinstance(x, tuple) else (x, None)
        in_cg = int(self.in_channels * self.ratio_gin)
        in_cl = self.in_channels - in_cg
        out_cg = int(self.out_channels * self.ratio_gout)
        out_cl = self.out_channels - out_cg

        def conv(name, out_ch):
            return nn.Conv(out_ch, (self.kernel_size, self.kernel_size),
                           strides=(self.stride, self.stride), padding="VALID",
                           use_bias=False, name=name)

        def pad(t):
            return _reflect_pad(t, self.padding)

        out_l = out_g = None
        if out_cl and in_cl:
            out_l = conv("convl2l", out_cl)(pad(x_l))
        if out_cl and in_cg:
            g2l = conv("convg2l", out_cl)(pad(x_g))
            out_l = g2l if out_l is None else out_l + g2l
        if out_cg and in_cl:
            out_g = conv("convl2g", out_cg)(pad(x_l))
        if out_cg and in_cg:
            g2g = SpectralTransform(out_cg, stride=self.stride, name="convg2g")(x_g)
            out_g = g2g if out_g is None else out_g + g2g
        return out_l, out_g


class FFCBnAct(nn.Module):
    """FFC → per-branch BN → ReLU (reference FFC_BN_ACT, lama.py:190-226)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    ratio_gin: float = 0.0
    ratio_gout: float = 0.0
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        out_cg = int(self.out_channels * self.ratio_gout)
        out_cl = self.out_channels - out_cg
        x_l, x_g = FFC(self.in_channels, self.out_channels, self.kernel_size,
                       self.ratio_gin, self.ratio_gout, self.stride,
                       self.padding, name="ffc")(x)
        if x_l is not None:
            x_l = nn.relu(_BN(out_cl, name="bn_l")(x_l))
        if x_g is not None:
            x_g = nn.relu(_BN(out_cg, name="bn_g")(x_g))
        return x_l, x_g


class FFCResnetBlock(nn.Module):
    """Two FFC_BN_ACT convs with a split residual (reference lama.py:228-245)."""

    dim: int
    ratio: float = 0.75

    @nn.compact
    def __call__(self, x):
        x_l, x_g = x
        h_l, h_g = FFCBnAct(self.dim, self.dim, 3, self.ratio, self.ratio,
                            padding=1, name="conv1")((x_l, x_g))
        h_l, h_g = FFCBnAct(self.dim, self.dim, 3, self.ratio, self.ratio,
                            padding=1, name="conv2")((h_l, h_g))
        return x_l + h_l, x_g + h_g


@dataclasses.dataclass(frozen=True)
class LamaConfig:
    input_nc: int = 4
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 18
    max_features: int = 1024


class LargeMaskInpainting(nn.Module):
    """big-lama generator (reference lama.py:258-309). Input NHWC in [0,1]."""

    cfg: LamaConfig = LamaConfig()

    @nn.compact
    def __call__(self, img: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """img (n, h, w, 3) in [0,1]; mask (n, h, w, 1) ∈ {0,1}; returns the
        blended inpainting mask*pred + (1-mask)*img."""
        c = self.cfg
        masked = img * (1.0 - mask)
        x = jnp.concatenate([masked, mask], axis=-1)

        idx = 0
        x = _reflect_pad(x, 3)
        x = FFCBnAct(c.input_nc, c.ngf, 7, name=f"model_{idx}")((x, None)); idx += 1

        for i in range(c.n_downsampling):
            mult = 2 ** i
            gout = 0.75 if i == c.n_downsampling - 1 else 0.0
            x = FFCBnAct(min(c.max_features, c.ngf * mult),
                         min(c.max_features, c.ngf * mult * 2), 3,
                         ratio_gout=gout, stride=2, padding=1,
                         name=f"model_{idx}")(x); idx += 1

        dim = min(c.max_features, c.ngf * 2 ** c.n_downsampling)
        for _ in range(c.n_blocks):
            x = FFCResnetBlock(dim, name=f"model_{idx}")(x); idx += 1

        x_l, x_g = x
        h = x_l if x_g is None else jnp.concatenate([x_l, x_g], axis=-1)

        for i in range(c.n_downsampling):
            mult = 2 ** (c.n_downsampling - i)
            out_ch = min(c.max_features, c.ngf * mult // 2)
            h = _ConvTranspose2x(out_ch, name=f"up_{i}_conv")(h)
            h = nn.relu(_BN(out_ch, name=f"up_{i}_bn")(h))

        h = _reflect_pad(h, 3)
        h = nn.Conv(c.output_nc, (7, 7), padding="VALID", name="conv_out")(h)
        pred = nn.sigmoid(h)
        return mask * pred + (1.0 - mask) * img


# -- torch checkpoint import --------------------------------------------------

def _bn_tree(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def _conv_kernel(sd, key):
    return {"kernel": np.asarray(sd[key]).transpose(2, 3, 1, 0)}  # OIHW→HWIO


def _fourier_perm(c2: int) -> np.ndarray:
    """torch FourierUnit channels are interleaved (c0_re, c0_im, c1_re, ...);
    ours are grouped (re..., im...). perm[grouped] = interleaved index."""
    c = c2 // 2
    return np.asarray([ci * 2 + ri for ri in (0, 1) for ci in range(c)])


def _fourier_unit(sd, p):
    w = np.asarray(sd[f"{p}.conv_layer.weight"])      # (out2, in2, 1, 1)
    pi, po = _fourier_perm(w.shape[1]), _fourier_perm(w.shape[0])
    w = w[po][:, pi]
    bn = _bn_tree(sd, f"{p}.bn")
    bn = {k: v[po] for k, v in bn.items()}
    return {"conv": {"kernel": w.transpose(2, 3, 1, 0)}, "bn": bn}


def _spectral(sd, p):
    return {
        "conv1": _conv_kernel(sd, f"{p}.conv1.0.weight"),
        "bn1": _bn_tree(sd, f"{p}.conv1.1"),
        "fu": _fourier_unit(sd, f"{p}.fu"),
        "conv2": _conv_kernel(sd, f"{p}.conv2.weight"),
    }


def _ffc(sd, p):
    out = {}
    for name in ("convl2l", "convl2g", "convg2l"):
        if f"{p}.{name}.weight" in sd:
            out[name] = _conv_kernel(sd, f"{p}.{name}.weight")
    if f"{p}.convg2g.conv1.0.weight" in sd:
        out["convg2g"] = _spectral(sd, f"{p}.convg2g")
    return out


def _ffc_bn_act(sd, p):
    out = {"ffc": _ffc(sd, f"{p}.ffc")}
    if f"{p}.bn_l.weight" in sd:
        out["bn_l"] = _bn_tree(sd, f"{p}.bn_l")
    if f"{p}.bn_g.weight" in sd:
        out["bn_g"] = _bn_tree(sd, f"{p}.bn_g")
    return out


def import_lama_torch_state(state_dict, cfg: LamaConfig = LamaConfig()):
    """Map the published big-lama generator state dict (torch, 'model.N.*'
    Sequential keys, reference lama.py:304-330 loading) onto this module's
    param tree."""
    sd = {k: v for k, v in state_dict.items()}
    params = {}
    idx = 0
    params[f"model_{idx}"] = _ffc_bn_act(sd, f"model.{idx + 1}")  # after pad layer
    seq = idx + 2  # torch Sequential: 0 pad, 1 first FFC_BN_ACT
    idx += 1
    for _ in range(cfg.n_downsampling):
        params[f"model_{idx}"] = _ffc_bn_act(sd, f"model.{seq}")
        idx += 1; seq += 1
    for _ in range(cfg.n_blocks):
        params[f"model_{idx}"] = {
            "conv1": _ffc_bn_act(sd, f"model.{seq}.conv1"),
            "conv2": _ffc_bn_act(sd, f"model.{seq}.conv2"),
        }
        idx += 1; seq += 1
    seq += 1  # ConcatTupleLayer
    for i in range(cfg.n_downsampling):
        w = np.asarray(sd[f"model.{seq}.weight"])  # (in, out, kh, kw)
        # torch ConvTranspose applies the flipped kernel; flax ConvTranspose
        # correlates — flip spatially and swap in/out to HWIO
        k = w.transpose(2, 3, 0, 1)[::-1, ::-1]
        params[f"up_{i}_conv"] = {"kernel": np.ascontiguousarray(k),
                                  "bias": np.asarray(sd[f"model.{seq}.bias"])}
        params[f"up_{i}_bn"] = _bn_tree(sd, f"model.{seq + 1}")
        seq += 3  # convtranspose, bn, relu
    seq += 1  # reflection pad
    params["conv_out"] = {
        "kernel": np.asarray(sd[f"model.{seq}.weight"]).transpose(2, 3, 1, 0),
        "bias": np.asarray(sd[f"model.{seq}.bias"]),
    }
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}


def inpaint_video(frames: np.ndarray, mask: np.ndarray, params,
                  model: Optional[LargeMaskInpainting] = None,
                  chunk: int = 8) -> np.ndarray:
    """Inpaint a (f, h, w, 3) uint8 video with a (h, w) {0,255} mask
    (reference inpaint_watermark, lama.py:313-330)."""
    model = model or LargeMaskInpainting()
    imgs = frames.astype(np.float32) / 255.0
    m = (np.asarray(mask, np.float32) / 255.0 >= 0.5).astype(np.float32)
    m = m[None, :, :, None]
    fwd = jax.jit(model.apply)
    outs = []
    # offline host-side tool (like the reference's): run on the CPU backend —
    # the remote-TPU platform lacks FFT support and videos stream from disk
    try:
        cpu = jax.local_devices(backend="cpu")[0]
        ctx = jax.default_device(cpu)
    except Exception:  # pragma: no cover - cpu backend always present in jax
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        for i in range(0, imgs.shape[0], chunk):
            batch = jnp.asarray(imgs[i:i + chunk])
            mm = jnp.broadcast_to(jnp.asarray(m), (batch.shape[0],) + m.shape[1:])
            outs.append(np.asarray(fwd(params, batch, mm)))
    out = np.concatenate(outs, axis=0)
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def _main():  # pragma: no cover - thin CLI
    """python -m animate_anything_tpu.models.lama <video> <mask.png> <ckpt>
    — offline watermark removal (reference: python -m utils.lama <video>,
    lama.py:333-355; the mask and checkpoint are explicit args here since
    nothing can be downloaded in zero-egress environments)."""
    import argparse

    from animate_anything_tpu.utils.media import load_video_frames, save_video

    ap = argparse.ArgumentParser(description=_main.__doc__)
    ap.add_argument("video")
    ap.add_argument("mask", help="grayscale png; white = region to inpaint")
    ap.add_argument("checkpoint", help="big-lama best.ckpt (torch)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import torch
    from PIL import Image

    state = torch.load(args.checkpoint, map_location="cpu")
    state = state.get("state_dict", state)
    gen = {k.replace("generator.", ""): v.numpy()
           for k, v in state.items() if k.startswith("generator.")}
    params = import_lama_torch_state(gen)

    frames = load_video_frames(args.video)  # (f, h, w, 3) uint8
    mask = np.asarray(Image.open(args.mask).convert("L"))
    out = inpaint_video(frames, mask, params)
    dst = args.out or (args.video.rsplit(".", 1)[0] + "_inpainted.mp4")
    print(save_video(dst, out))  # save_video returns the real path (gif fallback)


if __name__ == "__main__":  # pragma: no cover
    _main()
