"""diffusers/torch checkpoint → flax pytree weight importer.

The TPU analog of the reference's format converter
(/root/reference/utils/convert_diffusers_to_original_ms_text_to_video.py),
pointed the other way: it ingests the reference's *diffusers-layout* pipeline
directories (unet/, vae/, text_encoder/ with .safetensors or .bin weights) and
emits our flax param trees, so reference checkpoints
(animate_anything_512_v1.02 etc., README.md:54-56) run unmodified on TPU.

Tensor layout rules (torch → flax, channels-last):
- conv2d  (O,I,kh,kw)   → (kh,kw,I,O)
- conv3d  (O,I,kt,1,1)  → (kt,1,I,O)    [pseudo-3D temporal convs]
- linear  (O,I)         → (I,O)
- norm weight           → scale
- embeddings            → unchanged (V,D)

Every import reports unmatched source keys and missing target leaves —
loading a real checkpoint is the acceptance gate for naming fidelity.
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, Dict

import numpy as np


# --------------------------------------------------------------------------
# State-dict loading
# --------------------------------------------------------------------------

def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch state dict from a file or a diffusers model directory."""
    if os.path.isdir(path):
        for name in (
            "diffusion_pytorch_model.safetensors",
            "model.safetensors",
            "diffusion_pytorch_model.bin",
            "pytorch_model.bin",
        ):
            p = os.path.join(path, name)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(f"no weight file found in {path}")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


# --------------------------------------------------------------------------
# Generic conversion machinery
# --------------------------------------------------------------------------

_LIST_ATTRS = (
    "down_blocks|up_blocks|resnets|attentions|temp_attentions|temp_convs|"
    "transformer_blocks|downsamplers|upsamplers|layers|motion_modules"
)


def _flatten_lists(key: str) -> str:
    """'down_blocks.0.resnets.1.x' → 'down_blocks_0.resnets_1.x'."""
    return re.sub(rf"\b({_LIST_ATTRS})\.(\d+)", r"\1_\2", key)


def _set_leaf(tree: dict, parts: list[str], value: np.ndarray) -> None:
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _convert_tensor(key: str, w: np.ndarray) -> tuple[str, np.ndarray]:
    """Map the trailing param name and transpose to flax layout."""
    if key.endswith(".weight"):
        base = key[: -len(".weight")]
        if w.ndim == 4:                      # conv2d
            return base + ".kernel", w.transpose(2, 3, 1, 0)
        if w.ndim == 5:                      # conv3d (kt,1,1) temporal
            if w.shape[-1] != 1 or w.shape[-2] != 1:
                raise ValueError(f"unexpected conv3d kernel {w.shape} at {key}")
            return base + ".kernel", w[:, :, :, :, 0].transpose(2, 3, 1, 0)
        if w.ndim == 2:
            if base.split(".")[-1] in ("token_embedding", "position_embedding"):  # nn.Embed
                return base + ".embedding", w
            return base + ".kernel", w.T     # linear
        if w.ndim == 1:                      # norm scale
            return base + ".scale", w
    return key, w


def convert_generic(
    sd: Dict[str, np.ndarray],
    rename: Callable[[str], str | None],
) -> Dict[str, Any]:
    """Apply per-key rename (None → drop), tensor conversion, and nest."""
    tree: Dict[str, Any] = {}
    unused = []
    for key, w in sd.items():
        new = rename(key)
        if new is None:
            unused.append(key)
            continue
        new, w = _convert_tensor(new, w)
        _set_leaf(tree, new.split("."), np.asarray(w))
    return tree


# --------------------------------------------------------------------------
# Model-specific renames
# --------------------------------------------------------------------------

def _rename_unet3d(key: str) -> str | None:
    # drop params the forward pass never uses (ref defines-but-skips the
    # motion_embedding MLP, unet_3d_condition_mask.py:162-167)
    if key.startswith(("motion_embedding.", "motion_proj.")):
        return None
    if ".to_out.1." in key:  # attention dropout — no params in flax
        return None
    key = _flatten_lists(key)
    # TemporalConvLayer Sequential indices → named norms/convs
    key = re.sub(r"\.conv(\d)\.0\.(weight|bias)", r".norm\1.\2", key)
    key = re.sub(r"\.conv(\d)\.(?:2|3)\.(weight|bias)", r".conv\1.\2", key)
    key = key.replace(".to_out.0.", ".to_out_0.")
    key = key.replace(".ff.net.0.proj.", ".ff.net_0_proj.")
    key = key.replace(".ff.net.2.", ".ff.net_2.")
    return key


def convert_unet3d(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return convert_generic(sd, _rename_unet3d)


def _rename_vae(key: str) -> str | None:
    # flat single-level names on our side (Encoder/Decoder are single modules)
    key = re.sub(r"\.(down|up)_blocks\.(\d+)\.resnets\.(\d+)\.", r".\1_blocks_\2_resnets_\3.", key)
    key = re.sub(r"\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.", r".down_blocks_\1_downsample.", key)
    key = re.sub(r"\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.", r".up_blocks_\1_upsample.", key)
    key = re.sub(r"\.mid_block\.resnets\.(\d+)\.", r".mid_resnets_\1.", key)
    key = key.replace(".mid_block.attentions.0.", ".mid_attn.")
    # legacy VAE attention naming
    key = key.replace(".mid_attn.query.", ".mid_attn.to_q.")
    key = key.replace(".mid_attn.key.", ".mid_attn.to_k.")
    key = key.replace(".mid_attn.value.", ".mid_attn.to_v.")
    key = key.replace(".mid_attn.proj_attn.", ".mid_attn.to_out_0.")
    key = key.replace(".mid_attn.to_out.0.", ".mid_attn.to_out_0.")
    # our resnet shortcut name matches diffusers conv_shortcut; legacy nin_shortcut
    key = key.replace(".nin_shortcut.", ".conv_shortcut.")
    return key


def convert_vae(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree = convert_generic(sd, _rename_vae)
    # VAE attention projections may be stored as 1x1 convs in legacy ckpts →
    # flatten to dense kernels
    for enc in ("encoder", "decoder"):
        attn = tree.get(enc, {}).get("mid_attn")
        if not attn:
            continue
        for proj in ("to_q", "to_k", "to_v", "to_out_0"):
            k = attn.get(proj, {}).get("kernel")
            if k is not None and k.ndim == 4:
                attn[proj]["kernel"] = k[0, 0]
    return tree


def _rename_svd_unet(key: str) -> str | None:
    """diffusers UNetSpatioTemporalConditionModel → models/svd_unet.py names.

    Our SVD module uses flat block names (down_blocks_0_resnets_0) holding
    {spatial_res_block, temporal_res_block, time_mixer} submodules that match
    diffusers' attribute names 1:1; temporal conv3d kernels go through the
    rank-5 layout rule."""
    if ".to_out.1." in key:
        return None
    key = re.sub(r"^(down|up)_blocks\.(\d+)\.(resnets|attentions)\.(\d+)\.",
                 r"\1_blocks_\2_\3_\4.", key)
    key = re.sub(r"^down_blocks\.(\d+)\.downsamplers\.0\.conv\.", r"down_blocks_\1_downsample.conv.", key)
    key = re.sub(r"^up_blocks\.(\d+)\.upsamplers\.0\.conv\.", r"up_blocks_\1_upsample.conv.", key)
    key = re.sub(r"^mid_block\.resnets\.(\d+)\.", r"mid_resnets_\1.", key)
    key = re.sub(r"^mid_block\.attentions\.(\d+)\.", r"mid_attentions_\1.", key)
    key = _flatten_lists(key)  # transformer_blocks.N → transformer_blocks_N etc.
    key = re.sub(r"\btemporal_transformer_blocks\.(\d+)", r"temporal_transformer_blocks_\1", key)
    # diffusers has ONE time_mixer per spatio-temporal transformer; ours is
    # per-layer (layer 0 in SVD). Resnet time_mixers keep their name.
    if "_attentions_" in key or key.startswith("mid_attentions"):
        key = key.replace(".time_mixer.", ".time_mixer_0.")
    key = key.replace(".to_out.0.", ".to_out_0.")
    key = re.sub(r"\.(ff|ff_in)\.net\.0\.proj\.", r".\1.net_0_proj.", key)
    key = re.sub(r"\.(ff|ff_in)\.net\.2\.", r".\1.net_2.", key)
    return key


def convert_svd_unet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return convert_generic(sd, _rename_svd_unet)


def _rename_clip_vision(key: str) -> str | None:
    if key in ("vision_model.embeddings.position_ids",):
        return None
    key = key.replace("vision_model.", "")
    key = key.replace("embeddings.class_embedding", "class_embedding")
    key = key.replace("embeddings.patch_embedding.", "patch_embedding.")
    key = key.replace("embeddings.position_embedding.", "position_embedding.")
    key = _flatten_lists(key)
    key = key.replace("encoder.layers_", "layers_")
    key = key.replace(".self_attn.", ".")
    key = key.replace(".mlp.", ".")
    return key


def convert_clip_vision(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree = convert_generic(sd, _rename_clip_vision)
    # class_embedding is a bare param (1D), keep name as-is
    return tree


def _rename_clip_text(key: str) -> str | None:
    if key in ("text_model.embeddings.position_ids", "position_ids"):
        return None
    if key.startswith(("text_projection", "logit_scale", "visual_projection")):
        return None
    key = key.replace("text_model.", "")
    key = _flatten_lists(key)
    key = key.replace("embeddings.token_embedding.", "token_embedding.")
    key = key.replace("embeddings.position_embedding.", "position_embedding.")
    key = key.replace("encoder.layers_", "layers_")
    key = key.replace(".self_attn.", ".")
    key = key.replace(".mlp.", ".")
    return key


def convert_clip_text(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return convert_generic(sd, _rename_clip_text)


def _rename_unet384(key: str) -> str | None:
    """LayerDiffuse UNet384 (torch, /root/reference/models/layerdiffuse_VAE.py:44,
    saved as vae_alpha_decoder.pth at train_transparent_i2v_stage2.py:119-128)
    → models/transparent_vae.py::UNet384 names."""
    if ".to_out.1." in key:
        return None
    key = re.sub(r"^(down|up)_blocks\.(\d+)\.(resnets|attentions)\.(\d+)\.",
                 r"\1_blocks_\2_\3_\4.", key)
    key = re.sub(r"^down_blocks\.(\d+)\.downsamplers\.0\.conv\.",
                 r"down_blocks_\1_downsample.conv.", key)
    key = re.sub(r"^up_blocks\.(\d+)\.upsamplers\.0\.conv\.",
                 r"up_blocks_\1_upsample.conv.", key)
    key = re.sub(r"^mid_block\.resnets\.(\d+)\.", r"mid_resnets_\1.", key)
    key = key.replace("mid_block.attentions.0.", "mid_attn.")
    key = key.replace(".to_out.0.", ".to_out_0.")
    return key


def convert_unet384(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return convert_generic(sd, _rename_unet384)


def convert_offset_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """LatentTransparencyOffsetEncoder torch Sequential (blocks.N.weight,
    vae_alpha_encoder.pth) → flax blocks_N names (conv-only; SiLU layers
    hold no params)."""
    return convert_generic(
        sd, lambda k: re.sub(r"^blocks\.(\d+)\.", r"blocks_\1.", k))


# --------------------------------------------------------------------------
# Validation against a flax params tree
# --------------------------------------------------------------------------

def _flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_tree(v, f"{prefix}{k}." if prefix or True else k))
    else:
        out[prefix[:-1]] = tree
    return out


def align_to_params(
    imported: Dict[str, Any],
    params: Dict[str, Any],
    strict: bool = True,
) -> tuple[Dict[str, Any], list[str], list[str]]:
    """Fit an imported tree into the structure of ``params['params']``.

    Returns (new_params, missing_keys, unexpected_keys). With strict=True any
    mismatch raises.
    """
    import jax

    target = params["params"] if "params" in params else params
    flat_t = _flatten_tree(target)
    flat_i = _flatten_tree(imported)
    missing = sorted(set(flat_t) - set(flat_i))
    unexpected = sorted(set(flat_i) - set(flat_t))
    if strict and (missing or unexpected):
        raise ValueError(
            f"import mismatch: missing={missing[:10]}({len(missing)}), "
            f"unexpected={unexpected[:10]}({len(unexpected)})"
        )
    new_flat = {}
    for k, v in flat_t.items():
        if k in flat_i:
            src = flat_i[k]
            if src.shape != v.shape:
                raise ValueError(f"shape mismatch at {k}: ckpt {src.shape} vs model {v.shape}")
            new_flat[k] = src.astype(np.asarray(v).dtype)
        else:
            new_flat[k] = v
    new_tree: Dict[str, Any] = {}
    for k, v in new_flat.items():
        _set_leaf(new_tree, k.split("."), v)
    result = {"params": jax.tree_util.tree_map(lambda x: x, new_tree)}
    return result, missing, unexpected


# --------------------------------------------------------------------------
# Export (flax → diffusers-layout torch state dict)
# --------------------------------------------------------------------------
# Needed for save_pipe parity: the reference writes full diffusers pipeline
# directories every checkpoint (/root/reference/train.py:269-308); exporting
# in the same layout keeps our checkpoints loadable by the reference stack.

def _unflatten_lists(key: str) -> str:
    return re.sub(rf"\b({_LIST_ATTRS})_(\d+)", r"\1.\2", key)


def _export_tensor(key: str, w: np.ndarray, temporal: bool) -> tuple[str, np.ndarray]:
    if key.endswith(".kernel"):
        base = key[: -len(".kernel")]
        if w.ndim == 4 and temporal:          # (kt,1,I,O) → (O,I,kt,1,1)
            return base + ".weight", w.transpose(3, 2, 0, 1)[..., None]
        if w.ndim == 4:                       # (kh,kw,I,O) → (O,I,kh,kw)
            return base + ".weight", w.transpose(3, 2, 0, 1)
        if w.ndim == 2:
            return base + ".weight", w.T
    if key.endswith(".embedding"):
        return key[: -len(".embedding")] + ".weight", w
    if key.endswith(".scale"):
        return key[: -len(".scale")] + ".weight", w
    return key, w


def export_unet3d(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    tree = params.get("params", params)
    out = {}
    for key, w in _flatten_tree(tree).items():
        temporal = "temp_convs" in key
        k = _unflatten_lists(key)
        if temporal:
            k = re.sub(r"\.norm(\d)\.", r".conv\1.0.", k)
            k = re.sub(r"\.conv1\.(kernel|bias)$", r".conv1.2.\1", k)
            k = re.sub(r"\.conv([234])\.(kernel|bias)$", r".conv\1.3.\2", k)
        k = k.replace(".to_out_0.", ".to_out.0.")
        k = k.replace(".ff.net_0_proj.", ".ff.net.0.proj.")
        k = k.replace(".ff.net_2.", ".ff.net.2.")
        k, w = _export_tensor(k, np.asarray(w), temporal)
        out[k] = w
    return out


def export_svd_unet(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    tree = params.get("params", params)
    out = {}
    for key, w in _flatten_tree(tree).items():
        temporal = ".temporal_res_block." in "." + key
        k = re.sub(r"^(down|up)_blocks_(\d+)_(resnets|attentions)_(\d+)\.",
                   r"\1_blocks.\2.\3.\4.", key)
        k = re.sub(r"^down_blocks_(\d+)_downsample\.conv\.", r"down_blocks.\1.downsamplers.0.conv.", k)
        k = re.sub(r"^up_blocks_(\d+)_upsample\.conv\.", r"up_blocks.\1.upsamplers.0.conv.", k)
        k = re.sub(r"^mid_resnets_(\d+)\.", r"mid_block.resnets.\1.", k)
        k = re.sub(r"^mid_attentions_(\d+)\.", r"mid_block.attentions.\1.", k)
        k = re.sub(r"\btransformer_blocks_(\d+)\b", r"transformer_blocks.\1", k)
        k = re.sub(r"\btemporal_transformer_blocks_(\d+)\b", r"temporal_transformer_blocks.\1", k)
        k = re.sub(r"\btime_mixer_(\d+)\b", r"time_mixer", k)
        k = k.replace(".to_out_0.", ".to_out.0.")
        k = re.sub(r"\.(ff|ff_in)\.net_0_proj\.", r".\1.net.0.proj.", k)
        k = re.sub(r"\.(ff|ff_in)\.net_2\.", r".\1.net.2.", k)
        k, w = _export_tensor(k, np.asarray(w), temporal)
        out[k] = w
    return out


def export_clip_text(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    tree = params.get("params", params)
    out = {}
    for key, w in _flatten_tree(tree).items():
        k = _unflatten_lists(key)
        k = re.sub(r"^layers\.", "encoder.layers.", k)
        k = re.sub(r"\.([qkv]_proj|out_proj)\.", r".self_attn.\1.", k)
        k = k.replace(".fc1.", ".mlp.fc1.").replace(".fc2.", ".mlp.fc2.")
        if k.startswith(("token_embedding.", "position_embedding.")):
            k = "embeddings." + k
        k, w = _export_tensor(k, np.asarray(w), False)
        out["text_model." + k] = w
    return out


def export_vae(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    tree = params.get("params", params)
    out = {}
    for key, w in _flatten_tree(tree).items():
        k = re.sub(r"\.(down|up)_blocks_(\d+)_resnets_(\d+)\.", r".\1_blocks.\2.resnets.\3.", key)
        k = re.sub(r"\.down_blocks_(\d+)_downsample\.", r".down_blocks.\1.downsamplers.0.conv.", k)
        k = re.sub(r"\.up_blocks_(\d+)_upsample\.", r".up_blocks.\1.upsamplers.0.conv.", k)
        k = re.sub(r"\.mid_resnets_(\d+)\.", r".mid_block.resnets.\1.", k)
        k = k.replace(".mid_attn.to_out_0.", ".mid_block.attentions.0.to_out.0.")
        k = k.replace(".mid_attn.", ".mid_block.attentions.0.")
        k, w = _export_tensor(k, np.asarray(w), False)
        out[k] = w
    return out


def expand_conv_in_channels(kernel: np.ndarray, new_in: int) -> np.ndarray:
    """conv_in surgery: zero-init extra input channels, keep old weights
    (reference /root/reference/train.py:91-102). kernel (kh,kw,in,out)."""
    kh, kw, old_in, out = kernel.shape
    if new_in <= old_in:
        return kernel[:, :, :new_in]
    pad = np.zeros((kh, kw, new_in - old_in, out), kernel.dtype)
    return np.concatenate([kernel, pad], axis=2)
