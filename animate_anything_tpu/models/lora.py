"""LoRA: low-rank adaptation as a functional param-tree transform.

The reference carries two ~1700-LoC module-surgery backends
(`cloneofsimo` /root/reference/utils/lora.py, `stable_lora`
/root/reference/stable_lora/lora.py) plus a facade
(/root/reference/utils/lora_handler.py). On TPU the idiomatic design needs no
module surgery at all: LoRA weights live in their own pytree, and a pure
``merge`` folds W + (α/r)·BA into the base params inside the jitted step —
XLA fuses the rank-r matmul + add into the surrounding graph. One
implementation covers both backends' capabilities:

- inject by target filter (reference module-class names like
  'CrossAttention'/'Transformer2DModel' map to param-path patterns);
- zero-init up / scaled-normal down (cloneofsimo init, lora.py:33-237);
- conv kernels adapted via flattened (kh·kw·in, r)×(r, out) factors
  (stable_lora's conv handling, stable_lora/lora.py:69-197);
- train via optax on the LoRA tree only (base params stop-gradiented);
- save/load .safetensors with rank metadata (lora.py:569-777), keys in torch
  layout under diffusers names so webui-style consumers can ingest them;
- collapse_lora = permanent merge (lora.py:780-814); remove = drop the tree.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# reference module-class names (example yamls: unet_lora_modules /
# text_encoder_lora_modules) → param-path substring sets
_CLASS_NAME_PATTERNS = {
    "UNet3DConditionModel": ("",),                       # everything
    "CLIPTextModel": ("",),
    "CLIPEncoderLayer": ("layers_",),
    "CLIPAttention": ("q_proj", "k_proj", "v_proj", "out_proj"),
    "CrossAttention": ("attn1", "attn2"),
    "Attention": ("attn1", "attn2"),
    "Transformer2DModel": ("attentions_",),
    "TransformerTemporalModel": ("temp_attentions_", "transformer_in"),
    "ResnetBlock2D": ("resnets_",),
    "TemporalConvLayer": ("temp_convs_",),
    "GEGLU": ("net_0_proj",),
}


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    rank: int = 16
    alpha: Optional[float] = None        # defaults to rank (scale 1)
    targets: Tuple[str, ...] = ("CrossAttention",)
    include_convs: bool = False
    # train-time adapter dropout (reference lora_unet_dropout /
    # lora_text_dropout). The reference drops the down-projection's per-token
    # activations (utils/lora.py:33-110); the merged W+BA formulation cannot
    # express per-token dropout, so the analog here drops whole RANK
    # components per step (inverted scaling 1/(1-p)) — same regularization
    # target (the adapter), exactly zero at eval/merge time.
    dropout: float = 0.0

    @property
    def scale(self) -> float:
        return (self.alpha if self.alpha is not None else self.rank) / self.rank


def _patterns(cfg: LoraConfig) -> Tuple[str, ...]:
    pats: list[str] = []
    for t in cfg.targets:
        pats.extend(_CLASS_NAME_PATTERNS.get(t, (t,)))
    return tuple(pats)


def _path_str(path) -> str:
    return ".".join(str(getattr(k, "key", k)) for k in path)


def _is_target(path_s: str, leaf, cfg: LoraConfig) -> bool:
    if not path_s.endswith(".kernel"):
        return False
    if leaf.ndim == 2:
        pass
    elif leaf.ndim == 4 and cfg.include_convs:
        pass
    else:
        return False
    pats = _patterns(cfg)
    return any(p in path_s or p == "" for p in pats)


def init_lora_params(rng: jax.Array, params: Any, cfg: LoraConfig) -> Dict[str, Any]:
    """→ flat dict {param_path: {"down": (fan_in, r), "up": (r, fan_out)}}.

    down ~ N(0, 1/r), up = 0 (adapter starts as identity — cloneofsimo init).
    """
    tree = params.get("params", params)
    flat = jax.tree_util.tree_leaves_with_path(tree)
    lora: Dict[str, Any] = {}
    for path, leaf in flat:
        ps = _path_str(path)
        if not _is_target(ps, leaf, cfg):
            continue
        if leaf.ndim == 2:
            fan_in, fan_out = leaf.shape
        else:  # conv (kh, kw, in, out) → flattened input
            kh, kw, cin, fan_out = leaf.shape
            fan_in = kh * kw * cin
        rng, sub = jax.random.split(rng)
        lora[ps] = {
            "down": jax.random.normal(sub, (fan_in, cfg.rank), jnp.float32) / cfg.rank,
            "up": jnp.zeros((cfg.rank, fan_out), jnp.float32),
        }
    if not lora:
        raise ValueError(f"no LoRA targets matched {cfg.targets}")
    return lora


def merge_lora(params: Any, lora: Dict[str, Any], cfg: LoraConfig,
               scale: float = 1.0, stop_base_gradient: bool = True) -> Any:
    """W' = W + scale·(α/r)·(down@up), applied functionally (jit-safe).

    This is both the training-time composition (with stop_base_gradient) and
    ``collapse_lora`` (call once, keep result) — reference lora.py:780-814."""
    has_wrapper = "params" in params
    tree = params["params"] if has_wrapper else params
    s = scale * cfg.scale

    def visit(path, leaf):
        ps = _path_str(path)
        base = jax.lax.stop_gradient(leaf) if stop_base_gradient else leaf
        if ps not in lora:
            return base
        delta = (lora[ps]["down"] @ lora[ps]["up"]).astype(leaf.dtype)
        return base + s * delta.reshape(leaf.shape)

    new_tree = jax.tree_util.tree_map_with_path(visit, tree)
    return {"params": new_tree} if has_wrapper else new_tree


def dropout_lora(rng: jax.Array, lora: Dict[str, Any], cfg: LoraConfig) -> Dict[str, Any]:
    """Rank-component dropout for training steps (see LoraConfig.dropout).

    Each adapter independently keeps rank column r with prob 1-p; kept
    columns are scaled by 1/(1-p) so the merged delta is unbiased."""
    if not cfg.dropout:
        return lora
    keep_p = 1.0 - cfg.dropout
    out: Dict[str, Any] = {}
    for ps in sorted(lora):
        rng, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, keep_p, (cfg.rank,))
        m = keep.astype(jnp.float32) / keep_p
        out[ps] = {"down": lora[ps]["down"] * m[None, :], "up": lora[ps]["up"]}
    return out


# --------------------------------------------------------------------------
# Persistence: safetensors with rank metadata, torch-layout keys
# --------------------------------------------------------------------------

def save_lora(path: str, lora: Dict[str, Any], cfg: LoraConfig, prefix: str = "unet") -> str:
    from safetensors.numpy import save_file

    sd = {}
    for ps, ab in lora.items():
        base = f"{prefix}.{ps[: -len('.kernel')]}"
        # torch linear layout (out, in): down (r, fan_in), up (out, r).
        # ascontiguousarray is required: safetensors serializes the raw buffer
        # and ignores transposed strides.
        sd[f"{base}.lora_down.weight"] = np.ascontiguousarray(np.asarray(ab["down"]).T)
        sd[f"{base}.lora_up.weight"] = np.ascontiguousarray(np.asarray(ab["up"]).T)
    meta = {"rank": str(cfg.rank), "alpha": str(cfg.alpha or cfg.rank),
            "targets": json.dumps(list(cfg.targets)),
            "include_convs": str(cfg.include_convs)}
    save_file(sd, path, metadata=meta)
    return path


def load_lora(path: str, prefix: str = "unet") -> tuple[Dict[str, Any], LoraConfig]:
    from safetensors import safe_open

    lora: Dict[str, Any] = {}
    with safe_open(path, framework="np") as f:
        meta = f.metadata() or {}
        for key in f.keys():
            if not key.startswith(prefix + "."):
                continue
            stem = key[len(prefix) + 1:]
            if stem.endswith(".lora_down.weight"):
                ps = stem[: -len(".lora_down.weight")] + ".kernel"
                lora.setdefault(ps, {})["down"] = f.get_tensor(key).T
            elif stem.endswith(".lora_up.weight"):
                ps = stem[: -len(".lora_up.weight")] + ".kernel"
                lora.setdefault(ps, {})["up"] = f.get_tensor(key).T
    cfg = LoraConfig(
        rank=int(meta.get("rank", 16)),
        alpha=float(meta["alpha"]) if "alpha" in meta else None,
        targets=tuple(json.loads(meta.get("targets", '["CrossAttention"]'))),
        include_convs=meta.get("include_convs", "False") == "True",
    )
    return lora, cfg
