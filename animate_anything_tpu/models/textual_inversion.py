"""Textual-inversion embedding loading.

Reference capability: ``utils/lora.py:1096-1152`` loads learned-token
embedding files (AUTOMATIC1111/``learned_embeds`` formats) into the CLIP text
encoder and registers placeholder tokens. Functional equivalent here: grow the
token-embedding matrix of our flax CLIPTextModel and wrap the tokenizer so the
placeholder maps to the new ids.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def load_embedding_file(path: str) -> Dict[str, np.ndarray]:
    """→ {token: (n_vectors, dim)} from .safetensors or torch .pt/.bin files
    (A1111 'string_to_param' and diffusers 'learned_embeds' layouts)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        data = dict(load_file(path))
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        if "string_to_param" in raw:  # A1111
            name = raw.get("name", "token")
            vecs = next(iter(raw["string_to_param"].values()))
            return {name: np.atleast_2d(np.asarray(vecs, np.float32))}
        data = {k: v.float().numpy() for k, v in raw.items() if hasattr(v, "numpy")}
    return {k: np.atleast_2d(np.asarray(v, np.float32)) for k, v in data.items()}


def inject_embeddings(
    text_params,
    tokenizer,
    embeddings: Dict[str, np.ndarray],
) -> Tuple[dict, "TokenizerWithPlaceholders", int]:
    """Append embedding rows to the token matrix; return (new_params,
    wrapped tokenizer that resolves placeholder tokens to the new ids,
    num_added). Rebuild the text model with vocab_size += num_added (flax
    validates the embed shape at apply time)."""
    import jax

    params = jax.device_get(text_params)
    table = np.asarray(params["params"]["token_embedding"]["embedding"])
    placeholder_ids: Dict[str, list[int]] = {}
    rows = [table]
    next_id = table.shape[0]
    for token, vecs in embeddings.items():
        if vecs.shape[1] != table.shape[1]:
            raise ValueError(
                f"embedding dim {vecs.shape[1]} != text model dim {table.shape[1]}"
            )
        placeholder_ids[token] = list(range(next_id, next_id + len(vecs)))
        rows.append(vecs.astype(table.dtype))
        next_id += len(vecs)
    new_table = np.concatenate(rows, axis=0)
    params["params"]["token_embedding"]["embedding"] = new_table
    num_added = new_table.shape[0] - table.shape[0]
    return params, TokenizerWithPlaceholders(tokenizer, placeholder_ids), num_added


class TokenizerWithPlaceholders:
    """Wraps any tokenizer; placeholder words expand to their learned ids."""

    def __init__(self, base, placeholder_ids: Dict[str, list[int]]):
        self._base = base
        self.placeholder_ids = placeholder_ids
        self.model_max_length = getattr(base, "model_max_length", 77)

    def __call__(self, text, **kw):
        texts = [text] if isinstance(text, str) else list(text)
        out = self._base(texts, **kw)
        ids = np.asarray(out.input_ids).copy()
        # splice placeholder ids in by re-tokenizing each prompt word-wise
        for bi, t in enumerate(texts):
            cursor = 1  # after BOS
            for word in t.split():
                if word in self.placeholder_ids:
                    for pid in self.placeholder_ids[word]:
                        if cursor < ids.shape[1] - 1:
                            ids[bi, cursor] = pid
                            cursor += 1
                else:
                    wids = np.asarray(
                        self._base(word, padding="max_length",
                                   max_length=self.model_max_length,
                                   truncation=True).input_ids
                    )[0]
                    bos, eos = wids[0], wids[-1]
                    n = int(((wids != bos) & (wids != eos)).sum()) or 1
                    cursor += n

        class _Out:
            input_ids = ids

        return _Out()
