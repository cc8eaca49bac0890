#!/usr/bin/env python
"""Real-checkpoint import dry-run: point this at a diffusers-layout pipeline
directory (e.g. the reference's animate_anything_512_v1.02) and it reports —
without needing diffusers installed — exactly how the import would go:

  1. per-component key audit: unmatched source keys / missing model params /
     shape mismatches (utils/import_torch.py rename maps);
  2. per-layer weight-norm table (spot-check against `torch.norm` on the
     source side);
  3. a forward smoke: imported-weights UNet denoise step on tiny latents,
     finiteness + output-norm printout;
  4. optional golden-output gate: `--golden out.npz` (saved torch UNet output
     for the same seed/shapes) → masked-PSNR parity report, the acceptance
     gate from utils/import_torch.py:17-19.

Day-1 with weights is then a run, not a build:
    python scripts/import_dryrun.py /path/to/pipeline_dir [--golden ref.npz]

(VERDICT r1 next-step #10.)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flat(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat(v, f"{prefix}{k}."))
    else:
        out[prefix[:-1]] = tree
    return out


def audit(name: str, imported: dict, params: dict) -> dict:
    from animate_anything_tpu.utils.import_torch import align_to_params

    new, missing, unexpected = align_to_params(imported, params, strict=False)
    print(f"\n== {name} ==")
    print(f"  model leaves: {len(_flat(params.get('params', params)))}")
    print(f"  missing (model param not in checkpoint): {len(missing)}")
    for k in missing[:10]:
        print(f"    - {k}")
    print(f"  unexpected (checkpoint key unmapped):    {len(unexpected)}")
    for k in unexpected[:10]:
        print(f"    + {k}")
    # shape mismatches raise inside align_to_params; surviving means none
    flat = _flat(new["params"])
    rows = sorted(flat.items())
    print(f"  per-layer L2 norms (first/last 5 of {len(rows)}):")
    for k, v in rows[:5] + rows[-5:]:
        print(f"    {np.linalg.norm(np.asarray(v, np.float64)):12.4f}  {k}")
    return new


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("pipeline_dir")
    ap.add_argument("--golden", help="npz with {sample,cond,mask,ehs,motion,out} "
                                     "from the torch reference for PSNR parity")
    ap.add_argument("--skip-forward", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from animate_anything_tpu.models.factory import build_models
    from animate_anything_tpu.train.checkpoint import load_pipeline_components
    from animate_anything_tpu.utils.import_torch import (
        convert_clip_text,
        convert_unet3d,
        convert_vae,
    )

    comp = load_pipeline_components(args.pipeline_dir)
    print(f"components found in {args.pipeline_dir}: "
          f"{sorted(k for k in comp if not k.endswith('_config'))}")

    # build randomly-initialized models at the CHECKPOINT's architecture so
    # the audit runs against the real layer map
    models = build_models(
        args.pipeline_dir,
        motion_mask=True, motion_strength=True,
    )
    # build_models already imported; redo the audit verbosely per component
    raw = {}
    for name, conv in (("unet", convert_unet3d), ("vae", convert_vae),
                       ("text_encoder", convert_clip_text)):
        if name in comp:
            raw[name] = comp[name]

    params = {"unet": models["unet_params"], "vae": models["vae_params"],
              "text_encoder": models["text_params"]}
    for name in raw:
        audit(name, raw[name], params[name])

    if args.skip_forward:
        return 0

    print("\n== forward smoke (imported UNet, tiny latents) ==")
    rng = np.random.default_rng(0)
    b, f, hw = 1, 2, 16
    sample = jnp.asarray(rng.standard_normal((b, f, hw, hw, 4)), jnp.float32)
    cond = sample[:, :1]
    mask = jnp.ones((b, 1, hw, hw, 1))
    ehs = jnp.asarray(
        rng.standard_normal((b, 77, models["unet_config"].cross_attention_dim)),
        jnp.float32)
    motion = jnp.full((b,), 5.0)
    out = jax.jit(models["unet"].apply)(
        models["unet_params"], sample, jnp.asarray(500), ehs, cond, mask, motion)
    out = np.asarray(out)
    print(f"  out shape {out.shape}, norm {np.linalg.norm(out):.4f}, "
          f"finite={np.isfinite(out).all()}")
    if not np.isfinite(out).all():
        return 1

    if args.golden:
        g = np.load(args.golden)
        f_out = jax.jit(models["unet"].apply)(
            models["unet_params"],
            jnp.asarray(g["sample"]), jnp.asarray(int(g.get("t", 500))),
            jnp.asarray(g["ehs"]), jnp.asarray(g["cond"]),
            jnp.asarray(g["mask"]), jnp.asarray(g["motion"]))
        ref = np.asarray(g["out"])
        ours = np.asarray(f_out)
        mse = float(np.mean((ref - ours) ** 2))
        rng_pk = float(ref.max() - ref.min())
        psnr = 10 * np.log10(rng_pk**2 / max(mse, 1e-12))
        print(f"  golden parity: mse={mse:.3e} psnr={psnr:.2f} dB "
              f"(gate: >= 40 dB per utils/import_torch.py)")
        return 0 if psnr >= 40 else 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
