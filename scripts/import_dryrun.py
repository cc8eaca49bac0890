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


def audit(name: str, imported: dict, param_shapes: dict) -> int:
    """Non-raising key/shape audit: imported (converted checkpoint tree) vs
    the model's param SHAPES (from jax.eval_shape — no init cost). Unlike
    align_to_params it never raises, so the report always prints even for
    exactly the broken checkpoints this tool exists to triage. Returns the
    number of problems found."""
    target = param_shapes.get("params", param_shapes)
    flat_t = _flat(target)
    flat_i = _flat(imported)
    missing = sorted(set(flat_t) - set(flat_i))
    unexpected = sorted(set(flat_i) - set(flat_t))
    mismatched = sorted(
        k for k in set(flat_t) & set(flat_i)
        if tuple(flat_i[k].shape) != tuple(flat_t[k].shape)
    )
    print(f"\n== {name} ==")
    print(f"  model leaves: {len(flat_t)}")
    print(f"  missing (model param not in checkpoint): {len(missing)}")
    for k in missing[:10]:
        print(f"    - {k}")
    print(f"  unexpected (checkpoint key unmapped):    {len(unexpected)}")
    for k in unexpected[:10]:
        print(f"    + {k}")
    print(f"  shape mismatches:                        {len(mismatched)}")
    for k in mismatched[:10]:
        print(f"    ! {k}: ckpt {tuple(flat_i[k].shape)} vs model {tuple(flat_t[k].shape)}")
    rows = sorted((k, v) for k, v in flat_i.items() if k in flat_t)
    print(f"  per-layer L2 norms of matched checkpoint leaves "
          f"(first/last 5 of {len(rows)}):")
    for k, v in rows[:5] + rows[-5:]:
        print(f"    {np.linalg.norm(np.asarray(v, np.float64)):12.4f}  {k}")
    return len(missing) + len(unexpected) + len(mismatched)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("pipeline_dir")
    ap.add_argument("--golden", help="npz with {sample,cond,mask,ehs,motion,out} "
                                     "from the torch reference for PSNR parity")
    ap.add_argument("--skip-forward", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from animate_anything_tpu.models import UNet3DConditionModel
    from animate_anything_tpu.models.clip_text import CLIPTextModel
    from animate_anything_tpu.models.vae import AutoencoderKL
    from animate_anything_tpu.models.factory import (
        _unet_example_args,
        build_models,
        clip_config_from_json,
        unet_config_from_json,
        vae_config_from_json,
    )
    from animate_anything_tpu.train.checkpoint import load_pipeline_components

    comp = load_pipeline_components(args.pipeline_dir)
    print(f"components found in {args.pipeline_dir}: "
          f"{sorted(k for k in comp if not k.endswith('_config'))}")

    # --- 1. key/shape audit FIRST, against param shapes at the CHECKPOINT's
    # architecture (jax.eval_shape — no init, and no strict import that could
    # crash before the report prints)
    problems = 0
    ucfg_json = comp.get("unet_config", {})
    # real diffusers checkpoints don't carry the motion flags (they're
    # code-level in the reference) → default True for the flagship model;
    # our own exports DO carry them → respect the checkpoint
    motion_ov = {k: True for k in ("motion_mask", "motion_strength")
                 if k not in ucfg_json}
    if "unet" in comp:
        ucfg = unet_config_from_json(ucfg_json, **motion_ov)
        unet = UNet3DConditionModel(ucfg)
        shapes = jax.eval_shape(
            unet.init, jax.random.PRNGKey(0), *_unet_example_args(ucfg, jnp.float32))
        problems += audit("unet", comp["unet"], shapes)
    if "vae" in comp:
        vae = AutoencoderKL(vae_config_from_json(comp.get("vae_config", {})))
        shapes = jax.eval_shape(
            vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        problems += audit("vae", comp["vae"], shapes)
    if "text_encoder" in comp:
        text = CLIPTextModel(clip_config_from_json(comp.get("text_config", {})))
        shapes = jax.eval_shape(
            text.init, jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
        problems += audit("text_encoder", comp["text_encoder"], shapes)

    if args.skip_forward:
        return 1 if problems else 0

    # --- 2. forward smoke via the real import path, guarded so the audit
    # report above survives a crashing checkpoint
    print("\n== forward smoke (imported UNet, tiny latents) ==")
    try:
        models = build_models(args.pipeline_dir, **{
            k: bool(ucfg_json.get(k, True))
            for k in ("motion_mask", "motion_strength")})
    except Exception as e:
        print(f"  build_models FAILED: {type(e).__name__}: {e}")
        return 1
    mcfg = models["unet_config"]
    rng = np.random.default_rng(0)
    b, f, hw = 1, 2, 16
    sample = jnp.asarray(
        rng.standard_normal((b, f, hw, hw, mcfg.in_channels)), jnp.float32)
    cond = sample[:, :1]
    mask = jnp.ones((b, 1, hw, hw, 1)) if mcfg.motion_mask else None
    ehs = jnp.asarray(
        rng.standard_normal((b, 77, mcfg.cross_attention_dim)), jnp.float32)
    motion = jnp.full((b,), 5.0) if mcfg.motion_strength else None
    try:
        out = np.asarray(jax.jit(models["unet"].apply)(
            models["unet_params"], sample, jnp.asarray(500), ehs, cond, mask,
            motion))
    except Exception as e:
        print(f"  forward FAILED: {type(e).__name__}: {e}")
        return 1
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
