#!/usr/bin/env python
"""CLI-surface parity shim for LoRA finetuning (reference
/root/reference/train_lora.py:974-986). The unified CLI handles LoRA when the
config sets ``use_unet_lora: True`` (models/lora.py covers both reference
backends' capabilities)."""

import sys

from animate_anything_tpu.cli import cli

if __name__ == "__main__":
    # train_lora.py implies LoRA unless the config explicitly disables it
    argv = sys.argv[1:]
    if not any(a.startswith("use_unet_lora=") for a in argv):
        argv = argv + ["use_unet_lora=true"]
    cli(argv)
