#!/usr/bin/env python
"""CLI-surface parity shim for the transparent RGBA stage-2 workload
(reference /root/reference/train_transparent_i2v_stage2.py:662-674)."""

from animate_anything_tpu.cli_stage2 import cli

if __name__ == "__main__":
    cli()
