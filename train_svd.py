#!/usr/bin/env python
"""CLI-surface parity shim for the SVD workload (reference
/root/reference/train_svd.py:828-840)."""

from animate_anything_tpu.cli_svd import cli

if __name__ == "__main__":
    cli()
