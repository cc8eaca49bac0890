#!/usr/bin/env python
"""CLI-surface parity shim: ``python train.py --config X.yaml [--eval] k.v=x``
(same invocation as the reference /root/reference/train.py:859-871)."""

from animate_anything_tpu.cli import cli

if __name__ == "__main__":
    cli()
