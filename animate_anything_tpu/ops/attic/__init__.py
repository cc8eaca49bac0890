"""Attic: dormant kernels kept as measured negative results.

Every kernel here is real, tested, and was benchmarked on a v5e chip against
the XLA path at production shapes — and LOST or tied (measurements in
docs/KERNELS.md). They are kept opt-in for future revisits on different
hardware generations, but live outside the hot ``ops/`` surface so the
default import path and the fast test tier carry only live-path kernels:

- ``conv3x3``: fused GN+SiLU+3x3 conv, im2col + 9-tap forms — XLA's conv
  emitter wins at every UNet geometry;
- ``spatial_conv``: second attempt (whole-sample VMEM residency, row-window
  dots) — VMEM-infeasible beyond L0, and loses at L0 (4.24 vs 4.02 ms);
  opt-in via AA_SPATIAL_CONV=1 through models/layers.ResnetBlock2D.
"""
