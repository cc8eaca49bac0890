"""animate_anything_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-diffusion
framework with the capabilities of alibaba/animate-anything.

Not a port: the reference (mounted at /root/reference, PyTorch/diffusers) defines
WHAT this framework does — mask+strength-conditioned image animation, SVD
finetuning, transparent RGBA video, LoRA, training + inference pipelines — while
the implementation here is designed TPU-first:

- models are flax.linen modules in channels-last (NHWC) layout with a
  frame-major ``(b*f, h, w, c)`` spatial batch, mapping convs/matmuls onto the MXU;
- attention runs through fused Pallas flash-attention kernels (``ops/``) with an
  XLA fallback;
- parallelism is a ``jax.sharding.Mesh`` with named axes (data/frame/tensor) and
  pjit-partitioned optimizer state (ZeRO-equivalent), not NCCL process groups;
- samplers/trainers are pure functions compiled once under ``jax.jit`` with
  ``lax.scan`` denoise loops.
"""

__version__ = "0.1.0"
