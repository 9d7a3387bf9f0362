"""waifu2x_tpu — a TPU-native waifu2x engine.

A from-scratch JAX/XLA/Pallas framework with the full capabilities of the
reference C++ converter (WL-Amigo/waifu2x-converter-cpp): JPEG-artifact
denoising and arbitrary-ratio super-resolution of images via 7-layer 3x3
CNN inference on the luma plane, with block tiling, plus TPU-first
extensions the reference lacks: fused Pallas conv kernels, multi-device
sharded execution with halo exchange, batched throughput mode, and a JAX
training pipeline.

Package layout (reference components in parentheses, see SURVEY.md §2):
  models/    weight format + model spec          (C6, C7, C16)
  ops/       color, resize, conv stack, s2d,
             fused Pallas kernels                (C2, C5, C8, C9, C11)
  parallel/  tile planner, sharded mesh runners  (C12 + north-star scaling)
  train/     training pipeline + checkpointing   (C19)
  native.py  C++ host runtime bindings (codecs,
             thread pool, u8 interleave)         (C2 + C8's thread pool)
  stream.py  batch/video serving runtime         (configs[3..4])
  pipeline.py / cli.py / io.py                   (C1-C5, C10)
"""

__version__ = "0.1.0"

from waifu2x_tpu.config import Config  # noqa: F401
