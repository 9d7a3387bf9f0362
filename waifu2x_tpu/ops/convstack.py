"""The 7-layer conv stack — XLA path (reference-exact semantics).

Replaces the reference's per-plane cv::filter2D hot loop and its std::thread
output-channel fan-out (modelHandler.cpp:26-159) with a single fused
multi-channel convolution chain that XLA tiles onto the MXU. See
ops/pallas_stack.py for the hand-written Pallas kernel used on the perf path.

Semantics replicated exactly (SURVEY.md C8/C9/C11):
  * correlation, not convolution — cv::filter2D does NOT flip the kernel
    (modelHandler.cpp:141-142); `lax.conv_general_dilated` is also
    correlation, so weights pass through unflipped.
  * bias add then LeakyReLU(0.1) after EVERY layer including the last
    (modelHandler.cpp:147-152; appendix/waifu2x-commented.py:67).
  * border handling: the reference pads the input plane by `offset` (=7)
    pixels BORDER_REPLICATE up front (convertRoutine.cpp:35-36), runs each
    layer same-size with BORDER_REPLICATE, and crops `offset` off
    (convertRoutine.cpp:40-46). Because each same-size replicate-border layer
    only corrupts a 1-px rim of the already-padded frame per layer, the
    cropped interior is IDENTICAL to running `offset`-edge-padding followed
    by 7 *valid* convolutions. We implement the valid formulation — it does
    strictly less work and maps to static shapes. tests/test_convstack.py
    proves equality against a NumPy oracle that mirrors the reference's
    same-size/replicate scheme literally.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from waifu2x_tpu.models.srcnn import LEAKY_SLOPE


def leaky_relu(x: jax.Array, slope: float = LEAKY_SLOPE) -> jax.Array:
    """max(x,0) + slope*min(x,0) — exact form of modelHandler.cpp:148-152."""
    return jnp.maximum(x, 0) + slope * jnp.minimum(x, 0)


def _precision(name: str | None):
    if name is None:
        return lax.Precision.HIGHEST
    return {
        "default": lax.Precision.DEFAULT,
        "high": lax.Precision.HIGH,
        "highest": lax.Precision.HIGHEST,
    }[name]


@partial(jax.jit, static_argnames=("precision",))
def conv_stack_valid(x: jax.Array, params, precision: str | None = None):
    """Run the full conv stack with VALID padding.

    Args:
      x: f32[N, H, W, 1] input luma planes, already edge-padded by the
         model's offset (7 for the shipped architecture).
      params: tuple of {"w": [kh,kw,cin,cout], "b": [cout]}.
      precision: "default" | "high" | "highest" (None = highest). TPU
        f32 matmul passes: default=bf16, high=bf16x3, highest=bf16x6.

    Returns: f32[N, H - 2*offset, W - 2*offset, 1].
    """
    prec = _precision(precision)
    for p in params:
        x = lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=prec,
        )
        x = leaky_relu(x + p["b"].astype(x.dtype))
    return x


def convert_plane(y: jax.Array, params, precision: str | None = None):
    """Monolithic (non-tiled) plane conversion: replicate-pad by the model
    offset, run the stack, return a same-size plane.

    This is the reference's convertWithModels non-split path
    (convertRoutine.cpp:31-48). y: f32[H, W] or f32[N, H, W].
    """
    offset = sum(int(p["w"].shape[0]) // 2 for p in params)
    squeeze_batch = y.ndim == 2
    if squeeze_batch:
        y = y[None]
    yp = jnp.pad(y, ((0, 0), (offset, offset), (offset, offset)), mode="edge")
    out = conv_stack_valid(yp[..., None], params, precision=precision)[..., 0]
    return out[0] if squeeze_batch else out
