"""Model architecture spec for the waifu2x 7-layer SRCNN conv stack.

The architecture is fixed by the reference model files (see SURVEY.md C16;
reference: appendix/waifu2x-nocuda/lib/srcnn.lua:10-32):

    Conv 1->32 (3x3) -> LeakyReLU(0.1)
    Conv 32->32      -> LeakyReLU(0.1)
    Conv 32->64      -> LeakyReLU(0.1)
    Conv 64->64      -> LeakyReLU(0.1)
    Conv 64->128     -> LeakyReLU(0.1)
    Conv 128->128    -> LeakyReLU(0.1)
    Conv 128->1      -> LeakyReLU(0.1)   # applied after the LAST layer too
                                         # (reference: modelHandler.cpp:148-152)

Every conv is stride-1 correlation (no kernel flip — cv::filter2D semantics,
reference modelHandler.cpp:141-142). A valid (unpadded) pass shrinks each
spatial dim by 2 per layer, so the stack's total receptive radius ("offset")
is the number of layers: 7 (reference srcnn.lua:31 returns `model, 7`).

Parameters are a pytree: a tuple of per-layer dicts
    {"w": f32[kh, kw, cin, cout]  (HWIO), "b": f32[cout]}
This is the only parameter format used anywhere in the framework.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

LEAKY_SLOPE = 0.1  # reference: modelHandler.cpp:152 (scaleAdd 0.1)


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    cin: int
    cout: int
    ksize: int = 3


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """A conv-stack architecture: plane widths and kernel size per layer."""

    layers: tuple[LayerSpec, ...]

    @property
    def offset(self) -> int:
        """Total receptive radius = rows of context each output pixel needs.

        Reference: appendix/waifu2x-nocuda/lib/srcnn.lua:31 (offset=7 for the
        shipped models); used as the halo/pad width (convertRoutine.cpp:35).
        """
        return sum(l.ksize // 2 for l in self.layers)

    @property
    def n_layers(self) -> int:
        return len(self.layers)

    @property
    def max_channels(self) -> int:
        return max(max(l.cin, l.cout) for l in self.layers)

    @classmethod
    def from_widths(cls, widths: Sequence[int], ksize: int = 3) -> "ModelSpec":
        return cls(
            tuple(
                LayerSpec(cin, cout, ksize)
                for cin, cout in zip(widths[:-1], widths[1:])
            )
        )

    @classmethod
    def from_params(cls, params) -> "ModelSpec":
        return cls(
            tuple(
                LayerSpec(int(p["w"].shape[2]), int(p["w"].shape[3]),
                          int(p["w"].shape[0]))
                for p in params
            )
        )


# The one architecture the reference ships (noise1/noise2/scale2.0x all share
# it): plane widths 1->32->32->64->64->128->128->1 (srcnn.lua:13-25).
WAIFU2X_7LAYER = ModelSpec.from_widths([1, 32, 32, 64, 64, 128, 128, 1])


def init_params(key: jax.Array, spec: ModelSpec = WAIFU2X_7LAYER,
                dtype=jnp.float32):
    """He-normal initialised parameters for training / synthetic tests.

    (The reference is inference-only and always loads trained JSON weights;
    this exists for the JAX training pipeline and for tests, since the
    reference repo's model blobs are git-LFS-missing.)
    """
    params = []
    for layer in spec.layers:
        key, wk = jax.random.split(key)
        fan_in = layer.ksize * layer.ksize * layer.cin
        w = jax.random.normal(
            wk, (layer.ksize, layer.ksize, layer.cin, layer.cout), dtype
        ) * jnp.sqrt(2.0 / fan_in).astype(dtype)
        b = jnp.zeros((layer.cout,), dtype)
        params.append({"w": w, "b": b})
    return tuple(params)


def validate_params(params, spec: ModelSpec | None = None) -> ModelSpec:
    """Shape-check a parameter pytree; mirrors the reference loader's
    validation (modelHandler.hpp:48-71 requires kW == kH; filter() checks the
    plane chain at modelHandler.cpp:29-35). Returns the inferred ModelSpec."""
    if len(params) == 0:
        raise ValueError("empty model: no conv layers")
    prev_cout = None
    for i, p in enumerate(params):
        w, b = p["w"], p["b"]
        if w.ndim != 4:
            raise ValueError(f"layer {i}: weight must be [kh,kw,cin,cout], "
                             f"got shape {w.shape}")
        kh, kw, cin, cout = w.shape
        if kh != kw:
            raise ValueError(f"layer {i}: kernel must be square (kW==kH), "
                             f"got {kh}x{kw}")
        if kh % 2 != 1:
            raise ValueError(f"layer {i}: kernel size must be odd, got {kh}")
        if b.shape != (cout,):
            raise ValueError(f"layer {i}: bias shape {b.shape} != ({cout},)")
        if prev_cout is not None and cin != prev_cout:
            raise ValueError(f"layer {i}: cin={cin} does not chain from "
                             f"previous layer's cout={prev_cout}")
        prev_cout = cout
    if int(params[0]["w"].shape[2]) != 1:
        raise ValueError("first layer must take 1 input plane (luma)")
    if prev_cout != 1:
        raise ValueError("last layer must emit 1 output plane (luma)")
    inferred = ModelSpec.from_params(params)
    if spec is not None and inferred != spec:
        raise ValueError(f"params do not match spec: {inferred} != {spec}")
    return inferred


def params_astype(params, dtype):
    return jax.tree.map(lambda x: x.astype(dtype), params)


def count_maccs_per_pixel(spec: ModelSpec = WAIFU2X_7LAYER) -> int:
    """Multiply-accumulates per output pixel of the stack; the 32,672-passes
    figure in SURVEY.md §6 times k*k (appendix/waifu2x-commented.py:38)."""
    return sum(l.cin * l.cout * l.ksize * l.ksize for l in spec.layers)


def as_numpy(params):
    return [
        {"w": np.asarray(p["w"], np.float32), "b": np.asarray(p["b"], np.float32)}
        for p in params
    ]
