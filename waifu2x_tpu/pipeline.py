"""End-to-end conversion pipeline (reference C4 + C5: main.cpp:82-169).

Orchestrates, per image:
  u8 BGR -> f32/255 -> (OpenCV-quirk) YUV -> [noise stack on Y]
         -> [2x-scale loop: nearest-2x Y -> stack; cubic-2x U/V] x ceil(log2 r)
         -> [final linear shrink if r is not the reached power of 2]
         -> YUV -> f32*255 saturate-cast u8 BGR

All math from f32-conversion to saturate-cast runs on device; the host only
decodes/encodes files. Each distinct image geometry compiles one XLA program
(static shapes); the tiled path keeps tile shapes constant regardless of
image size.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from waifu2x_tpu.config import Config
from waifu2x_tpu.models.srcnn import validate_params
from waifu2x_tpu.models.weights import load_model_json, model_file_for
from waifu2x_tpu.ops.color import (
    bgr_to_yuv,
    saturate_cast_u8,
    u8_to_unit_f32,
    yuv_to_bgr,
)
from waifu2x_tpu.ops.convstack import convert_plane
from waifu2x_tpu.ops.resize import CUBIC, LINEAR, NEAREST, resize
from waifu2x_tpu.parallel.tiles import plan_tiles, tiled_convert


def scale_plan(scale_ratio: float) -> tuple[int, float]:
    """(number of 2x iterations, final shrink ratio or 0.0) — replicates
    main.cpp:107-114 including the int-vs-double comparison quirk:
    shrink is skipped only when int(scale_ratio) == 2**iters exactly."""
    if scale_ratio <= 0:
        raise ValueError("scale_ratio must be positive")
    iters = max(0, math.ceil(math.log2(scale_ratio)))
    shrink = 0.0
    if int(scale_ratio) != 2 ** iters:
        shrink = scale_ratio / (2.0 ** iters)
    return iters, shrink


def _convert_y(y: jax.Array, params, cfg: Config) -> jax.Array:
    """Run the conv stack on one luma plane, choosing monolithic vs tiled by
    the reference's rule W*H > blockW*blockH*3/2 (convertRoutine.cpp:25-26).

    compute_dtype=bfloat16 runs the stack with bf16 activations/weights
    (f32 accumulation on the MXU): ~2x faster than f32-io and measured
    >=54 dB PSNR vs the f32 reference — above the 50 dB fidelity bar."""
    in_dtype = y.dtype
    if cfg.compute_dtype == "bfloat16":
        y = y.astype(jnp.bfloat16)
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    h, w = y.shape[-2], y.shape[-1]
    offset = sum(int(p["w"].shape[0]) // 2 for p in params)
    bs = cfg.block_size
    if y.ndim == 2 and bs > 0 and h * w > bs * bs * 3 // 2:
        plan = plan_tiles(h, w, cfg.tile_size, offset)
        out = tiled_convert(y, params, plan, batch_tiles=cfg.batch_tiles,
                            precision=cfg.precision)
    else:
        out = convert_plane(y, params, precision=cfg.precision)
    return out.astype(in_dtype)


@partial(jax.jit, static_argnames=("cfg",))
def _noise_phase(yuv: jax.Array, params, cfg: Config) -> jax.Array:
    y = _convert_y(yuv[:, :, 0], params, cfg)
    return yuv.at[:, :, 0].set(y)


@partial(jax.jit, static_argnames=("cfg",))
def _scale_step(yuv: jax.Array, params, cfg: Config) -> jax.Array:
    """One 2x scaling iteration (main.cpp:126-156): CNN input Y comes from a
    NEAREST 2x resize, U/V (and the container) from a CUBIC 2x resize."""
    h, w, _ = yuv.shape
    dsize = (h * 2, w * 2)
    y_in = resize(yuv[:, :, 0], dsize, NEAREST)
    out = resize(yuv, dsize, CUBIC)
    y_out = _convert_y(y_in, params, cfg)
    return out.at[:, :, 0].set(y_out)


@partial(jax.jit, static_argnames=("dsize",))
def _shrink(yuv: jax.Array, dsize: tuple[int, int]) -> jax.Array:
    return resize(yuv, dsize, LINEAR)


@partial(jax.jit, static_argnames=("cfg",))
def scale2x_batch(yuv: jax.Array, params, cfg: Config) -> jax.Array:
    """Batched 2x scale step for throughput mode (frame streams / image
    batches — BASELINE.json configs[3..4]).

    yuv: f32[N, H, W, 3] -> f32[N, 2H, 2W, 3]. Same math as _scale_step,
    vectorized over frames so the MXU sees [N, H, W, C] convolutions."""
    n, h, w, _ = yuv.shape
    dsize = (h * 2, w * 2)
    y_in = resize(yuv[..., 0], dsize, NEAREST, h_axis=1)
    out = resize(yuv, dsize, CUBIC, h_axis=1)
    y_out = _convert_y(y_in, params, cfg)
    return out.at[..., 0].set(y_out)


@partial(jax.jit, static_argnames=("cfg",))
def noise_batch(yuv: jax.Array, params, cfg: Config) -> jax.Array:
    """Batched denoise pass: f32[N, H, W, 3] -> same shape."""
    y = _convert_y(yuv[..., 0], params, cfg)
    return yuv.at[..., 0].set(y)


@jax.jit
def _to_yuv(bgr_u8: jax.Array) -> jax.Array:
    return bgr_to_yuv(u8_to_unit_f32(bgr_u8))


@jax.jit
def _to_bgr_u8(yuv: jax.Array) -> jax.Array:
    return saturate_cast_u8(yuv_to_bgr(yuv))


@dataclasses.dataclass
class Converter:
    """Loaded-models pipeline front end. Replaces the main() body of the
    reference (model resolution main.cpp:82-121 + the phase drivers)."""

    cfg: Config
    noise_params: tuple | None = None
    scale_params: tuple | None = None

    @classmethod
    def from_config(cls, cfg: Config) -> "Converter":
        noise_params = scale_params = None
        if cfg.mode in ("noise", "noise_scale"):
            noise_params = load_model_json(
                model_file_for(cfg.model_dir, True, cfg.noise_level))
        if cfg.mode in ("scale", "noise_scale"):
            scale_params = load_model_json(model_file_for(cfg.model_dir, False))
        return cls(cfg, noise_params, scale_params)

    def process_yuv(self, yuv: jax.Array) -> jax.Array:
        cfg = self.cfg
        if self.noise_params is not None:
            yuv = _noise_phase(yuv, self.noise_params, cfg)
        if self.scale_params is not None:
            iters, shrink = scale_plan(cfg.scale_ratio)
            for _ in range(iters):
                yuv = _scale_step(yuv, self.scale_params, cfg)
            if shrink != 0.0:
                h, w, _ = yuv.shape
                # int truncation as in main.cpp:160-165
                dsize = (int(h * shrink), int(w * shrink))
                yuv = _shrink(yuv, dsize)
        return yuv

    def process_bgr_u8(self, bgr_u8: np.ndarray) -> np.ndarray:
        """uint8 BGR in, uint8 BGR out — the whole main.cpp math path."""
        yuv = _to_yuv(jnp.asarray(bgr_u8))
        yuv = self.process_yuv(yuv)
        return np.asarray(_to_bgr_u8(yuv))

    def process_alpha(self, alpha_u8: np.ndarray) -> np.ndarray:
        """Opt-in alpha channel handling: plain bicubic resample of A at the
        final geometry (the option sketched in appendix/hints-jp.md:76-81;
        the reference CLI itself drops alpha)."""
        a = u8_to_unit_f32(jnp.asarray(alpha_u8))
        if self.scale_params is not None:
            iters, shrink = scale_plan(self.cfg.scale_ratio)
            for _ in range(iters):
                a = resize(a, (a.shape[0] * 2, a.shape[1] * 2), CUBIC)
            if shrink != 0.0:
                a = resize(a, (int(a.shape[0] * shrink),
                               int(a.shape[1] * shrink)), LINEAR)
        return np.asarray(saturate_cast_u8(a))


def convert_image(bgr_u8: np.ndarray, cfg: Config,
                  noise_params=None, scale_params=None) -> np.ndarray:
    """One-shot functional API (loads nothing; params passed explicitly)."""
    if cfg.mode not in ("noise", "noise_scale"):
        noise_params = None
    if cfg.mode not in ("scale", "noise_scale"):
        scale_params = None
    if noise_params is not None:
        validate_params(noise_params)
    if scale_params is not None:
        validate_params(scale_params)
    conv = Converter(cfg, noise_params, scale_params)
    return conv.process_bgr_u8(bgr_u8)
