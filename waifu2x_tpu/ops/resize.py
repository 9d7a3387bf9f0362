"""Image resize — OpenCV-semantics (INTER_NEAREST / INTER_LINEAR / INTER_CUBIC)
implemented as separable gather + weighted-sum in JAX.

The reference uses exactly three interpolation modes (SURVEY.md C5):
  * INTER_NEAREST 2x  — CNN input for each doubling step (main.cpp:136)
  * INTER_CUBIC 2x    — U/V channels + output container     (main.cpp:145)
  * INTER_LINEAR      — final non-power-of-2 shrink         (main.cpp:166)

OpenCV's coordinate mapping (resize.cpp):
  nearest: src_x = floor(dst_x * scale),             scale = src/dst
  linear/cubic: src_x = (dst_x + 0.5) * scale - 0.5, 4 (cubic) or 2 taps,
  sample indices clamped to the valid range (replicate-border semantics),
  cubic kernel is the a = -0.75 Keys filter.

Weights/indices are computed host-side (static shapes under jit); the gather
and weighted reduction run on device. Each axis is resampled independently
(OpenCV's resize is separable for these filters). Exactness vs cv2 is
asserted in tests/test_resize.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

NEAREST = "nearest"
LINEAR = "linear"
CUBIC = "cubic"


def _cubic_weights(frac: np.ndarray) -> np.ndarray:
    """OpenCV interpolateCubic: Keys bicubic with A=-0.75; frac in [0,1);
    returns 4 taps for samples at offsets (-1, 0, 1, 2) from the base."""
    A = np.float32(-0.75)
    x = frac.astype(np.float32)
    w = np.empty(x.shape + (4,), np.float32)
    w[..., 0] = ((A * (x + 1) - 5 * A) * (x + 1) + 8 * A) * (x + 1) - 4 * A
    w[..., 1] = ((A + 2) * x - (A + 3)) * x * x + 1
    w[..., 2] = ((A + 2) * (1 - x) - (A + 3)) * (1 - x) * (1 - x) + 1
    w[..., 3] = 1.0 - w[..., 0] - w[..., 1] - w[..., 2]
    return w


def _axis_plan(dst: int, src: int, interpolation: str):
    """Host-side tap plan for one axis -> (indices [dst, taps] i32,
    weights [dst, taps] f32)."""
    scale = src / dst
    dx = np.arange(dst, dtype=np.float64)
    if interpolation == NEAREST:
        # OpenCV INTER_NEAREST: floor(dst_x * scale), clamped
        idx = np.floor(dx * scale).astype(np.int64)
        idx = np.clip(idx, 0, src - 1)
        return idx[:, None].astype(np.int32), np.ones((dst, 1), np.float32)

    fx = (dx + 0.5) * scale - 0.5
    base = np.floor(fx).astype(np.int64)
    frac = (fx - base).astype(np.float32)
    if interpolation == LINEAR:
        offs = np.array([0, 1])
        w = np.stack([1.0 - frac, frac], axis=-1).astype(np.float32)
    elif interpolation == CUBIC:
        offs = np.array([-1, 0, 1, 2])
        w = _cubic_weights(frac)
    else:
        raise ValueError(f"unknown interpolation: {interpolation!r}")
    idx = np.clip(base[:, None] + offs[None, :], 0, src - 1)
    return idx.astype(np.int32), w


def _resample_axis(img: jax.Array, axis: int, idx: np.ndarray,
                   w: np.ndarray) -> jax.Array:
    taps = idx.shape[1]
    if taps == 1:
        return jnp.take(img, jnp.asarray(idx[:, 0]), axis=axis)
    gathered = jnp.take(img, jnp.asarray(idx.reshape(-1)), axis=axis)
    new_shape = list(gathered.shape)
    new_shape[axis:axis + 1] = [idx.shape[0], taps]
    gathered = gathered.reshape(new_shape)
    wb_shape = [1] * gathered.ndim
    wb_shape[axis], wb_shape[axis + 1] = idx.shape[0], taps
    weights = jnp.asarray(w).reshape(wb_shape).astype(img.dtype)
    return jnp.sum(gathered * weights, axis=axis + 1)


@partial(jax.jit, static_argnames=("dsize", "interpolation", "h_axis"))
def resize(img: jax.Array, dsize: tuple[int, int],
           interpolation: str = LINEAR, h_axis: int = 0) -> jax.Array:
    """Resize `img` so (axis h_axis, h_axis+1) becomes dsize=(H, W).

    Matches cv::resize(img, (W, H), interpolation) for float32 inputs; the
    2x-nearest / 2x-cubic / arbitrary-linear calls of the reference pipeline
    (main.cpp:136, 145, 166) all route through here.
    """
    dh, dw = dsize
    sh, sw = img.shape[h_axis], img.shape[h_axis + 1]
    if (dh, dw) == (sh, sw):
        return img
    # vertical then horizontal (separable; order affects only ~1-ulp noise)
    if dh != sh:
        idx, w = _axis_plan(dh, sh, interpolation)
        img = _resample_axis(img, h_axis, idx, w)
    if dw != sw:
        idx, w = _axis_plan(dw, sw, interpolation)
        img = _resample_axis(img, h_axis + 1, idx, w)
    return img


def resize_np(img: np.ndarray, dsize: tuple[int, int],
              interpolation: str = LINEAR) -> np.ndarray:
    """NumPy twin of `resize` for host-side tooling and oracles."""
    return np.asarray(resize(jnp.asarray(img), dsize, interpolation))


def _phase_taps(interpolation: str):
    """Static per-parity stencils of the 2x upsample: (offsets, w[2, taps]).
    Output x=2j+B samples src at j + (B+0.5)/2 - 0.5, i.e. frac 0.75 (B=0,
    base j-1) / 0.25 (B=1, base j) — fixed 4-tap (cubic) or 2-tap (linear)
    stencils, so the generic gather machinery reduces to shifted slices."""
    if interpolation == CUBIC:
        offs = np.array([-2, -1, 0, 1])   # phase-0 taps rel. to j
        w = np.stack([_cubic_weights(np.float32(0.75)),
                      _cubic_weights(np.float32(0.25))])
        return offs, np.stack([w[0], w[1]])  # phase-1 taps = offs + 1
    if interpolation == LINEAR:
        offs = np.array([-1, 0])
        w = np.array([[0.25, 0.75], [0.75, 0.25]], np.float32)
        return offs, w
    raise ValueError(f"unsupported 2x-phase interpolation: {interpolation!r}")


def _stencil_axis(img: jax.Array, axis: int, offs, w) -> jax.Array:
    """Apply a 1-D stencil along `axis` with replicate borders: output j =
    sum_t w[t] * img[clamp(j + offs[t])]."""
    lo = max(0, -int(offs[0]))
    hi = max(0, int(offs[-1]))
    pad = [(0, 0)] * img.ndim
    pad[axis] = (lo, hi)
    xp = jnp.pad(img, pad, mode="edge")
    n = img.shape[axis]
    acc = None
    for t in range(len(offs)):
        start = int(offs[0]) + lo + t   # padded index of tap t at j = 0
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(start, start + n)
        term = xp[tuple(sl)] * jnp.asarray(w[t], img.dtype)
        acc = term if acc is None else acc + term
    return acc


@partial(jax.jit, static_argnames=("interpolation", "h_axis"))
def resize2x_phases(img: jax.Array, interpolation: str = CUBIC,
                    h_axis: int = 0) -> jax.Array:
    """Polyphase 2x upsample: same arithmetic as resize(img, (2H, 2W)) but
    emitting the four parity phases as a trailing axis instead of an
    interleaved full-res image — the s2d-layout form the Pallas fast path
    (ops/pallas_stack.py) runs in, with no device-side interleave.

    img [..., H, W, C...] -> [..., H, W, C..., 4] where phase index A*2+B
    equals full-res pixel (2i+A, 2j+B). Matches `resize` per pixel
    (same taps/weights/clamping, as fixed shifted-slice stencils instead of
    gathers — tests/test_fastpath.py asserts equality), vertical first.
    """
    offs, w = _phase_taps(interpolation)
    out = []
    for A in (0, 1):
        r = _stencil_axis(img, h_axis, offs + A, w[A])
        for B in (0, 1):
            out.append(_stencil_axis(r, h_axis + 1, offs + B, w[B]))
    return jnp.stack(out, axis=-1)
