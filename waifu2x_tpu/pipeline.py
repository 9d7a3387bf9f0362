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
import os
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from waifu2x_tpu.config import Config
from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, validate_params
from waifu2x_tpu.utils.logging import get_logger
from waifu2x_tpu.models.weights import load_model_json, model_file_for
from waifu2x_tpu.ops import color
from waifu2x_tpu.ops.color import (
    bgr_to_yuv,
    saturate_cast_u8,
    u8_to_unit_f32,
    yuv_to_bgr,
)
from waifu2x_tpu.ops.convstack import convert_plane
from waifu2x_tpu.ops.resize import (
    CUBIC,
    LINEAR,
    NEAREST,
    resize,
    resize2x_phases,
)
from waifu2x_tpu.ops.s2d import d2s, d2s_host
from waifu2x_tpu.parallel.tiles import plan_tiles, tiled_convert

log = get_logger("pipeline")


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


# ---------------------------------------------------------------------------
# Pallas fast path (TPU): the whole 2x step runs on the LOW-RES grid in
# polyphase (s2d) layout — fused kernels for the conv stack
# (ops/pallas_stack.py), polyphase bicubic for U/V, and BGR/u8 conversion
# per phase. The full-res image is only ever interleaved on the host (u8
# reshape) or once per extra scale iteration (d2s on device).
# ---------------------------------------------------------------------------

def _fast_import():
    from waifu2x_tpu.ops import pallas_stack  # deferred: TPU-only kernels
    return pallas_stack


def _kernel_dtype(cfg: Config):
    """Fused-kernel storage dtype for a Config: 'auto' means bf16
    activations with f32 tap accumulation (the measured fidelity/perf
    point, >=50 dB); 'float32' is honored with a halved tile budget
    (pick_tile scales by itemsize)."""
    return jnp.float32 if cfg.compute_dtype == "float32" else jnp.bfloat16


@dataclasses.dataclass(frozen=True)
class FastStack:
    """Device-ready fused-kernel parameters for one model."""

    kp: dict
    spec: tuple
    tile: "tuple[int, int] | None"   # None = auto per image shape
    interpret: bool = False

    @classmethod
    def build(cls, params, scale_input: bool, tile=None,
              interpret: bool = False, dtype=jnp.bfloat16) -> "FastStack":
        """tile=None picks a per-image-shape tile (pallas_stack.pick_tile).

        Raises ValueError for any architecture other than the flagship
        7-layer spec: the fused kernels bake its widths into their VMEM
        scratch shapes and weight packings. Arbitrary architectures (the
        reference loader accepts any layer count/widths,
        modelHandler.cpp:170-197) run via the XLA path — `_build_fast`
        below performs that fallback for the pipeline entry points."""
        spec = validate_params(params)
        if spec != WAIFU2X_7LAYER:
            raise ValueError(
                f"fused Pallas kernels support only the flagship 7-layer "
                f"architecture (widths 1/32/32/64/64/128/128/1, 3x3); got "
                f"{[l.cout for l in spec.layers]} — use the XLA path")
        ps = _fast_import()
        kp, spec = ps.prep_params(params, scale_input, dtype=dtype)
        # off-TPU the kernels run through the Pallas interpreter (tests, CI);
        # the axon remote-TPU platform reports device_kind "TPU v5 lite"
        is_tpu = any("TPU" in d.device_kind for d in jax.devices())
        interpret = interpret or not is_tpu
        return cls(kp, spec, tile, interpret)

    @property
    def dtype(self):
        return self.kp["l1"].dtype

    def scale(self, ylow: jax.Array) -> jax.Array:
        ps = _fast_import()
        return ps.stack_scale(ylow.astype(self.dtype), self.kp, self.spec,
                              self.tile, interpret=self.interpret)

    def noise(self, y: jax.Array) -> jax.Array:
        ps = _fast_import()
        return ps.stack_noise(y.astype(self.dtype), self.kp, self.spec,
                              self.tile, interpret=self.interpret)

    def noise_s2d(self, y: jax.Array, crop: bool = True) -> jax.Array:
        ps = _fast_import()
        return ps.stack_noise_s2d(y.astype(self.dtype), self.kp, self.spec,
                                  self.tile, interpret=self.interpret,
                                  crop=crop)


def scale2x_yuv_s2d(yuv: jax.Array, fast: FastStack) -> jax.Array:
    """One 2x iteration entirely on the low-res grid: f32 YUV [N, h, w, 3]
    -> f32 YUV in polyphase layout [N, h, w, 4, 3] (phase A*2+B = full-res
    pixel (2i+A, 2j+B)). Same math as _scale_step: Y through the conv stack
    (nearest-2x folded in), U/V through polyphase bicubic."""
    y_s2d = fast.scale(yuv[..., 0]).astype(yuv.dtype)       # [N, h, w, 4]
    uv = resize2x_phases(yuv[..., 1:3], CUBIC, h_axis=1)    # [N, h, w, 2, 4]
    uv = jnp.swapaxes(uv, -1, -2)                           # [N, h, w, 4, 2]
    return jnp.concatenate([y_s2d[..., None], uv], axis=-1)


def scale2x_batch_u8_s2d(yuv: jax.Array, fast: FastStack) -> jax.Array:
    """Throughput-mode 2x step: f32 YUV [N, h, w, 3] -> uint8 BGR in
    polyphase layout [N, h, w, 12] (channel (A*2+B)*3 + c). The host
    interleave to [N, 2h, 2w, 3] is a zero-flop u8 reshape (d2s_host)."""
    out = yuv_to_bgr(scale2x_yuv_s2d(yuv, fast))
    u8 = saturate_cast_u8(out)
    n, h, w = u8.shape[:3]
    return u8.reshape(n, h, w, 12)


@partial(jax.jit, static_argnames=("tile",))
def _uv_phases_cmajor(yuv: jax.Array, tile) -> jax.Array:
    """Channel-major polyphase U/V for the fused kernel: f32 YUV
    [N, h, w, 3] -> [N, hp, wp, 8] (u phases 0:4, v phases 4:8), padded to
    the tile grid by edge replication (interior values unchanged)."""
    ps = _fast_import()
    n, h, w, _ = yuv.shape
    hp, wp = ps.grid_dims(h, w, tile)
    uv = jnp.pad(yuv[..., 1:3], ((0, 0), (0, hp - h), (0, wp - w), (0, 0)),
                 mode="edge")
    phases = resize2x_phases(uv, CUBIC, h_axis=1)       # [N, hp, wp, 2, 4]
    return phases.reshape(n, hp, wp, 8)


FUSED_TAIL = os.environ.get("W2X_TAIL", "xla")
if FUSED_TAIL not in ("xla", "kernel"):   # fail fast on typos: a bad value
    raise ValueError(                     # would silently select a tail
        f"W2X_TAIL must be 'xla' or 'kernel', got {FUSED_TAIL!r}")
YDENSE = os.environ.get("W2X_YDENSE", "") == "1"
# opt-in A/B: the kernel stores its converted-Y out block phase-chunked
# DENSE (ps.stack_scale_dense) and the un-chunking transpose moves into
# the tail. Measured NEUTRAL-to-slightly-negative on the chip (step 20.73
# vs 20.58 ms/4f at 16x512^2): the 4-lane out-block store relayout that
# the empty-kernel probes price at ~0.76 ms/4f (tools/stage_time.py
# outonly vs outdense) is in reality hidden under the kernel's MXU
# stream, while the tail's transpose is a real addition. Kept as the
# measured negative result; bit-equal output (tests/test_pallas_stack.py).
# "xla" (default): the conv stack runs as the y-only fused kernel
# (stack_scale) and the bicubic-U/V + YUV->BGR + saturate-cast tail runs
# as a separate dense XLA program at full 128-lane width (the polyphase
# dim merged into width). Measured 21.3 vs 21.8 ms/4f at 512^2 against
# "kernel" (the in-kernel u8 tail, stack_scale_fused_u8): the kernel tail
# works on 4-16-lane vregs at 1/32-1/8 lane utilization (~1.49 ms/4f)
# while the dense XLA twin streams the same math at full width — and the
# kernel drops its uvp input entirely (less VMEM pressure) and the U/V
# path keeps full f32 (no i16/bf16 uvp quantization). See docs/PERF.md.


def _combine_u8_cmajor(y2, u2, v2, n, h, w):
    """Shared dense tail math: flat [n,h,w*4] Y/U/V phase planes ->
    uint8 BGR in CHANNEL-MAJOR polyphase layout [n,h,w,16] (lane
    c*4+phase, lanes 12:16 zero). Same math as yuv_to_bgr /
    saturate_cast_u8, restated at full VPU lane width."""
    inv, off = color._INV, color._INV_OFF
    chans = []
    for c in range(3):
        val = (y2 * inv[c, 0] + u2 * inv[c, 1] + v2 * inv[c, 2]
               + off[c]) * jnp.float32(255.0)
        chans.append(jnp.clip(jnp.round(val), 0, 255)
                     .astype(jnp.uint8).reshape(n, h, w, 4))
    chans.append(jnp.zeros_like(chans[0]))
    return jnp.concatenate(chans, axis=-1)                 # [n,h,w,16]


def _tail_u8_cmajor(y_s2d, yuv):
    """Dense u8/BGR SCALE tail: converted-Y s2d [N,h,w,4] + f32 YUV
    [N,h,w,3] -> u8 BGR cmajor [N,h,w,16] — the same contract as
    stack_scale_fused_u8 (interleave with d2s_host_cmajor)."""
    n, h, w, _ = yuv.shape
    ph = resize2x_phases(yuv[..., 1:3], CUBIC, h_axis=1)   # [n,h,w,2,4] f32
    y2 = y_s2d[:, :h, :w, :].astype(jnp.float32).reshape(n, h, w * 4)
    u2 = ph[..., 0, :].reshape(n, h, w * 4)
    v2 = ph[..., 1, :].reshape(n, h, w * 4)
    return _combine_u8_cmajor(y2, u2, v2, n, h, w)


def _tail_u8_cmajor_noise(ys, yuv):
    """Dense u8/BGR NOISE tail: converted-Y s2d [N,h/2,w/2,4] + the
    ORIGINAL f32 YUV [N,h,w,3] (h, w even) -> u8 BGR cmajor
    [N,h/2,w/2,16]. The noise step's U/V pass through untouched
    (main.cpp denoises Y only), so their "phases" are just the s2d
    split of the input plane — no resize. Replaces the round-trip the
    f32 noise step pays on throughput surfaces (device d2s of Y + the
    full-res at[...,0].set rewrite + a separate full-res BGR/u8
    program: 3.3+ ms per 64x256^2 batch, tools-measured) with one
    dense tail emitting the same host-interleave contract as scale."""
    n, h, w, _ = yuv.shape
    hl, wl = h // 2, w // 2
    y2 = ys[:, :hl, :wl, :].astype(jnp.float32).reshape(n, hl, wl * 4)
    uv = yuv[..., 1:3]
    ph = jnp.stack([uv[:, a::2, b::2, :] for a in (0, 1) for b in (0, 1)],
                   axis=3)                             # [n,hl,wl,4,2]
    u2 = ph[..., 0].reshape(n, hl, wl * 4)
    v2 = ph[..., 1].reshape(n, hl, wl * 4)
    return _combine_u8_cmajor(y2, u2, v2, n, hl, wl)


_tail_u8_cmajor_noise_jit = jax.jit(_tail_u8_cmajor_noise)


_tail_u8_cmajor_jit = jax.jit(_tail_u8_cmajor)


@partial(jax.jit, static_argnames=("tc",))
def _tail_u8_cmajor_dense(ydense, yuv, tc):
    """Same tail, fed by stack_scale_dense's phase-chunked dense layout:
    the un-chunking transpose (ps.dense_to_s2d) fuses into this program, so
    the kernel gets the cheap dense (tr, 4*tc) out store and the relayout
    runs here at full XLA/VPU width."""
    ps = _fast_import()
    n, h, w, _ = yuv.shape
    y_s2d = ps.dense_to_s2d(ydense, tc, h, w)
    return _tail_u8_cmajor(y_s2d, yuv)


def _fused_step(yuv, kp, tile, spec, interpret, dtype, y=None):
    # Deliberately NOT one outer jit: the U/V prep, the im2col build and
    # the kernel call run as separate programs. Collapsing them into one
    # program measured neutral for speed (the async dispatch queue hides
    # the extra ~3 ms relay dispatches), and XLA's layout assignment on
    # the combined program picks lanes-on-the-taps-dim layouts for the
    # im2col temporaries at several large-frame shapes (128x padding
    # expansion -> HBM OOM at e.g. batch-4 1080p); the standalone
    # _xcol_scale program compiles densely at those same shapes.
    ps = _fast_import()
    if y is None:   # `y` override: chained steps (noise_scale) pass the
        y = yuv[..., 0]   # denoised plane directly, skipping a full-res
    #                       yuv.at[..., 0].set rewrite; the tail reads
    #                       only yuv's U/V (and shape)
    if FUSED_TAIL == "xla":
        if YDENSE:   # A/B only — measured 20.73 vs 20.58 ms/4f (see PERF.md)
            ydense, tc = ps.stack_scale_dense(y.astype(dtype), kp,
                                              spec, tile, interpret=interpret)
            return _tail_u8_cmajor_dense(ydense, yuv, tc)
        y_s2d = ps.stack_scale(y.astype(dtype), kp, spec, tile,
                               interpret=interpret)
        return _tail_u8_cmajor_jit(y_s2d, yuv)
    uvp = _uv_phases_cmajor(yuv, tile)
    return ps.stack_scale_fused_u8(y.astype(dtype), uvp,
                                   kp, spec, tile, interpret=interpret)


BAND_ROWS = 1152     # low-res rows per banded dispatch (large frames).
#                      Sized so 1080p runs unbanded and 4K in two bands:
#                      the original 512 bounded the kernels' X4 HBM handoff
#                      buffer (~2.4 kB/low-res px), which the single fused
#                      kernel eliminated — what remains in HBM per band is
#                      the 16-lane im2col + u8 out (~100 B/low-res px).
BAND_PX = 2 * 1152 * 3840   # low-res px per dispatch, batch included —
#                      the largest validated dispatch (stream4k: batch 2,
#                      1152-row 4K bands). Rows alone don't bound HBM:
#                      batch-8 UNBANDED 1080p (16.6 M px) reproducibly
#                      ResourceExhausts the 16 GB chip once the im2col/uvp
#                      build temporaries are counted, while the same frames
#                      in two ~548-row bands run fine. scale2x_batch_u8_fused
#                      therefore caps rows at BAND_PX / (batch * width).
_BAND_HALO = 4       # one-sided receptive radius of the whole 2x step


def scale2x_batch_u8_fused(yuv: jax.Array, fast: FastStack,
                           band_rows: int = BAND_ROWS,
                           y: "jax.Array | None" = None) -> jax.Array:
    """Fully fused throughput 2x step: f32 YUV [N, h, w, 3] -> uint8 BGR in
    CHANNEL-MAJOR polyphase layout [N, h, w, 16] (lane c*4 + phase, lanes
    12:16 zero). Interleave with d2s_host_cmajor. The conv stack, bicubic
    U/V combine, color transform and u8 cast all run inside K2.

    Frames taller than `band_rows` (low-res) are processed in row bands
    with an 8-row overlap, bounding the per-dispatch HBM footprint of the
    im2col/uvp/u8 arrays (~100 B per low-res pixel) for 4K/8K streams.
    Band outputs are exact (the step's one-sided receptive radius is 4
    low-res rows; overlap rows are cropped, true edges keep replicate
    semantics). All interior bands share one compiled shape."""
    ps = _fast_import()
    n, h, w, _ = yuv.shape
    dtype = jnp.dtype(fast.dtype).type
    # per-dispatch HBM cap counts the batch too (see BAND_PX): wide/batched
    # frames band even below `band_rows`
    band_rows = max(64, min(band_rows, BAND_PX // max(1, n * w)))
    if h <= band_rows:
        tile = fast.tile or ps.pick_tile(h, w, jnp.dtype(fast.dtype).itemsize)
        return _fused_step(yuv, fast.kp, tile, fast.spec, fast.interpret,
                           dtype, y=y)
    k = _BAND_HALO
    n_bands = -(-h // band_rows)
    rows = -(-h // n_bands)          # even bands: no oversized tail slice
    size = min(h, rows + 2 * k)
    tile = fast.tile or ps.pick_tile(size, w, jnp.dtype(fast.dtype).itemsize)
    outs = []
    for b0 in range(0, h, rows):
        nrows = min(rows, h - b0)
        s = min(max(0, b0 - k), h - size)
        out = _fused_step(
            jax.lax.dynamic_slice_in_dim(yuv, s, size, axis=1),
            fast.kp, tile, fast.spec, fast.interpret, dtype,
            y=None if y is None
            else jax.lax.dynamic_slice_in_dim(y, s, size, axis=1))
        outs.append(out[:, b0 - s:b0 - s + nrows])
    return jnp.concatenate(outs, axis=1)


def scale2x_batch_fast(yuv: jax.Array, fast: FastStack,
                       band_rows: int = BAND_ROWS) -> jax.Array:
    """Fast-path twin of scale2x_batch: f32 YUV [N,h,w,3] -> [N,2h,2w,3]
    (device-side interleave; used when further scale iterations follow).

    Subject to the same per-dispatch pixel-volume cap (BAND_PX) as the u8
    path: tall/batched frames run in row bands so the im2col/phase
    temporaries stay inside HBM for any user-supplied image size."""
    n, h, w, _ = yuv.shape
    band_rows = max(64, min(band_rows, BAND_PX // max(1, n * w)))
    if h <= band_rows:
        s2d_out = scale2x_yuv_s2d(yuv, fast)
        return d2s(s2d_out.reshape(n, h, w, 12))
    k = _BAND_HALO
    n_bands = -(-h // band_rows)
    rows = -(-h // n_bands)
    size = min(h, rows + 2 * k)
    outs = []
    for b0 in range(0, h, rows):
        nrows = min(rows, h - b0)
        s = min(max(0, b0 - k), h - size)
        out = scale2x_yuv_s2d(
            jax.lax.dynamic_slice_in_dim(yuv, s, size, axis=1), fast)
        outs.append(out[:, b0 - s:b0 - s + nrows])
    s2d_out = jnp.concatenate(outs, axis=1)
    return d2s(s2d_out.reshape(n, h, w, 12))


def noise_y_batch_fast(y_in: jax.Array, fast: FastStack,
                       band_rows: int = 2 * BAND_ROWS,
                       out_dtype=jnp.float32) -> jax.Array:
    """Denoise a luma batch [N,h,w] -> [N,h,w] (out_dtype, default f32)
    through the fused kernel. Tall frames run in row bands (full-res
    rows; 16-row overlap covers the 7-px receptive radius on even s2d
    boundaries) to bound the per-dispatch HBM footprint. Plane-form core
    of noise_batch_fast — chain consumers (noise_scale) feed it straight
    into the scale step's `y=` override and skip the full-res YUV
    rewrite; bf16-kernel throughput chains pass out_dtype=None to keep
    the kernel dtype through the handoff (the scale step casts to its
    own dtype anyway — a full-res f32 round-trip between two bf16
    stacks buys nothing)."""
    n, h, w = y_in.shape
    cast = (lambda y: y) if out_dtype is None else (
        lambda y: y.astype(out_dtype))
    # same per-dispatch volume cap as the scale step (BAND_PX is in
    # low-res px; the noise path's rows are full-res, hence the 4x)
    band_rows = max(128, min(band_rows, 2 * (2 * BAND_PX // max(1, n * w))))
    if h <= band_rows:
        return cast(fast.noise(y_in))
    if h % 2:   # pad odd heights to even so bands keep s2d parity
        y_in = jnp.pad(y_in, ((0, 0), (0, 1), (0, 0)), mode="edge")
    he = y_in.shape[1]
    k = 8
    n_bands = -(-he // band_rows)
    rows = 2 * (-(-he // (2 * n_bands)))     # even band heights
    size = min(he, rows + 2 * k)
    parts = []
    for b0 in range(0, he, rows):
        nrows = min(rows, he - b0)
        s = min(max(0, b0 - k), he - size)
        y = fast.noise(
            jax.lax.dynamic_slice_in_dim(y_in, s, size, axis=1))
        parts.append(cast(y[:, b0 - s:b0 - s + nrows]))
    return jnp.concatenate(parts, axis=1)[:, :h]


def noise_batch_fast(yuv: jax.Array, fast: FastStack,
                     band_rows: int = 2 * BAND_ROWS) -> jax.Array:
    """Fast-path twin of noise_batch: f32 YUV [N,h,w,3] -> same shape with
    the Y plane denoised through the fused kernel (see noise_y_batch_fast
    for banding)."""
    y = noise_y_batch_fast(yuv[..., 0], fast, band_rows)
    return yuv.at[..., 0].set(y.astype(yuv.dtype))


def noise_batch_u8_fused(yuv: jax.Array, fast: FastStack,
                         band_rows: int = 2 * BAND_ROWS) -> jax.Array:
    """Throughput NOISE step with the dense u8 tail: f32 YUV [N,h,w,3]
    (h, w EVEN — callers with odd frames use noise_batch_fast) -> uint8
    BGR cmajor [N, h/2, w/2, 16] (lane c*4 + s2d phase); interleave with
    d2s_host_cmajor. Deliberately NOT one outer jit, like the scale
    step: the combined program regresses 24.6 -> 33 ms on 64x256^2 (the
    same XLA layout pathology _fused_step documents), while the async
    dispatch queue hides the extra program dispatches. Tall frames
    row-band exactly like noise_batch_fast."""
    n, h, w, _ = yuv.shape
    if h % 2 or w % 2:
        raise ValueError(f"noise_batch_u8_fused needs even dims, got "
                         f"{h}x{w} (use noise_batch_fast)")
    band_rows = max(128, min(band_rows, 2 * (2 * BAND_PX // max(1, n * w))))
    if h <= band_rows:
        ys = fast.noise_s2d(yuv[..., 0], crop=False)
        return _tail_u8_cmajor_noise_jit(ys, yuv)
    k = 8
    n_bands = -(-h // band_rows)
    rows = 2 * (-(-h // (2 * n_bands)))      # even band heights
    size = min(h, rows + 2 * k)
    parts = []
    for b0 in range(0, h, rows):
        nrows = min(rows, h - b0)
        s = min(max(0, b0 - k), h - size)
        band = jax.lax.dynamic_slice_in_dim(yuv, s, size, axis=1)
        ys = fast.noise_s2d(band[..., 0], crop=False)
        u8 = _tail_u8_cmajor_noise_jit(ys, band)
        parts.append(u8[:, (b0 - s) // 2:(b0 - s + nrows) // 2])
    return jnp.concatenate(parts, axis=1)


def _build_fast(params, scale_input: bool, cfg: Config,
                dtype=None) -> "FastStack | None":
    """Resolve cfg.use_pallas to a FastStack or None (XLA path).

    "auto" (the default) enables the fused kernels when a TPU backend is
    present; True forces them anywhere (interpret mode off-TPU). Either
    way an architecture the kernels can't compile falls back to the XLA
    path with a logged warning instead of crashing — the reference loader
    accepts arbitrary layer counts/widths (modelHandler.cpp:170-197) and
    so does our XLA path. `dtype` overrides the Config-derived kernel
    dtype (see _noise_dtype_for)."""
    want = cfg.use_pallas
    if want is False:
        return None
    if want == "auto":
        if not any("TPU" in d.device_kind for d in jax.devices()):
            return None
    try:
        return FastStack.build(params, scale_input=scale_input,
                               dtype=dtype or _kernel_dtype(cfg))
    except ValueError as e:
        log.warning("fused Pallas path unavailable (%s); using the XLA "
                    "path", e)
        return None


def _noise_dtype_for(cfg: Config):
    """Kernel dtype override for the NOISE stack on the single-image
    quality surface (Converter / convert_image / the CLI).

    Chained bf16 stacks compound rounding: on pure-random content (every
    pixel an edge — the adversarial worst case for bf16) the noise->scale
    chain measured 48.2 dB vs the >=50 dB product bar, while each single
    stack clears it (52.7 / 50.8 dB; tools/chain_fidelity_probe.py). An
    f32 NOISE stack lifts the chain to 51.3 dB for ~+20% chain cost (the
    noise stack is 1/5 of the chain's work) — the cheapest place to spend
    precision, since the noise stack's error dominates the compound (its
    output is amplified by the scale stack's gain). Throughput entry
    points (noise_batch_fast, StreamConverter built directly, bench)
    keep bf16 and the documented 0.8x-of-scale chain ceiling. Honored
    only under compute_dtype="auto"; explicit user choices win."""
    if cfg.mode == "noise_scale" and cfg.compute_dtype == "auto":
        return jnp.float32
    return None


@jax.jit
def _to_yuv(bgr_u8: jax.Array) -> jax.Array:
    return bgr_to_yuv(u8_to_unit_f32(bgr_u8))


@jax.jit
def _to_bgr_u8(yuv: jax.Array) -> jax.Array:
    return saturate_cast_u8(yuv_to_bgr(yuv))


SMALL_IMG_PX = 96 * 1024
# Below ~0.1 MP the bf16 fused kernels' output is edge-dominated (the
# one-sided replicate halo's bf16 rounding concentrates at borders):
# measured vs the cv2 oracle with the shipped demo weights, 49.3 dB at
# 120x160 but 53.0 dB at 512^2 (the >=50 product bar). Under
# use_pallas="auto" such images route to the ~92 dB XLA path instead —
# at these sizes conversion is dispatch-bound, so throughput is moot.


@dataclasses.dataclass
class Converter:
    """Loaded-models pipeline front end. Replaces the main() body of the
    reference (model resolution main.cpp:82-121 + the phase drivers)."""

    cfg: Config
    noise_params: tuple | None = None
    scale_params: tuple | None = None
    fast_noise: "FastStack | None" = None
    fast_scale: "FastStack | None" = None
    # lazily-built jitted entry points (per-converter cache; jax.jit then
    # caches per input shape as usual)
    _jits: dict = dataclasses.field(default_factory=dict, repr=False)

    def _noise_fast_jit(self):
        """ONE-dispatch denoise step: jitting noise_batch_fast collapses
        the s2d im2col build + fused kernel + d2s merge into a single
        program. At ~7 ms of device compute per batch the noise workload
        is otherwise at the mercy of the ~3 ms per-dispatch relay latency
        (bench.py measured 34-62 MP/s unjitted vs 134+ jitted at 256^2);
        the scale step deliberately stays multi-program (see _fused_step's
        layout-pathology note)."""
        if "noise" not in self._jits:
            fast = self.fast_noise
            self._jits["noise"] = jax.jit(
                lambda yuv: noise_batch_fast(yuv, fast))
        return self._jits["noise"]

    def _mesh_pipe(self, h: int, w: int):
        """Resolve cfg.mesh to a MeshPipeline for this image geometry, or
        None (single-device). "auto" activates only on multi-TPU hosts and
        picks the spatial split per image (parallel/mesh_pipeline.
        auto_spatial_shape); explicit shapes activate anywhere the device
        count suffices. Requires the fused stacks this mode needs (an
        XLA-path architecture falls back single-device, logged once).
        Pipelines are cached per mesh shape (jit caches live on them)."""
        spec = self.cfg.mesh_shape()
        if spec == "off":
            return None
        need = []
        if self.cfg.mode in ("scale", "noise_scale"):
            need.append(self.fast_scale)
        if self.cfg.mode in ("noise", "noise_scale"):
            need.append(self.fast_noise)
        if any(f is None for f in need):
            if "mesh_warned" not in self._jits:
                self._jits["mesh_warned"] = True
                if spec != "auto":
                    log.warning("--mesh needs the fused kernels (flagship "
                                "7-layer model on TPU, or --pallas on); "
                                "running single-device")
            return None
        import jax as _jax
        devices = _jax.devices()
        from waifu2x_tpu.parallel.mesh_pipeline import (
            MeshPipeline, auto_spatial_shape, make_mesh3)
        if spec == "auto":
            if len(devices) < 2 or not any(
                    "TPU" in d.device_kind for d in devices):
                return None
            spec = auto_spatial_shape(len(devices), h, w)
            if spec == (1, 1, 1):
                return None
        n_need = spec[0] * spec[1] * spec[2]
        if n_need > len(devices):
            if "mesh_warned" not in self._jits:
                self._jits["mesh_warned"] = True
                log.warning("mesh %s needs %d devices, have %d; running "
                            "single-device", spec, n_need, len(devices))
            return None
        key = ("mesh", spec)
        if key not in self._jits:
            self._jits[key] = MeshPipeline(
                make_mesh3(spec, devices[:n_need]),
                fast_scale=self.fast_scale, fast_noise=self.fast_noise,
                mode=self.cfg.mode, scale_ratio=self.cfg.scale_ratio)
        pipe = self._jits[key]
        mh, mw = pipe.min_image_hw()
        if h < mh or w < mw:
            return None
        return pipe

    def _fast_ok(self, fast: "FastStack | None", px: int) -> bool:
        """Use the fused kernels for this plane? 'auto' keeps tiny images
        on the XLA path for fidelity (see SMALL_IMG_PX); an explicit
        use_pallas=True honors the user's choice at any size.

        `px` is the pixel count of the plane handed to the phase (the
        full-res plane for noise, the low-res input for scale — whose
        output is 4x larger). The asymmetry is intentional: the bf16 edge
        rounding that motivates SMALL_IMG_PX lives on the INPUT borders,
        and both phases see `px` input pixels; measured dB by input size
        is what set the threshold (see SMALL_IMG_PX)."""
        if fast is None:
            return False
        return self.cfg.use_pallas is True or px >= SMALL_IMG_PX

    @classmethod
    def from_config(cls, cfg: Config) -> "Converter":
        noise_params = scale_params = None
        fast_noise = fast_scale = None
        if cfg.mode in ("noise", "noise_scale"):
            noise_params = load_model_json(
                model_file_for(cfg.model_dir, True, cfg.noise_level))
            fast_noise = _build_fast(noise_params, False, cfg,
                                     dtype=_noise_dtype_for(cfg))
        if cfg.mode in ("scale", "noise_scale"):
            scale_params = load_model_json(model_file_for(cfg.model_dir, False))
            fast_scale = _build_fast(scale_params, True, cfg)
        return cls(cfg, noise_params, scale_params, fast_noise, fast_scale)

    def _apply_noise(self, yuv: jax.Array) -> jax.Array:
        if self._fast_ok(self.fast_noise, yuv.shape[0] * yuv.shape[1]):
            # noise_batch_fast applies the BAND_PX per-dispatch volume
            # cap — a single 8K image through the public API must take
            # the same banded path as the batch pipelines
            return self._noise_fast_jit()(yuv[None])[0]
        return _noise_phase(yuv, self.noise_params, self.cfg)

    def _apply_scale_iter(self, yuv: jax.Array) -> jax.Array:
        if self._fast_ok(self.fast_scale, yuv.shape[0] * yuv.shape[1]):
            return scale2x_batch_fast(yuv[None], self.fast_scale)[0]
        return _scale_step(yuv, self.scale_params, self.cfg)

    def process_yuv(self, yuv: jax.Array) -> jax.Array:
        cfg = self.cfg
        if self.noise_params is not None:
            yuv = self._apply_noise(yuv)
        if self.scale_params is not None:
            iters, shrink = scale_plan(cfg.scale_ratio)
            for _ in range(iters):
                yuv = self._apply_scale_iter(yuv)
            if shrink != 0.0:
                h, w, _ = yuv.shape
                # int truncation as in main.cpp:160-165
                dsize = (int(h * shrink), int(w * shrink))
                yuv = _shrink(yuv, dsize)
        return yuv

    def _final_fast_u8(self, yuv: jax.Array) -> "np.ndarray | None":
        """The flagship single-image path: when the conversion ENDS with a
        fused-path 2x iteration (no shrink after it), run that last
        iteration through scale2x_batch_u8_fused — the dense-XLA-tail u8
        kernel the throughput paths use — and interleave on the host
        (zero-flop u8 reshape). The generic path would materialize the
        full-res f32 YUV on device and pay a device d2s + separate
        YUV->BGR/u8 program for nothing (VERDICT r2 item 3). Returns the
        u8 BGR image, or None when this conversion doesn't end that way
        (shrink step, XLA path, tiny image, noise-only mode)."""
        if self.scale_params is None:
            return None
        iters, shrink = scale_plan(self.cfg.scale_ratio)
        if iters < 1 or shrink != 0.0:
            return None
        h, w = yuv.shape[0], yuv.shape[1]
        hN, wN = h << (iters - 1), w << (iters - 1)  # last iteration input
        if not self._fast_ok(self.fast_scale, hN * wN):
            return None
        if self.noise_params is not None:
            yuv = self._apply_noise(yuv)
        for _ in range(iters - 1):
            yuv = self._apply_scale_iter(yuv)
        from waifu2x_tpu.ops.s2d import d2s_host_cmajor
        out = scale2x_batch_u8_fused(yuv[None], self.fast_scale)
        return d2s_host_cmajor(np.asarray(out))[0]

    def process_bgr_u8(self, bgr_u8: np.ndarray) -> np.ndarray:
        """uint8 BGR in, uint8 BGR out — the whole main.cpp math path.
        On a multi-device host (or explicit cfg.mesh) the full chain runs
        sharded over the mesh (parallel/mesh_pipeline.py) when the image
        qualifies for the fused path; otherwise single-device."""
        h, w = bgr_u8.shape[0], bgr_u8.shape[1]
        pipe = self._mesh_pipe(h, w)
        if pipe is not None and self._fast_ok(
                self.fast_scale or self.fast_noise, h * w):
            return pipe.convert_bgr_u8(bgr_u8[None])[0]
        yuv = _to_yuv(jnp.asarray(bgr_u8))
        out = self._final_fast_u8(yuv)
        if out is not None:
            return out
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
    fast_noise = fast_scale = None
    if noise_params is not None:
        validate_params(noise_params)
        fast_noise = _build_fast(noise_params, False, cfg,
                                 dtype=_noise_dtype_for(cfg))
    if scale_params is not None:
        validate_params(scale_params)
        fast_scale = _build_fast(scale_params, True, cfg)
    conv = Converter(cfg, noise_params, scale_params, fast_noise, fast_scale)
    return conv.process_bgr_u8(bgr_u8)
