"""Streaming / batch serving runtime (BASELINE configs[3..4]).

The reference processes one image per process invocation; production TPU
serving wants a pipeline: host decode (native C++ thread pool when built),
device conversion (the fused polyphase kernels), host interleave + encode —
with the device kept busy by dispatch-ahead double buffering (JAX dispatch
is asynchronous: batch i+1 is enqueued before batch i's result is read
back, so host work overlaps device work).

Frames sharing a geometry share one compiled program (static shapes); a
stream of equally-sized video frames runs at steady-state kernel throughput
with no recompiles. Mixed-size streams are grouped by shape: each distinct
geometry gets its own batch buffer and compiled program, per-shape batch
sizes are capped by the same per-dispatch pixel-volume rule as the banded
kernels (pipeline.BAND_PX), and outputs are re-ordered to input order.

Modes mirror the reference CLI (main.cpp:82-169): "scale" (2x), "noise"
(denoise only), "noise_scale" (denoise then 2x).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from waifu2x_tpu import io as w2x_io
from waifu2x_tpu.ops.color import (
    bgr_to_yuv,
    saturate_cast_u8,
    u8_to_unit_f32,
    yuv_to_bgr,
)
from waifu2x_tpu.ops.s2d import d2s_host_cmajor
from waifu2x_tpu.pipeline import (
    BAND_PX,
    FastStack,
    noise_batch_fast,
    noise_batch_u8_fused,
    noise_y_batch_fast,
    scale2x_batch_u8_fused,
)
from waifu2x_tpu.train.checkpoint import load_frame_cursor, save_frame_cursor


@jax.jit
def _to_yuv_batch(bgr_u8: jax.Array) -> jax.Array:
    return bgr_to_yuv(u8_to_unit_f32(bgr_u8))


def resolve_stream_mesh(spec):
    """Config.mesh_shape() output -> a ("dp","dy","sp") Mesh or None.

    Stream "auto" policy: pure frame data-parallelism (dp = all local
    devices) — zero halo traffic, every chip converts whole frames; the
    spatial axes are for explicit shapes (single giant frames). Activates
    only on multi-TPU hosts; a single-device host (or CPU tests) is a
    no-op, like the Converter's auto gate."""
    if spec in ("off", (1, 1, 1)):
        return None
    devices = jax.devices()
    from waifu2x_tpu.parallel.mesh_pipeline import make_mesh3
    if spec == "auto":
        if len(devices) < 2 or not any(
                "TPU" in d.device_kind for d in devices):
            return None
        return make_mesh3((len(devices), 1, 1), devices)
    n = spec[0] * spec[1] * spec[2]
    if n > len(devices):
        import logging
        logging.getLogger("w2x.stream").warning(
            "mesh %s needs %d devices, have %d; running single-device",
            spec, n, len(devices))
        return None
    return make_mesh3(spec, devices[:n])


@jax.jit
def _to_bgr_u8_batch(yuv: jax.Array) -> jax.Array:
    return saturate_cast_u8(yuv_to_bgr(yuv))


@dataclasses.dataclass
class StreamConverter:
    """Stream processor over the fused Pallas path.

    fast:       device-ready FastStack (scale model; None for mode="noise").
    batch:      frames per device dispatch (throughput knob; per-shape
                batches are additionally capped by pixel volume).
    depth:      dispatch-ahead depth (>=1; 2 overlaps host & device work).
    fast_noise: FastStack (noise model) for mode "noise"/"noise_scale".
    mode:       scale | noise | noise_scale (reference main.cpp modes).
    """

    fast: "FastStack | None"
    batch: int = 8
    depth: int = 2
    fast_noise: "FastStack | None" = None
    mode: str = "scale"
    mesh: "object | None" = None   # a make_mesh3 ("dp","dy","sp") Mesh:
    #   dispatches run the composed chain sharded over it
    #   (parallel/mesh_pipeline.py) instead of the single-device step —
    #   frames over "dp", image rows/cols over "dy"/"sp". Odd-dim frames
    #   ride the mesh padding (no raster fallback needed).

    @classmethod
    def from_params(cls, scale_params=None, noise_params=None,
                    mode: str = "scale", batch: int = 8, depth: int = 2,
                    quality_noise: bool = True,
                    interpret: bool = False) -> "StreamConverter":
        """Build a stream from reference-format params with the same
        noise-precision policy as the CLI / Converter quality surface:
        in noise_scale mode the NOISE stack runs f32 (chained bf16
        stacks compound rounding — 48.2 dB on pure-random content vs
        the >=50 dB product bar; pipeline._noise_dtype_for). Pass
        quality_noise=False for the documented throughput trade (bf16
        noise stack, the 0.8x-of-scale chain ceiling — what bench's
        ns1080 workload measures). Constructing the dataclass directly
        with prebuilt FastStacks is the expert surface and applies NO
        dtype policy."""
        import jax.numpy as jnp

        from waifu2x_tpu.pipeline import FastStack

        if mode in ("scale", "noise_scale") and scale_params is None:
            raise ValueError(f"mode {mode!r} needs scale_params")
        if mode in ("noise", "noise_scale") and noise_params is None:
            raise ValueError(f"mode {mode!r} needs noise_params")
        fast = fast_noise = None
        if mode in ("scale", "noise_scale"):
            fast = FastStack.build(scale_params, scale_input=True,
                                   interpret=interpret)
        if mode in ("noise", "noise_scale"):
            ndtype = (jnp.float32
                      if quality_noise and mode == "noise_scale"
                      else jnp.bfloat16)
            fast_noise = FastStack.build(noise_params, scale_input=False,
                                         interpret=interpret, dtype=ndtype)
        return cls(fast=fast, batch=batch, depth=depth,
                   fast_noise=fast_noise, mode=mode)

    def __post_init__(self):
        if self.mode not in ("scale", "noise", "noise_scale"):
            raise ValueError(f"invalid mode: {self.mode!r}")
        if self.mode != "noise" and self.fast is None:
            raise ValueError(f"mode {self.mode!r} needs a scale FastStack")
        if self.mode != "scale" and self.fast_noise is None:
            raise ValueError(f"mode {self.mode!r} needs a noise FastStack")
        self._mesh_pipe = None
        if self.mesh is not None:
            from waifu2x_tpu.parallel.mesh_pipeline import MeshPipeline
            self._mesh_pipe = MeshPipeline(
                self.mesh, fast_scale=self.fast, fast_noise=self.fast_noise,
                mode=self.mode, scale_ratio=2.0)
        if self.mode == "noise":
            # even-dim frames take the dense u8 cmajor tail (no device
            # d2s / full-res YUV rewrite — docs/PERF.md round 3), NOT
            # wrapped in an outer jit: the combined program hits the
            # documented layout pathology. Odd-dim frames keep the f32
            # raster fallback, which IS one jitted dispatch (im2col +
            # kernel + d2s + u8 cast in a single program — at ~7 ms of
            # compute per batch that path is otherwise at the mercy of
            # the ~3 ms per-dispatch relay latency).
            self._noise_u8_step = (
                lambda yuv: noise_batch_u8_fused(yuv, self.fast_noise))
            self._noise_raster_jit = jax.jit(lambda yuv: _to_bgr_u8_batch(
                noise_batch_fast(yuv, self.fast_noise)))
        elif self.mode == "noise_scale":
            # plane-form (unjitted: the scale step it feeds is multi-
            # program by design): the denoised Y feeds the scale step's
            # `y=` override — no full-res YUV rewrite between the stacks,
            # and the handoff keeps the noise kernel's dtype (f32 under
            # the quality policy, bf16 in throughput mode — the scale
            # step casts to its own dtype either way)
            self._noise_y_step = (
                lambda yuv: noise_y_batch_fast(yuv[..., 0],
                                               self.fast_noise,
                                               out_dtype=None))

    # -- per-shape batching ------------------------------------------------

    def _shape_batch(self, h: int, w: int) -> int:
        """Per-dispatch frame cap for one geometry: the same pixel-volume
        bound the banded kernels use (pipeline.BAND_PX; the scale paths
        band rows once a dispatch exceeds it — capping the batch keeps
        large-frame dispatches at whole frames where possible).

        Scale modes additionally prefer the largest batch that keeps the
        2x step UNBANDED (round 4: the band-overlap recompute was the
        chained workloads' dominant loss; at 1080p, 4 unbanded frames
        beat 8 banded ones, 159 vs 157 MP/s) — floored at 2 frames so
        4K+ streams keep dispatch amortization and just band."""
        if self._mesh_pipe is not None:
            # per-DEVICE volume is what the BAND_PX rule bounds: the mesh
            # divides every frame by dy*sp and shards frames over dp, so
            # the cap scales with the mesh size; batches at least cover
            # the "dp" axis (short batches get frame-padded)
            nmesh = int(np.prod(self.mesh.devices.shape))
            cap = max(1, nmesh * (4 if self.mode == "noise" else 1)
                      * BAND_PX // max(1, h * w))
            return max(self.mesh.devices.shape[0],
                       min(max(self.batch, self.mesh.devices.shape[0]), cap))
        if self.mode == "noise":
            return max(1, min(self.batch, 4 * BAND_PX // max(1, h * w)))
        unbanded = BAND_PX // max(1, h * w)
        return max(1, min(self.batch, max(2, unbanded)))

    def _step(self, yuv: jax.Array) -> jax.Array:
        if self.mode == "noise":
            if yuv.shape[1] % 2 == 0 and yuv.shape[2] % 2 == 0:
                return self._noise_u8_step(yuv)
            return self._noise_raster_jit(yuv)
        if self.mode == "noise_scale":
            return scale2x_batch_u8_fused(yuv, self.fast,
                                          y=self._noise_y_step(yuv))
        return scale2x_batch_u8_fused(yuv, self.fast)

    def _interleave(self, out: np.ndarray) -> np.ndarray:
        # 16-lane outputs are channel-major polyphase u8 (zero-flop host
        # interleave): scale always, noise on even-dim frames; odd-dim
        # noise frames arrive as raster BGR
        return d2s_host_cmajor(out) if out.shape[-1] == 16 else out

    def _dispatch(self, frames: Sequence[np.ndarray], nbatch: int):
        n = len(frames)
        arr = np.stack(frames)
        if n < nbatch:  # pad the tail batch to the compiled shape
            arr = np.concatenate(
                [arr, np.repeat(arr[-1:], nbatch - n, axis=0)])
        if self._mesh_pipe is not None:
            # sharded chain: place the u8 batch on the mesh FIRST, then
            # the YUV transform and the composed chain run sharded; the
            # mesh pads dims, so retire crops to the frame's output size
            h, w = arr.shape[1], arr.shape[2]
            u8s = self._mesh_pipe.shard(jnp.asarray(arr))
            out = self._mesh_pipe._chain_u8(
                self._mesh_pipe._to_yuv()(u8s), (h, w))
            s = 1 if self.mode == "noise" else 2
            return out, n, (s * h, s * w)
        return self._step(_to_yuv_batch(jnp.asarray(arr))), n, None

    # -- ordered streaming -------------------------------------------------

    def process_frames(self, frames: Iterable[np.ndarray]
                       ) -> Iterator[np.ndarray]:
        """u8 BGR frames [h, w, 3] -> converted u8 BGR frames, in input
        order. Sizes may differ across frames: each distinct geometry is
        batched separately (one compiled program per shape), dispatch-ahead
        keeps the device busy, and outputs are re-ordered to input order.
        """
        bufs: dict[tuple, tuple[list[np.ndarray], list[int]]] = {}
        pending: list[tuple] = []   # (out_dev, n_valid, crop_hw, seqs)
        ready: dict[int, np.ndarray] = {}
        next_out = 0

        def retire(entry):
            out_dev, n_valid, crop_hw, seqs = entry
            host = self._interleave(np.asarray(out_dev))
            if crop_hw is not None:   # mesh-padded dims back to the frame's
                host = host[:, :crop_hw[0], :crop_hw[1]]
            for k, seq in enumerate(seqs[:n_valid]):
                ready[seq] = host[k]

        def drain():
            nonlocal next_out
            while next_out in ready:
                yield ready.pop(next_out)
                next_out += 1

        for seq, frame in enumerate(frames):
            key = frame.shape
            buf, seqs = bufs.setdefault(key, ([], []))
            buf.append(frame)
            seqs.append(seq)
            if len(buf) >= self._shape_batch(*key[:2]):
                pending.append((*self._dispatch(buf, len(buf)), seqs))
                bufs[key] = ([], [])
                if len(pending) > self.depth:
                    retire(pending.pop(0))
                    yield from drain()
        for key, (buf, seqs) in bufs.items():
            if buf:  # tail batches, padded to their shape's compiled size
                pending.append(
                    (*self._dispatch(buf, self._shape_batch(*key[:2])), seqs))
        for entry in pending:
            retire(entry)
        yield from drain()
        assert not ready, "stream re-ordering left frames behind"

    def process_paths(self, paths: Sequence[str], out_paths: Sequence[str],
                      jobs: int = 4, checkpoint: str | None = None) -> None:
        """Convert image files: threaded native decode, batched device
        conversion, PNG encode.

        checkpoint: optional cursor-file path. The stream is stateless and
        strictly ordered, so resumability is just a frame index: after each
        encoded output the cursor advances (atomic rename), and a restarted
        run skips the frames already on disk. (SURVEY §5: the reference has
        no checkpointing; a frame cursor is this pipeline's entire state.)
        """
        start = 0
        if checkpoint is not None:
            start = load_frame_cursor(checkpoint)
            if start >= len(paths):
                return

        def decoded() -> Iterator[np.ndarray]:
            # decode in batch-sized chunks (native thread pool per chunk)
            # so host RAM holds O(batch * depth) frames, not the whole
            # stream — process_frames consumes the iterator incrementally
            for c0 in range(start, len(paths), self.batch):
                yield from w2x_io.imread_batch_bgr(
                    list(paths[c0:c0 + self.batch]), jobs=jobs)

        for idx, result in zip(range(start, len(paths)),
                               self.process_frames(decoded())):
            w2x_io.imwrite_bgr(out_paths[idx], result)
            if checkpoint is not None:
                save_frame_cursor(checkpoint, idx + 1)
