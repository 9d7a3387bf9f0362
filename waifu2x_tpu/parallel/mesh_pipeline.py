"""Product-surface multi-device pipeline — the COMPOSED conversion chain
on a ("dp", "dy", "sp") mesh.

parallel/fast_sharded.py certifies the single-step sharded twins (one 2x
step, one noise pass, width-only halos). This module is what the product
surfaces (cli.py --mesh, stream.StreamConverter(mesh=...), pipeline.
Converter) actually run on a multi-chip host: the reference's full
main.cpp chain — noise phase feeding the scale phase (main.cpp:82-100 ->
104-169), ceil(log2 ratio) chained 2x iterations, and the final LINEAR
shrink (main.cpp:158-167) — sharded over frames ("dp") and BOTH spatial
axes ("dy" rows x "sp" cols), replacing the reference's sequential 2-D
block tiler (convertRoutine.cpp:100-131) with lax.ppermute halo exchange
over ICI.

Layout/stage design:
  * Halos are exchanged per stage, rows first then columns of the
    row-extended block, so corner pixels arrive via the column neighbor
    without diagonal sends (same scheme as parallel/sharded.py). Each
    stage is locally exact given exact inputs, so the composed chain is
    bit-equal to the single-device fused path (tests/test_mesh_pipeline.py
    and __graft_entry__.dryrun_multichip assert this).
  * Between scale iterations the polyphase output is interleaved LOCALLY
    (ops/s2d.d2s): a width/height shard of the s2d grid maps to a
    contiguous full-res shard, so no data moves and the next iteration's
    shard_map consumes the same placement.
  * The noise->scale handoff mirrors the single-device `y=` override
    (pipeline._fused_step): the denoised plane flows in the NOISE kernel's
    dtype (f32 under the quality policy, bf16 in throughput mode) and the
    scale stage reads U/V from the original YUV — no full-res rewrite.
  * The final non-power-of-2 shrink + raster u8 cast runs as ONE jitted
    program over the sharded array with GSPMD partitioning (XLA inserts
    the boundary collectives for the 2-tap LINEAR stencil); per-pixel math
    is identical to pipeline._shrink + _to_bgr_u8.

Per-device HBM: each device sees 1/(dp*dy*sp) of every frame plus
O(halo) rims, so the footprint the single-device path row-bands against
(pipeline.BAND_PX) shrinks with the mesh; the stream layer still caps
per-dispatch volume by the same rule, counting the mesh size.

Multi-host: unchanged under jax.distributed.initialize — the mesh spans
hosts and ppermute rides ICI within a slice / DCN across
(parallel/multihost.py, tools/multiproc_worker.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from waifu2x_tpu.ops.color import (
    bgr_to_yuv,
    saturate_cast_u8,
    u8_to_unit_f32,
    yuv_to_bgr,
)
from waifu2x_tpu.ops.resize import CUBIC, LINEAR, resize, resize2x_phases
from waifu2x_tpu.ops.s2d import d2s, d2s_host_cmajor
from waifu2x_tpu.pipeline import FastStack, _combine_u8_cmajor, scale_plan

HALO_SCALE = 4   # low-res px: ceil(7/2) for the stack + 2 for bicubic U/V
HALO_NOISE = 8   # full-res px: stack receptive radius 7, kept even so the
#                  halo-extended shard preserves s2d parity


def make_mesh3(shape: "tuple[int, int, int] | None" = None,
               devices=None) -> Mesh:
    """A ("dp", "dy", "sp") mesh: frames x image rows x image columns."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (1, 1, len(devices))
    dp, dy, sp = shape
    if dp * dy * sp != len(devices):
        raise ValueError(f"mesh {shape} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(dp, dy, sp), ("dp", "dy", "sp"))


def auto_spatial_shape(n_devices: int, h: int, w: int,
                       min_shard: int = 128) -> tuple[int, int, int]:
    """Pick (1, dy, sp) for a single-image conversion: use as many devices
    as the geometry permits (each spatial shard stays >= min_shard px on
    both axes — halo overhead ~ halo/min_shard), splitting the axes to
    keep shards close to the image's aspect (a portrait scan shards rows,
    a wide frame columns — the reference's tiler is 2-D for the same
    reason, convertRoutine.cpp:100-131)."""
    best = (1, 1, 1)
    best_score = -1.0
    for m in range(1, n_devices + 1):
        for dy in range(1, m + 1):
            if m % dy:
                continue
            sp = m // dy
            sh, sw = h / dy, w / sp
            if sh < min_shard or sw < min_shard:
                continue
            # prefer more devices; break ties toward square-ish shards
            score = m * 1000.0 + min(sh, sw) / max(sh, sw)
            if score > best_score:
                best_score, best = score, (1, dy, sp)
    return best


def _halo(x: jax.Array, k: int, axis_name: str, axis: int) -> jax.Array:
    """Attach k halo slices along array axis `axis` from mesh neighbors
    along `axis_name`; replicate own edge at true image borders (exactly
    BORDER_REPLICATE, convertRoutine.cpp:35-36 semantics)."""
    n = lax.axis_size(axis_name)
    size = x.shape[axis]
    if n > 1 and size < k:
        raise ValueError(
            f"shard ({size} px on axis {axis}) narrower than the {k}-px "
            f"halo — use fewer '{axis_name}' devices for this image")
    first = lax.slice_in_dim(x, 0, 1, axis=axis)
    last = lax.slice_in_dim(x, size - 1, size, axis=axis)
    lo_edge = jnp.repeat(first, k, axis)
    hi_edge = jnp.repeat(last, k, axis)
    if n == 1:
        return jnp.concatenate([lo_edge, x, hi_edge], axis=axis)
    idx = lax.axis_index(axis_name)
    fwd = [(i, i + 1) for i in range(n - 1)]   # my high edge -> next's low
    bwd = [(i + 1, i) for i in range(n - 1)]   # my low edge -> prev's high
    from_lo = lax.ppermute(
        lax.slice_in_dim(x, size - k, size, axis=axis), axis_name, fwd)
    from_hi = lax.ppermute(
        lax.slice_in_dim(x, 0, k, axis=axis), axis_name, bwd)
    lo = jnp.where(idx == 0, lo_edge, from_lo)
    hi = jnp.where(idx == n - 1, hi_edge, from_hi)
    return jnp.concatenate([lo, x, hi], axis=axis)


def _halo2d(x: jax.Array, k: int) -> jax.Array:
    """[n, h, w, ...] local shard -> [n, h+2k, w+2k, ...] with halos from
    both spatial mesh axes: rows ("dy") first, then columns ("sp") of the
    row-extended block — the column strips then carry the vertical
    neighbors' rows, so corners arrive without diagonal sends."""
    return _halo(_halo(x, k, "dy", 1), k, "sp", 2)


# ---------------------------------------------------------------------------
# the composed pipeline
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MeshPipeline:
    """The full conversion chain compiled over a ("dp","dy","sp") mesh.

    mesh:       from make_mesh3.
    fast_scale: FastStack (scale model) — required unless mode="noise".
    fast_noise: FastStack (noise model) — required for noise modes; its
                dtype IS the handoff dtype (the `y=` override contract).
    mode:       noise | scale | noise_scale (main.cpp modes).
    scale_ratio: drives iters/shrink via pipeline.scale_plan (the
                ceil(log2) + int-compare quirk of main.cpp:107-114).
    """

    mesh: Mesh
    fast_scale: "FastStack | None" = None
    fast_noise: "FastStack | None" = None
    mode: str = "scale"
    scale_ratio: float = 2.0

    def __post_init__(self):
        if self.mode not in ("noise", "scale", "noise_scale"):
            raise ValueError(f"invalid mode: {self.mode!r}")
        if self.mode != "noise" and self.fast_scale is None:
            raise ValueError(f"mode {self.mode!r} needs fast_scale")
        if self.mode != "scale" and self.fast_noise is None:
            raise ValueError(f"mode {self.mode!r} needs fast_noise")
        if tuple(self.mesh.axis_names) != ("dp", "dy", "sp"):
            raise ValueError(
                f"MeshPipeline needs a ('dp','dy','sp') mesh (make_mesh3), "
                f"got axes {self.mesh.axis_names}")
        self.iters, self.shrink = (
            scale_plan(self.scale_ratio) if self.mode != "noise" else (0, 0.0))
        self._jits: dict = {}
        self._warned_volume = False

    # -- stage programs (built once, jit-cached per input shape) ----------

    def _yuv_spec(self):
        return P("dp", "dy", "sp", None)

    def _stage(self, name, body, in_specs, out_specs):
        if name not in self._jits:
            self._jits[name] = jax.jit(shard_map(
                body, mesh=self.mesh, in_specs=in_specs,
                out_specs=out_specs, check_vma=False))
        return self._jits[name]

    def _noise_y(self):
        """Denoise stage: f32 YUV [N,H,W,3] -> Y plane [N,H,W] in the
        noise kernel's dtype (the single-device noise_y_batch_fast
        out_dtype=None handoff)."""
        fast = self.fast_noise

        def body(yuv_loc):
            ext = _halo2d(yuv_loc[..., 0], HALO_NOISE)
            y = fast.noise(ext)
            return y[:, HALO_NOISE:-HALO_NOISE, HALO_NOISE:-HALO_NOISE]

        return self._stage("noise_y", body, self._yuv_spec(),
                           P("dp", "dy", "sp"))

    def _noise_u8(self):
        """Noise-only output stage: f32 YUV [N,H,W,3] (even local dims) ->
        u8 BGR cmajor [N,H/2,W/2,16] — the same contract/math as
        pipeline.noise_batch_u8_fused's dense tail."""
        fast = self.fast_noise
        k = HALO_NOISE

        def body(yuv_loc):
            ext = _halo2d(yuv_loc[..., 0], k)
            ys = fast.noise_s2d(ext, crop=True)
            ys = ys[:, k // 2:-(k // 2), k // 2:-(k // 2), :]
            n, h, w = yuv_loc.shape[:3]
            hl, wl = h // 2, w // 2
            y2 = ys.astype(jnp.float32).reshape(n, hl, wl * 4)
            uv = yuv_loc[..., 1:3]
            ph = jnp.stack(
                [uv[:, a::2, b::2, :] for a in (0, 1) for b in (0, 1)],
                axis=3)                                   # [n,hl,wl,4,2]
            u2 = ph[..., 0].reshape(n, hl, wl * 4)
            v2 = ph[..., 1].reshape(n, hl, wl * 4)
            return _combine_u8_cmajor(y2, u2, v2, n, hl, wl)

        return self._stage("noise_u8", body, self._yuv_spec(),
                           self._yuv_spec())

    def _scale_mid(self, with_y: bool):
        """One full 2x iteration: f32 YUV [N,h,w,3] -> f32 YUV
        [N,2h,2w,3], interleaved locally (d2s is shard-local: a low-res
        shard maps to a contiguous full-res shard). with_y threads the
        denoised-plane override into the FIRST iteration of a noise_scale
        chain."""
        fast = self.fast_scale
        k = HALO_SCALE

        def body(yuv_loc, *y_loc):
            ext = _halo2d(yuv_loc, k)
            y_in = _halo2d(y_loc[0], k) if with_y else ext[..., 0]
            y_s2d = fast.scale(y_in)[:, k:-k, k:-k, :].astype(yuv_loc.dtype)
            uv = resize2x_phases(ext[..., 1:3], CUBIC, h_axis=1)
            uv = jnp.swapaxes(uv, -1, -2)[:, k:-k, k:-k]  # [n,h,w,4,2]
            s2d_out = jnp.concatenate([y_s2d[..., None], uv], axis=-1)
            n, h, w = s2d_out.shape[:3]
            return d2s(s2d_out.reshape(n, h, w, 12))

        in_specs = ((self._yuv_spec(), P("dp", "dy", "sp")) if with_y
                    else self._yuv_spec())
        return self._stage(f"scale_mid_{with_y}", body, in_specs,
                           self._yuv_spec())

    def _scale_u8(self, with_y: bool):
        """Final 2x iteration with the dense u8 tail: f32 YUV [N,h,w,3] ->
        u8 BGR cmajor [N,h,w,16] — same math as pipeline._tail_u8_cmajor
        (interleave with d2s_host_cmajor)."""
        fast = self.fast_scale
        k = HALO_SCALE

        def body(yuv_loc, *y_loc):
            ext = _halo2d(yuv_loc, k)
            y_in = _halo2d(y_loc[0], k) if with_y else ext[..., 0]
            y_s2d = fast.scale(y_in)[:, k:-k, k:-k, :]
            ph = resize2x_phases(ext[..., 1:3], CUBIC,
                                 h_axis=1)[:, k:-k, k:-k]  # [n,h,w,2,4]
            n, h, w = yuv_loc.shape[:3]
            y2 = y_s2d.astype(jnp.float32).reshape(n, h, w * 4)
            u2 = ph[..., 0, :].reshape(n, h, w * 4)
            v2 = ph[..., 1, :].reshape(n, h, w * 4)
            return _combine_u8_cmajor(y2, u2, v2, n, h, w)

        in_specs = ((self._yuv_spec(), P("dp", "dy", "sp")) if with_y
                    else self._yuv_spec())
        return self._stage(f"scale_u8_{with_y}", body, in_specs,
                           self._yuv_spec())

    def _finish_raster(self):
        """Crop the mesh padding, apply the final LINEAR shrink when the
        ratio demands one (main.cpp:158-167), and saturate-cast to u8 BGR —
        one jitted program over the sharded array; GSPMD partitions the
        2-tap stencil (same per-pixel math as pipeline._shrink +
        _to_bgr_u8)."""
        if "finish" not in self._jits:
            from functools import partial

            @partial(jax.jit, static_argnames=("crop", "dsize"))
            def finish(yuv, crop, dsize):
                n, h, w = crop
                x = yuv[:n, :h, :w, :]
                if dsize is not None:
                    x = resize(x, dsize, LINEAR, h_axis=1)
                return saturate_cast_u8(yuv_to_bgr(x))

            self._jits["finish"] = finish
        return self._jits["finish"]

    # -- padding / placement ---------------------------------------------

    def pad_to_mesh(self, yuv: jax.Array) -> jax.Array:
        """Edge-pad [N,H,W,3] so frames divide "dp" and every spatial
        shard is EVEN on both axes (s2d parity; replicate-pad composes
        with the stack's replicate borders, so cropping back is exact).
        Batch padding replicates the last frame (dropped on crop)."""
        dp, dy, sp = self.mesh.devices.shape
        n, h, w, _ = yuv.shape
        np_, hp, wp = (-(-n // dp) * dp, -(-h // (2 * dy)) * (2 * dy),
                       -(-w // (2 * sp)) * (2 * sp))
        if (np_, hp, wp) != (n, h, w):
            yuv = jnp.pad(yuv, ((0, np_ - n), (0, hp - h), (0, wp - w),
                                (0, 0)), mode="edge")
        return yuv

    def shard(self, yuv) -> jax.Array:
        arr = self.pad_to_mesh(jnp.asarray(yuv))
        # The mesh stages run UNBANDED (each stage is one program per
        # shard); the per-DEVICE dispatch volume must therefore respect
        # the same HBM budget the single-device path row-bands against
        # (pipeline.BAND_PX ~ the im2col/uvp/u8 temporaries' footprint).
        # A 4K frame per device fits (8.3M px < BAND_PX); 8K-per-device
        # does not — shard the spatial axes for such frames.
        from waifu2x_tpu.pipeline import BAND_PX
        n, h, w = arr.shape[:3]
        per_dev = n * h * w // self.mesh.devices.size
        if per_dev > BAND_PX and not self._warned_volume:
            self._warned_volume = True
            import logging
            logging.getLogger("w2x.mesh").warning(
                "mesh dispatch holds %.1fM px per device (> the %.1fM "
                "single-dispatch budget); use 'dy'/'sp' spatial axes or "
                "smaller batches for frames this large",
                per_dev / 1e6, BAND_PX / 1e6)
        return jax.device_put(arr,
                              NamedSharding(self.mesh, self._yuv_spec()))

    def min_image_hw(self) -> tuple[int, int]:
        """Smallest (h, w) this mesh can convert: every stage's halo must
        fit inside one shard (binding stage: the first — noise at full
        res, or the first 2x iteration at low res)."""
        _, dy, sp = self.mesh.devices.shape
        need = HALO_NOISE if self.mode != "scale" else 2 * HALO_SCALE
        return need * dy, need * sp

    # -- the chain --------------------------------------------------------

    def step_u8_cmajor(self, yuv) -> tuple[jax.Array, tuple[int, int, int]]:
        """Throughput step (no shrink; iters>=1 or noise mode): f32 YUV
        [N,H,W,3] -> (sharded u8 cmajor output, (n, out_h, out_w) crop
        dims for after d2s_host_cmajor interleave)."""
        n, h, w, _ = np.shape(yuv)
        out = self._chain_u8(self.shard(yuv), (h, w))
        s = 1 << self.iters
        return out, ((n, h, w) if self.mode == "noise"
                     else (n, s * h, s * w))

    def convert_yuv_raster(self, yuv) -> jax.Array:
        """Full chain incl. shrink, raster u8 BGR out (device-resident,
        sharded): the general path for shrink ratios / iters=0."""
        shape = np.shape(yuv)
        return self.convert_yuv_raster_presharded(self.shard(yuv), shape)

    def _fix_pad(self):
        """Re-replicate the mesh padding from the TRUE image edge after a
        kernel stage. The initial edge-pad makes every stage's INTERIOR
        exact, but a stage's output in the pad region is
        kernel(replicated-input) — NOT the replicate of the edge output
        that the reference's next phase would pad with (each phase pads
        its OWN input, main.cpp:82-169 + convertRoutine.cpp:35-36). A
        chained stage reads those pad columns as halo taps, so without
        this fix the last ~4 output columns/rows drift on padded images
        (caught by the odd-dim stream test)."""
        if "fix_pad" not in self._jits:
            from functools import partial

            @partial(jax.jit, static_argnames=("crop",))
            def fix(arr, crop):
                h, w = crop
                if w < arr.shape[2]:
                    edge = lax.slice_in_dim(arr, w - 1, w, axis=2)
                    mask = (jnp.arange(arr.shape[2]) >= w).reshape(
                        (1, 1, -1) + (1,) * (arr.ndim - 3))
                    arr = jnp.where(mask, edge, arr)
                if h < arr.shape[1]:
                    edge = lax.slice_in_dim(arr, h - 1, h, axis=1)
                    mask = (jnp.arange(arr.shape[1]) >= h).reshape(
                        (1, -1) + (1,) * (arr.ndim - 2))
                    arr = jnp.where(mask, edge, arr)
                return arr

            self._jits["fix_pad"] = fix
        return self._jits["fix_pad"]

    def _fixed(self, arr, h, w):
        """Apply _fix_pad only when padding exists (identity otherwise)."""
        if arr.shape[1] == h and arr.shape[2] == w:
            return arr
        return self._fix_pad()(arr, (h, w))

    def _rewrite_y(self):
        if "rewrite_y" not in self._jits:
            def body(yuv_loc, y_loc):
                return yuv_loc.at[..., 0].set(y_loc.astype(yuv_loc.dtype))
            self._jits["rewrite_y"] = jax.jit(shard_map(
                body, mesh=self.mesh,
                in_specs=(self._yuv_spec(), P("dp", "dy", "sp")),
                out_specs=self._yuv_spec(), check_vma=False))
        return self._jits["rewrite_y"]

    def convert_bgr_u8(self, bgr_u8: np.ndarray) -> np.ndarray:
        """The whole product path for a u8 BGR batch [N,H,W,3]: YUV
        transform, chain on mesh, gather, interleave/crop on host.
        Returns u8 BGR [N,H',W',3]."""
        n, h, w = bgr_u8.shape[:3]
        u8 = self.shard(jnp.asarray(bgr_u8))
        yuv = self._to_yuv()(u8)
        if self.shrink == 0.0 and (self.iters >= 1 or self.mode == "noise"):
            out = self._chain_u8(yuv, (h, w))
            host = d2s_host_cmajor(np.asarray(out))
            s = 1 if self.mode == "noise" else 1 << self.iters
            return host[:n, :s * h, :s * w]
        return np.asarray(self.convert_yuv_raster_presharded(yuv,
                                                             (n, h, w)))

    # pre-sharded variants (input already padded + placed) ----------------

    def _to_yuv(self):
        if "to_yuv" not in self._jits:
            self._jits["to_yuv"] = jax.jit(
                lambda u8: bgr_to_yuv(u8_to_unit_f32(u8)))
        return self._jits["to_yuv"]

    def _chain_u8(self, yuv_sharded, hw) -> jax.Array:
        """step_u8_cmajor body on an already padded+sharded f32 YUV array;
        hw = the LOGICAL (unpadded) image dims, needed to re-replicate the
        pad region between chained stages (_fix_pad)."""
        if self.shrink != 0.0 or (self.iters < 1 and self.mode != "noise"):
            raise ValueError("the u8-cmajor chain needs shrink == 0 and at "
                             "least one 2x iteration — use the raster path")
        h, w = hw
        cur = yuv_sharded
        if self.mode == "noise":
            return self._noise_u8()(cur)
        y = None
        if self.mode == "noise_scale":
            y = self._fixed(self._noise_y()(cur), h, w)
        for _ in range(self.iters - 1):
            if y is not None:
                cur, y = self._scale_mid(True)(cur, y), None
            else:
                cur = self._scale_mid(False)(cur)
            h, w = 2 * h, 2 * w
            cur = self._fixed(cur, h, w)
        return (self._scale_u8(True)(cur, y) if y is not None
                else self._scale_u8(False)(cur))

    def convert_yuv_raster_presharded(self, yuv_sharded,
                                      orig_shape) -> jax.Array:
        n, h, w = orig_shape[0], orig_shape[1], orig_shape[2]
        ch, cw = h, w
        cur = yuv_sharded
        y = None
        if self.mode != "scale":
            y = self._fixed(self._noise_y()(cur), ch, cw)
            if self.mode == "noise":
                cur = self._rewrite_y()(cur, y)
                y = None
        for _ in range(self.iters):
            if y is not None:
                cur, y = self._scale_mid(True)(cur, y), None
            else:
                cur = self._scale_mid(False)(cur)
            ch, cw = 2 * ch, 2 * cw
            cur = self._fixed(cur, ch, cw)
        s = 1 << self.iters
        dsize = None
        if self.shrink != 0.0:
            dsize = (int(s * h * self.shrink), int(s * w * self.shrink))
        return self._finish_raster()(cur, (n, s * h, s * w), dsize)
