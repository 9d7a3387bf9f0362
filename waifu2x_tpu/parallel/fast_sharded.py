"""Multi-device polyphase fast path — shard_map over a ("dp", "sp") mesh.

The reference scales to large inputs with a sequential 512x512 block loop
and 7-px replicate halos (convertRoutine.cpp:84-168). The TPU-native
equivalent shards frames over "dp" (batch) and image width over "sp",
exchanges halos ONCE per step with lax.ppermute over ICI, and runs the
fused Pallas polyphase stack (ops/pallas_stack.py) on each device's shard.

Why a 4-column halo suffices: the whole 2x step runs on the LOW-RES grid
(s2d formulation), where the 7-layer stack's receptive radius is 7 full-res
px = 4 low-res px (and the polyphase bicubic needs 2). Each device extends
its width shard by 4 columns from its mesh neighbors (replicate at true
image edges — exactly BORDER_REPLICATE), runs the unchanged local kernels,
and crops 4 columns back: interior pixels see identical inputs to the
monolithic pass, so outputs are exact (tests/test_fast_sharded.py).

Multi-host: identical code under jax.distributed.initialize — the mesh
spans hosts and ppermute rides ICI within a slice / DCN across.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from waifu2x_tpu.ops.color import saturate_cast_u8, yuv_to_bgr
from waifu2x_tpu.ops.resize import CUBIC, resize2x_phases
from waifu2x_tpu.pipeline import FastStack

HALO = 4  # low-res columns: ceil(7 / 2) for the stack, >= 2 for bicubic


def _halo_cols(x: jax.Array, k: int, axis_name: str) -> jax.Array:
    """Attach k halo columns (axis 2 of [n, h, w, c]) from mesh neighbors
    along `axis_name`; replicate own edge columns at true image borders."""
    n = lax.axis_size(axis_name)
    if n > 1 and x.shape[2] < k:
        raise ValueError(
            f"width shard ({x.shape[2]} cols) narrower than the {k}-col "
            f"halo — use fewer 'sp' devices for this image width")
    left_edge = jnp.repeat(x[:, :, :1], k, 2)
    right_edge = jnp.repeat(x[:, :, -1:], k, 2)
    if n == 1:
        return jnp.concatenate([left_edge, x, right_edge], axis=2)
    idx = lax.axis_index(axis_name)
    fwd = [(i, i + 1) for i in range(n - 1)]   # my right cols -> next's left
    bwd = [(i + 1, i) for i in range(n - 1)]   # my left cols -> prev's right
    from_left = lax.ppermute(x[:, :, -k:], axis_name, fwd)
    from_right = lax.ppermute(x[:, :, :k], axis_name, bwd)
    left = jnp.where(idx == 0, left_edge, from_left)
    right = jnp.where(idx == n - 1, right_edge, from_right)
    return jnp.concatenate([left, x, right], axis=2)


def make_mesh(shape: tuple[int, int] | None = None, devices=None) -> Mesh:
    """A ("dp", "sp") mesh: frames data-parallel x width sharding."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (1, len(devices))
    dp, sp = shape
    if dp * sp != len(devices):
        raise ValueError(f"mesh {shape} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(dp, sp), ("dp", "sp"))


def scale2x_u8_s2d_sharded(yuv: jax.Array, fast: FastStack,
                           mesh: Mesh) -> jax.Array:
    """Sharded twin of pipeline.scale2x_batch_u8_s2d: f32 YUV [N, hl, wl, 3]
    -> uint8 BGR in polyphase layout [N, hl, wl, 12], sharded
    P("dp", None, "sp", None). Requires N % dp == 0 and wl % sp == 0
    (pad with pad_width_to_mesh first)."""

    def local(yuv_loc):
        ext = _halo_cols(yuv_loc, HALO, "sp")          # [nl, hl, wloc+8, 3]
        y_s2d = fast.scale(ext[..., 0])                # [nl, hl, wloc+8, 4]
        y_s2d = y_s2d[:, :, HALO:-HALO, :].astype(yuv_loc.dtype)
        uv = resize2x_phases(ext[..., 1:3], CUBIC, h_axis=1)
        uv = jnp.swapaxes(uv, -1, -2)[:, :, HALO:-HALO]  # [nl,hl,wloc,4,2]
        out = jnp.concatenate([y_s2d[..., None], uv], axis=-1)
        u8 = saturate_cast_u8(yuv_to_bgr(out))
        nl, h, w = u8.shape[:3]
        return u8.reshape(nl, h, w, 12)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=P("dp", None, "sp", None),
        out_specs=P("dp", None, "sp", None),
        check_vma=False,  # pallas_call outputs carry no vma annotation
    )
    return fn(yuv)


NOISE_HALO = 8   # full-res columns: stack receptive radius is 7; 8 keeps
#                  every shard's extended width even (s2d needs even dims)


def noise_plane_sharded(y: jax.Array, fast: FastStack,
                        mesh: Mesh) -> jax.Array:
    """Sharded twin of FastStack.noise: f32 Y plane [N, h, w] -> same shape,
    sharded P("dp", None, "sp"). The noise path runs at FULL resolution, so
    the halo is 8 full-res columns (vs 4 low-res for the 2x step). Requires
    N % dp == 0 and each width shard even (use noise_batch_on_mesh for
    arbitrary widths). The s2d phase decomposition inside stack_noise is
    offset-independent (it computes plain conv-stack semantics), so interior
    pixels match the monolithic pass exactly."""

    def local(y_loc):
        ext = _halo_cols(y_loc, NOISE_HALO, "sp")       # [nl, h, wloc+16]
        out = fast.noise(ext)
        return out[:, :, NOISE_HALO:-NOISE_HALO].astype(y_loc.dtype)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=P("dp", None, "sp"),
        out_specs=P("dp", None, "sp"),
        check_vma=False,
    )
    return fn(y)


def noise_batch_on_mesh(y: jax.Array, fast: FastStack,
                        mesh: Mesh) -> jax.Array:
    """Convenience wrapper: edge-pad width so every "sp" shard is even,
    shard, denoise, crop back."""
    sp = mesh.devices.shape[1]
    w = y.shape[2]
    wp = -(-w // (2 * sp)) * (2 * sp)
    if wp != w:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, wp - w)), mode="edge")
    sharding = NamedSharding(mesh, P("dp", None, "sp"))
    y = jax.device_put(y, sharding)
    return noise_plane_sharded(y, fast, mesh)[:, :, :w]


def pad_width_to_mesh(yuv: jax.Array, mesh: Mesh) -> tuple[jax.Array, int]:
    """Edge-pad width so it divides the "sp" axis; returns (padded, orig_w).
    Replicate-padding composes with the stack's own replicate borders, so
    cropping the output back is exact."""
    sp = mesh.devices.shape[1]
    w = yuv.shape[2]
    wp = -(-w // sp) * sp
    if wp != w:
        yuv = jnp.pad(yuv, ((0, 0), (0, 0), (0, wp - w), (0, 0)), mode="edge")
    return yuv, w


def convert_batch_on_mesh(yuv: jax.Array, fast: FastStack,
                          mesh: Mesh) -> jax.Array:
    """Convenience wrapper: pad -> shard -> 2x step -> crop. Returns the
    polyphase u8 output gathered per-shard (still device-resident)."""
    yp, w = pad_width_to_mesh(yuv, mesh)
    sharding = NamedSharding(mesh, P("dp", None, "sp", None))
    yp = jax.device_put(yp, sharding)
    out = scale2x_u8_s2d_sharded(yp, fast, mesh)
    return out[:, :, :w, :]
