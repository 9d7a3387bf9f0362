"""Multi-device sharded execution — the TPU-native replacement for the
reference's sequential 512x512 block loop (convertRoutine.cpp:84-168).

Design (SURVEY.md §2 parallelism table + BASELINE.json north_star):
the image plane is sharded over a 2-D device mesh ("dy", "dx"); each device
holds one contiguous sub-plane, and the `offset`-pixel halo rims that the
reference recomputed redundantly per block are exchanged ONCE per stack with
`jax.lax.ppermute` collective permutes over ICI. Devices at true image edges
replicate-pad instead (exactly the reference's BORDER_REPLICATE).

Corner correctness: halos are exchanged in two phases — rows first, then
columns of the already row-extended block — so the column strips carry the
vertical neighbors' rows too, i.e. the diagonal (corner) pixels arrive via
the horizontal neighbor without any explicit diagonal sends. Output is
bit-equal to the monolithic pass (tests/test_sharded.py).

Multi-host: the same code runs unchanged under `jax.distributed.initialize`
— the mesh simply spans hosts, `ppermute` rides ICI within a slice and DCN
across, and jax.make_array_from_process_local_data feeds per-host shards
(see waifu2x_tpu.parallel.multihost).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from waifu2x_tpu.ops.convstack import conv_stack_valid


def make_mesh(shape: tuple[int, int] | None = None,
              devices=None) -> Mesh:
    """A ("dy", "dx") spatial mesh. Default: all devices in one row (pure
    width sharding — fewest exchange phases for wide images)."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (1, len(devices))
    ny, nx = shape
    if ny * nx != len(devices):
        raise ValueError(f"mesh {shape} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(ny, nx), ("dy", "dx"))


def _exchange_rows(y: jax.Array, k: int, axis_name: str) -> jax.Array:
    """Attach k halo rows above/below from mesh neighbors along axis_name;
    replicate own edge rows at the true image boundary."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    if n == 1:
        return jnp.concatenate(
            [jnp.repeat(y[:1], k, 0), y, jnp.repeat(y[-1:], k, 0)], axis=0)
    down = [(i, i + 1) for i in range(n - 1)]   # my bottom rows -> next's top
    up = [(i + 1, i) for i in range(n - 1)]     # my top rows -> prev's bottom
    from_above = lax.ppermute(y[-k:], axis_name, down)
    from_below = lax.ppermute(y[:k], axis_name, up)
    top = jnp.where(idx == 0, jnp.repeat(y[:1], k, 0), from_above)
    bot = jnp.where(idx == n - 1, jnp.repeat(y[-1:], k, 0), from_below)
    return jnp.concatenate([top, y, bot], axis=0)


def _halo_extend(y_loc: jax.Array, k: int) -> jax.Array:
    """[h, w] local shard -> [h+2k, w+2k] with halos from both mesh dims.
    Rows first, then columns of the row-extended block (corners ride along).
    """
    y_rows = _exchange_rows(y_loc, k, "dy")
    y_full = _exchange_rows(y_rows.T, k, "dx").T
    return y_full


def sharded_convert_plane(y: jax.Array, params, mesh: Mesh,
                          precision: str | None = None) -> jax.Array:
    """Run the conv stack on a plane sharded over a ("dy","dx") mesh.

    y: f32[H, W] with H % mesh.dy == 0, W % mesh.dx == 0 (pad first via
    pad_to_mesh). Returns f32[H, W], sharded the same way, bit-equal to
    convert_plane."""
    offset = sum(int(p["w"].shape[0]) // 2 for p in params)

    def local_fn(y_loc, *flat_params):
        pt = jax.tree.unflatten(params_treedef, flat_params)
        ext = _halo_extend(y_loc, offset)
        return conv_stack_valid(ext[None, ..., None], pt,
                                precision=precision)[0, ..., 0]

    flat_params, params_treedef = jax.tree.flatten(params)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("dy", "dx"),) + (P(),) * len(flat_params),
        out_specs=P("dy", "dx"),
    )
    return fn(y, *flat_params)


def pad_to_mesh(y: jax.Array, mesh: Mesh) -> tuple[jax.Array, tuple[int, int]]:
    """Edge-pad a plane so both dims divide the mesh shape (replicate rows
    beyond the image are halo-consistent: replicate∘replicate=replicate)."""
    ny, nx = mesh.devices.shape
    h, w = y.shape
    hp = -(-h // ny) * ny
    wp = -(-w // nx) * nx
    if (hp, wp) != (h, w):
        y = jnp.pad(y, ((0, hp - h), (0, wp - w)), mode="edge")
    return y, (h, w)


@partial(jax.jit, static_argnames=("mesh", "precision"))
def _sharded_convert_padded(y, params, mesh, precision):
    return sharded_convert_plane(y, params, mesh, precision)


def convert_plane_on_mesh(y: jax.Array, params, mesh: Mesh,
                          precision: str | None = None) -> jax.Array:
    """Convenience wrapper: pad -> shard -> convert -> crop."""
    yp, (h, w) = pad_to_mesh(y, mesh)
    sharding = NamedSharding(mesh, P("dy", "dx"))
    yp = jax.device_put(yp, sharding)
    out = _sharded_convert_padded(yp, params, mesh, precision)
    return out[:h, :w]
