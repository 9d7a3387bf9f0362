"""Single-chip tile planner — batched halo tiling for large images.

TPU-native replacement for the reference's sequential block splitter
(convertWithModelsBlockSplit, convertRoutine.cpp:84-168; design notes
appendix/hints-jp.md:42-63). Same halo invariant — every tile carries an
`offset`-pixel rim so stitched interiors are identical to a monolithic pass —
but rebuilt for XLA:

  * the image is edge-padded up to an exact tile-grid multiple (the trick the
    original Lua tiler used, reconstruct.lua:36-43), so every tile has ONE
    static shape and the conv stack compiles once — no remainder-block shapes;
    replicate(replicate(x)) == replicate(x), so results are unchanged.
  * tiles are batched on the leading (N) axis and processed in fixed-size
    chunks under lax.scan — the MXU sees [chunk, tile, tile, C] convs instead
    of the reference's 32k separate single-plane filter2D passes.
  * stitching is a reshape/transpose, not per-block copies.

The split DECISION (whether to tile at all) stays with the caller
(pipeline.py) which preserves the reference's W*H > blockW*blockH*3/2 rule.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from waifu2x_tpu.ops.convstack import conv_stack_valid


@dataclasses.dataclass(frozen=True)
class TilePlan:
    h: int                # original plane height
    w: int                # original plane width
    tile: int             # tile side incl. halo (reference blockSize, 512)
    offset: int           # halo width = model receptive radius (7)
    ny: int               # tile grid rows
    nx: int               # tile grid cols
    stride: int           # tile - 2*offset (valid output per tile side)
    hp: int               # padded grid height = ny*stride
    wp: int               # padded grid width  = nx*stride

    @property
    def n_tiles(self) -> int:
        return self.ny * self.nx

    @property
    def redundancy(self) -> float:
        """Fraction of conv work spent on halos (for observability)."""
        useful = self.h * self.w
        done = self.n_tiles * self.tile * self.tile
        return 1.0 - useful / done


def plan_tiles(h: int, w: int, tile: int, offset: int) -> TilePlan:
    stride = tile - 2 * offset
    if stride <= 0:
        raise ValueError(f"tile ({tile}) must exceed 2*offset ({2 * offset})")
    ny = -(-h // stride)
    nx = -(-w // stride)
    return TilePlan(h, w, tile, offset, ny, nx, stride, ny * stride, nx * stride)


def extract_tiles(y: jax.Array, plan: TilePlan) -> jax.Array:
    """f32[H, W] -> f32[N, tile, tile] overlapping tiles (halo included)."""
    k, s = plan.offset, plan.stride
    yp = jnp.pad(
        y,
        ((k, k + plan.hp - plan.h), (k, k + plan.wp - plan.w)),
        mode="edge",
    )  # (hp + 2k, wp + 2k)
    r0 = np.arange(plan.ny) * s
    c0 = np.arange(plan.nx) * s
    # gather all tiles with two take-alongs: rows then cols (static indices)
    row_idx = (r0[:, None] + np.arange(plan.tile)[None, :]).reshape(-1)
    rows = jnp.take(yp, jnp.asarray(row_idx), axis=0)
    rows = rows.reshape(plan.ny, plan.tile, yp.shape[1])
    col_idx = (c0[:, None] + np.arange(plan.tile)[None, :]).reshape(-1)
    tiles = jnp.take(rows, jnp.asarray(col_idx), axis=2)
    tiles = tiles.reshape(plan.ny, plan.tile, plan.nx, plan.tile)
    return tiles.transpose(0, 2, 1, 3).reshape(-1, plan.tile, plan.tile)


def stitch_tiles(outs: jax.Array, plan: TilePlan) -> jax.Array:
    """f32[N, stride, stride] tile interiors -> f32[H, W] plane."""
    s = plan.stride
    grid = outs.reshape(plan.ny, plan.nx, s, s).transpose(0, 2, 1, 3)
    return grid.reshape(plan.hp, plan.wp)[: plan.h, : plan.w]


@partial(jax.jit,
         static_argnames=("plan", "batch_tiles", "precision"))
def tiled_convert(y: jax.Array, params, plan: TilePlan,
                  batch_tiles: int = 8, precision: str | None = None):
    """Run the conv stack over a plane via batched halo tiles.

    y: f32[H, W]. Returns f32[H, W]. Interiors match the monolithic pass
    (tests/test_tiles.py asserts this, mirroring the invariant of
    appendix/hints-jp.md:47-49)."""
    tiles = extract_tiles(y, plan)
    n = tiles.shape[0]
    b = max(1, min(batch_tiles, n))
    n_chunks = -(-n // b)
    pad_n = n_chunks * b - n
    if pad_n:
        tiles = jnp.concatenate([tiles, tiles[:pad_n]], axis=0)
    chunks = tiles.reshape(n_chunks, b, plan.tile, plan.tile, 1)

    def step(_, chunk):
        out = conv_stack_valid(chunk, params, precision=precision)
        return None, out[..., 0]

    _, outs = jax.lax.scan(step, None, chunks)
    outs = outs.reshape(n_chunks * b, plan.stride, plan.stride)[:n]
    return stitch_tiles(outs, plan)
