"""Tile planner: tiled output must match the monolithic pass (the invariant
of the reference's block splitter, appendix/hints-jp.md:47-49), and match the
literal block-split oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waifu2x_tpu.models import ModelSpec, init_params
from waifu2x_tpu.models.srcnn import as_numpy
from waifu2x_tpu.ops import convert_plane
from waifu2x_tpu.parallel.tiles import (
    extract_tiles,
    plan_tiles,
    stitch_tiles,
    tiled_convert,
)
from tests import oracle

SMALL = ModelSpec.from_widths([1, 4, 4, 1])  # offset 3


def test_plan_geometry():
    plan = plan_tiles(100, 200, tile=64, offset=7)
    assert plan.stride == 50
    assert plan.ny == 2 and plan.nx == 4
    assert plan.hp == 100 and plan.wp == 200
    assert plan.n_tiles == 8
    plan2 = plan_tiles(101, 201, tile=64, offset=7)
    assert (plan2.ny, plan2.nx) == (3, 5)


def test_extract_stitch_roundtrip(rng):
    y = rng.random((45, 83), dtype=np.float32)
    plan = plan_tiles(45, 83, tile=32, offset=3)
    tiles = extract_tiles(jnp.asarray(y), plan)
    assert tiles.shape == (plan.n_tiles, 32, 32)
    # stitching the tile interiors of the *input* reproduces the input
    k = plan.offset
    interiors = tiles[:, k:-k, k:-k]
    np.testing.assert_array_equal(np.asarray(stitch_tiles(interiors, plan)), y)


@pytest.mark.parametrize("shape,tile", [((64, 64), 32), ((61, 77), 40)])
def test_tiled_equals_monolithic(rng, shape, tile):
    params = init_params(jax.random.PRNGKey(0), SMALL)
    y = rng.random(shape, dtype=np.float32)
    plan = plan_tiles(*shape, tile=tile, offset=3)
    got = np.asarray(tiled_convert(jnp.asarray(y), params, plan,
                                   batch_tiles=3))
    want = np.asarray(convert_plane(jnp.asarray(y), params))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


def test_tiled_matches_blocksplit_oracle(rng):
    """Our tiler vs the literal port of convertWithModelsBlockSplit."""
    params_np = as_numpy(init_params(jax.random.PRNGKey(1), SMALL))
    y = rng.random((70, 90), dtype=np.float32)
    plan = plan_tiles(70, 90, tile=32, offset=3)
    got = np.asarray(tiled_convert(jnp.asarray(y), params_np, plan))
    want = oracle.convert_with_models_block_split(y, params_np, block_size=32)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)


def test_batch_padding_harmless(rng):
    """n_tiles not divisible by batch_tiles must not corrupt output."""
    params = init_params(jax.random.PRNGKey(2), SMALL)
    y = rng.random((50, 50), dtype=np.float32)
    plan = plan_tiles(50, 50, tile=20, offset=3)  # stride 14 -> 4x4=16 tiles
    a = np.asarray(tiled_convert(jnp.asarray(y), params, plan, batch_tiles=5))
    b = np.asarray(tiled_convert(jnp.asarray(y), params, plan, batch_tiles=16))
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)
