"""Sharded halo-exchange execution on an 8-device virtual CPU mesh —
every mesh shape must be bit-equal to the monolithic pass (SURVEY.md §4(d))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waifu2x_tpu.models import ModelSpec, init_params, WAIFU2X_7LAYER
from waifu2x_tpu.ops import convert_plane
from waifu2x_tpu.parallel.sharded import (
    convert_plane_on_mesh,
    make_mesh,
    pad_to_mesh,
)

SMALL = ModelSpec.from_widths([1, 4, 4, 1])  # offset 3


@pytest.mark.parametrize("mesh_shape", [(1, 8), (8, 1), (2, 4), (4, 2)])
def test_sharded_equals_monolithic(rng, mesh_shape):
    mesh = make_mesh(mesh_shape)
    params = init_params(jax.random.PRNGKey(0), SMALL)
    y = rng.random((48, 64), dtype=np.float32)
    got = np.asarray(convert_plane_on_mesh(jnp.asarray(y), params, mesh))
    want = np.asarray(convert_plane(jnp.asarray(y), params))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


def test_sharded_non_divisible_shape(rng):
    """pad_to_mesh handles dims that don't divide the mesh."""
    mesh = make_mesh((2, 4))
    params = init_params(jax.random.PRNGKey(1), SMALL)
    y = rng.random((45, 61), dtype=np.float32)
    got = np.asarray(convert_plane_on_mesh(jnp.asarray(y), params, mesh))
    want = np.asarray(convert_plane(jnp.asarray(y), params))
    assert got.shape == want.shape == (45, 61)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


def test_sharded_full_arch(rng):
    """7-layer model (offset 7): halo width 7 across a 2x4 mesh."""
    mesh = make_mesh((2, 4))
    params = init_params(jax.random.PRNGKey(2), WAIFU2X_7LAYER)
    y = rng.random((32, 64), dtype=np.float32)
    got = np.asarray(convert_plane_on_mesh(jnp.asarray(y), params, mesh))
    want = np.asarray(convert_plane(jnp.asarray(y), params))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=0)


def test_pad_to_mesh_roundtrip(rng):
    mesh = make_mesh((2, 4))
    y = jnp.asarray(rng.random((13, 10), dtype=np.float32))
    yp, (h, w) = pad_to_mesh(y, mesh)
    assert yp.shape == (14, 12) and (h, w) == (13, 10)
    np.testing.assert_array_equal(np.asarray(yp)[:13, :10], np.asarray(y))
    # replicate semantics
    np.testing.assert_array_equal(np.asarray(yp)[13], np.asarray(yp)[12])


def test_mesh_validation():
    with pytest.raises(ValueError, match="devices"):
        make_mesh((3, 3))
