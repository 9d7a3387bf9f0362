"""Sharded polyphase fast path == single-device fast path, bit-exact.

Runs the real shard_map + ppermute halo-exchange code on the 8-device
virtual CPU mesh (conftest.py), with the Pallas kernels in interpret mode —
the same code path a TPU pod slice executes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
from waifu2x_tpu.parallel.fast_sharded import (
    convert_batch_on_mesh,
    make_mesh,
    scale2x_u8_s2d_sharded,
)
from waifu2x_tpu.pipeline import FastStack, scale2x_batch_u8_s2d


@pytest.fixture(scope="module")
def fast():
    params = init_params(jax.random.PRNGKey(5), WAIFU2X_7LAYER)
    return FastStack.build(params, scale_input=True, tile=(16, 16),
                           interpret=True, dtype=jnp.float32)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4), (4, 2)])
def test_sharded_matches_single_device(fast, rng, shape):
    yuv = jnp.asarray(rng.random((4, 24, 40, 3), dtype=np.float32))
    ref = np.asarray(scale2x_batch_u8_s2d(yuv, fast))
    mesh = make_mesh(shape)
    got = np.asarray(scale2x_u8_s2d_sharded(yuv, fast, mesh))
    np.testing.assert_array_equal(got, ref)


def test_sharded_pad_and_crop(fast, rng):
    # width 37 does not divide sp=4 -> pad path
    yuv = jnp.asarray(rng.random((2, 16, 37, 3), dtype=np.float32))
    ref = np.asarray(scale2x_batch_u8_s2d(yuv, fast))
    mesh = make_mesh((2, 4))
    got = np.asarray(convert_batch_on_mesh(yuv, fast, mesh))
    np.testing.assert_array_equal(got, ref)


@pytest.fixture(scope="module")
def fast_noise():
    params = init_params(jax.random.PRNGKey(6), WAIFU2X_7LAYER)
    return FastStack.build(params, scale_input=False, tile=(16, 16),
                           interpret=True, dtype=jnp.float32)


@pytest.mark.parametrize("shape", [(1, 8), (2, 4)])
def test_sharded_noise_matches_single_device(fast_noise, rng, shape):
    from waifu2x_tpu.parallel.fast_sharded import noise_plane_sharded
    y = jnp.asarray(rng.random((2, 20, 80, 3), dtype=np.float32))[..., 0]
    ref = np.asarray(fast_noise.noise(y))
    mesh = make_mesh(shape)
    got = np.asarray(noise_plane_sharded(y, fast_noise, mesh))
    np.testing.assert_array_equal(got, ref)


def test_sharded_noise_odd_width(fast_noise, rng):
    from waifu2x_tpu.parallel.fast_sharded import noise_batch_on_mesh
    y = jnp.asarray(rng.random((2, 18, 69), dtype=np.float32))
    ref = np.asarray(fast_noise.noise(y))
    mesh = make_mesh((2, 4))
    got = np.asarray(noise_batch_on_mesh(y, fast_noise, mesh))
    np.testing.assert_array_equal(got, ref)
