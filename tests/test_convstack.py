"""Conv-stack correctness vs the literal NumPy oracle of the reference.

Proves the central equivalence the framework is built on: replicate-pad by
`offset` + VALID conv chain == the reference's pad + per-layer same-size
replicate-border filter2D + crop (convertRoutine.cpp:31-48)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waifu2x_tpu.models import ModelSpec, init_params, WAIFU2X_7LAYER
from waifu2x_tpu.models.srcnn import as_numpy
from waifu2x_tpu.ops import convert_plane, conv_stack_valid, leaky_relu
from tests import oracle

SMALL = ModelSpec.from_widths([1, 4, 4, 1])


def _rand_plane(rng, h, w):
    return rng.random((h, w), dtype=np.float32)


def test_leaky_relu_exact():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0], jnp.float32)
    xn = np.asarray(x)
    want = np.maximum(xn, 0) + np.float32(0.1) * np.minimum(xn, 0)
    np.testing.assert_array_equal(np.asarray(leaky_relu(x)), want)


@pytest.mark.parametrize("shape", [(24, 24), (17, 31)])
def test_single_layer_vs_oracle(rng, shape):
    params = as_numpy(init_params(jax.random.PRNGKey(0),
                                  ModelSpec.from_widths([1, 3, 1])))
    plane = _rand_plane(rng, *shape)
    # one layer, valid conv on a pre-padded plane vs oracle same-size layer
    got = np.asarray(convert_plane(jnp.asarray(plane), params))
    want = oracle.convert_with_models(plane, params, block_splitting=False)
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=0)


@pytest.mark.parametrize("shape", [(32, 32), (21, 45)])
def test_small_stack_vs_oracle(rng, shape):
    params = as_numpy(init_params(jax.random.PRNGKey(1), SMALL))
    plane = _rand_plane(rng, *shape)
    got = np.asarray(convert_plane(jnp.asarray(plane), params))
    want = oracle.convert_with_models(plane, params, block_splitting=False)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)


def test_full_7layer_vs_oracle(rng):
    """The real architecture (1->32->...->128->1) on a small image."""
    params = as_numpy(init_params(jax.random.PRNGKey(2), WAIFU2X_7LAYER))
    plane = _rand_plane(rng, 40, 40)
    got = np.asarray(convert_plane(jnp.asarray(plane), params))
    want = oracle.convert_with_models(plane, params, block_splitting=False)
    # float32 accumulation-order differences only
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=0)
    assert oracle.psnr(got * 255, want * 255) > 90


def test_batched_matches_single(rng):
    params = init_params(jax.random.PRNGKey(3), SMALL)
    planes = rng.random((3, 20, 20), dtype=np.float32)
    batched = np.asarray(convert_plane(jnp.asarray(planes), params))
    for i in range(3):
        single = np.asarray(convert_plane(jnp.asarray(planes[i]), params))
        np.testing.assert_array_equal(batched[i], single)


def test_valid_stack_shapes(rng):
    params = init_params(jax.random.PRNGKey(4), WAIFU2X_7LAYER)
    x = jnp.zeros((1, 30, 46, 1), jnp.float32)
    out = conv_stack_valid(x, params)
    assert out.shape == (1, 30 - 14, 46 - 14, 1)


def test_conv_is_correlation_not_convolution(rng):
    """An asymmetric kernel distinguishes correlation from convolution; the
    reference uses correlation (cv::filter2D, no flip)."""
    w = np.zeros((3, 3, 1, 1), np.float32)
    w[0, 1, 0, 0] = 1.0  # pick up the pixel ABOVE (dy=-1 after centering)
    params = ({"w": w, "b": np.zeros((1,), np.float32)},)
    plane = np.arange(25, dtype=np.float32).reshape(5, 5)
    got = np.asarray(convert_plane(jnp.asarray(plane), params))
    # leaky relu is identity here (all inputs >= 0)
    want = oracle.convert_with_models(plane, params, block_splitting=False)
    np.testing.assert_array_equal(got, want)
    # row 2 of output must equal row 1 of input (shift down == read above)
    np.testing.assert_array_equal(got[2], plane[1])


def test_fast_oracle_matches_exact_oracle(rng):
    """The BLAS twin of the oracle (oracle.model_filter_fast) must agree
    with the literal per-plane port to float-reordering tolerance on both
    the monolithic and block-split paths — it backs the PSNR-level demo
    fidelity tests at sizes where the exact oracle takes minutes."""
    spec = ModelSpec.from_widths([1, 6, 10, 1])
    params = as_numpy(init_params(jax.random.PRNGKey(9), spec))
    plane = rng.random((40, 52), dtype=np.float32)
    exact = oracle.convert_with_models(plane, params, block_splitting=False)
    fast = oracle.convert_with_models(plane, params, block_splitting=False,
                                      fast=True)
    np.testing.assert_allclose(fast, exact, rtol=0, atol=2e-5)
    # block-split path (tiny block size to force tiling)
    exact_b = oracle.convert_with_models(plane, params, block_size=16)
    fast_b = oracle.convert_with_models(plane, params, block_size=16,
                                        fast=True)
    np.testing.assert_allclose(fast_b, exact_b, rtol=0, atol=2e-5)
