"""Resize ops vs OpenCV's cv::resize (the reference's three modes)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from waifu2x_tpu.ops.resize import CUBIC, LINEAR, NEAREST, resize

_CV = {NEAREST: cv2.INTER_NEAREST, LINEAR: cv2.INTER_LINEAR,
       CUBIC: cv2.INTER_CUBIC}


def _cmp(img, dsize, interp, atol):
    dh, dw = dsize
    want = cv2.resize(img, (dw, dh), interpolation=_CV[interp])
    got = np.asarray(resize(jnp.asarray(img), dsize, interp))
    if want.ndim < got.ndim:  # cv2 squeezes single-channel
        want = want.reshape(got.shape)
    np.testing.assert_allclose(got, want, atol=atol, rtol=0)


@pytest.mark.parametrize("shape", [(16, 24), (17, 31)])
def test_nearest_2x(rng, shape):
    img = rng.random(shape, dtype=np.float32)
    _cmp(img, (shape[0] * 2, shape[1] * 2), NEAREST, 0)  # exact


def test_nearest_2x_3ch(rng):
    img = rng.random((10, 14, 3), dtype=np.float32)
    _cmp(img, (20, 28), NEAREST, 0)


@pytest.mark.parametrize("shape", [(16, 24), (33, 47)])
def test_cubic_2x(rng, shape):
    img = rng.random((*shape, 3), dtype=np.float32)
    _cmp(img, (shape[0] * 2, shape[1] * 2), CUBIC, 1e-5)


@pytest.mark.parametrize(
    "src,dst",
    [((64, 64), (40, 40)), ((50, 70), (33, 59)), ((31, 33), (62, 66))],
)
def test_linear_arbitrary(rng, src, dst):
    img = rng.random((*src, 3), dtype=np.float32)
    _cmp(img, dst, LINEAR, 1e-5)


@pytest.mark.parametrize(
    "src,dst",
    [((20, 20), (57, 43)), ((40, 40), (20, 20))],
)
def test_cubic_arbitrary(rng, src, dst):
    img = rng.random(src, dtype=np.float32)
    _cmp(img, dst, CUBIC, 2e-5)


def test_identity_is_noop(rng):
    img = rng.random((9, 9), dtype=np.float32)
    got = np.asarray(resize(jnp.asarray(img), (9, 9), CUBIC))
    np.testing.assert_array_equal(got, img)


def test_nearest_arbitrary_matches_cv2(rng):
    img = rng.random((13, 17), dtype=np.float32)
    _cmp(img, (29, 23), NEAREST, 0)
