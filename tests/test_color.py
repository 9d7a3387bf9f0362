"""Color transforms vs OpenCV (the reference's cvtColor, main.cpp:76/171)."""

import cv2
import numpy as np
import jax.numpy as jnp

from waifu2x_tpu.ops.color import (
    bgr_to_yuv,
    saturate_cast_u8,
    u8_to_unit_f32,
    yuv_to_bgr,
)


def test_forward_matches_cv2(rng):
    img = rng.random((37, 53, 3), dtype=np.float32)
    want = cv2.cvtColor(img, cv2.COLOR_RGB2YUV)
    got = np.asarray(bgr_to_yuv(jnp.asarray(img)))
    np.testing.assert_allclose(got, want, atol=3e-7, rtol=0)


def test_inverse_matches_cv2(rng):
    img = rng.random((37, 53, 3), dtype=np.float32)
    want = cv2.cvtColor(img, cv2.COLOR_YUV2RGB)
    got = np.asarray(yuv_to_bgr(jnp.asarray(img)))
    np.testing.assert_allclose(got, want, atol=5e-7, rtol=0)


def test_roundtrip_quirk_preserves_colors(rng):
    """BGR data through RGB2YUV then YUV2RGB comes back as the same BGR —
    the reference's channel-order quirk is lossless end-to-end."""
    bgr = rng.random((16, 16, 3), dtype=np.float32)
    back = np.asarray(yuv_to_bgr(bgr_to_yuv(jnp.asarray(bgr))))
    # OpenCV's forward/inverse matrices are not exact inverses (rounded
    # constants); fidelity bar = identical to OpenCV's own roundtrip.
    back_cv = cv2.cvtColor(cv2.cvtColor(bgr, cv2.COLOR_RGB2YUV),
                           cv2.COLOR_YUV2RGB)
    np.testing.assert_allclose(back, back_cv, atol=1e-6, rtol=0)
    np.testing.assert_allclose(back, bgr, atol=2e-3, rtol=0)


def test_saturate_cast_semantics():
    """convertTo(CV_8U, 255.0) = saturate_cast<uchar>(cvRound(x*255)):
    round-half-to-even + clamp (main.cpp:172). Checked on exact values
    including .5 ties and out-of-gamut inputs."""
    x = np.array(
        [-0.5, -0.001, 0.0, 0.5 / 255, 1.5 / 255, 2.5 / 255, 0.999, 1.0, 1.7],
        np.float32,
    )
    got = np.asarray(saturate_cast_u8(jnp.asarray(x)))
    #            clamp  clamp  0   tie->0 tie->2 tie->2  255   255  clamp
    want = np.array([0, 0, 0, 0, 2, 2, 255, 255, 255], np.uint8)
    np.testing.assert_array_equal(got, want)


def test_saturate_cast_matches_cv2_on_real_data(rng):
    img = rng.random((32, 32, 3), dtype=np.float32)
    # cv2.Mat convertTo semantics via multiply + cvRound path:
    ref = np.clip(np.rint(img.astype(np.float64) * 255.0), 0, 255).astype(np.uint8)
    cvref = cv2.convertScaleAbs(img, alpha=255.0)  # same for non-negative in
    got = np.asarray(saturate_cast_u8(jnp.asarray(img)))
    mismatch = np.mean(got != cvref)
    assert mismatch < 2e-3  # float32-vs-float64 scaling ties only
    np.testing.assert_array_equal(got, np.clip(np.rint(img * 255.0), 0, 255)
                                  .astype(np.uint8))
    del ref


def test_u8_to_f32(rng):
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    got = np.asarray(u8_to_unit_f32(jnp.asarray(img)))
    want = img.astype(np.float32) * (1.0 / 255.0)
    np.testing.assert_array_equal(got, want)
