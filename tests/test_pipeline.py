"""End-to-end pipeline vs the cv2-based executable spec of main.cpp.

These are the golden tests SURVEY.md §4 calls for: full conversions compared
against a reference implementation built on OpenCV itself, PSNR >= 50 dB
(BASELINE.json target) and near-bit equality."""

import numpy as np
import pytest

from waifu2x_tpu.config import Config
from waifu2x_tpu.models import ModelSpec, init_params
from waifu2x_tpu.models.srcnn import as_numpy, WAIFU2X_7LAYER
from waifu2x_tpu.models.zoo import identity_params
from waifu2x_tpu.pipeline import convert_image, scale_plan
from waifu2x_tpu.utils.metrics import psnr
from tests.oracle_pipeline import reference_pipeline

SMALL = ModelSpec.from_widths([1, 4, 4, 1])


def _img(rng, h=40, w=48):
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _params(seed, spec=SMALL):
    import jax
    return as_numpy(init_params(jax.random.PRNGKey(seed), spec))


def test_scale_plan_quirk():
    """Replicates main.cpp:107-114's int-vs-double comparison."""
    assert scale_plan(2.0) == (1, 0.0)
    assert scale_plan(4.0) == (2, 0.0)
    assert scale_plan(1.0) == (0, 0.0)
    iters, shrink = scale_plan(2.5)
    assert iters == 2 and abs(shrink - 0.625) < 1e-12
    iters, shrink = scale_plan(1.5)
    assert iters == 1 and abs(shrink - 0.75) < 1e-12
    # 3.9999 -> iters 2, int(3.9999)=3 != 4 -> shrink ~0.999975 (quirk kept)
    iters, shrink = scale_plan(3.9999)
    assert iters == 2 and shrink != 0.0


@pytest.mark.parametrize("mode", ["noise", "scale", "noise_scale"])
def test_pipeline_matches_reference_spec(rng, mode):
    img = _img(rng)
    noise_p = _params(10)
    scale_p = _params(11)
    cfg = Config(mode=mode, scale_ratio=2.0)
    got = convert_image(img, cfg, noise_params=noise_p, scale_params=scale_p)
    want = reference_pipeline(img, mode, 2.0, noise_p, scale_p)
    assert got.shape == want.shape
    assert got.dtype == np.uint8
    p = psnr(got, want)
    assert p > 50, f"PSNR {p:.1f} dB below target"
    # near-bit equality: u8 off-by-one rounding at most, on few pixels
    assert np.mean(np.abs(got.astype(int) - want.astype(int)) > 1) < 1e-3


@pytest.mark.parametrize("ratio", [1.5, 2.5, 4.0])
def test_pipeline_arbitrary_ratio(rng, ratio):
    img = _img(rng, 30, 30)
    scale_p = _params(12)
    cfg = Config(mode="scale", scale_ratio=ratio)
    got = convert_image(img, cfg, scale_params=scale_p)
    want = reference_pipeline(img, "scale", ratio, None, scale_p)
    assert got.shape == want.shape
    assert psnr(got, want) > 50


def test_pipeline_full_arch_tiny(rng):
    """Real 7-layer architecture end-to-end on a tiny image."""
    img = _img(rng, 24, 24)
    p7 = _params(13, WAIFU2X_7LAYER)
    cfg = Config(mode="noise")
    got = convert_image(img, cfg, noise_params=p7)
    want = reference_pipeline(img, "noise", 2.0, p7, None)
    assert psnr(got, want) > 50


def test_pipeline_tiled_path_engages(rng):
    """Image above the split threshold goes through the tiler and still
    matches the reference spec (which also block-splits at that size)."""
    img = _img(rng, 90, 90)
    noise_p = _params(14)
    cfg = Config(mode="noise", block_size=64, tile_size=64)
    got = convert_image(img, cfg, noise_params=noise_p)
    want = reference_pipeline(img, "noise", 2.0, noise_p, None,
                              block_size=64)
    assert psnr(got, want) > 50


def test_identity_model_is_noop_on_y(rng):
    """The placeholder zoo models must leave the image unchanged (identity
    stack; LeakyReLU is identity on non-negative luma)."""
    img = _img(rng, 20, 20)
    p = identity_params(SMALL)
    cfg = Config(mode="noise")
    got = convert_image(img, cfg, noise_params=p)
    np.testing.assert_array_equal(got, reference_pipeline(
        img, "noise", 2.0, p, None))
    # and vs a pure color-roundtrip (no CNN): identical
    got2 = convert_image(img, Config(mode="noise"), noise_params=p)
    np.testing.assert_array_equal(got, got2)


@pytest.mark.slow
def test_convert_image_honors_use_pallas(rng):
    """convert_image must route through the fused Pallas path when the
    config asks for it (use_pallas was previously ignored by the one-shot
    API). bf16 kernels vs the f32 XLA path: within ~1 u8 step."""
    img = _img(rng, 24, 32)
    scale_p = _params(12, WAIFU2X_7LAYER)
    cfg_xla = Config(mode="scale", use_pallas=False)
    cfg_pal = Config(mode="scale", use_pallas=True)
    a = convert_image(img, cfg_xla, scale_params=scale_p)
    b = convert_image(img, cfg_pal, scale_params=scale_p)
    assert a.shape == b.shape
    assert psnr(a, b) > 50
    # explicit f32 kernels (compute_dtype honored on the Pallas path too)
    cfg_f32 = Config(mode="scale", use_pallas=True, compute_dtype="float32")
    c = convert_image(img, cfg_f32, scale_params=scale_p)
    diff = np.abs(a.astype(int) - c.astype(int))
    assert diff.max() <= 1
