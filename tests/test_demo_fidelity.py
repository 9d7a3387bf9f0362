"""End-to-end fidelity regression with the SHIPPED demo weights at a
realistic size (VERDICT r1 item 7; SURVEY §4 golden-output mandate).

The toy-spec golden tests (test_pipeline.py) pin pipeline *plumbing*; this
pins the flagship 7-layer path with the real trained models shipped in
models/*_demo.json, at >=512x512, against the cv2-based executable spec of
the reference main.cpp (tests/oracle_pipeline.py):

  * XLA path, highest precision, f32: measured ~96 dB -> bar 70 dB.
  * Fused Pallas path (interpret mode), bf16 params/activations like the
    TPU kernels: measured ~56 dB on TPU hardware -> bar 50 dB (the
    BASELINE.json product floor).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waifu2x_tpu.config import Config
from waifu2x_tpu.models.srcnn import as_numpy
from waifu2x_tpu.models.weights import load_model_json
from waifu2x_tpu.pipeline import Converter, FastStack
from waifu2x_tpu.utils.metrics import psnr
from tests.oracle_pipeline import reference_pipeline

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODELS = os.path.join(ROOT, "models")


def _natural_image(rng, h=512, w=512):
    """Synthetic but structured: smooth gradients, disks and boxes with
    antialiased edges plus mild noise — the content class the demo weights
    were trained on matters less than having both flats and edges."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        128 + 90 * np.sin(xx / 37.0) * np.cos(yy / 53.0),
        128 + 80 * np.cos((xx + yy) / 61.0),
        128 + 70 * np.sin(yy / 29.0),
    ], axis=-1)
    import cv2
    img = base.astype(np.float32)
    for k in range(12):
        c = (int(rng.integers(0, w)), int(rng.integers(0, h)))
        col = tuple(int(v) for v in rng.integers(0, 256, 3))
        if k % 2:
            cv2.circle(img, c, int(rng.integers(8, h // 6)), col, -1,
                       lineType=cv2.LINE_AA)
        else:
            c2 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            cv2.rectangle(img, c, c2, col, -1)
    img = cv2.GaussianBlur(img, (3, 3), 0)
    img += rng.normal(0, 2.0, img.shape)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def demo_params():
    noise = load_model_json(os.path.join(MODELS, "noise1_demo.json"))
    scale = load_model_json(os.path.join(MODELS, "scale2.0x_demo.json"))
    return noise, scale


@pytest.fixture(scope="module")
def img():
    return _natural_image(np.random.default_rng(7))


@pytest.fixture(scope="module")
def want(img, demo_params):
    # fast=True: the BLAS twin of the per-plane oracle — same math,
    # ~1e-6-relative summation reordering, irrelevant at dB level
    # (tests/test_convstack.py pins fast==exact on small planes)
    noise, scale = demo_params
    return reference_pipeline(img, "noise_scale", 2.0,
                              as_numpy(noise), as_numpy(scale), fast=True)


@pytest.mark.slow
def test_demo_weights_xla_fidelity(img, demo_params, want):
    noise, scale = demo_params
    cfg = Config(mode="noise_scale", precision="highest",
                 use_pallas=False)
    got = Converter(cfg, noise, scale).process_bgr_u8(img)
    p = psnr(got, want)
    assert got.shape == want.shape
    assert p >= 70.0, f"XLA-path PSNR regressed: {p:.2f} dB (bar 70)"


@pytest.mark.slow
def test_demo_weights_pallas_bf16_fidelity(img, demo_params, want):
    """The fused-kernel path in the TPU production dtype (bf16 weights and
    activations, f32 tap accumulation), via the interpreter. 50 dB is the
    hard product bar (BASELINE.json)."""
    noise, scale = demo_params
    cfg = Config(mode="noise_scale", use_pallas=True)
    fast_n = FastStack.build(noise, scale_input=False, interpret=True,
                             dtype=jnp.bfloat16)
    fast_s = FastStack.build(scale, scale_input=True, interpret=True,
                             dtype=jnp.bfloat16)
    got = Converter(cfg, noise, scale, fast_n, fast_s).process_bgr_u8(img)
    p = psnr(got, want)
    assert got.shape == want.shape
    assert p >= 50.0, f"Pallas-bf16 PSNR regressed: {p:.2f} dB (bar 50)"


@pytest.mark.slow
def test_demo_weights_adversarial_content_fidelity(demo_params):
    """The >=50 dB bar must be CONTENT-INDEPENDENT at production sizes
    (VERDICT r2 item 6): pure-random u8 input is the bf16 worst case
    (every pixel is an edge; the error is spatially uniform, NOT border-
    concentrated — tools/edge_error_probe.py). The chained bf16 noise->
    scale stacks measured 48.2 dB here; the single-image quality surface
    therefore runs the NOISE stack in f32 (pipeline._noise_dtype_for),
    measured 51.3 dB. This pins the Converter path exactly as the CLI
    builds it (f32 noise + bf16 scale kernels)."""
    noise, scale = demo_params
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (512, 512, 3), dtype=np.uint8)
    want = reference_pipeline(img, "noise_scale", 2.0,
                              as_numpy(noise), as_numpy(scale), fast=True)
    cfg = Config(mode="noise_scale", use_pallas=True)
    from waifu2x_tpu.pipeline import _noise_dtype_for
    ndt = _noise_dtype_for(cfg)
    assert ndt == jnp.float32  # the CLI must build the f32 noise stack
    fast_n = FastStack.build(noise, scale_input=False, interpret=True,
                             dtype=ndt)
    fast_s = FastStack.build(scale, scale_input=True, interpret=True,
                             dtype=jnp.bfloat16)
    got = Converter(cfg, noise, scale, fast_n, fast_s).process_bgr_u8(img)
    p = psnr(got, want)
    assert got.shape == want.shape
    assert p >= 50.0, f"adversarial-content PSNR below bar: {p:.2f} dB"
