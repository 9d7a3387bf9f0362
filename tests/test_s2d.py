"""Polyphase (s2d) stack vs the reference-exact conv stack.

Proves the space-to-depth reformulation (ops/s2d.py) — the math behind the
Pallas fast path — is exactly the reference algorithm: nearest-2x + pad-7
replicate + 7x(conv3x3 correlation + bias + LeakyReLU 0.1) + crop
(main.cpp:136-148, convertRoutine.cpp:31-48, modelHandler.cpp:117-159).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
from waifu2x_tpu.ops.convstack import convert_plane
from waifu2x_tpu.ops.s2d import (
    d2s,
    pack_stack,
    pack_w2,
    phase_groups,
    s2d,
    s2d_stack_noise,
    s2d_stack_scale,
)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(7), WAIFU2X_7LAYER)


def _nearest2x(ylow):
    return np.repeat(np.repeat(ylow, 2, axis=-2), 2, axis=-1)


def test_s2d_d2s_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 3)).astype(np.float32))
    assert jnp.array_equal(d2s(s2d(x)), x)
    # layout convention: channel (a*2+b)*C+c is pixel (2i+a, 2j+b, c)
    xs = s2d(x)
    np.testing.assert_array_equal(
        np.asarray(xs[0, 1, 2, (1 * 2 + 0) * 3 + 1]), np.asarray(x[0, 3, 4, 1]))


def test_pack_w2_identity_on_dense_conv(rng):
    """dense W2 2x2 conv in s2d space == 3x3 valid conv (the core identity)."""
    w = rng.standard_normal((3, 3, 5, 4)).astype(np.float32)
    x = rng.standard_normal((1, 12, 14, 5)).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    got = jax.lax.conv_general_dilated(
        s2d(jnp.asarray(x)), jnp.asarray(pack_w2(w)), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(d2s(got)), np.asarray(ref),
                               rtol=0, atol=1e-4)


def test_phase_groups_match_dense(rng):
    """phase-sparse matmul groups == dense W2 conv, numpy brute force."""
    ci, co = 3, 2
    w = rng.standard_normal((3, 3, ci, co)).astype(np.float32)
    x = rng.standard_normal((9, 11, 4 * ci)).astype(np.float32)  # s2d input
    w2 = pack_w2(w)
    h, wd = x.shape[0], x.shape[1]
    dense = np.zeros((h - 1, wd - 1, 4 * co), np.float32)
    for Dy in range(2):
        for Dx in range(2):
            dense += np.einsum(
                "hwk,kc->hwc",
                x[Dy:h - 1 + Dy, Dx:wd - 1 + Dx], w2[Dy, Dx])
    sparse = np.zeros_like(dense)
    for p, glist in enumerate(phase_groups(w)):
        acc = np.zeros((h - 1, wd - 1, co), np.float32)
        for (Dy, Dx, lo, hi, wm) in glist:
            acc += np.einsum(
                "hwk,kc->hwc", x[Dy:h - 1 + Dy, Dx:wd - 1 + Dx, lo:hi], wm)
        sparse[:, :, p * co:(p + 1) * co] = acc
    np.testing.assert_allclose(sparse, dense, rtol=0, atol=1e-4)


@pytest.mark.parametrize("hl,wl", [(16, 16), (15, 21)])
def test_scale_stack_matches_reference(params, rng, hl, wl):
    ylow = rng.random((2, hl, wl), dtype=np.float32)
    up = jnp.asarray(_nearest2x(ylow))
    ref = convert_plane(up, params, precision="highest")      # [2, 2hl, 2wl]
    got = s2d_stack_scale(jnp.asarray(ylow), pack_stack(params, True))
    got_full = d2s(got)[..., 0]
    np.testing.assert_allclose(np.asarray(got_full), np.asarray(ref),
                               rtol=0, atol=2e-5)


@pytest.mark.parametrize("use_sparse", [True, False])
def test_scale_stack_sparse_equals_dense(params, rng, use_sparse):
    ylow = jnp.asarray(rng.random((1, 12, 12), dtype=np.float32))
    ref = s2d_stack_scale(ylow, pack_stack(params, True), use_sparse_mid=False)
    got = s2d_stack_scale(ylow, pack_stack(params, True),
                          use_sparse_mid=use_sparse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("h,w", [(32, 32), (26, 38)])
def test_noise_stack_matches_reference(params, rng, h, w):
    y = rng.random((2, h, w), dtype=np.float32)
    ref = convert_plane(jnp.asarray(y), params, precision="highest")
    got = s2d_stack_noise(jnp.asarray(y), pack_stack(params, False))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)
