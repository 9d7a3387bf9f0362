"""Fast (Pallas/polyphase) pipeline vs the reference XLA pipeline.

The fast path must produce the same images as the validated XLA path (which
tests/test_pipeline.py pins to the cv2-based reference spec): polyphase
bicubic == resize, and the full 2x step / noise phase / Converter round-trip
agree to u8 within one quantisation level.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from waifu2x_tpu.config import Config
from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
from waifu2x_tpu.ops.resize import CUBIC, LINEAR, resize, resize2x_phases
from waifu2x_tpu.ops.s2d import d2s_host
from waifu2x_tpu.pipeline import (
    Converter,
    FastStack,
    scale2x_batch,
    scale2x_batch_fast,
    scale2x_batch_u8_s2d,
)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(11), WAIFU2X_7LAYER)


@pytest.fixture(scope="module")
def fast(params):
    return FastStack.build(params, scale_input=True, tile=(16, 16),
                           interpret=True, dtype=jnp.float32)


@pytest.mark.parametrize("interp", [CUBIC, LINEAR])
def test_resize2x_phases_matches_resize(rng, interp):
    img = jnp.asarray(rng.random((2, 9, 14, 3), dtype=np.float32))
    full = resize(img, (18, 28), interp, h_axis=1)
    ph = resize2x_phases(img, interp, h_axis=1)      # [2, 9, 14, 3, 4]
    for A in (0, 1):
        for B in (0, 1):
            np.testing.assert_allclose(
                np.asarray(ph[..., A * 2 + B]),
                np.asarray(full[:, A::2, B::2, :]), rtol=0, atol=1e-6)


def test_scale2x_fast_matches_xla(params, fast, rng):
    yuv = jnp.asarray(rng.random((1, 24, 20, 3), dtype=np.float32))
    cfg = Config(mode="scale", precision="highest", block_size=0)
    ref = scale2x_batch(yuv, params, cfg)
    got = scale2x_batch_fast(yuv, fast)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)


def test_scale2x_u8_s2d_host_interleave(params, fast, rng):
    from waifu2x_tpu.ops.color import saturate_cast_u8, yuv_to_bgr
    yuv = jnp.asarray(rng.random((2, 12, 16, 3), dtype=np.float32))
    cfg = Config(mode="scale", precision="highest", block_size=0)
    ref = np.asarray(saturate_cast_u8(yuv_to_bgr(
        scale2x_batch(yuv, params, cfg))))
    got = d2s_host(np.asarray(scale2x_batch_u8_s2d(yuv, fast)))
    diff = np.abs(ref.astype(int) - got.astype(int))
    assert diff.max() <= 1 and (diff != 0).mean() < 0.01


def test_scale2x_fused_u8_matches_unfused(params, fast, rng):
    from waifu2x_tpu.ops.s2d import d2s_host_cmajor
    from waifu2x_tpu.pipeline import scale2x_batch_u8_fused
    yuv = jnp.asarray(rng.random((2, 18, 20, 3), dtype=np.float32))
    ref = d2s_host(np.asarray(scale2x_batch_u8_s2d(yuv, fast)))
    got = d2s_host_cmajor(np.asarray(scale2x_batch_u8_fused(yuv, fast)))
    # same math, different op order inside the kernel: allow 1 u8 level
    diff = np.abs(ref.astype(int) - got.astype(int))
    assert diff.max() <= 1 and (diff != 0).mean() < 0.005


def test_fused_step_xla_tail_matches_kernel_tail(fast, rng, monkeypatch):
    """The default dense-XLA u8/BGR tail (W2X_TAIL=xla) must stay within
    one u8 level of the in-kernel tail (W2X_TAIL=kernel) on few pixels:
    identical math, different op order/rounding site for the U/V path."""
    import waifu2x_tpu.pipeline as pl
    from waifu2x_tpu.pipeline import scale2x_batch_u8_fused

    yuv = jnp.asarray(rng.random((2, 18, 20, 3), dtype=np.float32))
    monkeypatch.setattr(pl, "FUSED_TAIL", "xla")
    a = np.asarray(scale2x_batch_u8_fused(yuv, fast))
    monkeypatch.setattr(pl, "FUSED_TAIL", "kernel")
    b = np.asarray(scale2x_batch_u8_fused(yuv, fast))
    diff = np.abs(a[..., :12].astype(int) - b[..., :12].astype(int))
    assert diff.max() <= 1 and (diff != 0).mean() < 0.005, (
        diff.max(), (diff != 0).mean())
    # lanes 12:16 are zero in both layouts
    assert not a[..., 12:].any() and not b[..., 12:].any()


def test_scale2x_fused_banded_exact(params, fast, rng):
    from waifu2x_tpu.pipeline import scale2x_batch_u8_fused
    yuv = jnp.asarray(rng.random((1, 50, 20, 3), dtype=np.float32))
    whole = np.asarray(scale2x_batch_u8_fused(yuv, fast, band_rows=64))
    banded = np.asarray(scale2x_batch_u8_fused(yuv, fast, band_rows=16))
    np.testing.assert_array_equal(banded, whole)


def test_noise_batch_fast_matches_xla(params, rng):
    from waifu2x_tpu.pipeline import noise_batch, noise_batch_fast
    fast_n = FastStack.build(params, scale_input=False, tile=(16, 16),
                             interpret=True, dtype=jnp.float32)
    yuv = jnp.asarray(rng.random((2, 20, 26, 3), dtype=np.float32))
    cfg = Config(mode="noise", precision="highest", block_size=0)
    ref = noise_batch(yuv, params, cfg)
    got = noise_batch_fast(yuv, fast_n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)
    # banded == unbanded (even heights; 16-row overlap covers the radius)
    yuv = jnp.asarray(rng.random((1, 60, 22, 3), dtype=np.float32))
    whole = np.asarray(noise_batch_fast(yuv, fast_n, band_rows=64))
    banded = np.asarray(noise_batch_fast(yuv, fast_n, band_rows=20))
    np.testing.assert_array_equal(banded, whole)


def test_converter_pallas_matches_xla(params, rng, tmp_path):
    from waifu2x_tpu.models.weights import save_model_json
    mdl = tmp_path / "models"
    mdl.mkdir()
    save_model_json(mdl / "scale2.0x_model.json", params)
    save_model_json(mdl / "noise1_model.json", params)
    img = rng.integers(0, 256, (26, 22, 3), np.uint8)

    cfg = Config(mode="noise_scale", model_dir=str(mdl), precision="highest")
    ref = Converter.from_config(cfg).process_bgr_u8(img)

    cfg_f = Config(mode="noise_scale", model_dir=str(mdl), use_pallas=True)
    conv = Converter.from_config(cfg_f)
    # CPU test: rebuild the fast stacks in f32 + interpreter explicitly
    conv.fast_noise = FastStack.build(params, scale_input=False,
                                      tile=(16, 16), interpret=True,
                                      dtype=jnp.float32)
    conv.fast_scale = FastStack.build(params, scale_input=True,
                                      tile=(16, 16), interpret=True,
                                      dtype=jnp.float32)
    got = conv.process_bgr_u8(img)
    diff = np.abs(ref.astype(int) - got.astype(int))
    assert diff.max() <= 1 and (diff != 0).mean() < 0.01


def test_fused_u8_bf16_uvp_close(fast, rng):
    """bf16 polyphase U/V input (the W2X_UVP_BF16 VMEM saver) must stay
    within 1 u8 step of the f32-uvp kernel on few pixels: only U/V
    quantize (~2^-9 relative), Y is untouched."""
    from waifu2x_tpu.ops import pallas_stack as ps
    from waifu2x_tpu.pipeline import _uv_phases_cmajor

    yuv = jnp.asarray(rng.random((2, 18, 20, 3), dtype=np.float32))
    tile = fast.tile or (16, 16)
    uvp = _uv_phases_cmajor(yuv, tile)
    ylow = yuv[..., 0].astype(fast.dtype)
    a = np.asarray(ps.stack_scale_fused_u8(
        ylow, uvp, fast.kp, fast.spec, tile, interpret=True))
    b = np.asarray(ps.stack_scale_fused_u8(
        ylow, uvp.astype(jnp.bfloat16), fast.kp, fast.spec, tile,
        interpret=True))
    diff = np.abs(a.astype(int) - b.astype(int))
    mse = (diff.astype(np.float64) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / mse) if mse > 0 else np.inf
    assert diff.max() <= 2 and psnr >= 55.0, (diff.max(), psnr)


def test_fused_u8_i16_uvp_near_exact(fast, rng, monkeypatch):
    """int16 fixed-point uvp (the default W2X_UVP=i16 VMEM saver) must be
    output-indistinguishable from f32 uvp: step 3.05e-5 -> <=0.016 of a u8
    level through the YUV->BGR transform (only rounding ties can move)."""
    from waifu2x_tpu.ops import pallas_stack as ps
    from waifu2x_tpu.pipeline import _uv_phases_cmajor

    yuv = jnp.asarray(rng.random((2, 18, 20, 3), dtype=np.float32))
    tile = fast.tile or (16, 16)
    uvp = _uv_phases_cmajor(yuv, tile)
    ylow = yuv[..., 0].astype(fast.dtype)
    monkeypatch.setattr(ps, "UVP_MODE", "f32")  # pin the f32 reference
    a = np.asarray(ps.stack_scale_fused_u8(
        ylow, uvp, fast.kp, fast.spec, tile, interpret=True))
    b = np.asarray(ps.stack_scale_fused_u8(
        ylow, ps._uvp_to_i16(uvp), fast.kp, fast.spec, tile,
        interpret=True))
    diff = np.abs(a.astype(int) - b.astype(int))
    # only rounding ties can move, and only by one level (~76 dB-equiv)
    assert diff.max() <= 1 and (diff != 0).mean() < 0.005, (
        diff.max(), (diff != 0).mean())


def test_scale2x_fast_banded_exact(fast, rng):
    """The f32-output fast path (used for chained scale iterations and the
    single-image API) applies the same BAND_PX row banding as the u8 path."""
    yuv = jnp.asarray(rng.random((1, 50, 20, 3), dtype=np.float32))
    whole = np.asarray(scale2x_batch_fast(yuv, fast, band_rows=64))
    banded = np.asarray(scale2x_batch_fast(yuv, fast, band_rows=16))
    np.testing.assert_array_equal(banded, whole)


def test_noise_batch_fast_banded_odd_height(params, rng):
    """Odd-height frames band too (pad-to-even inside the bander), so no
    frame size can bypass the per-dispatch volume cap."""
    from waifu2x_tpu.pipeline import noise_batch_fast
    fast_n = FastStack.build(params, scale_input=False, tile=(16, 16),
                             interpret=True, dtype=jnp.float32)
    yuv = jnp.asarray(rng.random((1, 61, 22, 3), dtype=np.float32))
    whole = np.asarray(noise_batch_fast(yuv, fast_n, band_rows=64))
    banded = np.asarray(noise_batch_fast(yuv, fast_n, band_rows=20))
    np.testing.assert_array_equal(banded, whole)


def test_faststack_build_rejects_non_flagship():
    """The fused kernels bake the flagship widths into their scratch
    shapes; any other architecture must be rejected (the pipeline entry
    points then fall back to the XLA path)."""
    from waifu2x_tpu.models.srcnn import ModelSpec
    small = init_params(jax.random.PRNGKey(0),
                        ModelSpec.from_widths([1, 8, 8, 1]))
    with pytest.raises(ValueError, match="flagship"):
        FastStack.build(small, scale_input=True)


def test_pallas_auto_and_fallback(params, rng, tmp_path):
    """use_pallas='auto' resolves to the XLA path off-TPU, and an explicit
    use_pallas=True with a non-flagship model converts via XLA instead of
    crashing (reference loader accepts arbitrary architectures,
    modelHandler.cpp:170-197)."""
    from waifu2x_tpu.models.srcnn import ModelSpec
    from waifu2x_tpu.models.weights import save_model_json
    from waifu2x_tpu.pipeline import convert_image

    mdl = tmp_path / "models"
    mdl.mkdir()
    save_model_json(mdl / "scale2.0x_model.json", params)
    conv = Converter.from_config(Config(mode="scale", model_dir=str(mdl)))
    assert conv.cfg.use_pallas == "auto"
    assert conv.fast_scale is None  # tests run on the CPU platform

    small = init_params(jax.random.PRNGKey(0),
                        ModelSpec.from_widths([1, 8, 8, 1]))
    img = rng.integers(0, 256, (14, 12, 3), np.uint8)
    ref = convert_image(img, Config(mode="scale", use_pallas=False,
                                    precision="highest"), scale_params=small)
    got = convert_image(img, Config(mode="scale", use_pallas=True,
                                    precision="highest"), scale_params=small)
    np.testing.assert_array_equal(got, ref)


def test_small_image_routes_to_xla_under_auto(params, fast, rng):
    """use_pallas='auto' keeps sub-SMALL_IMG_PX images on the XLA path
    (bf16 kernel output is edge-dominated there: measured 49.3 dB at
    120x160 vs 53.0 at 512^2 on TPU); an explicit use_pallas=True keeps
    the fused path at any size."""
    import waifu2x_tpu.pipeline as pl

    fast_n = FastStack.build(params, scale_input=False, tile=(16, 16),
                             interpret=True, dtype=jnp.float32)
    small = jnp.asarray(rng.random((20, 24, 3), dtype=np.float32))

    auto = pl.Converter(Config(mode="noise_scale", use_pallas="auto"),
                        params, params, fast_n, fast)
    assert not auto._fast_ok(fast, 20 * 24)
    assert auto._fast_ok(fast, pl.SMALL_IMG_PX)
    forced = pl.Converter(Config(mode="noise_scale", use_pallas=True),
                          params, params, fast_n, fast)
    assert forced._fast_ok(fast, 20 * 24)
    assert not forced._fast_ok(None, 10 ** 9)

    # the auto path must equal the pure-XLA conversion on a small image
    cfg_x = Config(mode="noise_scale", use_pallas=False)
    ref = np.asarray(pl.Converter(cfg_x, params, params).process_yuv(small))
    got = np.asarray(auto.process_yuv(small))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


@pytest.mark.slow
def test_process_yuv_respects_volume_cap(params, fast, rng, monkeypatch):
    """A large single image via the public Converter API must take the
    banded dispatch path (VERDICT r1: the unbanded direct calls could
    ResourceExhaust the chip on 8K inputs)."""
    import waifu2x_tpu.pipeline as pl

    fast_n = FastStack.build(params, scale_input=False, tile=(16, 16),
                             interpret=True, dtype=jnp.float32)
    conv = Converter(Config(mode="noise_scale", use_pallas=True),
                     params, params, fast_n, fast)
    yuv = jnp.asarray(rng.random((130, 16, 3), dtype=np.float32))
    ref = np.asarray(conv.process_yuv(yuv))

    calls = {"scale": 0, "noise": 0}
    orig_scale, orig_noise = pl.scale2x_yuv_s2d, FastStack.noise

    def counting_scale(y, f):
        calls["scale"] += 1
        return orig_scale(y, f)

    def counting_noise(self, y):
        calls["noise"] += 1
        return orig_noise(self, y)

    monkeypatch.setattr(pl, "scale2x_yuv_s2d", counting_scale)
    monkeypatch.setattr(FastStack, "noise", counting_noise)
    monkeypatch.setattr(pl, "BAND_PX", 16 * 16)  # tiny cap -> must band
    # fresh Converter: the noise step is jitted per converter, so the
    # banding decision is baked in at trace time — the counted run must
    # trace under the patched BAND_PX (a cached trace would hide the
    # calls from the counters while still being banded per ITS OWN cap)
    conv = Converter(Config(mode="noise_scale", use_pallas=True),
                     params, params, fast_n, fast)
    got = np.asarray(conv.process_yuv(yuv))
    np.testing.assert_array_equal(got, ref)
    assert calls["scale"] >= 2 and calls["noise"] >= 2, calls


def test_noise_batch_u8_fused_matches_classic(params, rng):
    """The dense u8 cmajor noise tail (noise_batch_u8_fused) must match
    the classic f32 path + raster BGR/u8 cast within one u8 rounding tie,
    banded and unbanded, and interleave back with d2s_host_cmajor."""
    from waifu2x_tpu.ops.color import saturate_cast_u8, yuv_to_bgr
    from waifu2x_tpu.ops.s2d import d2s_host_cmajor
    from waifu2x_tpu.pipeline import noise_batch_fast, noise_batch_u8_fused

    fast_n = FastStack.build(params, scale_input=False, tile=(16, 16),
                             interpret=True, dtype=jnp.float32)
    yuv = jnp.asarray(rng.random((2, 24, 32, 3), dtype=np.float32))
    ref = np.asarray(saturate_cast_u8(yuv_to_bgr(
        noise_batch_fast(yuv, fast_n))))
    got = d2s_host_cmajor(np.asarray(noise_batch_u8_fused(yuv, fast_n)))
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1 and (diff != 0).mean() < 0.02
    # banded == unbanded — band_rows floors at max(128, ...), so the frame
    # must be taller than 128 rows for the band loop (and its u8-slice
    # arithmetic: u8[:, (b0-s)//2:(b0-s+nrows)//2], k=8 halo) to run at all
    tall = jnp.asarray(rng.random((1, 320, 16, 3), dtype=np.float32))
    whole = np.asarray(noise_batch_u8_fused(tall, fast_n, band_rows=320))
    banded = np.asarray(noise_batch_u8_fused(tall, fast_n, band_rows=160))
    np.testing.assert_array_equal(banded, whole)
    # odd dims are rejected toward the classic path
    with pytest.raises(ValueError, match="even"):
        noise_batch_u8_fused(jnp.zeros((1, 21, 32, 3), jnp.float32), fast_n)


def test_stream_noise_u8_path(params, rng):
    """StreamConverter mode=noise: even frames take the dense u8 cmajor
    tail + host interleave, odd frames the raster fallback; both match
    the classic reference path."""
    from waifu2x_tpu.ops.color import saturate_cast_u8, yuv_to_bgr
    from waifu2x_tpu.pipeline import noise_batch
    from waifu2x_tpu.stream import StreamConverter, _to_yuv_batch

    fast_n = FastStack.build(params, scale_input=False, tile=(16, 16),
                             interpret=True, dtype=jnp.float32)
    sc = StreamConverter(fast=None, fast_noise=fast_n, mode="noise",
                         batch=2)
    cfg = Config(mode="noise", precision="highest", block_size=0)
    for h, w in ((24, 32), (21, 27)):
        frames = [rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
                  for _ in range(2)]
        outs = list(sc.process_frames(frames))
        yuv = _to_yuv_batch(jnp.asarray(np.stack(frames)))
        ref = np.asarray(saturate_cast_u8(yuv_to_bgr(
            noise_batch(yuv, params, cfg))))
        for i, out in enumerate(outs):
            assert out.shape == (h, w, 3) and out.dtype == np.uint8
            diff = np.abs(out.astype(np.int32) - ref[i].astype(np.int32))
            assert diff.max() <= 1


def test_noise_y_out_dtype_passthrough(params, rng):
    """noise_y_batch_fast(out_dtype=None) hands the kernel dtype through
    the chain (the throughput handoff); the default stays f32 and equals
    the cast of the passthrough result."""
    from waifu2x_tpu.pipeline import noise_y_batch_fast

    fast_n = FastStack.build(params, scale_input=False, tile=(16, 16),
                             interpret=True, dtype=jnp.float32)
    y = jnp.asarray(rng.random((1, 20, 24), dtype=np.float32))
    a = noise_y_batch_fast(y, fast_n)
    b = noise_y_batch_fast(y, fast_n, out_dtype=None)
    assert a.dtype == jnp.float32 and b.dtype == fast_n.dtype
    np.testing.assert_array_equal(np.asarray(a),
                                  np.asarray(b.astype(jnp.float32)))


def test_chain_y_override_banded_exact(params, fast, rng):
    """The ns1080-style chain (noise_y_batch_fast -> scale y= override)
    must be band-configuration-independent: any mix of noise/scale
    band_rows (incl. the round-4 unbanded defaults) produces identical
    output. Band floors: noise max(128, ...), scale max(64, ...) — the
    frame must be TALLER than both or every config silently runs
    unbanded (the round-3 advisor caught exactly this in the noise u8
    band test)."""
    from waifu2x_tpu.pipeline import noise_y_batch_fast, scale2x_batch_u8_fused

    fast_n = FastStack.build(params, scale_input=False, tile=(16, 16),
                             interpret=True, dtype=jnp.float32)
    yuv = jnp.asarray(rng.random((1, 160, 16, 3), dtype=np.float32))

    def chain(nb, sb):
        y = noise_y_batch_fast(yuv[..., 0], fast_n, band_rows=nb,
                               out_dtype=None)
        return np.asarray(scale2x_batch_u8_fused(yuv, fast, band_rows=sb,
                                                 y=y))

    ref = chain(256, 256)                       # both unbanded (160 <= 256)
    np.testing.assert_array_equal(chain(256, 64), ref)   # scale 3 bands
    np.testing.assert_array_equal(chain(256, 96), ref)   # scale 2 bands
    np.testing.assert_array_equal(chain(128, 256), ref)  # noise 2 bands
    np.testing.assert_array_equal(chain(128, 64), ref)   # both banded
