"""The composed product chain on a ("dp","dy","sp") mesh must be bit-equal
to the single-device fused paths — noise_scale handoff, multi-iteration
scale, final shrink, 2-D (rows x cols) spatial sharding (VERDICT r4 items
1-3; replaces the reference's sequential 2-D block tiler,
convertRoutine.cpp:100-131, and the main.cpp:82-169 phase chain)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
from waifu2x_tpu.ops.color import saturate_cast_u8, yuv_to_bgr
from waifu2x_tpu.ops.resize import LINEAR, resize
from waifu2x_tpu.ops.s2d import d2s_host_cmajor
from waifu2x_tpu.parallel.mesh_pipeline import (
    MeshPipeline,
    auto_spatial_shape,
    make_mesh3,
)
from waifu2x_tpu.pipeline import (
    FastStack,
    noise_batch_u8_fused,
    noise_y_batch_fast,
    scale2x_batch_fast,
    scale2x_batch_u8_fused,
)


def assert_u8_tie_equal(got, ref, max_frac=0.002):
    """u8 outputs of DIFFERENT XLA programs can differ by ONE level at
    exact rounding ties: fma contraction in the fused combine changes
    which side of x.5 the f32 value lands on (measured: the one differing
    pixel's pre-round value sits 8e-5 from the boundary while the f32
    intermediates are bit-equal — see test_f32_chain_bit_equal for the
    strong form of the equivalence). Everything else must be identical."""
    d = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert d.max() <= 1, f"max u8 diff {d.max()} > 1"
    frac = (d != 0).mean()
    assert frac <= max_frac, f"{frac:.4%} of pixels differ (ties only!)"


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(7), WAIFU2X_7LAYER)


@pytest.fixture(scope="module")
def fasts(params):
    fast_s = FastStack.build(params, scale_input=True, tile=(8, 16),
                             interpret=True, dtype=jnp.float32)
    fast_n = FastStack.build(params, scale_input=False, tile=(8, 16),
                             interpret=True, dtype=jnp.float32)
    return fast_s, fast_n


def _u8_frames(rng, n, h, w):
    return rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)


def _to_yuv(u8):
    from waifu2x_tpu.ops.color import bgr_to_yuv, u8_to_unit_f32
    return bgr_to_yuv(u8_to_unit_f32(jnp.asarray(u8)))


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(1, 1, 8), (1, 2, 4), (2, 2, 2),
                                   (1, 4, 2)])
def test_scale2x_chain_matches_single_device(fasts, rng, shape):
    fast_s, _ = fasts
    mesh = make_mesh3(shape, jax.devices()[:8])
    pipe = MeshPipeline(mesh, fast_scale=fast_s, mode="scale",
                        scale_ratio=2.0)
    u8 = _u8_frames(rng, 2, 48, 40)
    yuv = _to_yuv(u8)
    ref = d2s_host_cmajor(np.asarray(scale2x_batch_u8_fused(yuv, fast_s)))
    got = pipe.convert_bgr_u8(u8)
    assert_u8_tie_equal(got, ref)


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(1, 2, 4), (2, 1, 4)])
def test_noise_scale_chain_matches_single_device(fasts, rng, shape):
    """The chained noise->scale path with the `y=` override handoff — what
    the CLI/StreamConverter noise_scale mode runs (main.cpp:82-156)."""
    fast_s, fast_n = fasts
    mesh = make_mesh3(shape, jax.devices()[:8])
    pipe = MeshPipeline(mesh, fast_scale=fast_s, fast_noise=fast_n,
                        mode="noise_scale", scale_ratio=2.0)
    u8 = _u8_frames(rng, 3, 32, 40)       # batch 3 on dp=2: frame padding
    yuv = _to_yuv(u8)
    ref = d2s_host_cmajor(np.asarray(scale2x_batch_u8_fused(
        yuv, fast_s, y=noise_y_batch_fast(yuv[..., 0], fast_n,
                                          out_dtype=None))))
    got = pipe.convert_bgr_u8(u8)
    assert_u8_tie_equal(got, ref)


@pytest.mark.slow
def test_noise_only_matches_single_device(fasts, rng):
    fast_s, fast_n = fasts
    mesh = make_mesh3((1, 2, 4), jax.devices()[:8])
    pipe = MeshPipeline(mesh, fast_noise=fast_n, mode="noise")
    u8 = _u8_frames(rng, 2, 32, 48)
    yuv = _to_yuv(u8)
    ref = d2s_host_cmajor(np.asarray(noise_batch_u8_fused(yuv, fast_n)))
    got = pipe.convert_bgr_u8(u8)
    assert_u8_tie_equal(got, ref)


@pytest.mark.slow
def test_ratio4_two_iterations_matches_single_device(fasts, rng):
    """Multi-iteration scale (main.cpp:104-169, iterTimes=2) on the mesh:
    the mid-iteration local d2s keeps shards contiguous."""
    fast_s, _ = fasts
    mesh = make_mesh3((1, 2, 4), jax.devices()[:8])
    pipe = MeshPipeline(mesh, fast_scale=fast_s, mode="scale",
                        scale_ratio=4.0)
    u8 = _u8_frames(rng, 1, 24, 32)
    yuv = _to_yuv(u8)
    mid = scale2x_batch_fast(yuv, fast_s)
    ref = d2s_host_cmajor(np.asarray(scale2x_batch_u8_fused(mid, fast_s)))
    got = pipe.convert_bgr_u8(u8)
    assert_u8_tie_equal(got, ref)


@pytest.mark.slow
def test_shrink_ratio_matches_single_device(fasts, rng):
    """Non-power-of-2 ratio: 2 iterations + LINEAR shrink 0.75
    (main.cpp:107-114, 158-167) — the GSPMD raster finish."""
    fast_s, _ = fasts
    mesh = make_mesh3((1, 2, 4), jax.devices()[:8])
    pipe = MeshPipeline(mesh, fast_scale=fast_s, mode="scale",
                        scale_ratio=3.0)
    assert (pipe.iters, pipe.shrink) == (2, 0.75)
    u8 = _u8_frames(rng, 1, 24, 32)
    yuv = _to_yuv(u8)
    full = scale2x_batch_fast(scale2x_batch_fast(yuv, fast_s), fast_s)
    dsize = (int(96 * 0.75), int(128 * 0.75))
    ref = np.asarray(saturate_cast_u8(yuv_to_bgr(
        resize(full, dsize, LINEAR, h_axis=1))))
    got = pipe.convert_bgr_u8(u8)
    assert_u8_tie_equal(got, ref)


@pytest.mark.slow
@pytest.mark.parametrize("ratio,iters,shrink", [(1.0, 0, 0.0),
                                                (0.6, 0, 0.6)])
def test_identity_and_pure_shrink_ratios(fasts, rng, ratio, iters, shrink):
    """ratio 1.0 is a no-op by the int-compare quirk (main.cpp:110-111);
    ratio < 1 is a pure LINEAR shrink — both ride the raster path."""
    fast_s, _ = fasts
    mesh = make_mesh3((1, 2, 4), jax.devices()[:8])
    pipe = MeshPipeline(mesh, fast_scale=fast_s, mode="scale",
                        scale_ratio=ratio)
    assert (pipe.iters, pipe.shrink) == (iters, shrink)
    u8 = _u8_frames(rng, 1, 24, 32)
    yuv = _to_yuv(u8)
    out = yuv if shrink == 0.0 else resize(
        yuv, (int(24 * shrink), int(32 * shrink)), LINEAR, h_axis=1)
    ref = np.asarray(saturate_cast_u8(yuv_to_bgr(out)))
    got = pipe.convert_bgr_u8(u8)
    assert_u8_tie_equal(got, ref)


@pytest.mark.slow
def test_odd_dims_pad_and_crop(fasts, rng):
    """Odd image dims ride the mesh padding (the single-device u8 path
    would reject them) and crop back exactly."""
    fast_s, fast_n = fasts
    mesh = make_mesh3((1, 2, 4), jax.devices()[:8])
    pipe = MeshPipeline(mesh, fast_noise=fast_n, mode="noise")
    u8 = _u8_frames(rng, 1, 31, 45)
    got = pipe.convert_bgr_u8(u8)
    assert got.shape == (1, 31, 45, 3)
    # reference: pad on host the same way, run single-device, crop
    pad = np.pad(u8, ((0, 0), (0, 32 - 31), (0, 48 - 45), (0, 0)),
                 mode="edge")
    ref = d2s_host_cmajor(np.asarray(noise_batch_u8_fused(
        _to_yuv(pad), fast_n)))[:, :31, :45]
    assert_u8_tie_equal(got, ref)


def test_narrow_shard_raises(fasts, rng):
    fast_s, fast_n = fasts
    mesh = make_mesh3((1, 1, 8), jax.devices()[:8])
    pipe = MeshPipeline(mesh, fast_noise=fast_n, mode="noise")
    u8 = _u8_frames(rng, 1, 16, 32)   # 4-col shards < 8-col noise halo
    with pytest.raises(ValueError, match="halo"):
        pipe.convert_bgr_u8(u8)
    assert pipe.min_image_hw() == (8, 64)


@pytest.mark.slow
def test_f32_chain_bit_equal(fasts, rng):
    """The STRONG equivalence: the sharded f32 chain (halo exchange +
    kernels + local d2s) is BIT-equal to the single-device fast path —
    only the final u8 quantization can flip at ties across programs."""
    fast_s, fast_n = fasts
    mesh = make_mesh3((1, 2, 4), jax.devices()[:8])
    pipe = MeshPipeline(mesh, fast_scale=fast_s, fast_noise=fast_n,
                        mode="noise_scale", scale_ratio=4.0)
    yuv = jnp.asarray(rng.random((2, 24, 32, 3), dtype=np.float32))
    cur = pipe.shard(yuv)
    y = pipe._noise_y()(cur)
    ref_y = np.asarray(noise_y_batch_fast(yuv[..., 0], fast_n,
                                          out_dtype=None))
    np.testing.assert_array_equal(np.asarray(y), ref_y)
    mid = pipe._scale_mid(True)(cur, y)
    ref_mid = np.asarray(scale2x_batch_fast(
        yuv.at[..., 0].set(jnp.asarray(ref_y)), fast_s))
    np.testing.assert_array_equal(np.asarray(mid), ref_mid)
    last = pipe._scale_mid(False)(mid)
    ref_last = np.asarray(scale2x_batch_fast(jnp.asarray(ref_mid), fast_s))
    np.testing.assert_array_equal(np.asarray(last), ref_last)


# ---------------------------------------------------------------------------
# product surfaces (VERDICT r4 item 1): Converter / StreamConverter / CLI
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_converter_mesh_matches_single_device(fasts, params, rng):
    """pipeline.Converter with cfg.mesh routes process_bgr_u8 through the
    mesh chain; output matches the single-device converter."""
    from waifu2x_tpu.config import Config
    from waifu2x_tpu.pipeline import Converter

    fast_s, fast_n = fasts
    u8 = _u8_frames(rng, 1, 48, 64)[0]
    base = dict(mode="noise_scale", scale_ratio=2.0, use_pallas=True)
    ref_conv = Converter(Config(mesh="off", **base),
                         params, params, fast_n, fast_s)
    ref = ref_conv.process_bgr_u8(u8)
    mesh_conv = Converter(Config(mesh="2x4", **base),
                          params, params, fast_n, fast_s)
    assert mesh_conv._mesh_pipe(48, 64) is not None
    got = mesh_conv.process_bgr_u8(u8)
    assert_u8_tie_equal(got, ref)
    # too-small image falls back to single-device cleanly
    tiny = _u8_frames(rng, 1, 12, 12)[0]
    assert mesh_conv._mesh_pipe(12, 12) is None
    np.testing.assert_array_equal(mesh_conv.process_bgr_u8(tiny),
                                  ref_conv.process_bgr_u8(tiny))


@pytest.mark.slow
def test_converter_mesh_shrink_ratio(fasts, params, rng):
    """The mesh product path covers the FULL chain incl. the final shrink
    (ratio 3.0 = 2 iterations + LINEAR 0.75, main.cpp:104-169)."""
    from waifu2x_tpu.config import Config
    from waifu2x_tpu.pipeline import Converter

    fast_s, fast_n = fasts
    u8 = _u8_frames(rng, 1, 32, 48)[0]
    base = dict(mode="scale", scale_ratio=3.0, use_pallas=True)
    ref = Converter(Config(mesh="off", **base),
                    None, params, None, fast_s).process_bgr_u8(u8)
    got = Converter(Config(mesh="1x2x4", **base),
                    None, params, None, fast_s).process_bgr_u8(u8)
    assert got.shape == ref.shape == (96, 144, 3)
    assert_u8_tie_equal(got, ref)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["scale", "noise", "noise_scale"])
def test_stream_mesh_matches_single_device(fasts, rng, mode):
    """StreamConverter(mesh=...) — mixed frame sizes (odd dims included:
    the mesh pads instead of the raster fallback), outputs in input order,
    equal to the single-device stream."""
    from waifu2x_tpu.stream import StreamConverter

    fast_s, fast_n = fasts
    mesh = make_mesh3((2, 1, 4), jax.devices()[:8])
    frames = [_u8_frames(rng, 1, h, w)[0]
              for h, w in [(32, 40), (32, 40), (24, 48), (31, 41),
                           (32, 40), (24, 48)]]
    kw = dict(fast=fast_s if mode != "noise" else None,
              fast_noise=fast_n if mode != "scale" else None,
              mode=mode, batch=2, depth=1)
    ref = list(StreamConverter(**kw).process_frames(frames))
    got = list(StreamConverter(mesh=mesh, **kw).process_frames(frames))
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        assert_u8_tie_equal(g, r)


@pytest.mark.slow
def test_cli_mesh_end_to_end(fasts, params, rng, tmp_path, monkeypatch):
    """bin/waifu2x-tpu --mesh 1x2x4: files in -> PNGs out on the virtual
    8-device mesh, equal to the single-device run (VERDICT r4 item 1's
    done-criterion)."""
    import cv2

    from waifu2x_tpu import cli
    from waifu2x_tpu.models.weights import save_model_json

    mdir = tmp_path / "models"
    mdir.mkdir()
    save_model_json(str(mdir / "noise1_model.json"), params)
    save_model_json(str(mdir / "scale2.0x_model.json"), params)
    imgs = [_u8_frames(rng, 1, h, w)[0]
            for h, w in [(40, 48), (40, 48), (32, 56)]]

    def run(name, mesh):
        # auto-naming writes next to the inputs (main.cpp:173-189), so
        # each run gets its own input directory
        d = tmp_path / name
        d.mkdir()
        ins = []
        for i, img in enumerate(imgs):
            p = d / f"in{i}.png"
            cv2.imwrite(str(p), img)
            ins.append(str(p))
        rc = cli.main(["-i", *ins, "--model_dir", str(mdir),
                       "--pallas", "on", "--mesh", mesh])
        assert rc == 0
        outs = sorted(str(p) for p in d.glob("*(noise_scale)*.png"))
        assert len(outs) == 3
        return [cv2.imread(o) for o in outs]

    ref = run("single", "off")
    got = run("meshed", "1x2x4")
    for g, r in zip(got, ref):
        assert g.shape == r.shape
        assert_u8_tie_equal(g, r)


def test_config_mesh_shape_parsing():
    from waifu2x_tpu.config import Config

    assert Config(mesh="auto").mesh_shape() == "auto"
    assert Config(mesh="off").mesh_shape() == "off"
    assert Config(mesh="2x4").mesh_shape() == (2, 1, 4)     # DPxSP
    assert Config(mesh="1x2x4").mesh_shape() == (1, 2, 4)   # DPxDYxSP
    for bad in ("2x", "axb", "0x4", "2x4x2x1", "-1x4"):
        with pytest.raises(ValueError, match="mesh"):
            Config(mesh=bad)


def test_resolve_stream_mesh():
    """Stream mesh policy: 'off'/(1,1,1) -> None; explicit shapes build a
    3-axis mesh when devices suffice, warn+None otherwise; 'auto' stays
    off on non-TPU backends (this CPU test env)."""
    from waifu2x_tpu.stream import resolve_stream_mesh

    assert resolve_stream_mesh("off") is None
    assert resolve_stream_mesh((1, 1, 1)) is None
    assert resolve_stream_mesh("auto") is None   # CPU backend: no-op
    m = resolve_stream_mesh((2, 1, 4))
    assert m is not None and tuple(m.axis_names) == ("dp", "dy", "sp")
    assert m.devices.shape == (2, 1, 4)
    assert resolve_stream_mesh((4, 2, 4)) is None   # 32 > 8 devices


def test_auto_spatial_shape():
    # wide frame: all devices on columns
    assert auto_spatial_shape(8, 1080, 3840, min_shard=128) == (1, 2, 4)
    assert auto_spatial_shape(8, 256, 4096, min_shard=128) == (1, 1, 8)
    assert auto_spatial_shape(8, 128, 4096, min_shard=128) == (1, 1, 8)
    # portrait scan: rows take the devices (the 2-D tiler case)
    assert auto_spatial_shape(8, 4096, 128, min_shard=128) == (1, 8, 1)
    # tiny image: stays single-device
    assert auto_spatial_shape(8, 100, 100, min_shard=128) == (1, 1, 1)
    # non-power-of-2 counts still factor
    assert auto_spatial_shape(6, 4096, 4096, min_shard=128)[1:] in (
        (2, 3), (3, 2))
