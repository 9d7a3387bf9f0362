"""Streaming runtime: ordered, batched, dispatch-ahead 2x conversion."""

import numpy as np
import jax
import jax.numpy as jnp

from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
from waifu2x_tpu.ops.s2d import d2s_host_cmajor
from waifu2x_tpu.pipeline import FastStack, scale2x_batch_u8_fused
from waifu2x_tpu.stream import StreamConverter, _to_yuv_batch


def _fast():
    params = init_params(jax.random.PRNGKey(2), WAIFU2X_7LAYER)
    return FastStack.build(params, scale_input=True, tile=(16, 16),
                           interpret=True, dtype=jnp.float32)


def test_stream_matches_batch(rng):
    fast = _fast()
    frames = [rng.integers(0, 256, (20, 24, 3), np.uint8) for _ in range(7)]
    sc = StreamConverter(fast, batch=3, depth=2)
    outs = list(sc.process_frames(frames))
    assert len(outs) == 7
    ref_yuv = _to_yuv_batch(jnp.asarray(np.stack(frames)))
    ref = d2s_host_cmajor(np.asarray(scale2x_batch_u8_fused(ref_yuv, fast)))
    for got, want in zip(outs, ref):
        assert got.shape == (40, 48, 3)
        np.testing.assert_array_equal(got, want)


def test_stream_paths(rng, tmp_path):
    from waifu2x_tpu import io as w2x_io
    fast = _fast()
    paths, outs = [], []
    imgs = []
    for i in range(3):
        img = rng.integers(0, 256, (16, 16, 3), np.uint8)
        p = str(tmp_path / f"in{i}.png")
        w2x_io.imwrite_bgr(p, img)
        paths.append(p)
        outs.append(str(tmp_path / f"out{i}.png"))
        imgs.append(img)
    StreamConverter(fast, batch=2).process_paths(paths, outs)
    for i, op in enumerate(outs):
        out = w2x_io.imread_bgr(op)
        assert out.shape == (32, 32, 3)


def test_stream_checkpoint_resume(rng, tmp_path):
    from waifu2x_tpu import io as w2x_io
    fast = _fast()
    paths, outs = [], []
    for i in range(5):
        img = rng.integers(0, 256, (16, 16, 3), np.uint8)
        p = str(tmp_path / f"in{i}.png")
        w2x_io.imwrite_bgr(p, img)
        paths.append(p)
        outs.append(str(tmp_path / f"out{i}.png"))
    ckpt = str(tmp_path / "cursor.json")

    # first run converts 0..4; interrupt by pre-setting the cursor instead
    sc = StreamConverter(fast, batch=2)
    sc.process_paths(paths[:3], outs[:3], checkpoint=ckpt)
    import json
    assert json.load(open(ckpt))["cursor"] == 3

    # resume over the FULL list: frames 0-2 must be skipped (their outputs
    # untouched), 3-4 produced
    import os
    mtimes = [os.path.getmtime(o) for o in outs[:3]]
    sc.process_paths(paths, outs, checkpoint=ckpt)
    assert [os.path.getmtime(o) for o in outs[:3]] == mtimes
    for o in outs:
        assert w2x_io.imread_bgr(o).shape == (32, 32, 3)
    assert json.load(open(ckpt))["cursor"] == 5

    # fully-done cursor: no work, no error
    sc.process_paths(paths, outs, checkpoint=ckpt)


def _fast_noise():
    params = init_params(jax.random.PRNGKey(3), WAIFU2X_7LAYER)
    return FastStack.build(params, scale_input=False, tile=(16, 16),
                           interpret=True, dtype=jnp.float32)


def test_stream_noise_scale_mode(rng):
    """noise_scale streaming (BASELINE config[4]: denoise + 2x end-to-end)
    == the chained batch pipeline."""
    from waifu2x_tpu.pipeline import noise_batch_fast
    fast, fast_n = _fast(), _fast_noise()
    frames = [rng.integers(0, 256, (20, 24, 3), np.uint8) for _ in range(5)]
    sc = StreamConverter(fast, batch=2, depth=1, fast_noise=fast_n,
                         mode="noise_scale")
    outs = list(sc.process_frames(frames))
    assert len(outs) == 5
    for pair0 in range(0, 4, 2):  # reference: same batching, chained steps
        yuv = _to_yuv_batch(jnp.asarray(np.stack(frames[pair0:pair0 + 2])))
        ref = d2s_host_cmajor(np.asarray(
            scale2x_batch_u8_fused(noise_batch_fast(yuv, fast_n), fast)))
        np.testing.assert_array_equal(outs[pair0], ref[0])
        np.testing.assert_array_equal(outs[pair0 + 1], ref[1])


def test_stream_noise_mode(rng):
    """Pure-denoise streaming emits raster BGR at input size."""
    fast_n = _fast_noise()
    frames = [rng.integers(0, 256, (18, 22, 3), np.uint8) for _ in range(3)]
    sc = StreamConverter(None, batch=2, fast_noise=fast_n, mode="noise")
    outs = list(sc.process_frames(frames))
    assert [o.shape for o in outs] == [(18, 22, 3)] * 3


def test_stream_mixed_sizes_ordered(rng):
    """Mixed-geometry streams group by shape (one compiled program each)
    and still yield outputs in input order."""
    fast = _fast()
    shapes = [(16, 16), (20, 24), (16, 16), (16, 16), (20, 24), (16, 16)]
    frames = [rng.integers(0, 256, (*s, 3), np.uint8) for s in shapes]
    sc = StreamConverter(fast, batch=2, depth=1)
    outs = list(sc.process_frames(frames))
    assert len(outs) == len(frames)
    for frame, out in zip(frames, outs):
        assert out.shape == (2 * frame.shape[0], 2 * frame.shape[1], 3)
        yuv = _to_yuv_batch(jnp.asarray(frame[None]))
        ref = d2s_host_cmajor(np.asarray(scale2x_batch_u8_fused(
            np.repeat(yuv, 2, 0), fast)))[0]
        np.testing.assert_array_equal(out, ref)


def test_stream_mode_validation():
    fast = _fast()
    import pytest
    with pytest.raises(ValueError):
        StreamConverter(fast, mode="bogus")
    with pytest.raises(ValueError):
        StreamConverter(fast, mode="noise_scale")  # no noise model
    with pytest.raises(ValueError):
        StreamConverter(None, mode="scale")
