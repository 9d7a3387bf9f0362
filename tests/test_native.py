"""Native C++ host runtime (native/w2x_host.cpp) vs Python references.

Exercises the libpng/libjpeg codecs, the polyphase u8 interleave, the
threaded batch decoder, and alpha flattening. All tests skip cleanly when
the toolchain can't build the library (pure-Python fallbacks keep the
framework functional either way — tests/test_cli.py covers those).
"""

import numpy as np
import pytest

from waifu2x_tpu import io as w2x_io
from waifu2x_tpu import native
from waifu2x_tpu.ops.s2d import d2s_host

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


@pytest.fixture
def img(rng):
    return rng.integers(0, 256, (37, 53, 3), np.uint8)


def test_png_roundtrip_exact(tmp_path, img):
    p = str(tmp_path / "t.png")
    assert native.imwrite_png(p, img)
    back = native.imread(p)
    assert np.array_equal(back, img)


def test_png_alpha_roundtrip(tmp_path, rng):
    bgra = rng.integers(0, 256, (8, 10, 4), np.uint8)
    p = str(tmp_path / "a.png")
    assert native.imwrite_png(p, bgra)
    assert np.array_equal(native.imread(p, keep_alpha=True), bgra)
    # without keep_alpha the reader strips to 3 channels (IMREAD_COLOR)
    assert native.imread(p).shape == (8, 10, 3)


def test_png_matches_pil(tmp_path, img):
    from PIL import Image
    p = str(tmp_path / "t.png")
    Image.fromarray(img[:, :, ::-1]).save(p)  # write RGB via PIL
    assert np.array_equal(native.imread(p), img)


def test_jpeg_decode_close_to_pil(tmp_path, img):
    from PIL import Image
    p = str(tmp_path / "t.jpg")
    Image.fromarray(img[:, :, ::-1]).save(p, quality=95)
    got = native.imread(p)
    ref = np.asarray(Image.open(p))[:, :, ::-1]
    # libjpeg IDCT implementations may differ by +-1
    assert got.shape == ref.shape
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_d2s_u8_matches_numpy(rng):
    s = rng.integers(0, 256, (3, 5, 7, 12), np.uint8)
    ref = s.reshape(3, 5, 7, 2, 2, 3)
    ref = np.moveaxis(ref, -3, -4).reshape(3, 10, 14, 3)
    assert np.array_equal(native.d2s_u8(s), ref)
    assert np.array_equal(d2s_host(s), ref)


def test_decode_batch_threads(tmp_path, rng):
    paths = []
    imgs = []
    for i in range(6):
        im = rng.integers(0, 256, (9 + i, 11, 3), np.uint8)
        p = str(tmp_path / f"b{i}.png")
        native.imwrite_png(p, im)
        paths.append(p)
        imgs.append(im)
    outs = native.decode_batch(paths, threads=3)
    assert all(np.array_equal(o, im) for o, im in zip(outs, imgs))


def test_flatten_white(rng):
    bgra = rng.integers(0, 256, (6, 6, 4), np.uint8)
    got = native.flatten_white(bgra)
    a = bgra[..., 3:4].astype(np.int32)
    ref = ((bgra[..., :3].astype(np.int32) * a + 255 * (255 - a) + 127)
           // 255).astype(np.uint8)
    assert np.array_equal(got, ref)


def test_imread_odd_formats(tmp_path, rng):
    # IMREAD_COLOR semantics (main.cpp:74): 16-bit, grayscale and palette
    # inputs all decode to 8-bit 3-channel BGR
    import cv2
    from PIL import Image
    p16 = str(tmp_path / "t16.png")
    cv2.imwrite(p16, rng.integers(0, 65535, (20, 24, 3), np.uint16))
    pg = str(tmp_path / "tg.png")
    cv2.imwrite(pg, rng.integers(0, 255, (20, 24), np.uint8))
    pp = str(tmp_path / "tp.gif")
    Image.fromarray(rng.integers(0, 255, (20, 24, 3), np.uint8)) \
        .convert("P").save(pp)
    for p in (p16, pg, pp):
        a = w2x_io.imread_bgr(p)
        assert a.shape == (20, 24, 3) and a.dtype == np.uint8


def test_io_flatten_white_fallback(rng):
    """io.flatten_white: numpy fallback == native == the Lua formula
    c*a + (1-a) on the unit scale (image_loader.lua:23-33)."""
    bgra = rng.integers(0, 256, (7, 5, 4), np.uint8)
    a = bgra[..., 3:4].astype(np.float64) / 255.0
    ref_f = bgra[..., :3].astype(np.float64) / 255.0 * a + (1.0 - a)
    ref = np.round(ref_f * 255.0).astype(np.uint8)
    got = w2x_io.flatten_white(bgra)
    assert np.array_equal(got, ref)
    # opaque pixels pass through; fully transparent become white
    opaque = np.dstack([bgra[..., :3], np.full((7, 5), 255, np.uint8)])
    assert np.array_equal(w2x_io.flatten_white(opaque), bgra[..., :3])
    clear = np.dstack([bgra[..., :3], np.zeros((7, 5), np.uint8)])
    assert (w2x_io.flatten_white(clear) == 255).all()
