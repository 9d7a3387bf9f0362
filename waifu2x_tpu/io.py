"""Host-side image IO + output auto-naming (reference C2, C3).

Decoding/encoding is host work; the reference used OpenCV for it
(cv::imread/imwrite, main.cpp:74, 190). Codec preference order:
  1. the native C++ runtime (native/w2x_host.cpp via waifu2x_tpu.native —
     libpng/libjpeg, BGR order, threaded batch decode), like the
     reference's native OpenCV codecs;
  2. cv2 when installed (identical codecs/order);
  3. PIL (pure-Python fallback so the framework always works).
Everything else (colorspace, resampling, CNN) runs on the TPU.
"""

from __future__ import annotations

import os

import numpy as np

from waifu2x_tpu import native

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False

from PIL import Image


def imread_bgr(path: str) -> np.ndarray:
    """Read an image as uint8 BGR (cv::imread IMREAD_COLOR semantics —
    drops alpha, 3 channels, BGR order; main.cpp:74)."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"couldn't read image: {path}")
    if native.available():
        img = native.imread(path)
        if img is not None:
            return img
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(f"couldn't read image: {path}")
        return img
    img = np.asarray(Image.open(path).convert("RGB"))
    return img[:, :, ::-1].copy()  # RGB -> BGR


def imread_bgra(path: str) -> np.ndarray | None:
    """Read with alpha preserved if the file has one (for the opt-in alpha
    pipeline, appendix/hints-jp.md:76-81). Returns uint8 BGRA or None."""
    if not os.path.exists(path):
        raise FileNotFoundError(f"couldn't read image: {path}")
    if native.available():
        img = native.imread(path, keep_alpha=True)
        if img is not None:
            return img if img.shape[2] == 4 else None
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(f"couldn't read image: {path}")
        if img.ndim == 3 and img.shape[2] == 4:
            return img
        return None
    img = Image.open(path)
    if img.mode in ("RGBA", "LA", "PA"):
        rgba = np.asarray(img.convert("RGBA"))
        return rgba[:, :, [2, 1, 0, 3]].copy()  # RGBA -> BGRA
    return None


def imread_batch_bgr(paths: list[str], jobs: int = 4) -> list[np.ndarray]:
    """Decode many images (native thread pool when available — the host
    analogue of the reference's -j/nJob worker fan-out, main.cpp:79)."""
    results: list[np.ndarray | None] = [None] * len(paths)
    if native.available():
        decoded = native.decode_batch(paths, threads=jobs)
        if decoded is not None:
            results = decoded
    return [r if r is not None else imread_bgr(p)
            for p, r in zip(paths, results)]


def flatten_white(bgra_u8: np.ndarray) -> np.ndarray:
    """Composite a uint8 BGRA image onto a white background -> uint8 BGR:
    c' = c*a + (1-a) on the unit scale, the original waifu2x loader's alpha
    handling (appendix/waifu2x-nocuda/lib/image_loader.lua:23-33). Native
    C++ fast path (w2x_flatten_white) when built; numpy twin otherwise —
    both round to nearest on the byte scale."""
    if bgra_u8.ndim != 3 or bgra_u8.shape[2] != 4:
        raise ValueError(f"expected BGRA, got shape {bgra_u8.shape}")
    if native.available():
        out = native.flatten_white(bgra_u8)
        if out is not None:
            return out
    c = bgra_u8[:, :, :3].astype(np.uint32)
    a = bgra_u8[:, :, 3:4].astype(np.uint32)
    return ((c * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)


def imwrite_bgr(path: str, img_bgr_u8: np.ndarray) -> None:
    """Write a uint8 BGR (or BGRA) image (cv::imwrite, main.cpp:190)."""
    if (path.lower().endswith(".png") and native.available()
            and native.imwrite_png(path, img_bgr_u8)):
        return
    if _HAS_CV2:
        if not cv2.imwrite(path, img_bgr_u8):
            raise IOError(f"couldn't write image: {path}")
        return
    if img_bgr_u8.shape[2] == 4:
        rgba = img_bgr_u8[:, :, [2, 1, 0, 3]]
        Image.fromarray(rgba, "RGBA").save(path)
    else:
        Image.fromarray(img_bgr_u8[:, :, ::-1]).save(path)


def _cpp_double_str(x: float) -> str:
    """std::to_string(double): fixed notation, 6 decimals (main.cpp:185)."""
    return f"{x:.6f}"


def auto_output_name(input_path: str, mode: str, noise_level: int,
                     scale_ratio: float) -> str:
    """Default output filename when -o is omitted, replicating
    main.cpp:173-189: strip from the LAST dot, then append
    "(mode)" ["(LevelN)"] ["(xR.RRRRRR)"] ".png"."""
    tail_dot = input_path.rfind(".")
    base = input_path[:tail_dot] if tail_dot != -1 else input_path
    name = f"{base}({mode})"
    if "noise" in mode:
        name += f"(Level{noise_level})"
    if "scale" in mode:
        name += f"(x{_cpp_double_str(scale_ratio)})"
    return name + ".png"


def default_model_dir() -> str:
    """Bundled models directory (repo's models/, like the reference's
    default `models` flag value, main.cpp:56). For pip installs (no models/
    sibling of the package, and site-packages may not be writable) fall
    back to a per-user cache dir that ensure_default_models can populate."""
    repo_dir = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "models")
    if os.path.isdir(repo_dir):
        return repo_dir
    cache_root = os.environ.get(
        "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(cache_root, "waifu2x_tpu", "models")
