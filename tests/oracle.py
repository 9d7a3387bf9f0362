"""NumPy oracle that mirrors the reference C++ converter *literally*.

Every function here is a line-for-line-in-spirit port of the reference's
algorithm (per-plane same-size filter2D with BORDER_REPLICATE, sequential
accumulation), used only as a test oracle — the framework itself implements
the math differently (valid convs, fused kernels). Cites:
  filter worker: /root/reference/src/modelHandler.cpp:117-159
  basic convert: /root/reference/src/convertRoutine.cpp:53-82
  pad/crop path: /root/reference/src/convertRoutine.cpp:21-49
  block split:   /root/reference/src/convertRoutine.cpp:84-168
"""

from __future__ import annotations

import math

import numpy as np


def replicate_pad(x: np.ndarray, t: int, b: int, l: int, r: int) -> np.ndarray:
    return np.pad(x, ((t, b), (l, r)), mode="edge")


def filter2d_replicate(plane: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """cv::filter2D: same-size 2-D CORRELATION (no flip), anchor center,
    BORDER_REPLICATE (modelHandler.cpp:141-142)."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    xp = replicate_pad(plane, ph, ph, pw, pw)
    out = np.zeros_like(plane, dtype=np.float32)
    for dy in range(kh):
        for dx in range(kw):
            out += np.float32(kernel[dy, dx]) * xp[
                dy : dy + plane.shape[0], dx : dx + plane.shape[1]
            ]
    return out


def model_filter(input_planes: list[np.ndarray], layer) -> list[np.ndarray]:
    """One layer: Model::filter / filterWorker (modelHandler.cpp:26-159).
    layer = {"w": [kh,kw,cin,cout], "b": [cout]} (HWIO, unflipped)."""
    w, b = layer["w"], layer["b"]
    cin, cout = w.shape[2], w.shape[3]
    assert len(input_planes) == cin
    outs = []
    for op in range(cout):
        acc = np.zeros_like(input_planes[0], dtype=np.float32)
        for ip in range(cin):
            acc += filter2d_replicate(input_planes[ip], w[:, :, ip, op])
        acc += np.float32(b[op])
        # LeakyReLU 0.1 exactly as modelHandler.cpp:148-152
        acc = np.maximum(acc, 0) + np.float32(0.1) * np.minimum(acc, 0)
        outs.append(acc)
    return outs


def model_filter_fast(x: np.ndarray, layer) -> np.ndarray:
    """BLAS twin of model_filter for PSNR-level (not bit-level) tests:
    same correlation/bias/LeakyReLU math on [cin, H, W] stacks via one
    channel matmul per tap — float summation order differs from the
    sequential C++ loop by ~1e-6 relative, 100x faster at 512^2."""
    w, b = layer["w"], layer["b"]
    kh, kw, cin, cout = w.shape
    ph, pw = kh // 2, kw // 2
    h, wd = x.shape[1], x.shape[2]
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw)), mode="edge")
    acc = np.zeros((cout, h, wd), np.float32)
    for dy in range(kh):
        for dx in range(kw):
            tap = xp[:, dy:dy + h, dx:dx + wd].reshape(cin, -1)
            acc += (w[dy, dx].T.astype(np.float32) @ tap).reshape(
                cout, h, wd)
    acc += b.astype(np.float32)[:, None, None]
    return np.maximum(acc, 0) + np.float32(0.1) * np.minimum(acc, 0)


def convert_with_models_basic(plane: np.ndarray, params,
                              fast: bool = False) -> np.ndarray:
    """convertRoutine.cpp:53-82 — sequential layer loop; input must already
    be padded by the caller."""
    if fast:
        x = plane.astype(np.float32)[None]
        for layer in params:
            x = model_filter_fast(x, layer)
        assert x.shape[0] == 1
        return x[0]
    planes = [plane.astype(np.float32)]
    for layer in params:
        planes = model_filter(planes, layer)
    assert len(planes) == 1
    return planes[0]


def convert_with_models(plane: np.ndarray, params, block_size: int | None = None,
                        block_splitting: bool = True,
                        fast: bool = False) -> np.ndarray:
    """convertWithModels (convertRoutine.cpp:21-49) incl. the split decision
    W*H > blockW*blockH*3/2 (convertRoutine.cpp:25-26)."""
    n_model = len(params)
    h, w = plane.shape
    bs = block_size if block_size is not None else 512
    if block_splitting and (w * h > bs * bs * 3 // 2):
        return convert_with_models_block_split(plane, params, bs, fast=fast)
    padded = replicate_pad(plane, n_model, n_model, n_model, n_model)
    out = convert_with_models_basic(padded, params, fast=fast)
    return out[n_model : n_model + h, n_model : n_model + w]


def convert_with_models_block_split(plane: np.ndarray, params,
                                    block_size: int = 512,
                                    fast: bool = False) -> np.ndarray:
    """convertWithModelsBlockSplit (convertRoutine.cpp:84-168): pad whole
    plane by n_model, tile at stride block-2*n_model with remainder blocks,
    run the stack per block, crop the n_model rim, stitch."""
    n_model = len(params)
    h, w = plane.shape
    padded = replicate_pad(plane, n_model, n_model, n_model, n_model)
    stride = block_size - 2 * n_model
    split_cols = math.ceil(w / stride)
    split_rows = math.ceil(h / stride)
    out = np.zeros((h, w), np.float32)
    for r in range(split_rows):
        r0 = r * stride
        r1 = padded.shape[0] if r == split_rows - 1 else r0 + block_size
        for c in range(split_cols):
            c0 = c * stride
            c1 = padded.shape[1] if c == split_cols - 1 else c0 + block_size
            block = padded[r0:r1, c0:c1]
            res = convert_with_models_basic(block, params, fast=fast)
            inner = res[n_model : res.shape[0] - n_model,
                        n_model : res.shape[1] - n_model]
            out[r0 : r0 + inner.shape[0], c0 : c0 + inner.shape[1]] = inner
    return out


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * math.log10(peak * peak / mse)
