"""Executable spec of the reference main() built on OpenCV itself.

This mirrors /root/reference/src/main.cpp:74-190 call-for-call using cv2 (the
same library the C++ uses), with tests/oracle.py providing the filter stack.
It is the golden reference the JAX pipeline is measured against (PSNR metric
per BASELINE.json)."""

from __future__ import annotations

import math

import cv2
import numpy as np

from tests import oracle


def reference_pipeline(bgr_u8: np.ndarray, mode: str, scale_ratio: float,
                       noise_params=None, scale_params=None,
                       block_size: int = 512,
                       fast: bool = False) -> np.ndarray:
    # main.cpp:74-76 — float conversion + RGB2YUV applied to BGR data
    img = bgr_u8.astype(np.float32) * np.float32(1.0 / 255.0)
    img = cv2.cvtColor(img, cv2.COLOR_RGB2YUV)

    if mode in ("noise", "noise_scale"):
        # main.cpp:82-100
        img[:, :, 0] = oracle.convert_with_models(
            img[:, :, 0].copy(), noise_params, block_size=block_size,
            fast=fast)

    if mode in ("scale", "noise_scale"):
        # main.cpp:104-169
        iters = max(0, math.ceil(math.log2(scale_ratio)))
        shrink = 0.0
        if int(scale_ratio) != 2 ** iters:
            shrink = scale_ratio / (2.0 ** iters)
        for _ in range(iters):
            h, w = img.shape[:2]
            nearest = cv2.resize(img, (w * 2, h * 2),
                                 interpolation=cv2.INTER_NEAREST)
            y_in = nearest[:, :, 0].copy()
            bic = cv2.resize(img, (w * 2, h * 2),
                             interpolation=cv2.INTER_CUBIC)
            bic[:, :, 0] = oracle.convert_with_models(
                y_in, scale_params, block_size=block_size, fast=fast)
            img = bic
        if shrink != 0.0:
            h, w = img.shape[:2]
            img = cv2.resize(img, (int(w * shrink), int(h * shrink)),
                             interpolation=cv2.INTER_LINEAR)

    # main.cpp:171-172 — YUV2RGB then *255 saturate-cast
    img = cv2.cvtColor(img, cv2.COLOR_YUV2RGB)
    return np.clip(np.rint(img.astype(np.float64) * 255.0), 0, 255).astype(
        np.uint8)
