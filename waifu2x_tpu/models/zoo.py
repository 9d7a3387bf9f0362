"""Built-in model management.

The reference ships three trained model files — noise1_model.json,
noise2_model.json, scale2.0x_model.json (main.cpp:83-85, 116-117) — but the
blobs are git-LFS objects that are not present in the mirrored repo
(/root/reference/.MISSING_LARGE_BLOBS). Until the train/ pipeline produces
real weights, we generate deterministic *identity* models in the same JSON
schema so every pipeline path runs end-to-end out of the box: each layer
routes plane 0 through its center tap, so the stack is an exact no-op on
non-negative luma (LeakyReLU is identity for x >= 0). Files written by this
module load unmodified in the reference C++ converter too.
"""

from __future__ import annotations

import os

import numpy as np

from waifu2x_tpu.models.srcnn import ModelSpec, WAIFU2X_7LAYER
from waifu2x_tpu.models.weights import save_model_json

DEFAULT_MODEL_NAMES = (
    "noise1_model.json",
    "noise2_model.json",
    "scale2.0x_model.json",
)


def identity_params(spec: ModelSpec = WAIFU2X_7LAYER):
    """An exact-identity conv stack in the reference architecture."""
    params = []
    for layer in spec.layers:
        w = np.zeros((layer.ksize, layer.ksize, layer.cin, layer.cout),
                     np.float32)
        c = layer.ksize // 2
        w[c, c, 0, 0] = 1.0  # pass plane 0 through the center tap
        b = np.zeros((layer.cout,), np.float32)
        params.append({"w": w, "b": b})
    return tuple(params)


def ensure_default_models(model_dir: str,
                          spec: ModelSpec = WAIFU2X_7LAYER) -> list[str]:
    """Materialize missing or STALE reference model files: prefer the
    shipped TPU-trained demo weights (models/*_demo.json, trained by
    tools/train_demo.py and committed to the repo), fall back to
    placeholder identity models. A *_model.json previously copied from a
    demo is refreshed when the demo file is newer (retrained weights must
    reach users who already materialized the old copy); a user's own
    *_model.json (no demo sibling) is never touched. Returns the list of
    files written."""
    os.makedirs(model_dir, exist_ok=True)
    written = []
    params = None
    for name in DEFAULT_MODEL_NAMES:
        path = os.path.join(model_dir, name)
        demo = os.path.join(model_dir, name.replace("_model.json",
                                                    "_demo.json"))
        has_demo = os.path.exists(demo)
        if os.path.exists(path):
            if not (has_demo
                    and os.path.getmtime(demo) > os.path.getmtime(path)):
                continue
        if has_demo:
            import shutil
            # copy2 (not copyfile): preserving the demo's mtime makes the
            # refresh idempotent — a copy stamped "now" would stay older
            # than a newer-mtime demo and re-refresh on every call
            shutil.copy2(demo, path)
        else:
            if params is None:
                params = identity_params(spec)
            save_model_json(path, params)
        written.append(path)
    return written
