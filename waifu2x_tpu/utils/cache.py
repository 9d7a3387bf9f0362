"""Persistent XLA compilation cache — first compile of each program shape is
slow (tens of seconds on TPU, worse through a remote tunnel); caching makes
repeat CLI/bench invocations start fast."""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/waifu2x_tpu/xla")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("W2X_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax or readonly fs
        pass
