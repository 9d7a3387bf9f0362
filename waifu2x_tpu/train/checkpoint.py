"""Checkpoint / resume — a subsystem the reference converter lacks entirely
(SURVEY.md §5: the Lua appendix only torch.save'd model snapshots,
settings.lua:39-42). Training state (params + Adam state + step) is saved as
a flat .npz; final weights export to the reference JSON format via
models/weights.py so the C++ converter can load them."""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree.flatten(tree)
    return flat, treedef


def save_checkpoint(path: str, params, opt_state, step: int) -> None:
    """Atomic .npz snapshot of the full training state."""
    state = {"params": params, "opt_state": opt_state}
    flat, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    arrays["__step__"] = np.asarray(step, np.int64)
    tmp = path + ".tmp.npz"  # explicit .npz so np.savez doesn't rename
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, params_like, opt_state_like):
    """Restore (params, opt_state, step); the _like args provide the pytree
    structure (same pattern as orbax restore targets)."""
    with np.load(path) as data:
        step = int(data["__step__"])
        state_like = {"params": params_like, "opt_state": opt_state_like}
        flat_like, treedef = jax.tree.flatten(state_like)
        flat = [data[f"leaf_{i}"] for i in range(len(flat_like))]
    state = jax.tree.unflatten(treedef, flat)
    return state["params"], state["opt_state"], step


def save_frame_cursor(path: str, cursor: int, meta: dict | None = None) -> None:
    """Stream-resume cursor for the video/batch pipeline (SURVEY.md §5
    'streaming video configs can checkpoint a frame cursor')."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"cursor": cursor, **(meta or {})}, f)
    os.replace(tmp, path)


def load_frame_cursor(path: str) -> int:
    """Missing or torn cursor files mean 'start from frame 0' — resume must
    never crash on the state it exists to recover from."""
    if not os.path.exists(path):
        return 0
    try:
        with open(path) as f:
            return int(json.load(f)["cursor"])
    except (ValueError, KeyError, OSError):
        return 0
