"""Transposed-matmul feasibility probe (lanes = spatial positions design).

The current kernel keeps channels in lanes — which forces 16-lane im2col
input, 4-lane y output and 8-byte HBM runs (~1.8 ms/4f of structural
layout cost, tools/stage_time.py). The alternative layout keeps COLUMNS in
lanes and channels in sublanes: all HBM crossings dense, but every matmul
becomes y[co, W] = W[ci, co]^T @ x[ci, W] (contraction on dim 0 of both)
and must be issued PER ROW (rows are a major dim).

This probe measures one L6-like layer (128->128 ch, 4 taps) both ways at
production-ish volume (grid (16,8,4), 64 rows x 136 cols per cell):

  chlane   current form: x (rows, wc, 128) @ w (128, 128), 4 taps, acc f32
  poslane  transposed form: per row r, per tap: acc[co, W] += w^T @ x-slice
           (dot_general contracting dim 0 of both operands)

If poslane's per-MAC cost lands within ~1.2x of chlane, a ground-up layout
flip could recover the ~1.8 ms/4f; if it's much worse (or fails to
compile), the s2d-lanes design stands.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waifu2x_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, ny, nx = 16, 8, 4
tr, tc = 64, 128
wc = tc + 8
cdtype = jnp.bfloat16
rng = np.random.default_rng(0)


def timeit(name, f, *xs):
    out = f(*xs)
    print(name, "compiled", flush=True)
    float(jnp.max(out[..., 0].astype(jnp.float32))
          if out.ndim > 2 else jnp.max(out.astype(jnp.float32)))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(*xs)
        float(jnp.max(out.reshape(-1)[:1].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 10 * 1e3
        best = dt if best is None else min(best, dt)
    print(f"{name:8s}: {best * 4 / B:6.2f} ms/4f", flush=True)


# ---- chlane: the current form ----------------------------------------------
xc = jnp.asarray(rng.random((B, (ny + 1) * tr, (nx + 1) * tc, 128),
                            np.float32)).astype(cdtype)
wch = jnp.asarray(rng.random((4, 128, 128), np.float32)).astype(cdtype)


def body_ch(x, w, out, acc):
    a = acc.at[0:tr, 0:wc, :]
    for t in range(4):
        p = jax.lax.dot_general(
            x[0][t:t + tr, t:t + wc, :], w[t],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if t == 0:
            a[...] = p
        else:
            a[...] += p
    out[0] = acc[0:tr, 0:tc, :].astype(cdtype)


cch = pl.pallas_call(
    body_ch, grid=(B, ny, nx),
    in_specs=[pl.BlockSpec((1, tr + 8, tc + 16, 128),
                           lambda n, i, j: (n, i, j, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((4, 128, 128), lambda n, i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, tr, tc, 128), lambda n, i, j: (n, i, j, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, ny * tr, nx * tc, 128), cdtype),
    scratch_shapes=[pltpu.VMEM((tr, tc + 16, 128), jnp.float32)],
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024),
)

# NOTE the input block here deliberately over-fetches (tr+8, tc+16) whole —
# this probe compares MATMUL forms, not fetch pipelines.
timeit("chlane", jax.jit(lambda x, w: cch(x, w)), xc, wch)

# ---- poslane: transposed form, per-row dots ---------------------------------
# activations [B, R, ci, W]: rows major, channels sublane, cols lane — all
# HBM-dense. Per row: acc (co, W) accumulated over 4 taps.
xp = jnp.asarray(rng.random((B, (ny + 1) * tr, 128, (nx + 1) * tc),
                            np.float32)).astype(cdtype)


def body_pos(x, w, out, acc):
    def row(r, _):
        a = None
        for t in range(4):
            p = jax.lax.dot_general(
                w[t], jax.lax.dynamic_slice(
                    x[0], (r + t, 0, t), (1, 128, wc))[0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            a = p if a is None else a + p
        acc[r] = a.astype(cdtype)
        return 0

    jax.lax.fori_loop(0, tr, row, 0)
    out[0] = acc[:, :, 0:tc]


cpos = pl.pallas_call(
    body_pos, grid=(B, ny, nx),
    in_specs=[pl.BlockSpec((1, tr + 8, 128, tc + 16),
                           lambda n, i, j: (n, i, 0, j),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((4, 128, 128), lambda n, i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, tr, 128, tc), lambda n, i, j: (n, i, 0, j),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, ny * tr, 128, nx * tc), cdtype),
    scratch_shapes=[pltpu.VMEM((tr, 128, tc + 8), cdtype)],
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024),
)
timeit("poslane", jax.jit(lambda x, w: cpos(x, w)), xp, wch)
