"""Isolate WHY the xcol input fetch costs 3.26 ms/4f (tools/l14_probe.py
xonly) when the nominal bytes (~41 MB) should move in ~0.05 ms.

Hypotheses:
  H1 lane waste: the 16-lane minor dim wastes 7/8 of each (8,128) VMEM/HBM
     granule -> 8x traffic AND 1/8-efficiency DMA.
  H2 per-grid-step DMA latency: 128 steps x 4 DMAs serialize ~25 us each.

Probes (all: grid (4, 8, 4), per-cell out (1,64,128,4) bf16, body = tiny
reduce so nothing is DCE'd; 20 reps timed):
  lane16_x4   the production shape: [4,520,528,16] fetched as 4 blocks
              (tile + 16-col right stripe + 8-row below stripe + 8x16 diag)
  lane16_x1   same array, ONE (64,128,16) block per cell (no neighbors)
  lane128     SAME nominal bytes, dense lanes: [4,520,66,128], one
              (1,64,17,128) block per cell... 528*16 = 66*128 exactly.
  lane128_x4  dense-lane array fetched as 4 blocks (16-col stripe = 2
              dense cols, etc.) to separate DMA-count from layout.
  raw2d       the raw plane form: [4,520,528] f32-free bf16, block
              (1,64,128) (lane dim = columns, dense) — what a no-im2col
              kernel would fetch. 9x fewer nominal bytes than lane16.
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

B = 4
tr, tc = 64, 128
ny, nx = 8, 4
cdtype = jnp.bfloat16
rng = np.random.default_rng(0)


def timeit(f, x):
    out = f(x)
    float(jnp.max(out[..., 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(x)
    float(jnp.max(out[..., 0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / 20 * 1e3


def run(name, in_specs, shapes, body):
    call = pl.pallas_call(
        body,
        grid=(B, ny, nx),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tr, tc, 4),
                               lambda n, i, j: (n, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ny * tr, nx * tc, 4), cdtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    nargs = len(in_specs)
    f = jax.jit(lambda x: call(*([x] * nargs)))
    arrs = [jnp.asarray(rng.random(s, np.float32)).astype(cdtype)
            for s in shapes]
    dt = timeit(f, arrs[0])
    gb = sum(np.prod(s) for s in shapes) * 2 / 1e9
    print(f"{name:12s}: {dt:6.2f} ms  (array {gb*1e3:7.1f} MB nominal)",
          flush=True)


# ---- lane16_x4: production window assembly --------------------------------
H16, W16 = (ny + 1) * tr, (nx + 1) * tc   # 576, 640 (block grid +1)
cb, rb = tc // 16, tr // 8


def body4(xa, xb, xc, xd, out):
    t = (xa[0][0:tr, 0:tc, 0:4].astype(jnp.float32)
         + xb[0][:, 0:1, 0:4].astype(jnp.float32)
         + xc[0][0:1, :, 0:4].astype(jnp.float32)
         + xd[0][0:1, 0:1, 0:4].astype(jnp.float32))
    out[0] = t.astype(cdtype)


run("lane16_x4",
    [pl.BlockSpec((1, tr, tc, 16), lambda n, i, j: (n, i, j, 0),
                  memory_space=pltpu.VMEM),
     pl.BlockSpec((1, tr, 16, 16), lambda n, i, j: (n, i, (j + 1) * cb, 0),
                  memory_space=pltpu.VMEM),
     pl.BlockSpec((1, 8, tc, 16), lambda n, i, j: (n, (i + 1) * rb, j, 0),
                  memory_space=pltpu.VMEM),
     pl.BlockSpec((1, 8, 16, 16),
                  lambda n, i, j: (n, (i + 1) * rb, (j + 1) * cb, 0),
                  memory_space=pltpu.VMEM)],
    [(B, H16, W16, 16)] * 4, body4)


# ---- lane16_x1: one block, no neighbors ------------------------------------
def body1(xa, out):
    out[0] = xa[0][:, :, 0:4]


run("lane16_x1",
    [pl.BlockSpec((1, tr, tc, 16), lambda n, i, j: (n, i, j, 0),
                  memory_space=pltpu.VMEM)],
    [(B, H16, W16, 16)], body1)

# ---- lane128: same bytes, dense minor --------------------------------------
WD = W16 * 16 // 128   # 80 dense cols


def bodyd(xa, out):
    out[0] = xa[0][:, 0:tc // 8, 0:4].astype(jnp.float32).repeat(
        8, axis=1).astype(cdtype)


run("lane128",
    [pl.BlockSpec((1, tr, tc // 8, 128), lambda n, i, j: (n, i, j, 0),
                  memory_space=pltpu.VMEM)],
    [(B, H16, WD, 128)], bodyd)


# ---- lane128_x4: dense minor, 4 DMAs ---------------------------------------
def bodyd4(xa, xb, xc, xd, out):
    t = (xa[0][0:tr, 0:tc // 8, 0:4].astype(jnp.float32)
         + xb[0][:, 0:1, 0:4].astype(jnp.float32)
         + xc[0][0:1, :, 0:4].astype(jnp.float32)
         + xd[0][0:1, 0:1, 0:4].astype(jnp.float32))
    out[0] = t.repeat(8, axis=1).astype(cdtype)


cbd = tc // 8 // 2     # right stripe = 2 dense cols
run("lane128_x4",
    [pl.BlockSpec((1, tr, tc // 8, 128), lambda n, i, j: (n, i, j, 0),
                  memory_space=pltpu.VMEM),
     pl.BlockSpec((1, tr, 2, 128), lambda n, i, j: (n, i, (j + 1) * cbd, 0),
                  memory_space=pltpu.VMEM),
     pl.BlockSpec((1, 8, tc // 8, 128),
                  lambda n, i, j: (n, (i + 1) * rb, j, 0),
                  memory_space=pltpu.VMEM),
     pl.BlockSpec((1, 8, 2, 128),
                  lambda n, i, j: (n, (i + 1) * rb, (j + 1) * cbd, 0),
                  memory_space=pltpu.VMEM)],
    [(B, H16, WD, 128)] * 4, bodyd4)


# ---- raw2d: the raw plane, lane dim = columns ------------------------------
def bodyr(xa, out):
    t = xa[0].astype(jnp.float32)
    out[0] = jnp.stack([t, t, t, t], axis=-1).astype(cdtype)


call = pl.pallas_call(
    bodyr,
    grid=(B, ny, nx),
    in_specs=[pl.BlockSpec((1, tr, tc), lambda n, i, j: (n, i, j),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, tr, tc, 4), lambda n, i, j: (n, i, j, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, ny * tr, nx * tc, 4), cdtype),
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024),
)
f = jax.jit(lambda x: call(x))
x = jnp.asarray(rng.random((B, H16, W16), np.float32)).astype(cdtype)
dt = timeit(f, x)
print(f"{'raw2d':12s}: {dt:6.2f} ms  (array {x.size*2/1e6:7.1f} MB nominal)",
      flush=True)
