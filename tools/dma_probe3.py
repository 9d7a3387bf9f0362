"""Round 3: find a FAST out layout for the kernel's y (s2d phases).

dma_probe2 found the smoking gun: writing the (1,64,128,4) bf16 out block
costs 2.95 ms/4f ON ITS OWN (no inputs, zero compute) — the 4-lane minor
dim makes the HBM scatter write 8-byte runs. That constant sat under every
l14_probe truncation, so layers 1-4 are actually near model; the real
production residual is the out write of the xla-tail y (same 4-lane shape).

Candidates (grid (4,8,4); body reads xa16 and fakes a (tr,tc,4) y):
  y4          write y as (1,64,128,4)          [production xla-tail today]
  y512r       reshape y (64,128,4)->(64,512) in-kernel; out (1,64,512)
              on [4,512,2048]  — SAME memory semantics as y4's array
  y512n       write a natively-(64,512) value (no reshape) — lower bound
  u8_16       write (1,64,128,16) u8           [production fused-u8 tail]
  u8_2048r    fused-u8 as (64,2048) u8 via reshape; out (1,64,2048)
"""
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
H16, W16 = (ny + 1) * tr, (nx + 1) * tc

xa16 = pl.BlockSpec((1, tr, tc, 16), lambda n, i, j: (n, i, j, 0),
                    memory_space=pltpu.VMEM)
xarr = jnp.asarray(rng.random((B, H16, W16, 16), np.float32)).astype(cdtype)


def timeit(f, x):
    out = f(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 20 * 1e3


def run(name, out_spec, out_shape, body):
    call = pl.pallas_call(
        body, grid=(B, ny, nx), in_specs=[xa16], out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024))
    f = jax.jit(lambda x: call(x))
    dt = timeit(f, xarr)
    ob = int(np.prod(out_shape.shape)) * out_shape.dtype.itemsize / 1e6
    print(f"{name:9s}: {dt:6.2f} ms  (out {ob:6.1f} MB)", flush=True)


def mk_y(xa):
    """Fake a (tr, tc, 4) f32 y from the input block (forces a read)."""
    t = xa[0][:, :, 0:4].astype(jnp.float32)
    return t * 0.5 + 1.0


def b_y4(xa, out):
    out[0] = mk_y(xa).astype(cdtype)


run("y4",
    pl.BlockSpec((1, tr, tc, 4), lambda n, i, j: (n, i, j, 0),
                 memory_space=pltpu.VMEM),
    jax.ShapeDtypeStruct((B, ny * tr, nx * tc, 4), cdtype), b_y4)


def b_y512r(xa, out):
    out[0] = mk_y(xa).astype(cdtype).reshape(tr, tc * 4)


run("y512r",
    pl.BlockSpec((1, tr, tc * 4), lambda n, i, j: (n, i, j),
                 memory_space=pltpu.VMEM),
    jax.ShapeDtypeStruct((B, ny * tr, nx * tc * 4), cdtype), b_y512r)


def b_y512n(xa, out):
    t = xa[0][:, :, 0:4].astype(jnp.float32)
    v = jnp.concatenate([t[:, :, 0], t[:, :, 1], t[:, :, 2], t[:, :, 3]],
                        axis=-1)
    out[0] = v.astype(cdtype)


run("y512n",
    pl.BlockSpec((1, tr, tc * 4), lambda n, i, j: (n, i, j),
                 memory_space=pltpu.VMEM),
    jax.ShapeDtypeStruct((B, ny * tr, nx * tc * 4), cdtype), b_y512n)


def b_u8(xa, out):
    t = xa[0].astype(jnp.float32) * 255.0
    q = jnp.clip(jnp.round(t), 0, 255).astype(jnp.int32)
    out[0] = q.astype(jnp.uint8)


run("u8_16",
    pl.BlockSpec((1, tr, tc, 16), lambda n, i, j: (n, i, j, 0),
                 memory_space=pltpu.VMEM),
    jax.ShapeDtypeStruct((B, ny * tr, nx * tc, 16), jnp.uint8), b_u8)


def b_u8r(xa, out):
    t = xa[0].astype(jnp.float32) * 255.0
    q = jnp.clip(jnp.round(t), 0, 255).astype(jnp.int32)
    out[0] = q.astype(jnp.uint8).reshape(tr, tc * 16)


run("u8_2048r",
    pl.BlockSpec((1, tr, tc * 16), lambda n, i, j: (n, i, j),
                 memory_space=pltpu.VMEM),
    jax.ShapeDtypeStruct((B, ny * tr, nx * tc * 16), jnp.uint8), b_u8r)
