"""Round 2: separate the OUT-block write cost from the input fetch cost.

dma_probe.py showed lane16_x1 = 3.13 ms and lane128 = 2.09 ms for the same
47 MB — but every probe wrote a (1,64,128,4) out block (4-lane minor =
1/32 vreg+DMA utilization), which may dominate. Here: vary input and
output layouts independently. grid (4,8,4) = 128 steps throughout.

  out4       no input; write out block (1,64,128,4) bf16   [production-ish]
  out128     no input; write out block (1,64,4,128) bf16   [dense minor]
  out2d      no input; write out block (1,64,128) bf16 2-D plane
  in16+o128  xa (1,64,128,16) fetch + dense out
  in128+o128 dense (1,64,8,128) fetch (tc/8=16... 8 cols) + dense out
  raw+o128   raw plane (1,64,128) fetch + dense out
  in16+o16c  xa fetch + (1,64,128,16) u8 out  [the fused-u8 production out]
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
WD = W16 * 16 // 128


def timeit(f, *xs):
    out = f(*xs)
    np.asarray(jax.device_get(out)).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(*xs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 20 * 1e3


def run(name, in_specs, shapes, out_spec, out_shape, body):
    call = pl.pallas_call(
        body, grid=(B, ny, nx), in_specs=in_specs, out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024))
    arrs = [jnp.asarray(rng.random(s, np.float32)).astype(cdtype)
            for s in shapes]
    f = jax.jit(lambda *xs: call(*xs))
    dt = timeit(f, *arrs)
    ib = sum(int(np.prod(s)) for s in shapes) * 2 / 1e6
    ob = int(np.prod(out_shape.shape)) * out_shape.dtype.itemsize / 1e6
    print(f"{name:11s}: {dt:6.2f} ms  (in {ib:6.1f} MB, out {ob:6.1f} MB)",
          flush=True)


o4 = (pl.BlockSpec((1, tr, tc, 4), lambda n, i, j: (n, i, j, 0),
                   memory_space=pltpu.VMEM),
      jax.ShapeDtypeStruct((B, ny * tr, nx * tc, 4), cdtype))
o128 = (pl.BlockSpec((1, tr, 4, 128), lambda n, i, j: (n, i, j, 0),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((B, ny * tr, nx * 4, 128), cdtype))
o2d = (pl.BlockSpec((1, tr, tc), lambda n, i, j: (n, i, j),
                    memory_space=pltpu.VMEM),
       jax.ShapeDtypeStruct((B, ny * tr, nx * tc), cdtype))
o16c = (pl.BlockSpec((1, tr, tc, 16), lambda n, i, j: (n, i, j, 0),
                     memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((B, ny * tr, nx * tc, 16), jnp.uint8))

xa16 = pl.BlockSpec((1, tr, tc, 16), lambda n, i, j: (n, i, j, 0),
                    memory_space=pltpu.VMEM)
xad = pl.BlockSpec((1, tr, WD // nx, 128), lambda n, i, j: (n, i, j, 0),
                   memory_space=pltpu.VMEM)
xar = pl.BlockSpec((1, tr, tc), lambda n, i, j: (n, i, j),
                   memory_space=pltpu.VMEM)


def w4(out):
    out[0] = jnp.zeros((tr, tc, 4), cdtype)


def w128(out):
    out[0] = jnp.zeros((tr, 4, 128), cdtype)


def w2d(out):
    out[0] = jnp.zeros((tr, tc), cdtype)


run("out4", [], [], *o4, w4)
run("out128", [], [], *o128, w128)
run("out2d", [], [], *o2d, w2d)


def b16(xa, out):
    out[0] = xa[0][:, 0:4, :].astype(jnp.float32).astype(cdtype) * 0


run("in16+o128", [xa16], [(B, H16, W16, 16)], *o128, b16)


def b128(xa, out):
    out[0] = xa[0][:, 0:4, :] * 0


run("in128+o128", [xad], [(B, H16, WD, 128)], *b128.__defaults__ or o128,
    b128) if False else run("in128+o128", [xad], [(B, H16, WD, 128)],
                            *o128, b128)


def braw(xa, out):
    t = xa[0]
    out[0] = jnp.stack([t[:, 0:4]] * 32, axis=-1).reshape(tr, 4, 128) * 0


run("raw+o128", [xar], [(B, H16, W16)], *o128, braw)


def b16u(xa, out):
    out[0] = (xa[0].astype(jnp.float32) * 0).astype(jnp.int32).astype(
        jnp.uint8)


run("in16+o16c", [xa16], [(B, H16, W16, 16)], *o16c, b16u)
