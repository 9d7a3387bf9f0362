"""Production-scale stage timing with RELIABLE sync (scalar readback) and a
bench-style pipelined loop. The earlier micro-probes (dma_probe*.py) ran at
B=4 where everything sits at the ~3 ms relay dispatch floor, and their
block_until_ready sync under-reports — treat their absolute numbers as void.

Batch 16 x 512^2 (the headline shape). Stages:
  outonly   kernel writing zeros to the (1,64,128,4) bf16 out block, no
            inputs — is the 4-lane out write REALLY a whale at scale?
  outdense  same, out block (1,64,512) on [B,hp,4*wp] (dense lanes)
  xcol      _xcol_scale alone
  kernel    _run_stack alone (pre-built xcol input)
  tail      _tail_u8_cmajor alone (pre-built y_s2d)
  step      the full scale2x_batch_u8_fused
All numbers reported per 4 frames (ms) for comparison with docs/PERF.md.
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
from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
from waifu2x_tpu.ops import pallas_stack as ps
from waifu2x_tpu import pipeline

B, S = 16, 512
tr, tc = 64, 128
ny, nx = S // tr, S // tc
cdtype = jnp.bfloat16

params = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
fast = pipeline.FastStack.build(params, scale_input=True)
rng = np.random.default_rng(0)
yuv = jnp.asarray(rng.random((B, S, S, 3), dtype=np.float32))
ylow = yuv[..., 0].astype(cdtype)
xcol = ps._xcol_scale(ylow, tr, tc)
y_s2d = ps._run_stack(xcol, fast.kp, tr, tc, ny, nx, fast.spec)
print("setup:", float(jnp.max(xcol[0, 0, 0, :4].astype(jnp.float32))),
      float(jnp.max(y_s2d[0, 0, 0, :4].astype(jnp.float32))), flush=True)


def sync(a):
    return int(np.asarray(jnp.max(jnp.ravel(a)[:1].astype(jnp.float32))))


def timeit(name, f, *xs, iters=20):
    out = f(*xs)
    sync(out)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*xs)
        sync(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        best = dt if best is None else min(best, dt)
    print(f"{name:9s}: {best * 4 / B:6.2f} ms/4f   ({best:6.2f} ms/batch{B})",
          flush=True)
    return best


# --- outonly / outdense ------------------------------------------------------
# a real (tiny) input dependency keeps jit/XLA from trying to constant-fold
# the whole zero-arg pallas_call at compile time (a no-input jit hung the
# remote AOT compiler for >25 min)
seed = jnp.ones((1, 8, 128), jnp.float32)
sspec = pl.BlockSpec((1, 8, 128), lambda n, i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM)


def w4(s, out):
    out[0] = (jnp.zeros((tr, tc, 4), jnp.float32) + s[0, 0, 0]).astype(cdtype)


c4 = pl.pallas_call(
    w4, grid=(B, ny, nx), in_specs=[sspec],
    out_specs=pl.BlockSpec((1, tr, tc, 4), lambda n, i, j: (n, i, j, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, ny * tr, nx * tc, 4), cdtype),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT))
timeit("outonly", jax.jit(lambda s: c4(s)), seed)


def wd(s, out):
    out[0] = (jnp.zeros((tr, 4 * tc), jnp.float32) + s[0, 0, 0]).astype(cdtype)


cd = pl.pallas_call(
    wd, grid=(B, ny, nx), in_specs=[sspec],
    out_specs=pl.BlockSpec((1, tr, 4 * tc), lambda n, i, j: (n, i, j),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, ny * tr, nx * 4 * tc), cdtype),
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT))
timeit("outdense", jax.jit(lambda s: cd(s)), seed)

# --- production stages -------------------------------------------------------
timeit("xcol", lambda x: ps._xcol_scale(x, tr, tc), ylow)
timeit("kernel", lambda x: ps._run_stack(x, fast.kp, tr, tc, ny, nx,
                                         fast.spec), xcol)
timeit("tail", pipeline._tail_u8_cmajor_jit, y_s2d, yuv)
timeit("step", lambda x: pipeline.scale2x_batch_u8_fused(x, fast), yuv)


# --- out-layout variants + isolated input fetch (all at B=16) ---------------
def mkout(name, oshape, odtype, body):
    c = pl.pallas_call(
        body, grid=(B, ny, nx), in_specs=[sspec],
        out_specs=pl.BlockSpec((1,) + oshape,
                               (lambda n, i, j: (n, i, j, 0))
                               if len(oshape) == 3 else
                               (lambda n, i, j: (n, i, j)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, ny * oshape[0], nx * oshape[1]) + oshape[2:], odtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT))
    timeit(name, jax.jit(lambda s: c(s)), seed)


def w4f(s, out):
    out[0] = jnp.zeros((tr, tc, 4), jnp.float32) + s[0, 0, 0]


mkout("out4f32", (tr, tc, 4), jnp.float32, w4f)


def w16f(s, out):
    out[0] = jnp.zeros((tr, tc, 16), jnp.float32) + s[0, 0, 0]


mkout("out16f32", (tr, tc, 16), jnp.float32, w16f)


def w16u(s, out):
    out[0] = (jnp.zeros((tr, tc, 16), jnp.float32)
              + s[0, 0, 0]).astype(jnp.int32).astype(jnp.uint8)


mkout("out16u8", (tr, tc, 16), jnp.uint8, w16u)

# isolated input fetch at B=16: xa block only / all four window blocks,
# writing the DENSE out so the out side contributes ~0.36
H16, W16 = (ny + 1) * tr, (nx + 1) * tc
xarr = jnp.asarray(rng.random((B, H16, W16, 16), np.float32)).astype(cdtype)
xa16 = pl.BlockSpec((1, tr, tc, 16), lambda n, i, j: (n, i, j, 0),
                    memory_space=pltpu.VMEM)
cb, rb = tc // 16, tr // 8
xr = pl.BlockSpec((1, tr, 16, 16), lambda n, i, j: (n, i, (j + 1) * cb, 0),
                  memory_space=pltpu.VMEM)
xb_ = pl.BlockSpec((1, 8, tc, 16), lambda n, i, j: (n, (i + 1) * rb, j, 0),
                   memory_space=pltpu.VMEM)
xd_ = pl.BlockSpec((1, 8, 16, 16),
                   lambda n, i, j: (n, (i + 1) * rb, (j + 1) * cb, 0),
                   memory_space=pltpu.VMEM)
odense = pl.BlockSpec((1, tr, 4 * tc), lambda n, i, j: (n, i, j),
                      memory_space=pltpu.VMEM)
oshape = jax.ShapeDtypeStruct((B, ny * tr, nx * 4 * tc), cdtype)


def bin1(xa, out):
    # consume the block via a cheap reduction (no relayout in the body)
    t = jnp.max(xa[0][0:8, 0:8, :].astype(jnp.float32))
    out[0] = (jnp.zeros((tr, 4 * tc), jnp.float32) + t).astype(cdtype)


cin1 = pl.pallas_call(
    bin1, grid=(B, ny, nx), in_specs=[xa16], out_specs=odense,
    out_shape=oshape,
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT))
timeit("in16", jax.jit(lambda x: cin1(x)), xarr)


def bin4(xa, xb, xc, xd, out):
    t = (jnp.max(xa[0][0:8, 0:8, :].astype(jnp.float32))
         + jnp.max(xb[0][0:8, 0:8, :].astype(jnp.float32))
         + jnp.max(xc[0][0:8, 0:8, :].astype(jnp.float32))
         + jnp.max(xd[0][0:8, 0:8, :].astype(jnp.float32)))
    out[0] = (jnp.zeros((tr, 4 * tc), jnp.float32) + t).astype(cdtype)


cin4 = pl.pallas_call(
    bin4, grid=(B, ny, nx), in_specs=[xa16, xr, xb_, xd_], out_specs=odense,
    out_shape=oshape,
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT))
timeit("in16x4", jax.jit(lambda x: cin4(x, x, x, x)), xarr)


# --- outcat: dense (tr, 4*tc) out built by in-kernel lane-extract concat ----
# (the Mosaic relayout cost is THE question: (tr,tc,4) -> 4x(tr,tc) planar)
def bcat(xa, out):
    t = xa[0][:, :, 0:4].astype(jnp.float32) * 0.5
    v = jnp.concatenate([t[:, :, 0], t[:, :, 1], t[:, :, 2], t[:, :, 3]],
                        axis=-1)
    out[0] = v.astype(cdtype)


ccat = pl.pallas_call(
    bcat, grid=(B, ny, nx), in_specs=[xa16], out_specs=odense,
    out_shape=oshape,
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT))
timeit("outcat", jax.jit(lambda x: ccat(x)), xarr)

# --- in9: 9-lane xcol (scale path's real tap count; no zero pad lanes) ------
xarr9 = jnp.asarray(rng.random((B, H16, W16, 9), np.float32)).astype(cdtype)
xa9 = pl.BlockSpec((1, tr, tc, 9), lambda n, i, j: (n, i, j, 0),
                   memory_space=pltpu.VMEM)


def bin9(xa, out):
    t = jnp.max(xa[0][0:8, 0:8, :].astype(jnp.float32))
    out[0] = (jnp.zeros((tr, 4 * tc), jnp.float32) + t).astype(cdtype)


cin9 = pl.pallas_call(
    bin9, grid=(B, ny, nx), in_specs=[xa9], out_specs=odense,
    out_shape=oshape,
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT))
timeit("in9", jax.jit(lambda x: cin9(x)), xarr9)

# --- in9 + real L1 quadrant matmul into a scratch (vreg-level effect) -------
l1w = jnp.asarray(rng.random((9, 128), np.float32)).astype(cdtype)
l1spec = pl.BlockSpec((9, 128), lambda n, i, j: (0, 0),
                      memory_space=pltpu.VMEM)


def bin9mm(xa, w, out, x1):
    x1[...] = jax.lax.dot_general(
        xa[0], w[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(cdtype)
    out[0] = jnp.concatenate(
        [x1[:, :, 0], x1[:, :, 1], x1[:, :, 2], x1[:, :, 3]],
        axis=-1)


cin9mm = pl.pallas_call(
    bin9mm, grid=(B, ny, nx), in_specs=[xa9, l1spec], out_specs=odense,
    out_shape=oshape,
    scratch_shapes=[pltpu.VMEM((tr, tc, 128), cdtype)],
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT))
timeit("in9+l1", jax.jit(lambda x: cin9mm(x, l1w)), xarr9)
