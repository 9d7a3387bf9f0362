"""Split the L1-4 residual (docs/PERF.md open item a).

Stage timing (tools/fused_strip_probe.py upto-N, 2026-08-19, 4x512^2,
(64,128) tiles): upto4 = 10.31 ms vs 4.56 model, while L5/L6/L7 deltas sit
within 0.6 ms of model — the ENTIRE ~5.7 ms/4f unattributed residual is
front-loaded in layers 1-4. This probe truncates the production-shaped
kernel earlier to attribute it:

  xonly  read xa..xd, reduce to the out tile (input DMA pipeline alone)
  upto1  + L1 quadrant matmuls into x1
  upto2  + L2 block4
  upto3  + L3 block_pair
  upto4  + L4 block_pair  (matches fused_strip_probe's upto4)

Each mode writes a [tr, tc, 4] slice of its last activation so nothing is
dead-code-eliminated. Deltas between consecutive modes = per-layer cost.

Usage: python tools/l14_probe.py [xonly upto1 upto2 upto3 upto4]
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
from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
from waifu2x_tpu.ops import pallas_stack as ps

params = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
kp, spec = ps.prep_params(params, scale_input=True, dtype=jnp.bfloat16)
spec3, spec4, _, _ = spec
tr, tc = 64, 128
B, S = 4, 512
ny, nx = S // tr, S // tc
cdtype = jnp.bfloat16
accdt = jnp.float32
rng = np.random.default_rng(0)
ylow = jnp.asarray(rng.random((B, S, S), np.float32)).astype(cdtype)
xcol = ps._xcol_scale(ylow, tr, tc)


def sync(a):
    return float(jnp.max(a[..., 0:4].astype(jnp.float32)))


def body(upto, xa, xb, xc, xd, l1, b1, w2a, b2a, w2b, b2b, w2c, b2c,
         out_ref, bufa, bufb, acc):
    wc = tc + 8
    x1 = bufa.at[:, :, 0:128]
    x2 = bufb.at[0:tr + 5, :, 0:128]
    x3 = bufa.at[0:tr + 4, :, 0:256]
    x4 = bufb.at[0:tr + 3, :, 0:256]
    if upto == 0:
        # consume every input block without compute: one f32 add per block
        t = (xa[0][0:tr, 0:tc, 0:4].astype(jnp.float32)
             + xb[0][0:tr, 0:4, 0:4].astype(jnp.float32)[:, 0:1]
             + xc[0][0:6, 0:tc, 0:4].astype(jnp.float32)[0:1]
             + xd[0][0:6, 0:4, 0:4].astype(jnp.float32)[0:1, 0:1])
        out_ref[0] = t.astype(cdtype)
        return
    b1v = b1[0].astype(accdt)

    def l1q(q):
        return ps._leaky(ps._dot3(q, l1[:], accdt) + b1v).astype(cdtype)

    x1[0:tr, 0:tc, :] = l1q(xa[0])
    x1[0:tr, tc:tc + 16, :] = l1q(xb[0][:, 0:16, :])
    x1[tr:tr + 6, 0:tc, :] = l1q(xc[0][0:6, :, :])
    x1[tr:tr + 6, tc:tc + 16, :] = l1q(xd[0][0:6, 0:16, :])
    if upto == 1:
        out_ref[0] = x1[0:tr, 0:tc, 0:4]
        return

    def block4(src, w_ref, b_ref, rows):
        a = acc.at[0:rows, 0:wc, 0:128]
        a[...] = ps._dot3(src[0:rows, 0:wc, :], w_ref[0], accdt)
        a[...] += ps._dot3(src[0:rows, 1:wc + 1, :], w_ref[1], accdt)
        a[...] += ps._dot3(src[1:rows + 1, 0:wc, :], w_ref[2], accdt)
        a[...] += ps._dot3(src[1:rows + 1, 1:wc + 1, :], w_ref[3], accdt)
        return ps._leaky(a[...] + b_ref[0].astype(accdt)).astype(cdtype)

    x2[:, 0:wc, :] = block4(x1, w2a, b2a, tr + 5)
    if upto == 2:
        out_ref[0] = x2[0:tr, 0:tc, 0:4]
        return

    def block_pair(src, w_ref, b_ref, sp, rows, dst):
        vals = []
        for A, entries in enumerate(sp):
            a = acc.at[0:rows, 0:wc, 0:128]
            for g, (Dy, Dx, lo, hi, k0, klen) in enumerate(entries):
                part = ps._dot3(src[Dy:Dy + rows, Dx:Dx + wc, lo:hi],
                                w_ref[A, k0:k0 + klen, :], accdt)
                if g == 0:
                    a[...] = part
                else:
                    a[...] += part
            vals.append(ps._leaky(a[...] + b_ref[0, A * 128:(A + 1) * 128]
                                  .astype(accdt)).astype(cdtype))
        dst[:, 0:wc, :] = jnp.concatenate(vals, axis=-1)

    block_pair(x2, w2b, b2b, spec3, tr + 4, x3)
    if upto == 3:
        out_ref[0] = x3[0:tr, 0:tc, 0:4]
        return
    block_pair(x3, w2c, b2c, spec4, tr + 3, x4)
    out_ref[0] = x4[0:tr, 0:tc, 0:4]


def make(upto):
    def _xblk(di, dj):
        return pl.BlockSpec((1, tr, tc, 16),
                            lambda nn, i, j, di=di, dj=dj:
                            (nn, i + di, j + dj, 0),
                            memory_space=pltpu.VMEM)

    def _xblk_right():
        return pl.BlockSpec((1, tr, 16, 16),
                            lambda nn, i, j: (nn, i, (j + 1) * (tc // 16), 0),
                            memory_space=pltpu.VMEM)

    def _xblk_below():
        return pl.BlockSpec((1, 8, tc, 16),
                            lambda nn, i, j: (nn, (i + 1) * (tr // 8), j, 0),
                            memory_space=pltpu.VMEM)

    def _xblk_diag():
        return pl.BlockSpec((1, 8, 16, 16),
                            lambda nn, i, j: (nn, (i + 1) * (tr // 8),
                                              (j + 1) * (tc // 16), 0),
                            memory_space=pltpu.VMEM)

    def _full(shape):
        return pl.BlockSpec(shape, lambda n, i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        functools.partial(body, upto),
        grid=(B, ny, nx),
        in_specs=[_xblk(0, 0), _xblk_right(), _xblk_below(), _xblk_diag(),
                  _full((16, 128)), _full((1, 128)),
                  _full((4, 128, 128)), _full((1, 128)),
                  _full((2, 384, 128)), _full((1, 256)),
                  _full((2, 768, 128)), _full((1, 256))],
        out_specs=pl.BlockSpec((1, tr, tc, 4),
                               lambda nn, i, j: (nn, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ny * tr, nx * tc, 4), cdtype),
        scratch_shapes=[
            pltpu.VMEM((tr + 6, tc + 16, 512), cdtype),   # bufa
            pltpu.VMEM((tr + 5, tc + 16, 256), cdtype),   # bufb
            pltpu.VMEM((tr + 5, tc + 16, 128), accdt),    # acc
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=ps.VMEM_LIMIT),
    )
    return jax.jit(lambda x: call(
        x, x, x, x, kp["l1"], kp["b1"], kp["w2a"], kp["b2a"], kp["w2b"],
        kp["b2b"], kp["w2c"], kp["b2c"]))


MODES = {"xonly": 0, "upto1": 1, "upto2": 2, "upto3": 3, "upto4": 4}
args = sys.argv[1:] or ["xonly", "upto1", "upto2", "upto3", "upto4"]
for a in args:
    f = make(MODES[a])
    out = f(xcol)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(xcol)
    sync(out)
    dt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{a:8s}: {dt:6.2f} ms per {B}x{S}^2", flush=True)
