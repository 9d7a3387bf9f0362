"""Is the unattributed ~4 ms/4f residual (docs/PERF.md open item a) the
sublane-relayout cost of column-shifted (Dx=1) matmul operands?

Every layer reads half its operands at a +1 column offset — a sublane
(second-minor) offset that Mosaic cannot feed to the MXU directly, so each
such read plausibly pays a relayout copy of its volume. This probe times
the production-shaped kernel against a timing-only twin whose Dx offsets
are all forced to 0 (WRONG numerics, identical op/pass structure): the
delta is the total column-shift cost. A row-shift twin (Dy->0) isolates
the major-dim (free) control.

Usage: python tools/shift_cost_probe.py [base noshiftx noshifty]
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
spec3, spec4, spec5, spec6 = spec
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


def body(fx, fy, xa, xb, xc, xd, l1, b1, w2a, b2a, w2b, b2b, w2c, b2c,
         w5, b5, w6, b6, blk2, b7, out_ref, bufa, bufb, zt, acc):
    # production structure: l1_direct + alias scratch + L7 fold
    wc = tc + 8
    x1 = bufa.at[:, :, 0:128]
    x2 = bufb.at[0:tr + 5, :, 0:128]
    x3 = bufa.at[0:tr + 4, :, 0:256]
    x4 = bufb.at[0:tr + 3, :, 0:256]
    x5 = bufa.at[0:tr + 2, :, 0:512]
    b1v = b1[0].astype(accdt)

    def l1q(q):
        return ps._leaky(ps._dot3(q, l1[:], accdt) + b1v).astype(cdtype)

    x1[0:tr, 0:tc, :] = l1q(xa[0])
    x1[0:tr, tc:tc + 16, :] = l1q(xb[0][:, 0:16, :])
    x1[tr:tr + 6, 0:tc, :] = l1q(xc[0][0:6, :, :])
    x1[tr:tr + 6, tc:tc + 16, :] = l1q(xd[0][0:6, 0:16, :])

    def block4(src, w_ref, b_ref, rows):
        a = acc.at[0:rows, 0:wc, 0:128]
        a[...] = ps._dot3(src[0:rows, 0:wc, :], w_ref[0], accdt)
        a[...] += ps._dot3(src[0:rows, fx:wc + fx, :], w_ref[1], accdt)
        a[...] += ps._dot3(src[fy:rows + fy, 0:wc, :], w_ref[2], accdt)
        a[...] += ps._dot3(src[fy:rows + fy, fx:wc + fx, :], w_ref[3], accdt)
        return ps._leaky(a[...] + b_ref[0].astype(accdt)).astype(cdtype)

    x2[:, 0:wc, :] = block4(x1, w2a, b2a, tr + 5)

    def block_pair(src, w_ref, b_ref, sp, rows, dst):
        vals = []
        for A, entries in enumerate(sp):
            a = acc.at[0:rows, 0:wc, 0:128]
            for g, (Dy, Dx, lo, hi, k0, klen) in enumerate(entries):
                dy, dx = Dy * fy, Dx * fx
                part = ps._dot3(src[dy:dy + rows, dx:dx + wc, lo:hi],
                                w_ref[A, k0:k0 + klen, :], accdt)
                if g == 0:
                    a[...] = part
                else:
                    a[...] += part
            vals.append(ps._leaky(a[...] + b_ref[0, A * 128:(A + 1) * 128]
                                  .astype(accdt)).astype(cdtype))
        dst[:, 0:wc, :] = jnp.concatenate(vals, axis=-1)

    block_pair(x2, w2b, b2b, spec3, tr + 4, x3)
    block_pair(x3, w2c, b2c, spec4, tr + 3, x4)

    def gather(src, rows, Dy, Dx, lane_slices):
        dy, dx = Dy * fy, Dx * fx
        parts = [src[dy:dy + rows, dx:dx + wc, lo:hi]
                 for lo, hi in lane_slices]
        return parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=-1)

    def mid(src, w_ref, b_ref, sp, rows, dst):
        for p, entries in enumerate(sp):
            a = acc.at[0:rows, 0:wc, 0:128]
            for g, (Dy, Dx, lanes, k0, klen) in enumerate(entries):
                part = ps._dot3(gather(src, rows, Dy, Dx, lanes),
                                w_ref[p, k0:k0 + klen, :], accdt)
                if g == 0:
                    a[...] = part
                else:
                    a[...] += part
            dst[:, 0:wc, p * 128:(p + 1) * 128] = ps._leaky(
                a[...] + b_ref[0, p * 128:(p + 1) * 128].astype(accdt)
            ).astype(cdtype)

    mid(x4, w5, b5, spec5, tr + 2, x5)
    rows = tr + 1
    for p, entries in enumerate(spec6):
        a = acc.at[0:rows, 0:wc, 0:128]
        for g, (Dy, Dx, lanes, k0, klen) in enumerate(entries):
            part = ps._dot3(gather(x5, rows, Dy, Dx, lanes),
                            w6[p, k0:k0 + klen, :], accdt)
            if g == 0:
                a[...] = part
            else:
                a[...] += part
        x6p = ps._leaky(a[...] + b6[0, p * 128:(p + 1) * 128].astype(accdt)
                        ).astype(cdtype)
        part = ps._dot3(x6p, blk2[p * 128:(p + 1) * 128, :])
        if p == 0:
            zt[:, 0:wc, :] = part.astype(zt.dtype)
        else:
            zt[:, 0:wc, :] += part.astype(zt.dtype)
    y = None
    for Dy in (0, 1):
        for Dx in (0, 1):
            s = Dy * 2 + Dx
            part = zt[Dy * fy:Dy * fy + tr, Dx * fx:Dx * fx + tc,
                      s * 4:s * 4 + 4]
            y = part if y is None else y + part
    out_ref[0] = ps._leaky(y + b7[0, 0]).astype(cdtype)


def make(fx, fy):
    def _xblk(di, dj):
        return pl.BlockSpec((1, tr, tc, 16),
                            lambda nn, i, j, di=di, dj=dj:
                            (nn, i + di, j + dj, 0),
                            memory_space=pltpu.VMEM)

    def _full(shape):
        return pl.BlockSpec(shape, lambda n, i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        functools.partial(body, fx, fy),
        grid=(B, ny, nx),
        in_specs=[_xblk(0, 0), _xblk(0, 1), _xblk(1, 0), _xblk(1, 1),
                  _full((16, 128)), _full((1, 128)),
                  _full((4, 128, 128)), _full((1, 128)),
                  _full((2, 384, 128)), _full((1, 256)),
                  _full((2, 768, 128)), _full((1, 256)),
                  _full((4, 576, 128)), _full((1, 512)),
                  _full((4, 1152, 128)), _full((1, 512)),
                  _full((512, 16)),
                  pl.BlockSpec((1, 1), lambda nn, i, j: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, tr, tc, 4),
                               lambda nn, i, j: (nn, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ny * tr, nx * tc, 4), cdtype),
        scratch_shapes=[
            pltpu.VMEM((tr + 6, tc + 16, 512), cdtype),   # bufa
            pltpu.VMEM((tr + 5, tc + 16, 256), cdtype),   # bufb
            pltpu.VMEM((tr + 1, tc + 16, 16), jnp.float32),
            pltpu.VMEM((tr + 5, tc + 16, 128), accdt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=ps.VMEM_LIMIT),
    )
    return jax.jit(lambda x: call(
        x, x, x, x, kp["l1"], kp["b1"], kp["w2a"], kp["b2a"], kp["w2b"],
        kp["b2b"], kp["w2c"], kp["b2c"], kp["w5"], kp["b5"], kp["w6"],
        kp["b6"], kp["l7_blk2"], kp["b7"]))


MODES = {"base": (1, 1), "noshiftx": (0, 1), "noshifty": (1, 0),
         "noshift": (0, 0)}
args = sys.argv[1:] or ["base", "noshiftx", "noshifty"]
for a in args:
    fx, fy = MODES[a]
    f = make(fx, fy)
    out = f(xcol)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(xcol)
    sync(out)
    dt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{a:10s}: {dt:6.2f} ms per {B}x{S}^2", flush=True)
