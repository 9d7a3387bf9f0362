"""K1 forensics: time K1 truncated after each layer (TPU-only tool)."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
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
def sync(a): return float(jnp.max(a.astype(jnp.float32)))

def body(upto, xa, xb, xc, xd, l1, b1, w2a, b2a, w2b, b2b, w2c, b2c,
         out_ref, xin, x1, x2, x3, acc, x3a, x3b):
    wc = tc + 8
    xin[0:tr, 0:tc, :] = xa[0]
    xin[0:tr, tc:tc + 16, :] = xb[0][:, 0:16, :]
    xin[tr:tr + 6, 0:tc, :] = xc[0][0:6, :, :]
    xin[tr:tr + 6, tc:tc + 16, :] = xd[0][0:6, 0:16, :]
    if upto == 0:   # assembly only
        out_ref[0, :, 0:wc, 0:16] = xin[0:tr + 3, 0:wc, :]
        return
    x1[:] = ps._leaky(ps._dot3(xin[:], l1[:], accdt)
                      + b1[0].astype(accdt)).astype(cdtype)
    if upto == 1:
        out_ref[0, :, 0:wc, 0:128] = x1[0:tr + 3, 0:wc, :]
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
        out_ref[0, :, 0:wc, 0:128] = x2[0:tr + 3, 0:wc, :]
        return
    def block_pair(src, w_ref, b_ref, sp, rows, dst, is_out):
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
        val = jnp.concatenate(vals, axis=-1)
        if is_out:
            dst[0, :, 0:wc, :] = val
        else:
            dst[:, 0:wc, :] = val
    block_pair(x2, w2b, b2b, spec3, tr + 4, x3, False)
    if upto == 3:
        out_ref[0, :, 0:wc, 0:256] = x3[0:tr + 3, 0:wc, :]
        return
    if upto == 4:
        block_pair(x3, w2c, b2c, spec4, tr + 3, out_ref, True)
        return
    if upto == 6:
        # split x3 into two 128-lane buffers (a-parity) and run L4 with
        # full-lane reads / same-shift concats only
        x3a[:, 0:wc, :] = x3[0:tr + 4, 0:wc, 0:128]
        x3b[:, 0:wc, :] = x3[0:tr + 4, 0:wc, 128:256]
        rows = tr + 3
        vals = []
        for A, entries in enumerate(spec4):
            a = acc.at[0:rows, 0:wc, 0:128]
            first = True
            for (Dy, Dx, lo, hi, k0, klen) in entries:
                if klen == 256:
                    op = jnp.concatenate(
                        [x3a[Dy:Dy + rows, Dx:Dx + wc, :],
                         x3b[Dy:Dy + rows, Dx:Dx + wc, :]], axis=-1)
                elif lo == 0:
                    op = x3a[Dy:Dy + rows, Dx:Dx + wc, :]
                else:
                    op = x3b[Dy:Dy + rows, Dx:Dx + wc, :]
                part = ps._dot3(op, w2c[A, k0:k0 + klen, :], accdt)
                if first:
                    a[...] = part
                    first = False
                else:
                    a[...] += part
            vals.append(ps._leaky(a[...] + b2c[0, A * 128:(A + 1) * 128]
                                  .astype(accdt)).astype(cdtype))
        out_ref[0, :, 0:wc, :] = jnp.concatenate(vals, axis=-1)
        return
    # upto == 5: L4 with every K>128 dot split into K=128 dots
    rows = tr + 3
    vals = []
    for A, entries in enumerate(spec4):
        a = acc.at[0:rows, 0:wc, 0:128]
        first = True
        for (Dy, Dx, lo, hi, k0, klen) in entries:
            for ofs in range(0, klen, 128):
                kk = min(128, klen - ofs)
                part = ps._dot3(x3[Dy:Dy + rows, Dx:Dx + wc,
                                   lo + ofs:lo + ofs + kk],
                                w2c[A, k0 + ofs:k0 + ofs + kk, :], accdt)
                if first:
                    a[...] = part
                    first = False
                else:
                    a[...] += part
        vals.append(ps._leaky(a[...] + b2c[0, A * 128:(A + 1) * 128]
                              .astype(accdt)).astype(cdtype))
    out_ref[0, :, 0:wc, :] = jnp.concatenate(vals, axis=-1)

def make(upto):
    hb, wb = tr + 3, tc + 16
    def _xblk(di, dj):
        return pl.BlockSpec((1, tr, tc, 16),
                            lambda nn, i, j, di=di, dj=dj:
                            (nn, i + di, j + dj, 0),
                            memory_space=pltpu.VMEM)
    def _full(shape):
        return pl.BlockSpec(shape, lambda n, i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        functools.partial(body, upto),
        grid=(B, ny, nx),
        in_specs=[_xblk(0, 0), _xblk(0, 1), _xblk(1, 0), _xblk(1, 1),
                  _full((16, 128)), _full((1, 128)),
                  _full((4, 128, 128)), _full((1, 128)),
                  _full((2, 384, 128)), _full((1, 256)),
                  _full((2, 768, 128)), _full((1, 256))],
        out_specs=pl.BlockSpec((1, hb, wb, 256),
                               lambda nn, i, j: (nn, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ny * hb, nx * wb, 256), cdtype),
        scratch_shapes=[
            pltpu.VMEM((tr + 6, tc + 16, 16), cdtype),
            pltpu.VMEM((tr + 6, tc + 16, 128), cdtype),
            pltpu.VMEM((tr + 5, tc + 16, 128), cdtype),
            pltpu.VMEM((tr + 4, tc + 16, 256), cdtype),
            pltpu.VMEM((tr + 5, tc + 16, 128), accdt),
            pltpu.VMEM((tr + 4, tc + 16, 128), cdtype),
            pltpu.VMEM((tr + 4, tc + 16, 128), cdtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT),
    )
    f = jax.jit(lambda x: call(x, x, x, x, kp["l1"], kp["b1"], kp["w2a"],
                               kp["b2a"], kp["w2b"], kp["b2b"], kp["w2c"],
                               kp["b2c"]))
    return f

for upto, label in [(4, "+L4 (full K1)"), (6, "+L4 a-split")]:
    f = make(upto)
    out = f(xcol); sync(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(xcol)
    sync(out)
    dt = (time.perf_counter() - t0) / 20
    print(f"{label:15s}: {dt*1e3:6.2f} ms", flush=True)
