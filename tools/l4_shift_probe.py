"""L4 mechanism probe: discriminate WHY layer 4 of K1 runs at ~66% of its
MXU model where L3 (same structure, half the work) runs at ~100%.

Variants (all share the K1-through-L3 prefix so deltas isolate L4):
  base   : L3 only (store x3 slice to out)           -> baseline
  l4     : current production L4 (pair packing)      -> known slow
  zshift : L4 with ALL operand shifts forced to 0    (numerics WRONG;
           if fast => the Dy/Dx operand slicing / relayout is the cost)
  zdx    : L4 with only Dx (sublane/column) shifts 0 (numerics WRONG;
           isolates sublane-shift relayout from row-shift)
  preshift: L4 reading Dx=1 operands from an explicitly pre-shifted copy
           x3s (one VPU copy; numerics CORRECT)
  scratch: L4 computing into a VMEM scratch, out_ref written with junk
           from x3 (isolates the pipelined HBM store path)
"""
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
def sync(a): return float(jnp.max(a[..., 0:4].astype(jnp.float32)))


def body(mode, xa, xb, xc, xd, l1, b1, w2a, b2a, w2b, b2b, w2c, b2c,
         out_ref, xin, x1, x2, x3, acc, x3s, x4s):
    wc = tc + 8
    xin[0:tr, 0:tc, :] = xa[0]
    xin[0:tr, tc:tc + 16, :] = xb[0][:, 0:16, :]
    xin[tr:tr + 6, 0:tc, :] = xc[0][0:6, :, :]
    xin[tr:tr + 6, tc:tc + 16, :] = xd[0][0:6, 0:16, :]
    x1[:] = ps._leaky(ps._dot3(xin[:], l1[:], accdt)
                      + b1[0].astype(accdt)).astype(cdtype)

    def block4(src, w_ref, b_ref, rows):
        a = acc.at[0:rows, 0:wc, 0:128]
        a[...] = ps._dot3(src[0:rows, 0:wc, :], w_ref[0], accdt)
        a[...] += ps._dot3(src[0:rows, 1:wc + 1, :], w_ref[1], accdt)
        a[...] += ps._dot3(src[1:rows + 1, 0:wc, :], w_ref[2], accdt)
        a[...] += ps._dot3(src[1:rows + 1, 1:wc + 1, :], w_ref[3], accdt)
        return ps._leaky(a[...] + b_ref[0].astype(accdt)).astype(cdtype)

    x2[:, 0:wc, :] = block4(x1, w2a, b2a, tr + 5)

    def block_pair(src, w_ref, b_ref, sp, rows, dst, is_out, fdy, fdx,
                   src_shift=None):
        vals = []
        for A, entries in enumerate(sp):
            a = acc.at[0:rows, 0:wc, 0:128]
            for g, (Dy, Dx, lo, hi, k0, klen) in enumerate(entries):
                if fdy: Dy = 0
                if fdx: Dx = 0
                s = src
                if src_shift is not None and Dx == 1:
                    s, Dx = src_shift, 0
                part = ps._dot3(s[Dy:Dy + rows, Dx:Dx + wc, lo:hi],
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

    block_pair(x2, w2b, b2b, spec3, tr + 4, x3, False, False, False)
    if mode == "base":
        out_ref[0, :, 0:wc, :] = jnp.concatenate(
            [x3[0:tr + 3, 0:wc, :], x3[0:tr + 3, 0:wc, :]], axis=-1)[..., :256]
        return
    if mode == "l4":
        block_pair(x3, w2c, b2c, spec4, tr + 3, out_ref, True, False, False)
        return
    if mode == "zshift":
        block_pair(x3, w2c, b2c, spec4, tr + 3, out_ref, True, True, True)
        return
    if mode == "zdx":
        block_pair(x3, w2c, b2c, spec4, tr + 3, out_ref, True, False, True)
        return
    if mode == "preshift":
        x3s[:, 0:wc + 1, :] = x3[0:tr + 4, 1:wc + 2, :]
        block_pair(x3, w2c, b2c, spec4, tr + 3, out_ref, True, False, False,
                   src_shift=x3s)
        return
    if mode == "stage":
        block_pair(x3, w2c, b2c, spec4, tr + 3, x4s, False, False, False)
        out_ref[0] = x4s[:]
        return
    if mode == "stagep":
        block_pair(x3, w2c, b2c, spec4, tr + 3, x4s, False, False, False)
        out_ref[0, :, 0:wc, :] = x4s[:, 0:wc, :]
        return
    if mode == "scratch":
        block_pair(x3, w2c, b2c, spec4, tr + 3, x4s, False, False, False)
        out_ref[0, :, 0:wc, :] = jnp.concatenate(
            [x3[0:tr + 3, 0:wc, :], x3[0:tr + 3, 0:wc, :]], axis=-1)[..., :256]
        return
    raise ValueError(mode)


def make(mode):
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
        functools.partial(body, mode),
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
            pltpu.VMEM((tr + 4, tc + 16, 256), cdtype),   # x3s (shifted)
            pltpu.VMEM((tr + 3, tc + 16, 256), cdtype),   # x4 scratch
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT),
    )
    return jax.jit(lambda x: call(x, x, x, x, kp["l1"], kp["b1"], kp["w2a"],
                                  kp["b2a"], kp["w2b"], kp["b2b"], kp["w2c"],
                                  kp["b2c"]))


modes = sys.argv[1:] or ["base", "l4", "zshift", "zdx", "preshift", "scratch"]
for mode in modes:
    f = make(mode)
    out = f(xcol); sync(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(xcol)
    sync(out)
    dt = (time.perf_counter() - t0) / 20
    print(f"{mode:10s}: {dt*1e3:6.2f} ms", flush=True)

# appended variants: stage (L4 -> scratch -> full-block copy to out_ref)
