"""Ping-pong accumulator probe: the fused kernel funnels EVERY dot group
through one shared f32 acc scratch, creating write-after-read hazards that
serialize consecutive groups (L3's A=1 can't start until A=0's leaky/cast
read acc; L5 can't start until L4's tail). Two alternating acc buffers
(+10 MB VMEM) break adjacent chains. Modes: prod, pp.
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
spec3, spec4, spec5, spec6 = spec
tr, tc = 64, 128
B, S = 4, 512
ny, nx = S // tr, S // tc
cdtype = jnp.bfloat16
accdt = jnp.float32
rng = np.random.default_rng(0)
ylow = jnp.asarray(rng.random((B, S, S), np.float32)).astype(cdtype)
xcol = ps._xcol_scale(ylow, tr, tc)
def sync(a): return float(jnp.max(a[..., 0:4].astype(jnp.float32)))


def body(xa, xb, xc, xd, l1, b1, w2a, b2a, w2b, b2b, w2c, b2c,
         w5, b5, w6, b6, blk, sel, b7,
         out_ref, xin, x1, x2, x3, x4, x5, zt, acc0, acc1):
    wc = tc + 8
    accs = [acc0, acc1]
    turn = [0]
    def nacc():
        a = accs[turn[0]]
        turn[0] ^= 1
        return a
    xin[0:tr, 0:tc, :] = xa[0]
    xin[0:tr, tc:tc + 16, :] = xb[0][:, 0:16, :]
    xin[tr:tr + 6, 0:tc, :] = xc[0][0:6, :, :]
    xin[tr:tr + 6, tc:tc + 16, :] = xd[0][0:6, 0:16, :]
    x1[:] = ps._leaky(ps._dot3(xin[:], l1[:], accdt)
                      + b1[0].astype(accdt)).astype(cdtype)

    def block4(src, w_ref, b_ref, rows):
        acc = nacc()
        a = acc.at[0:rows, 0:wc, 0:128]
        a[...] = ps._dot3(src[0:rows, 0:wc, :], w_ref[0], accdt)
        a[...] += ps._dot3(src[0:rows, 1:wc + 1, :], w_ref[1], accdt)
        a[...] += ps._dot3(src[1:rows + 1, 0:wc, :], w_ref[2], accdt)
        a[...] += ps._dot3(src[1:rows + 1, 1:wc + 1, :], w_ref[3], accdt)
        return ps._leaky(a[...] + b_ref[0].astype(accdt)).astype(cdtype)

    x2[:, 0:wc, :] = block4(x1, w2a, b2a, tr + 5)

    def block_pair(src, w_ref, b_ref, sp, rows, dst):
        vals = []
        for A, entries in enumerate(sp):
            acc = nacc()
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
    block_pair(x3, w2c, b2c, spec4, tr + 3, x4)

    rows5 = tr + 2
    for p, entries in enumerate(spec5):
        acc = nacc()
        a = acc.at[0:rows5, 0:wc, 0:128]
        for g, (Dy, Dx, lanes, k0, klen) in enumerate(entries):
            part = ps._dot3(ps._gather_k(x4, rows5, wc, Dy, Dx, lanes),
                            w5[p, k0:k0 + klen, :], accdt)
            if g == 0:
                a[...] = part
            else:
                a[...] += part
        x5[:, 0:wc, p * 128:(p + 1) * 128] = ps._leaky(
            a[...] + b5[0, p * 128:(p + 1) * 128].astype(accdt)
        ).astype(cdtype)

    rows = tr + 1
    for p, entries in enumerate(spec6):
        acc = nacc()
        a = acc.at[0:rows, 0:wc, 0:128]
        for g, (Dy, Dx, lanes, k0, klen) in enumerate(entries):
            part = ps._dot3(ps._gather_k(x5, rows, wc, Dy, Dx, lanes),
                            w6[p, k0:k0 + klen, :], accdt)
            if g == 0:
                a[...] = part
            else:
                a[...] += part
        x6p = ps._leaky(a[...] + b6[0, p * 128:(p + 1) * 128].astype(accdt)
                        ).astype(cdtype)
        zt[:, 0:wc, p * 16:(p + 1) * 16] = ps._dot3(
            x6p, blk[p * 128:(p + 1) * 128, p * 16:(p + 1) * 16]
        ).astype(zt.dtype)
    y = None
    for Dy in (0, 1):
        for Dx in (0, 1):
            part = ps._dot3(zt[Dy:Dy + tr, Dx:Dx + tc, :],
                            sel[(Dy * 2 + Dx) * 64:(Dy * 2 + Dx + 1) * 64, :])
            y = part if y is None else y + part
    out_ref[0] = ps._leaky(y + b7[0, 0]).astype(cdtype)


def make_pp():
    def _xblk(di, dj):
        return pl.BlockSpec((1, tr, tc, 16),
                            lambda nn, i, j, di=di, dj=dj:
                            (nn, i + di, j + dj, 0),
                            memory_space=pltpu.VMEM)
    def _full(shape):
        return pl.BlockSpec(shape, lambda n, i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        body,
        grid=(B, ny, nx),
        in_specs=[_xblk(0, 0), _xblk(0, 1), _xblk(1, 0), _xblk(1, 1),
                  _full((16, 128)), _full((1, 128)),
                  _full((4, 128, 128)), _full((1, 128)),
                  _full((2, 384, 128)), _full((1, 256)),
                  _full((2, 768, 128)), _full((1, 256)),
                  _full((4, 576, 128)), _full((1, 512)),
                  _full((4, 1152, 128)), _full((1, 512)),
                  _full((512, 64)), _full((256, 4)),
                  pl.BlockSpec((1, 1), lambda nn, i, j: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, tr, tc, 4),
                               lambda nn, i, j: (nn, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ny * tr, nx * tc, 4), cdtype),
        scratch_shapes=[
            pltpu.VMEM((tr + 6, tc + 16, 16), cdtype),
            pltpu.VMEM((tr + 6, tc + 16, 128), cdtype),
            pltpu.VMEM((tr + 5, tc + 16, 128), cdtype),
            pltpu.VMEM((tr + 4, tc + 16, 256), cdtype),
            pltpu.VMEM((tr + 3, tc + 16, 256), cdtype),
            pltpu.VMEM((tr + 2, tc + 16, 512), cdtype),
            pltpu.VMEM((tr + 1, tc + 16, 64), jnp.float32),
            pltpu.VMEM((tr + 5, tc + 16, 128), accdt),
            pltpu.VMEM((tr + 5, tc + 16, 128), accdt),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT),
    )
    return jax.jit(lambda x: call(
        x, x, x, x, kp["l1"], kp["b1"], kp["w2a"], kp["b2a"], kp["w2b"],
        kp["b2b"], kp["w2c"], kp["b2c"], kp["w5"], kp["b5"], kp["w6"],
        kp["b6"], kp["l7_blk"], kp["l7_sel"], kp["b7"]))


def time_it(label, f, x):
    out = f(x); sync(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(x)
    sync(out)
    dt = (time.perf_counter() - t0) / 20
    print(f"{label:10s}: {dt*1e3:6.2f} ms", flush=True)
    return out


which = sys.argv[1:] or ["prod", "pp", "prod"]
ref = None
for w in which:
    if w == "prod":
        f = jax.jit(lambda x: ps._run_stack(
            x, kp, tr, tc, ny, nx, spec, acc_f32=True))
        ref = time_it("prod", f, xcol)
    else:
        f = make_pp()
        out = time_it("pp", f, xcol)
        if ref is not None:
            print("max |pp - prod| =",
                  np.max(np.abs(np.asarray(out, np.float32)
                                - np.asarray(ref, np.float32))))
