"""Per-layer strip of the FUSED kernel: where do the non-model ms hide?

Modes: upto0 (assembly) .. upto7 (full), prod (production _run_stack),
dimsem (full, with parallel dimension_semantics).
Unit model @5.3e9 unit-px/s, B=4 frames of 512^2 (1.05M low-px):
  L1 .25/px  L2 1  L3 1.5  L4 3  L5 5  L6 9  L7 2   (full-res px, 4.2 MP)
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


def body(upto, xa, xb, xc, xd, l1, b1, w2a, b2a, w2b, b2b, w2c, b2c,
         w5, b5, w6, b6, blk, sel, b7,
         out_ref, xin, x1, x2, x3, x4, x5, zt, acc):
    wc = tc + 8
    pair_direct = upto >= 100
    if upto >= 100:
        upto = upto - 100
    xin[0:tr, 0:tc, :] = xa[0]
    xin[0:tr, tc:tc + 16, :] = xb[0][:, 0:16, :]
    xin[tr:tr + 6, 0:tc, :] = xc[0][0:6, :, :]
    xin[tr:tr + 6, tc:tc + 16, :] = xd[0][0:6, 0:16, :]
    if upto == 0:
        out_ref[0] = jnp.concatenate(
            [xin[0:tr, 0:tc, 0:1]] * 4, axis=-1).astype(cdtype)
        return
    x1[:] = ps._leaky(ps._dot3(xin[:], l1[:], accdt)
                      + b1[0].astype(accdt)).astype(cdtype)
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
            val = ps._leaky(a[...] + b_ref[0, A * 128:(A + 1) * 128]
                            .astype(accdt)).astype(cdtype)
            if pair_direct:
                dst[:, 0:wc, A * 128:(A + 1) * 128] = val
            else:
                vals.append(val)
        if not pair_direct:
            dst[:, 0:wc, :] = jnp.concatenate(vals, axis=-1)

    block_pair(x2, w2b, b2b, spec3, tr + 4, x3)
    if upto == 3:
        out_ref[0] = x3[0:tr, 0:tc, 0:4]
        return
    block_pair(x3, w2c, b2c, spec4, tr + 3, x4)
    if upto == 4:
        out_ref[0] = x4[0:tr, 0:tc, 0:4]
        return
    ps._mid_sparse(x4, w5, b5, spec5, tr + 2, wc, 128, cdtype, x5, acc)
    if upto == 5:
        out_ref[0] = x5[0:tr, 0:tc, 0:4]
        return
    rows = tr + 1
    for p, entries in enumerate(spec6):
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
    if upto == 6:
        out_ref[0] = zt[0:tr, 0:tc, 0:4].astype(cdtype)
        return
    y = None
    for Dy in (0, 1):
        for Dx in (0, 1):
            part = ps._dot3(zt[Dy:Dy + tr, Dx:Dx + tc, :],
                            sel[(Dy * 2 + Dx) * 64:(Dy * 2 + Dx + 1) * 64, :])
            y = part if y is None else y + part
    out_ref[0] = ps._leaky(y + b7[0, 0]).astype(cdtype)


def one_body(xa, out_ref, xin):
    # assembly-only with a SINGLE fetched input block (junk halo): isolates
    # per-cell DMA-count cost vs the 4-block window assembly of upto0
    xin[0:tr, 0:tc, :] = xa[0]
    out_ref[0] = jnp.concatenate(
        [xin[0:tr, 0:tc, 0:1]] * 4, axis=-1).astype(cdtype)


def make_one():
    call = pl.pallas_call(
        one_body,
        grid=(B, ny, nx),
        in_specs=[pl.BlockSpec((1, tr, tc, 16),
                               lambda nn, i, j: (nn, i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tr, tc, 4),
                               lambda nn, i, j: (nn, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, ny * tr, nx * tc, 4), cdtype),
        scratch_shapes=[pltpu.VMEM((tr + 6, tc + 16, 16), cdtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=ps.VMEM_LIMIT),
    )
    return jax.jit(lambda x: call(x))


def make(upto, dimsem=False):
    def _xblk(di, dj):
        return pl.BlockSpec((1, tr, tc, 16),
                            lambda nn, i, j, di=di, dj=dj:
                            (nn, i + di, j + dj, 0),
                            memory_space=pltpu.VMEM)
    def _full(shape):
        return pl.BlockSpec(shape, lambda n, i, j: (0,) * len(shape),
                            memory_space=pltpu.VMEM)
    cp = dict(vmem_limit_bytes=ps.VMEM_LIMIT)
    if dimsem:
        cp["dimension_semantics"] = ("parallel", "parallel", "parallel")
    call = pl.pallas_call(
        functools.partial(body, upto),
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
        ],
        compiler_params=pltpu.CompilerParams(**cp),
    )
    return jax.jit(lambda x: call(
        x, x, x, x, kp["l1"], kp["b1"], kp["w2a"], kp["b2a"], kp["w2b"],
        kp["b2b"], kp["w2c"], kp["b2c"], kp["w5"], kp["b5"], kp["w6"],
        kp["b6"], kp["l7_blk"], kp["l7_sel"], kp["b7"]))


MODEL = {0: 0, 1: .25, 2: 1.25, 3: 2.75, 4: 5.75, 5: 10.75, 6: 19.75,
         7: 21.75}
args = sys.argv[1:] or ["0", "1", "2", "3", "4", "5", "6", "7", "dimsem"]
prev = None
outs = {}
for a in args:
    if a == "oneblk":
        f = make_one(); label = "oneblk"
    elif a == "dimsem":
        f = make(7, dimsem=True); label = "full+dimsem"
    elif a == "prod":
        f = jax.jit(lambda x: ps._run_stack(
            x, kp, tr, tc, ny, nx, spec, acc_f32=True))
        label = "prod"
    else:
        f = make(int(a)); label = f"upto{a}"
    out = f(xcol); sync(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(xcol)
    sync(out)
    dt = (time.perf_counter() - t0) / 20 * 1e3
    outs[a] = np.asarray(out[..., 0:4], np.float32)
    model = MODEL.get(int(a), None) if a.isdigit() else None
    mstr = f" model~{model*4.2e6/5.3e9*1e3:5.2f}" if model is not None else ""
    dstr = f" delta {dt-prev:5.2f}" if prev is not None and a.isdigit() else ""
    print(f"{label:12s}: {dt:6.2f} ms{mstr}{dstr}", flush=True)
    if a.isdigit():
        prev = dt

if "7" in outs and "107" in outs:
    print("max |107 - 7| =", np.max(np.abs(outs["107"] - outs["7"])))
