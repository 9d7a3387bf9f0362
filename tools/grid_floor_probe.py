"""Grid-floor decomposition: what does an (almost) empty kernel cost at
the production grid? (Round-4 closure of the 'L1/input 2 ms' question.)

Measured on-chip (B=16, 512^2, tile (64,128), grid (16,8,4) = 128
cells/4f, ms per 4 frames):

  store-only (0 inputs, constant -> out block)            1.11
  + 1 full (1,64,128,16) bf16 fetch operand (copy)        2.24
  + 4 full fetch operands                                 5.31
  production body truncated to its 4 fetches (upto=0,
  1 full block + 3 narrow stripes)                        2.34
  full production kernel                                 19.77

Reading: the ~2.3 ms front floor of the production kernel is exactly
out-store pipeline (1.1) + primary input stream (1.1) — every kernel at
this grid pays both once; the extra fetch streams (~1.1 ms per full
block when nothing hides them; the minimal 4-operand kernel shows it)
hide under the production body's 17 ms of compute (which is why the
narrow stripes measured only +0.3%). Per-stream effective bandwidth is
~30 GB/s at (1,64,128,16) blocks — the pipeline's issue/sync
granularity, not HBM (819 GB/s). The only lever is bigger blocks per
DMA = bigger tiles = the round-1/2 VMEM wall. Structurally sunk,
empirically: even a store-only kernel pays half the floor.

Follow-up A/Bs (same session): frames-per-block 1/2/4 at constant total
bytes all measure 2.21 ms/4f (the cost is per BYTE, not per grid
iteration — batch-folding blocks buys nothing); fetch + 1-lane touch
with no bulk copy measures 2.23 (the cost is the fetch stream itself,
not the body's copy). 32 MB/4f in ~1.1 ms = ~29 GB/s: the 16-lane
(32-byte minor dim) im2col layout transfers at ~1/8 lane utilization —
the SAME 8x factor the kernel deliberately trades against 8x HBM
traffic for a 128-lane-aligned manual DMA (see _xcol_scale notes), and
the same vreg-side factor that killed the xin window-assembly scratch.
Every corner of this triangle (16-lane DMA, 128-lane DMA, in-kernel
relayout) is now measured; the floor stands.

Usage: python tools/grid_floor_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main() -> int:
    from waifu2x_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S, tr, tc = 16, 512, 64, 128
    ny, nx = S // tr, S // tc
    rng = np.random.default_rng(0)
    xcol = jnp.asarray(
        rng.random((B, (ny + 1) * tr, (nx + 1) * tc, 16), np.float32)
    ).astype(jnp.bfloat16)

    def blk(di, dj):
        return pl.BlockSpec((1, tr, tc, 16),
                            lambda n, i, j, di=di, dj=dj:
                            (n, i + di, j + dj, 0),
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, tr, tc, 4), lambda n, i, j: (n, i, j, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, ny * tr, nx * tc, 4), jnp.bfloat16)

    def body0(out):
        out[0] = jnp.full((tr, tc, 4), 1.0, out.dtype)

    def body1(xa, out):
        out[0] = xa[0][:, :, 0:4]

    def body4(xa, xb, xc, xd, out):
        val = xa[0][:, :, 0:4].astype(jnp.float32)
        s = jnp.float32(0)
        for ref in (xb, xc, xd):
            s = s + jnp.sum(ref[0][:, :, 0:1].astype(jnp.float32))
        out[0] = (val + s).astype(out.dtype)

    variants = [
        ("store-only (0 inputs)", body0, 0),
        ("1 full fetch operand", body1, 1),
        ("4 full fetch operands", body4, 4),
    ]

    def sync(a):
        return int(np.asarray(jnp.max(jnp.ravel(a)[:1]
                                      .astype(jnp.float32))))

    for name, body, nops in variants:
        f = pl.pallas_call(
            body, grid=(B, ny, nx),
            in_specs=[blk(0, 0), blk(0, 1), blk(1, 0), blk(1, 1)][:nops],
            out_specs=out_spec, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024))
        args = (xcol,) * nops
        sync(f(*args))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                o = f(*args)
            sync(o)
            dt = (time.perf_counter() - t0) / 20 * 1e3
            best = dt if best is None else min(best, dt)
        print(f"{name:28s}: {best * 4 / B:5.2f} ms/4f", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
