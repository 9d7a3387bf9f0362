"""Is the fused kernel VMEM-bandwidth bound rather than MXU bound?

Hypothesis (new mechanism for the 'sticky 23 ms' / pair-layer 55-60%%
efficiency): every matmul group does acc[...] += dot(...), which is a
full f32 read+write of a ~4.6 MB accumulator through VMEM load/store
ports, plus the operand load — the kernel may saturate VMEM bandwidth,
so removing MXU passes doesn't move wall clock.

Probe: a standalone kernel running P back-to-back [M,128]x[128,128]
matmuls over a grid, in four accumulation styles:
  sep    - each dot stores to its own region (no read-modify-write)
  rmw    - acc[...] += dot      (the production pattern)
  value  - v = v + dot, one final store (partials all live)
  chainK - one dot with K = P*128 (operand concat; the 'merge taps into
           K' direction) — same MACs, 1/P the acc traffic
Per-pass time vs the 5.3e9 unit-px/s MXU peak tells which wall we're on.
Usage: python tools/vmem_bound_probe.py [P=8]
"""
import sys
import time
import functools

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waifu2x_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

P = int(sys.argv[1]) if len(sys.argv) > 1 else 8
R, C = 64, 136          # rows x cols per cell (production-like M = R*C)
G = 32                  # grid cells (1 frame of 512^2 at (64,128))
cdtype = jnp.bfloat16


def _dot(x, w):
    return jax.lax.dot_general(x, w, (((2,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def body(mode, x_ref, w_ref, o_ref, acc):
    if mode == "chainK":
        o_ref[0] = _dot(
            jnp.concatenate([x_ref[0]] * P, axis=-1).astype(cdtype),
            w_ref[:].reshape(P * 128, 128)).astype(cdtype)
        return
    if mode == "value":
        v = _dot(x_ref[0], w_ref[0])
        for p in range(1, P):
            v = v + _dot(x_ref[0], w_ref[p])
        o_ref[0] = v.astype(cdtype)
        return
    if mode == "rmw":
        a = acc.at[0:R, 0:C, :]
        a[...] = _dot(x_ref[0], w_ref[0])
        for p in range(1, P):
            a[...] += _dot(x_ref[0], w_ref[p])
        o_ref[0] = a[...].astype(cdtype)
        return
    # sep: P independent dots, each stored (no RMW chain)
    for p in range(P):
        acc[0:R, 0:C, :] = _dot(x_ref[0], w_ref[p])
    o_ref[0] = acc[0:R, 0:C, :].astype(cdtype)


# generate ON DEVICE: host->TPU uploads ride the relay tunnel and a
# few-hundred-MB array takes tens of minutes
x = (jax.random.normal(jax.random.PRNGKey(0), (G, R, C, 128), jnp.float32)
     * 0.1).astype(cdtype)
w = (jax.random.normal(jax.random.PRNGKey(1), (P, 128, 128), jnp.float32)
     * 0.1).astype(cdtype)
x.block_until_ready()


def make(mode):
    call = pl.pallas_call(
        functools.partial(body, mode),
        grid=(G,),
        in_specs=[pl.BlockSpec((1, R, C, 128), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((P, 128, 128), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, C, 128), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, R, C, 128), cdtype),
        scratch_shapes=[pltpu.VMEM((R, C, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return jax.jit(lambda a, b: call(a, b))


# MXU model: G cells x P passes x (R*C/ (128*8?)) — report per-pass µs and
# the implied unit-px/s for comparison against the measured 5.3e9 peak.
for mode in ("sep", "rmw", "value", "chainK"):
    try:
        f = make(mode)
        out = f(x, w)
        float(jnp.max(out[..., 0:8].astype(jnp.float32)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                out = f(x, w)
            float(jnp.max(out[..., 0:8].astype(jnp.float32)))
            best = min(best, (time.perf_counter() - t0) / 8)
        unit_px = G * P * R * C          # 128x128-MAC pass-rows
        rate = unit_px / best
        print(f"{mode:7s}: {best * 1e3:7.2f} ms  "
              f"{rate / 1e9:5.2f}e9 unit-px/s "
              f"({rate / 5.3e9 * 100:4.0f}% of MXU peak)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{mode:7s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
