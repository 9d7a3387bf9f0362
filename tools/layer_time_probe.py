"""In-situ per-layer timing of the PRODUCTION fused kernel at B=16.

Supersedes tools/l14_probe.py and tools/fused_strip_probe.py for layer
attribution: those rebuilt truncated kernel bodies at B=4, where every
number sits on the ~1.7 ms relay dispatch floor and the scratch/VMEM
pressure differs from production. This probe runs `_run_stack` itself with
the forensic `upto` arg (pallas_stack._stack_body): identical specs,
scratches, grid and VMEM limit — only the body returns early after layer k,
storing a 4-lane slice of that layer's activation so nothing is DCE'd.

Deltas between consecutive k = in-situ per-layer cost. Compare against the
unit-pass model (rows x K-subtiles x N-subtiles at the measured 174 TFLOP/s
bf16 peak = 5.31e9 MXU rows/s):

  layer   rows/cell                 units/cell   model ms/4f (128 cells)
  L1      10080 (4 quadrants, K16)       10080   0.24
  L2      9384 x 4 taps                  37536   0.90
  L3      9248 x 2A x 3 Ksub             55488   1.34
  L4      9112 x 2A x 6 Ksub            109344   2.64
  L5      8976 x 5 passes                44880   1.08
  L6      8840 x 36 passes              318240   7.67
  L7      8840 x 4 passes (N=16)         35360   0.85
  total                                 610928   14.72

Usage: python tools/layer_time_probe.py [1 2 3 4 5 6 full]
(first compile of each mode is ~2-3 min through the remote relay;
measured results are recorded in docs/PERF.md)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from waifu2x_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
from waifu2x_tpu.ops import pallas_stack as ps

B, S = 16, 512
tr, tc = 64, 128
ny, nx = S // tr, S // tc

params = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
kp, spec = ps.prep_params(params, scale_input=True, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
ylow = jnp.asarray(rng.random((B, S, S), np.float32)).astype(jnp.bfloat16)
xcol = ps._xcol_scale(ylow, tr, tc)


def sync(a):
    return int(np.asarray(jnp.max(jnp.ravel(a)[:1].astype(jnp.float32))))


def timeit(name, f, iters=20):
    t0 = time.perf_counter()
    out = f(xcol)
    sync(out)
    print(f"{name} compile+first: {time.perf_counter() - t0:.0f}s",
          flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(xcol)
        sync(out)
        dt = (time.perf_counter() - t0) / iters * 1e3
        best = dt if best is None else min(best, dt)
    print(f"{name:8s}: {best * 4 / B:6.2f} ms/4f", flush=True)


args = sys.argv[1:] or ["0", "1", "2", "3", "4", "5", "6", "full"]
for a in args:
    upto = None if a == "full" else int(a)
    timeit(f"upto{a}", lambda x, u=upto: ps._run_stack(
        x, kp, tr, tc, ny, nx, spec, upto=u))
