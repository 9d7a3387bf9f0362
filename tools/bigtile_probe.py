"""Big-tile retry for the fused kernel: does halving the cell count beat
the ~4 ms/4f of residual per-cell overhead (docs/PERF.md open item (a))?

Earlier attempts hit >10-min relay compiles at (128,128)/(64,256) and a
Mosaic crash at (96,128) — but those were the TWO-kernel configuration.
The single fused kernel has a different (smaller) live set, and the
persistent XLA cache means one long compile amortizes over every later
same-shape run. Usage:  python tools/bigtile_probe.py 128 128 [B]
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

tr, tc = int(sys.argv[1]), int(sys.argv[2])
B = int(sys.argv[3]) if len(sys.argv) > 3 else 4
S = 512

params = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
kp, spec = ps.prep_params(params, scale_input=True, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
ylow = jnp.asarray(rng.random((B, S, S), np.float32)).astype(jnp.bfloat16)


def sync(a):
    return float(jnp.max(a[..., 0:4].astype(jnp.float32)))


t0 = time.perf_counter()
out = ps.stack_scale(ylow, kp, spec, tile=(tr, tc))
sync(out)
t1 = time.perf_counter()
print(f"tile ({tr},{tc}) B={B}: compile+first run {t1 - t0:.1f}s",
      flush=True)

# correctness vs the default tile
ref = ps.stack_scale(ylow, kp, spec, tile=(64, 128))
sync(ref)
diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                             - ref.astype(jnp.float32))))
print(f"max |diff| vs (64,128): {diff:.2e}", flush=True)

for _ in range(2):
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        out = ps.stack_scale(ylow, kp, spec, tile=(tr, tc))
    sync(out)
    dt = (time.perf_counter() - t0) / n
    mps = B * (2 * S) ** 2 / dt / 1e6
    print(f"kernel step: {dt * 1e3:.2f} ms/batch  ({mps:.1f} MP/s "
          "kernel-only)", flush=True)
