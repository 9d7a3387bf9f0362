"""A/B the L1-direct variant (no xin assembly scratch) vs the original
4-copy window assembly. Mechanism under test: 16-lane bf16 arrays use
vregs at 1/8 lane utilization, so the xin copies cost ~8x their bytes in
vreg ops; applying L1 per window quadrant writes only 128-lane x1."""
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

B, S = 4, 512
tr, tc = 64, 128
ny, nx = S // tr, S // tc
params = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
kp, spec = ps.prep_params(params, scale_input=True, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
ylow = jnp.asarray(rng.random((B, S, S), np.float32)).astype(jnp.bfloat16)
xcol = ps._xcol_scale(ylow, tr, tc)
xcol.block_until_ready()


def sync(a):
    return float(jnp.max(a[..., 0:4].astype(jnp.float32)))


outs = {}
for name, l1d in (("assembly", False), ("l1_direct", True)):
    run = lambda: ps._run_stack(xcol, kp, tr, tc, ny, nx, spec,  # noqa: E731
                                l1_direct=l1d)
    out = run()
    sync(out)
    outs[name] = out
    for _ in range(2):
        n = 16
        t0 = time.perf_counter()
        for _ in range(n):
            out = run()
        sync(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name}: {dt:.2f} ms/batch(4f)", flush=True)

d = float(jnp.max(jnp.abs(outs["assembly"].astype(jnp.float32)
                          - outs["l1_direct"].astype(jnp.float32))))
print(f"max |diff|: {d:.2e}")
