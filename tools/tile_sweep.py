"""Tile-size ladder for the fused kernel (docs/PERF.md open item (b)).

Tries a ladder of (tr, tc) tiles between the known-good (64, 128) and the
cell-count-doubling shapes, each under a per-shape compile budget (the
remote relay makes compiles minutes-long; a pathological shape must not
eat the whole session). Each shape that compiles is timed and checked
bit-identical to the (64, 128) output. Runs SEQUENTIALLY in one process so
the persistent XLA cache keeps every success warm for later bench runs.

Usage: python tools/tile_sweep.py [shapes like 72x128 80x128+a+v120 ...]
       suffix +a  -> W2X_ALIAS_SCRATCH=1 (activation scratch overlay)
       suffix +vN -> W2X_VMEM_LIMIT_MB=N
"""
import os
import subprocess
import sys
import time

DEFAULT = ["72x128", "80x128+a", "88x128+a+v120", "64x160", "96x128+a+v120"]

CHILD = r"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from waifu2x_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
from waifu2x_tpu.ops import pallas_stack as ps

tr, tc, B, S = map(int, sys.argv[1:5])
params = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
kp, spec = ps.prep_params(params, scale_input=True, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
ylow = jnp.asarray(rng.random((B, S, S), np.float32)).astype(jnp.bfloat16)
sync = lambda a: float(jnp.max(a[..., 0:4].astype(jnp.float32)))

t0 = time.perf_counter()
out = ps.stack_scale(ylow, kp, spec, tile=(tr, tc))
sync(out)
print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
ref = ps.stack_scale(ylow, kp, spec, tile=(64, 128))
sync(ref)
diff = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
best = None
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(8):
        out = ps.stack_scale(ylow, kp, spec, tile=(tr, tc))
    sync(out)
    dt = (time.perf_counter() - t0) / 8
    best = dt if best is None else min(best, dt)
mps = B * (2 * S) ** 2 / best / 1e6
print(f"RESULT tile=({tr},{tc}) {best*1e3:.2f} ms/batch {mps:.1f} MP/s "
      f"maxdiff={diff:.2e}", flush=True)
"""


def main():
    shapes = sys.argv[1:] or DEFAULT
    budget_s = 1500  # per shape: compile through the relay runs ~4-10 min
    for s in shapes:
        parts = s.split("+")
        tr, tc = map(int, parts[0].split("x"))
        env = dict(os.environ)
        for p in parts[1:]:
            if p == "a":
                env["W2X_ALIAS_SCRATCH"] = "1"
            elif p.startswith("v"):
                env["W2X_VMEM_LIMIT_MB"] = p[1:]
        print(f"=== tile ({tr},{tc}) opts={parts[1:]} "
              f"(budget {budget_s}s) ===", flush=True)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD, str(tr), str(tc), "4", "512"],
                capture_output=True, text=True, timeout=budget_s, env=env,
            )
            out, rc = (r.stdout or "") + (r.stderr or ""), r.returncode
        except subprocess.TimeoutExpired as e:
            out = ((e.stdout or b"").decode(errors="replace")
                   + (e.stderr or b"").decode(errors="replace"))
            rc = "TIMEOUT"
        keep = [ln for ln in out.splitlines()
                if "RESULT" in ln or "compile+run" in ln
                or "RESOURCE_EXHAUSTED" in ln or "vmem" in ln.lower()[:200]]
        print("\n".join(keep[-6:]) or out[-800:], flush=True)
        print(f"--- ({tr},{tc}) done in {time.time()-t0:.0f}s "
              f"rc={rc}", flush=True)


if __name__ == "__main__":
    main()
