"""ns1080 chain attribution (VERDICT r3 item 3): where does the
noise2+2x 1080p chain lose ~7% vs its 0.8x-of-scale ceiling?

Suspects (docs/PERF.md round-3 'weak #1'):
  (a) band-overlap recompute — bench pins band_rows 512 (scale side,
      3 bands: 1104/1080 rows = +2.2%) and 1024 (noise side, 2 bands:
      1112/1080 = +3.0%) for compile-time reasons that may not apply
      at batch 4;
  (b) the f32 handoff between noise_y_batch_fast and the scale step's
      `y=` override (measured <1% in the r2 ceiling analysis);
  (c) dispatch pipelining between the two stacks' programs.

Method: time the chain's parts in isolation and the chain under band
variants, batch 4 and up (bench.py:123 capped batch at 4 — this probe
is where the knob gets unlocked).

Round-4 measurements (one chip, v5e, batch 4 unless noted), ms/batch
(33.2 MP output):
  see docs/PERF.md 'round 4' — results recorded there after the run.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    args = ap.parse_args()

    from waifu2x_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
    from waifu2x_tpu.ops import pallas_stack as ps
    from waifu2x_tpu.pipeline import (
        FastStack,
        noise_y_batch_fast,
        scale2x_batch_u8_fused,
    )

    params = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
    fast = FastStack.build(params, scale_input=True)
    fast_n = FastStack.build(params, scale_input=False)
    rng = np.random.default_rng(0)

    def sync(a):
        return int(np.asarray(jnp.max(a)))

    def timeit(fn, x, iters):
        sync(fn(x))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                o = fn(x)
            sync(o)
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        return best

    def run(name, fn, batch, safe=False, iters=None):
        if args.only and name not in args.only.split(","):
            return
        x = jnp.asarray(rng.random((batch, 1080, 1920, 3),
                                   dtype=np.float32))
        old = ps.XCOL_SAFE
        ps.XCOL_SAFE = safe
        try:
            t0 = time.perf_counter()
            dt = timeit(fn, x, iters or args.iters)
            mp = batch * 2160 * 3840 / 1e6
            print(f"{name:34s} b={batch} safe={int(safe)}: "
                  f"{dt * 1e3:7.2f} ms/batch = {mp / dt:6.1f} MP/s "
                  f"(incl compile {time.perf_counter() - t0:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — print and continue
            print(f"{name:34s} b={batch} safe={int(safe)}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        finally:
            ps.XCOL_SAFE = old

    # chain as bench.py ships it today (reproduce the 153.2)
    chain = lambda nb, sb: (lambda x: scale2x_batch_u8_fused(  # noqa: E731
        x, fast, band_rows=sb,
        y=noise_y_batch_fast(x[..., 0], fast_n, band_rows=nb)))
    noise_only = lambda nb: (lambda x: noise_y_batch_fast(  # noqa: E731
        x[..., 0], fast_n, band_rows=nb))
    scale_only = lambda sb: (lambda x: scale2x_batch_u8_fused(  # noqa: E731
        x, fast, band_rows=sb))

    run("noise-only nb=1024 (2 bands)", noise_only(1024), 4)
    run("noise-only nb=2304 (unbanded)", noise_only(2304), 4)
    run("scale-only sb=512 (3 bands)", scale_only(512), 4)
    run("scale-only sb=540 (2 bands)", scale_only(540), 4)
    run("scale-only sb=1152 unbanded", scale_only(1152), 4, safe=True)
    run("chain bench (nb1024 sb512)", chain(1024, 512), 4)
    run("chain nb2304 sb512", chain(2304, 512), 4)
    run("chain nb2304 sb540", chain(2304, 540), 4)
    run("chain nb2304 sb1152 safe", chain(2304, 1152), 4, safe=True)
    # batch unlock: explicit noise banding at b>4 (the unbanded batch-8
    # noise program is the documented pathological compile — avoid it)
    run("chain b6 nb1024 sb540", chain(1024, 540), 6)
    run("chain b8 nb1024 sb540", chain(1024, 540), 8)
    return 0


if __name__ == "__main__":
    sys.exit(main())
