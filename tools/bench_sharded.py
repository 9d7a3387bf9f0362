"""Multi-device benchmark driver — the sharded 4K-stream workload
(BASELINE.json configs[4]: "4K/8K stream sharded across an N-host pod
slice") run via the shard_map + ppermute halo-exchange fast path.

Prints ONE JSON line: {"metric", "value" (MP/s), "unit", "mesh",
"efficiency_vs_1dev", ...}. Efficiency is measured against a single-device
run of the same per-device workload (the >=80% north-star in BASELINE.md).

Runs anywhere:
  * real pod slice:   python tools/bench_sharded.py --mesh 1x4
                      (after waifu2x_tpu.parallel.multihost.initialize on
                       each host; the mesh spans all cluster devices)
  * this container:   python tools/bench_sharded.py --force-cpu 8
                      (8-device virtual CPU mesh, interpret-mode kernels —
                       validates the code path and scaling bookkeeping,
                       not silicon speed)

The single real chip available here can't demonstrate multi-chip scaling;
this driver is the runnable artifact those measurements plug into.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default=None, metavar="DPxSP",
                    help="mesh shape, e.g. 2x4 (default: 1 x n_devices)")
    ap.add_argument("--batch", type=int, default=2,
                    help="frames per step (global, sharded over dp)")
    ap.add_argument("--size", default="2160x3840",
                    help="frame size HxW (low-res; output is 2x)")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--force-cpu", type=int, default=0, metavar="N",
                    help="run on an N-device virtual CPU platform "
                         "(interpret-mode kernels; code-path validation)")
    args = ap.parse_args()

    if args.force_cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags +
                f" --xla_force_host_platform_device_count={args.force_cpu}"
            ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
    from waifu2x_tpu.parallel import multihost
    from waifu2x_tpu.parallel.fast_sharded import (
        convert_batch_on_mesh,
        make_mesh,
    )
    from waifu2x_tpu.pipeline import FastStack

    n_dev = len(jax.devices())
    if args.mesh:
        dp, sp = (int(v) for v in args.mesh.split("x"))
    else:
        dp, sp = 1, n_dev
    h, w = (int(v) for v in args.size.split("x"))
    if args.force_cpu:
        # virtual mesh: shrink the frame so interpret-mode kernels finish
        h, w = min(h, 48), min(w, 64)
    mesh = make_mesh((dp, sp))

    params = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
    tile = (16, 16) if args.force_cpu else None
    fast = FastStack.build(params, scale_input=True, tile=tile,
                           interpret=bool(args.force_cpu),
                           dtype=jnp.float32 if args.force_cpu
                           else jnp.bfloat16)

    rng = np.random.default_rng(0)
    batch = max(dp, args.batch - args.batch % dp)
    yuv = jnp.asarray(rng.random((batch, h, w, 3), dtype=np.float32))
    out_px = batch * (2 * h) * (2 * w)

    # single-device baseline of the same per-device slice (for efficiency)
    base_mesh = make_mesh((1, 1), devices=jax.devices()[:1])
    yuv_base = yuv[:max(1, batch // dp), :, :w // sp]
    base = multihost.measure_throughput(
        lambda x: convert_batch_on_mesh(x, fast, base_mesh), yuv_base,
        yuv_base.shape[0] * 2 * h * 2 * (w // sp), iters=args.iters)

    report = multihost.measure_throughput(
        lambda x: convert_batch_on_mesh(x, fast, mesh), yuv,
        out_px, iters=args.iters, baseline_mp_per_s=base.mp_per_s)

    # Wall-clock "efficiency" of virtual CPU devices time-slicing ONE host
    # core is noise, not a scaling number (r4 VERDICT): suppress it there.
    # The no-silicon datapoint lives in tools/scaling_probe.py (total-work
    # overhead ratio, 1-core-serialized) + the ICI byte budget it prints.
    eff = None
    if not args.force_cpu and report.efficiency is not None:
        eff = round(report.efficiency, 4)
    print(json.dumps({
        "metric": f"megapixels/sec, sharded 2x stream (mesh {dp}x{sp}, "
                  f"batch {batch}, {h}x{w} frames, "
                  f"{'virtual-CPU interpret' if args.force_cpu else 'TPU'})",
        "value": round(report.mp_per_s, 4),
        "unit": "MP/s",
        "mesh": [dp, sp],
        "devices": n_dev,
        "baseline_1dev_mp_per_s": round(base.mp_per_s, 4),
        "efficiency_vs_1dev": eff,
        **({"note": "virtual devices share one host core; see "
                    "tools/scaling_probe.py for the meaningful "
                    "no-silicon datapoint"} if args.force_cpu else {}),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
