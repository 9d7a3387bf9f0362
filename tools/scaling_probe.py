"""Work-normalized sharding-overhead probe — the defensible no-silicon
scaling datapoint (VERDICT r4 item 7).

This host has ONE physical core (`nproc` = 1), so any wall-clock
"efficiency" of an 8-virtual-device mesh is noise: the devices fight for
the core and T_mesh ~ 8 x T_1 regardless of communication cost. What one
core DOES measure cleanly is TOTAL WORK: it serializes every device
program, so

    overhead = T(frame sharded over N devices) / T(same frame, 1 device) - 1

is exactly the extra work+comm the sharded decomposition adds — the
halo-region recompute (each shard's conv consumes a 7-px rim of neighbor
data), the ppermute transfers (host loopback here; ICI on silicon), and
the per-program dispatch. On N real chips, per-chip wall-clock is
(1 + overhead)/N of the single-chip time, so

    predicted efficiency ~ 1 / (1 + overhead)

Measured with the COMPILED XLA conv stack (parallel/sharded.py — compiled
CPU code, not interpret-mode Pallas, so the compute term is real machine
throughput). The halo-recompute term is also analytic: 2*offset/shard_cols
per exchanged axis; the probe reports measured-vs-analytic so the residual
(comm + dispatch) is visible.

Prints one JSON line plus the analytic ICI byte-budget table for the
FUSED path at production sizes (the fraction of each step's HBM traffic
that crosses ICI — the quantity that bounds efficiency on silicon).

Usage: python tools/scaling_probe.py [--mesh 1x8] [--size 256x512]
                                     [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="1x8", metavar="DYxDX")
    ap.add_argument("--size", default="512x3840", metavar="HxW",
                    help="plane size; the default gives 480-col shards on "
                         "1x8 — the production 4K-over-8-chips geometry")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_platforms", "cpu")

    from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
    from waifu2x_tpu.parallel.sharded import convert_plane_on_mesh, make_mesh

    dy, dx = (int(v) for v in args.mesh.split("x"))
    h, w = (int(v) for v in args.size.split("x"))
    params = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
    y = jnp.asarray(np.random.default_rng(0).random((h, w), np.float32))

    mesh_1 = make_mesh((1, 1), devices=jax.devices()[:1])
    mesh_n = make_mesh((dy, dx), devices=jax.devices()[:dy * dx])

    def timeit(mesh):
        run = lambda: convert_plane_on_mesh(y, params, mesh)  # noqa: E731
        np.asarray(run())                      # warmup/compile
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = run()
            out.block_until_ready()            # CPU backend: reliable
            dt = (time.perf_counter() - t0) / args.iters
            best = dt if best is None else min(best, dt)
        return best

    t1 = timeit(mesh_1)
    tn = timeit(mesh_n)
    overhead = tn / t1 - 1.0
    # analytic halo-recompute share: every shard pads/receives a 7-px rim
    # on BOTH axes (neighbor data mid-image, replicate at true edges —
    # exactly what the monolithic pass pads ONCE), so the sharded total
    # input area is dy*dx*(sh+14)*(sw+14) vs (h+14)*(w+14)
    off = 7
    sh, sw = h // dy, w // dx
    area = (dy * dx * (sh + 2 * off) * (sw + 2 * off)
            / float((h + 2 * off) * (w + 2 * off)))
    analytic_recompute = area - 1.0
    print(json.dumps({
        "metric": f"sharding overhead ratio, {h}x{w} plane over mesh "
                  f"{dy}x{dx} (XLA conv stack, 1-core-serialized virtual "
                  f"CPU devices: total work+comm, not wall-clock scaling)",
        "value": round(overhead, 4),
        "unit": "fraction of single-device work",
        "t_single_ms": round(t1 * 1e3, 2),
        "t_sharded_ms": round(tn * 1e3, 2),
        "analytic_halo_recompute": round(analytic_recompute, 4),
        "residual_vs_analytic": round(overhead - analytic_recompute, 4),
        "predicted_efficiency_n_chips_measured": round(
            1.0 / (1.0 + max(overhead, 0.0)), 4),
        "predicted_efficiency_n_chips_analytic": round(
            1.0 / (1.0 + analytic_recompute), 4),
    }))

    # Analytic ICI byte budget for the FUSED polyphase path (the flagship
    # distributed strategy, parallel/fast_sharded.py + mesh_pipeline.py):
    # per 2x step per device, width-sharded over sp:
    #   ICI:  2 sides x HALO(4) low-res cols x hl rows x 3 ch x 4 B (f32)
    #   HBM:  ~100 B per low-res px of the shard (im2col + uvp + u8 out;
    #         the measured per-dispatch footprint, docs/PERF.md)
    print("# ICI byte budget, fused 2x step, width-sharded (per device):")
    print("# frame        sp   halo_bytes   hbm_bytes    ICI/HBM")
    for name, hl, wl in (("1080p", 540, 960), ("4K", 1080, 1920),
                         ("8K", 2160, 3840)):
        for sp in (4, 8):
            halo = 2 * 4 * hl * 3 * 4
            hbm = 100 * hl * (wl // sp)
            print(f"#  {name:6} 2x   {sp}   {halo:>10,}   {hbm:>10,}   "
                  f"{halo / hbm:.4%}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
