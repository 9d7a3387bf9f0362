"""int8-L6 fidelity + throughput measurement (VERDICT r3 item 2).

For a given weight file, measures on the chip:
  1. PSNR of the fused kernel's u8 scale output with W2X_L6_I8=1 vs the
     f32-highest reference stack (the bench --psnr protocol, structured
     content) — the number that must clear 50 dB for default-on;
  2. the same with the bf16 default (the envelope the i8 path must not
     degrade from);
  3. scale512 throughput with the i8 kernel (target >=215 MP/s).

Also reports the training-side proxy (train/qat.py l6_quant_gap_db) so
the QAT curve's gap metric can be cross-calibrated against the kernel
measurement.

Usage: W2X_L6_I8=1 python tools/i8_fidelity_probe.py --model path.json
(the env var gates the kernel build; the probe builds both variants via
the l6_i8 argument regardless, so no env is actually required).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def structured_batch(rng, n, h, w):
    """bench-adjacent structured frames (gradients + shapes + mild noise)
    — the content class PSNR gates on (pure-random is the adversarial
    case, measured separately by the chain tests)."""
    import cv2
    out = []
    for _ in range(n):
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([
            128 + 90 * np.sin(xx / 37.0) * np.cos(yy / 53.0),
            128 + 80 * np.cos((xx + yy) / 61.0),
            128 + 70 * np.sin(yy / 29.0),
        ], axis=-1)
        for k in range(10):
            c = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            col = tuple(int(v) for v in rng.integers(0, 256, 3))
            if k % 2:
                cv2.circle(img, c, int(rng.integers(8, h // 6)), col, -1,
                           lineType=cv2.LINE_AA)
            else:
                c2 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
                cv2.rectangle(img, c, c2, col, -1)
        img += rng.normal(0, 2.0, img.shape)
        out.append(np.clip(np.round(img), 0, 255).astype(np.uint8))
    return np.stack(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="models/scale2.0x_demo.json")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--skip_throughput", action="store_true")
    args = ap.parse_args()

    from waifu2x_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from waifu2x_tpu.config import Config
    from waifu2x_tpu.models.weights import load_model_json
    from waifu2x_tpu.ops.color import bgr_to_yuv, saturate_cast_u8, \
        u8_to_unit_f32, yuv_to_bgr
    from waifu2x_tpu.ops.s2d import d2s_host_cmajor
    from waifu2x_tpu.pipeline import (
        FastStack,
        scale2x_batch,
        scale2x_batch_u8_fused,
    )
    from waifu2x_tpu.train.qat import l6_quant_gap_db

    params = load_model_json(args.model)
    rng = np.random.default_rng(5)
    imgs = structured_batch(rng, 2, 512, 512)
    yuv = bgr_to_yuv(u8_to_unit_f32(jnp.asarray(imgs)))

    # f32-highest reference output
    hi = np.asarray(saturate_cast_u8(yuv_to_bgr(scale2x_batch(
        yuv, params, Config(mode="scale", precision="highest")))),
        np.float64)

    def kernel_psnr(l6_i8: bool) -> float:
        import waifu2x_tpu.ops.pallas_stack as ps
        old = ps.L6_I8
        ps.L6_I8 = l6_i8
        # _run_stack resolves the L6_I8 global at trace time under a
        # static l6_i8=None — clear the jit cache so the flip retraces
        ps._run_stack.clear_cache()
        try:
            fast = FastStack.build(params, scale_input=True)
            got = d2s_host_cmajor(
                np.asarray(scale2x_batch_u8_fused(yuv, fast))
            ).astype(np.float64)
        finally:
            ps.L6_I8 = old
            # drop the traced-with-flag kernel too: a later FastStack use
            # in the same process must not silently reuse the wrong trace
            ps._run_stack.clear_cache()
        mse = np.mean((got - hi) ** 2)
        return float(10 * np.log10(255.0 ** 2 / mse)) if mse else float("inf")

    print(f"model {args.model}", flush=True)
    print(f"  bf16 kernel vs f32 ref: {kernel_psnr(False):.2f} dB", flush=True)
    print(f"  int8-L6 kernel vs f32 ref: {kernel_psnr(True):.2f} dB",
          flush=True)

    # training-side proxy on the same content's Y planes
    ypad = jnp.pad(yuv[..., 0:1], ((0, 0), (7, 7), (7, 7), (0, 0)),
                   mode="edge")
    print(f"  qat-proxy L6 quant gap: "
          f"{l6_quant_gap_db(params, ypad[:, :256, :256]):.2f} dB",
          flush=True)

    if args.skip_throughput:
        return 0

    # throughput with i8 on, scale512 shape
    import waifu2x_tpu.ops.pallas_stack as ps
    big = jnp.asarray(rng.random((args.batch, 512, 512, 3),
                                 dtype=np.float32))

    def sync(a):
        return int(np.asarray(jnp.max(a)))

    for name, flag in (("bf16", False), ("int8-L6", True)):
        ps.L6_I8 = flag
        ps._run_stack.clear_cache()
        fast = FastStack.build(params, scale_input=True)
        step = lambda x: scale2x_batch_u8_fused(x, fast)  # noqa: E731
        sync(step(big))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = step(big)
            sync(o)
            dt = (time.perf_counter() - t0) / args.iters
            best = dt if best is None else min(best, dt)
        mp = args.batch * 1024 * 1024 / 1e6   # 2x of 512^2 -> 1 MP/frame
        print(f"  scale512 {name}: {mp / best:.1f} MP/s "
              f"({best * 1e3:.2f} ms/batch)", flush=True)
    ps.L6_I8 = False
    ps._run_stack.clear_cache()
    return 0


if __name__ == "__main__":
    sys.exit(main())
