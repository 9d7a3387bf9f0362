"""End-to-end training demo: synthetic data -> trained 7-layer model ->
reference-JSON export -> fused-pipeline inference, all on the attached
accelerator.

The reference converter ships trained weights but its repo mirrors them as
missing git-LFS blobs, and the original training stack is Lua/Torch
(appendix/waifu2x-nocuda). This tool exercises our replacement end to end
(SURVEY.md C19 -> C21 -> C6): pairwise scale-transform batches, the jitted
Adam loop, export via models/weights.py, reload, and a PSNR comparison of
the trained model vs bicubic and vs the untrained init on held-out frames.

Usage: python tools/train_demo.py [--steps 400] [--out models/scale2.0x_demo.json]
"""

from __future__ import annotations

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_image(rng: np.random.Generator, size: int = 192) -> np.ndarray:
    """Anime-adjacent synthetic art: flat-color regions, hard and
    antialiased edges, thin line work, soft 2-D gradients, smooth cloudy
    shading and occasional halftone texture — the structure classes the
    SRCNN must learn to reconstruct under 2x downscaling / JPEG noise.
    (Round 2: widened from the r1 generator — ellipses, polylines, 2-D
    gradients, low-frequency shading, dot screens — which measurably
    raises held-out dB of the shipped demo weights.)"""
    import cv2
    img = np.zeros((size, size, 3), np.float32)
    img[:] = rng.integers(0, 256, 3)
    # 2-D soft gradient (random direction + strength)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    gdir = rng.uniform(0, 2 * np.pi)
    grad = (np.cos(gdir) * xx + np.sin(gdir) * yy) * rng.uniform(0, 80)
    img += grad[..., None]
    if rng.random() < 0.5:
        # cloudy low-frequency shading: upsampled smoothed noise
        small = rng.random((8, 8, 3)).astype(np.float32)
        cloud = cv2.resize(small, (size, size),
                           interpolation=cv2.INTER_CUBIC)
        img += (cloud - 0.5) * rng.uniform(10, 60)
    for _ in range(14):
        color = tuple(float(c) for c in rng.integers(0, 256, 3))
        kind = int(rng.integers(0, 5))
        p1 = tuple(int(c) for c in rng.integers(0, size, 2))
        p2 = tuple(int(c) for c in rng.integers(0, size, 2))
        aa = cv2.LINE_AA if rng.random() < 0.5 else cv2.LINE_8
        if kind == 0:
            cv2.rectangle(img, p1, p2, color, -1)
        elif kind == 1:
            cv2.circle(img, p1, int(rng.integers(8, size // 3)), color, -1,
                       lineType=aa)
        elif kind == 2:
            ax = (int(rng.integers(6, size // 3)),
                  int(rng.integers(6, size // 3)))
            cv2.ellipse(img, p1, ax, float(rng.uniform(0, 180)), 0, 360,
                        color, -1, lineType=aa)
        elif kind == 3:
            # thin polyline (line work / hair strokes)
            pts = rng.integers(0, size, (int(rng.integers(3, 6)), 2))
            cv2.polylines(img, [pts.astype(np.int32)], False, color,
                          int(rng.integers(1, 3)), lineType=aa)
        else:
            cv2.line(img, p1, p2, color, int(rng.integers(1, 4)),
                     lineType=aa)
    if rng.random() < 0.25:
        # halftone-ish dot screen patch (screentone texture)
        step = int(rng.integers(4, 9))
        r0, c0 = rng.integers(0, size // 2, 2)
        h0 = int(rng.integers(size // 4, size // 2))
        tone = tuple(float(c) for c in rng.integers(0, 256, 3))
        for y in range(r0, min(size, r0 + h0), step):
            for x in range(c0, min(size, c0 + h0), step):
                cv2.circle(img, (x, y), max(1, step // 3), tone, -1)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)[:, :, ::-1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--crop", type=int, default=96)
    ap.add_argument("--kind", default="scale", choices=["scale", "noise"],
                    help="training pair kind (pairwise_transform.{scale,"
                         "jpeg} analogues, train/data.py)")
    ap.add_argument("--noise_level", type=int, default=1, choices=[1, 2])
    ap.add_argument("--images", type=int, default=64,
                    help="synthetic training images to generate")
    ap.add_argument("--workers", type=int, default=4,
                    help="host synthesis threads (cv2 releases the GIL; "
                         "long runs are otherwise host-synthesis-bound)")
    ap.add_argument("--out", default=None,
                    help="output JSON (default: models/<kind>_demo name)")
    ap.add_argument("--seed", type=int, default=0,
                    help="base RNG seed: corpus synthesis uses `seed`, "
                         "worker i draws from `seed*1000 + 1000 + i`. "
                         "NOTE batch CONTENT is seed-determined but batch "
                         "ARRIVAL ORDER is thread-scheduling-dependent, so "
                         "shipped weights are reproducible only up to SGD "
                         "batch order; the JSON records seed/steps/workers "
                         "in `provenance` for the record")
    args = ap.parse_args()
    if args.out is None:
        args.out = ("models/scale2.0x_demo.json" if args.kind == "scale"
                    else f"models/noise{args.noise_level}_demo.json")

    from waifu2x_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params, as_numpy
    from waifu2x_tpu.models.weights import load_model_json, save_model_json
    from waifu2x_tpu.ops.convstack import convert_plane
    from waifu2x_tpu.train.data import PairOptions, make_batch, rgb_luma
    from waifu2x_tpu.train.train import TrainConfig, train_loop
    from waifu2x_tpu.utils.metrics import psnr

    rng = np.random.default_rng(args.seed)
    train_imgs = [synth_image(rng) for _ in range(args.images)]
    test_imgs = [synth_image(rng) for _ in range(8)]
    opts = PairOptions(crop_size=args.crop)

    params0 = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
    cfg = TrainConfig(batch_size=args.batch, crop_size=args.crop,
                      precision="default", decay_steps=args.steps)
    # host-side pair synthesis (crops/flips/JPEG) runs on a small thread
    # pool so it overlaps the device steps instead of serializing with
    # them (cv2's codecs release the GIL; one thread caps long runs).
    # SGD doesn't care about batch order, so workers just share a queue.
    import queue as _q
    import threading as _t

    def prefetch(steps, workers, depth=16):
        q: "_q.Queue" = _q.Queue(maxsize=depth)
        END = object()
        per = [steps // workers + (i < steps % workers)
               for i in range(workers)]

        def worker(i, n):
            wrng = np.random.default_rng(args.seed * 1000 + 1000 + i)
            for _ in range(n):
                q.put(make_batch(train_imgs, args.batch, args.kind, wrng,
                                 opts, noise_level=args.noise_level))
            q.put(END)

        for i, n in enumerate(per):
            _t.Thread(target=worker, args=(i, n), daemon=True).start()
        done = 0
        while done < workers:
            item = q.get()
            if item is END:
                done += 1
                continue
            yield item

    params, losses = train_loop(
        params0, prefetch(args.steps, max(1, args.workers)), cfg)
    print(f"trained {args.steps} steps: mse {losses[0]:.5f} -> "
          f"{np.mean(losses[-20:]):.5f}")

    # held-out eval: Y-PSNR of model output vs ground truth, against the
    # nearest-2x input baseline and the untrained init
    def eval_psnr(p):
        scores = []
        for im in test_imgs:
            x, y = make_batch([im], 1, args.kind, np.random.default_rng(7),
                              opts, noise_level=args.noise_level)
            out = np.asarray(convert_plane(
                jax.numpy.asarray(x[0, :, :, 0]), p, precision="highest"))
            off = (x.shape[1] - y.shape[1]) // 2
            scores.append(psnr(out[off:-off, off:-off] * 255.0,
                               y[0, :, :, 0] * 255.0))
        return float(np.mean(scores))

    base_in = eval_psnr(as_numpy(params0))
    trained = eval_psnr(as_numpy(params))
    print(f"held-out Y-PSNR: untrained init {base_in:.2f} dB -> "
          f"trained {trained:.2f} dB")

    save_model_json(args.out, as_numpy(params))
    reloaded = load_model_json(args.out)
    print(f"exported reference-format weights to {args.out} "
          f"(reloads cleanly: {len(reloaded)} layers, "
          f"reload PSNR {eval_psnr(reloaded):.2f} dB)")
    # provenance sidecar (the model JSON itself must stay a bare layer
    # array — the reference loader's schema): training config + held-out
    # metric, so every shipped weight file has a recorded number
    import json as _json
    prov = {
        "script": "tools/train_demo.py",
        "kind": args.kind, "noise_level": args.noise_level,
        "steps": args.steps, "batch": args.batch, "crop": args.crop,
        "images": args.images, "workers": args.workers, "seed": args.seed,
        "final_train_mse": float(np.mean(losses[-20:])),
        "heldout_y_psnr_db": round(trained, 2),
        "heldout_y_psnr_untrained_db": round(base_in, 2),
    }
    with open(args.out + ".provenance.json", "w") as f:
        _json.dump(prov, f, indent=1)
    print(f"provenance -> {args.out}.provenance.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
