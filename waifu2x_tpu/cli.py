"""Command-line interface — drop-in compatible flag set.

Replaces the reference's TCLAP CLI (main.cpp:26-71, C1) with argparse. Every
reference flag is preserved with identical names, constraints and defaults;
TPU-specific flags are additive.

    waifu2x-tpu -i in.png [-o out.png] [-m noise|scale|noise_scale]
                [--noise_level 1|2] [--scale_ratio 2.0] [--model_dir models]
                [-j 4]
"""

from __future__ import annotations

import argparse
import sys
import time

from waifu2x_tpu import io as w2x_io
from waifu2x_tpu.config import Config
from waifu2x_tpu.utils.logging import get_logger

log = get_logger("cli")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="waifu2x-tpu",
        description="waifu2x on TPU (JAX/XLA/Pallas reimplementation)",
    )
    # TCLAP auto-provides --version; the reference registers "1.0.0"
    # (main.cpp:26)
    p.add_argument("--version", action="version", version="1.0.0")
    # --- reference flags, identical semantics (main.cpp:26-61) ---
    p.add_argument("-i", "--input_file", required=True, nargs="+",
                   action="extend",
                   help="path to input image file(s); multiple files are "
                        "decoded by the native thread pool (-j) and share "
                        "one loaded model (outputs auto-named). Both "
                        "'-i a b c' and repeated '-i a -i b' accumulate "
                        "(argparse's default would silently keep only the "
                        "last -i)")
    p.add_argument("-o", "--output_file", default="(auto)",
                   help="path to output image file")
    p.add_argument("-m", "--mode", default="noise_scale",
                   choices=["noise", "scale", "noise_scale"],
                   help="image processing mode")
    p.add_argument("--noise_level", type=int, default=1, choices=[1, 2],
                   help="noise reduction level")
    p.add_argument("--scale_ratio", type=float, default=2.0,
                   help="custom scale ratio")
    p.add_argument("--model_dir", default=None,
                   help="path to custom model directory (don't append last /)")
    p.add_argument("-j", "--jobs", type=int, default=4,
                   help="number of host worker threads")
    # --- TPU-native extensions ---
    p.add_argument("--block_size", type=int, default=512,
                   help="block-splitting threshold size (reference: 512)")
    p.add_argument("--tile_size", type=int, default=512,
                   help="device tile size for the tiled path")
    p.add_argument("--precision", default="highest",
                   choices=["default", "high", "highest"],
                   help="f32 matmul precision on TPU")
    p.add_argument("--compute_dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="auto = float32 XLA path / bfloat16 Pallas kernels "
                        "(f32 accumulation); explicit values are honored "
                        "on both paths")
    p.add_argument("--pallas", nargs="?", const="on", default="auto",
                   choices=["auto", "on", "off"],
                   help="fused Pallas conv kernels: 'auto' (default) "
                        "enables them on TPU for the flagship 7-layer "
                        "model; 'on' forces them (interpret mode off-TPU, "
                        "slow); 'off' always uses the XLA path")
    p.add_argument("--alpha", default="ignore",
                   choices=["ignore", "bicubic", "flatten"],
                   help="alpha channel: drop it (reference behavior), "
                        "bicubic-resample it alongside, or flatten onto a "
                        "white background before processing (the original "
                        "Lua loader's behavior, image_loader.lua:23-33)")
    p.add_argument("--mesh", default="auto",
                   help="multi-device mesh: 'auto' (default) shards over "
                        "all local devices when >1 TPU is attached and the "
                        "workload qualifies; 'off' forces single-device; "
                        "'DPxSP' (frames x width) or 'DPxDYxSP' (frames x "
                        "rows x cols) pins a shape, e.g. 1x2x4")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace to DIR")
    p.add_argument("--device", default="auto", choices=["auto", "cpu"],
                   help="force the JAX platform: 'cpu' runs the XLA path "
                        "on the host (works with no TPU attached); 'auto' "
                        "uses the default backend (TPU when present)")
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    return Config(
        mode=args.mode,
        noise_level=args.noise_level,
        scale_ratio=args.scale_ratio,
        model_dir=(args.model_dir if args.model_dir is not None
                   else w2x_io.default_model_dir()),
        jobs=args.jobs,
        block_size=args.block_size,
        tile_size=args.tile_size,
        precision=args.precision,
        compute_dtype=args.compute_dtype,
        use_pallas={"auto": "auto", "on": True, "off": False}[args.pallas],
        mesh=args.mesh,
        alpha=args.alpha,
    )


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

    if args.device == "cpu":
        # must happen before the first backend touch; env vars alone don't
        # override a sitecustomize-registered plugin platform
        import os

        import jax
        shape = cfg.mesh_shape()
        if isinstance(shape, tuple):
            # an explicit mesh on the CPU backend needs that many virtual
            # devices — request them before the backend initializes
            n = shape[0] * shape[1] * shape[2]
            flags = os.environ.get("XLA_FLAGS", "")
            if n > 1 and "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + f" --xla_force_host_platform_device_count={n}"
                ).strip()
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            log.warning("--device cpu: backend already initialized")
        if args.pallas == "on":
            log.warning("--pallas on CPU runs the kernels in interpret "
                        "mode (slow; intended for debugging)")

    from waifu2x_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from waifu2x_tpu.pipeline import Converter  # deferred: imports jax

    if args.model_dir is None:
        # default model dir: auto-provision missing model files — copied
        # from the shipped TPU-trained *_demo.json weights when present,
        # placeholder identity models otherwise (the reference's own blobs
        # are LFS-missing upstream)
        from waifu2x_tpu.models.zoo import ensure_default_models
        made = ensure_default_models(cfg.model_dir)
        if made:
            log.warning("materialized default models: %s", ", ".join(made))

    inputs = args.input_file
    if len(inputs) > 1 and args.output_file != "(auto)":
        log.error("-o is only valid with a single input file "
                  "(multiple inputs auto-name their outputs)")
        return 1

    t0 = time.perf_counter()
    try:
        converter = Converter.from_config(cfg)
    except FileNotFoundError as e:
        log.error("%s", e)
        return 1

    try:
        imgs = (w2x_io.imread_batch_bgr(inputs, jobs=cfg.jobs)
                if len(inputs) > 1 else [w2x_io.imread_bgr(inputs[0])])
    except (FileNotFoundError, IOError) as e:
        log.error("%s", e)
        return 1

    if cfg.mode in ("noise", "noise_scale"):
        log.info("noise reduction (level %d)", cfg.noise_level)
    if cfg.mode in ("scale", "noise_scale"):
        log.info("start scaling (ratio %.6f)", cfg.scale_ratio)

    import contextlib
    if args.profile:
        import jax
        profile_ctx = jax.profiler.trace(args.profile)
    else:
        profile_ctx = contextlib.nullcontext()

    # Multiple inputs with stream-compatible settings ride the dispatch-
    # ahead StreamConverter (per-shape batching, device kept busy across
    # files) instead of a serial per-image loop. Conditions: the fused
    # stacks must exist (TPU present, flagship model), the scale part must
    # be exactly one 2x iteration with no shrink (the stream's contract),
    # no alpha handling, and every image big enough for the fused path's
    # fidelity gate (SMALL_IMG_PX) unless --pallas on forces it.
    from waifu2x_tpu.pipeline import SMALL_IMG_PX, scale_plan
    stream_ok = (
        len(imgs) > 1 and cfg.alpha == "ignore"
        and (cfg.mode == "noise" or scale_plan(cfg.scale_ratio) == (1, 0.0))
        and (cfg.mode == "noise" or converter.fast_scale is not None)
        and (cfg.mode == "scale" or converter.fast_noise is not None)
        and (cfg.use_pallas is True
             or all(im.shape[0] * im.shape[1] >= SMALL_IMG_PX
                    for im in imgs)))

    total_mp = 0.0
    if stream_ok:
        from waifu2x_tpu.stream import StreamConverter, resolve_stream_mesh
        sc = StreamConverter(fast=converter.fast_scale,
                             fast_noise=converter.fast_noise, mode=cfg.mode,
                             mesh=resolve_stream_mesh(cfg.mesh_shape()))
        with profile_ctx:
            for path, out in zip(inputs, sc.process_frames(imgs)):
                out_name = w2x_io.auto_output_name(
                    path, cfg.mode, cfg.noise_level, cfg.scale_ratio)
                w2x_io.imwrite_bgr(out_name, out)
                total_mp += out.shape[0] * out.shape[1] / 1e6
                log.info("wrote %s", out_name)
        dt = time.perf_counter() - t0
        log.info("%d file(s), %.2f MP in %.3fs (%.2f MP/s incl. compile)",
                 len(inputs), total_mp, dt, total_mp / dt)
        log.info("process successfully done!")
        return 0

    with profile_ctx:
        for path, img in zip(inputs, imgs):
            alpha = None
            if cfg.alpha == "bicubic":
                bgra = w2x_io.imread_bgra(path)
                if bgra is not None:
                    alpha = bgra[:, :, 3]
            elif cfg.alpha == "flatten":
                bgra = w2x_io.imread_bgra(path)
                if bgra is not None:
                    img = w2x_io.flatten_white(bgra)

            out = converter.process_bgr_u8(img)
            if alpha is not None:
                import numpy as np
                a = converter.process_alpha(alpha)
                out = np.concatenate([out, a[:, :, None]], axis=2)

            out_name = args.output_file
            if out_name == "(auto)" or len(inputs) > 1:
                out_name = w2x_io.auto_output_name(
                    path, cfg.mode, cfg.noise_level, cfg.scale_ratio)
            w2x_io.imwrite_bgr(out_name, out)
            total_mp += out.shape[0] * out.shape[1] / 1e6
            log.info("wrote %s", out_name)

    dt = time.perf_counter() - t0
    log.info("%d file(s), %.2f MP in %.3fs (%.2f MP/s incl. compile)",
             len(inputs), total_mp, dt, total_mp / dt)
    log.info("process successfully done!")
    return 0


if __name__ == "__main__":
    sys.exit(main())
