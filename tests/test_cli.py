"""CLI: flag surface, defaults, auto-naming, end-to-end file conversion
(reference C1 + C3, main.cpp:26-71 and 173-189)."""

import os

import numpy as np
import pytest

from waifu2x_tpu import io as w2x_io
from waifu2x_tpu.cli import build_parser, config_from_args, main
from waifu2x_tpu.models import ModelSpec, init_params
from waifu2x_tpu.models.srcnn import as_numpy
from waifu2x_tpu.models.weights import save_model_json
from waifu2x_tpu.models.zoo import identity_params


def test_defaults_match_reference():
    args = build_parser().parse_args(["-i", "in.png"])
    cfg = config_from_args(args)
    assert cfg.mode == "noise_scale"          # main.cpp:42
    assert cfg.noise_level == 1               # main.cpp:49
    assert cfg.scale_ratio == 2.0             # main.cpp:52
    assert cfg.jobs == 4                      # main.cpp:59
    assert args.output_file == "(auto)"       # main.cpp:34
    assert cfg.block_size == 512              # modelHandler.hpp:99


def test_mode_constraint():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["-i", "x.png", "-m", "bogus"])
    with pytest.raises(SystemExit):
        build_parser().parse_args(["-i", "x.png", "--noise_level", "3"])


@pytest.mark.parametrize(
    "mode,level,ratio,want",
    [
        ("noise_scale", 1, 2.0, "img(noise_scale)(Level1)(x2.000000).png"),
        ("noise", 2, 2.0, "img(noise)(Level2).png"),
        ("scale", 1, 2.5, "img(scale)(x2.500000).png"),
    ],
)
def test_auto_output_name(mode, level, ratio, want):
    got = w2x_io.auto_output_name("/p/img.jpg", mode, level, ratio)
    assert got == f"/p/{want}"


def _write_models(model_dir, spec):
    os.makedirs(model_dir, exist_ok=True)
    import jax
    for name, seed in [("noise1_model.json", 0), ("noise2_model.json", 1)]:
        save_model_json(os.path.join(model_dir, name),
                        as_numpy(init_params(jax.random.PRNGKey(seed), spec)))
    save_model_json(os.path.join(model_dir, "scale2.0x_model.json"),
                    as_numpy(init_params(jax.random.PRNGKey(2), spec)))


def test_cli_end_to_end(tmp_path, rng):
    spec = ModelSpec.from_widths([1, 3, 1])
    model_dir = str(tmp_path / "models")
    _write_models(model_dir, spec)
    src = str(tmp_path / "input.png")
    w2x_io.imwrite_bgr(src, rng.integers(0, 256, (20, 24, 3), dtype=np.uint8))

    rc = main(["-i", src, "--model_dir", model_dir, "-m", "noise_scale"])
    assert rc == 0
    out = str(tmp_path / "input(noise_scale)(Level1)(x2.000000).png")
    assert os.path.exists(out)
    img = w2x_io.imread_bgr(out)
    assert img.shape == (40, 48, 3)


def test_cli_explicit_output_and_mode(tmp_path, rng):
    spec = ModelSpec.from_widths([1, 3, 1])
    model_dir = str(tmp_path / "models")
    _write_models(model_dir, spec)
    src = str(tmp_path / "a.png")
    dst = str(tmp_path / "b.png")
    w2x_io.imwrite_bgr(src, rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
    rc = main(["-i", src, "-o", dst, "-m", "noise", "--noise_level", "2",
               "--model_dir", model_dir])
    assert rc == 0
    assert w2x_io.imread_bgr(dst).shape == (16, 16, 3)


def test_cli_missing_model_dir(tmp_path, rng):
    src = str(tmp_path / "a.png")
    w2x_io.imwrite_bgr(src, rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    rc = main(["-i", src, "--model_dir", str(tmp_path / "nope")])
    assert rc == 1


def test_cli_alpha_bicubic(tmp_path, rng):
    spec = ModelSpec.from_widths([1, 3, 1])
    model_dir = str(tmp_path / "models")
    _write_models(model_dir, spec)
    src = str(tmp_path / "rgba.png")
    rgba = rng.integers(0, 256, (12, 12, 4), dtype=np.uint8)
    w2x_io.imwrite_bgr(src, rgba)
    dst = str(tmp_path / "out.png")
    rc = main(["-i", src, "-o", dst, "-m", "scale", "--alpha", "bicubic",
               "--model_dir", model_dir])
    assert rc == 0
    out = w2x_io.imread_bgra(dst)
    assert out is not None and out.shape == (24, 24, 4)


def test_zoo_identity_roundtrip(tmp_path):
    from waifu2x_tpu.models.zoo import ensure_default_models
    from waifu2x_tpu.models.weights import load_model_json
    spec = ModelSpec.from_widths([1, 2, 1])
    made = ensure_default_models(str(tmp_path), spec)
    assert len(made) == 3
    params = load_model_json(str(tmp_path / "noise1_model.json"))
    ident = identity_params(spec)
    for p, q in zip(params, ident):
        np.testing.assert_array_equal(p["w"], q["w"])
    # idempotent
    assert ensure_default_models(str(tmp_path), spec) == []


def test_zoo_refreshes_stale_demo_copies(tmp_path):
    """A *_model.json previously copied from a demo must refresh when the
    demo file is newer (retrained weights reach users who already
    materialized the old copy); a user's own file (no demo sibling) is
    never touched."""
    import os
    import time

    from waifu2x_tpu.models.weights import load_model_json, save_model_json
    from waifu2x_tpu.models.zoo import ensure_default_models

    spec = ModelSpec.from_widths([1, 2, 1])
    ensure_default_models(str(tmp_path), spec)      # identity placeholders
    # ship a "retrained demo" for noise1, newer than the materialized copy
    new_params = identity_params(spec)
    new_params = tuple({"w": p["w"] * 2.0, "b": p["b"]} for p in new_params)
    save_model_json(str(tmp_path / "noise1_demo.json"), new_params)
    future = time.time() + 60
    os.utime(str(tmp_path / "noise1_demo.json"), (future, future))
    made = ensure_default_models(str(tmp_path), spec)
    assert made == [str(tmp_path / "noise1_model.json")]
    got = load_model_json(str(tmp_path / "noise1_model.json"))
    np.testing.assert_array_equal(got[0]["w"], new_params[0]["w"])
    # scale2.0x_model.json has no demo sibling here: untouched
    assert ensure_default_models(str(tmp_path), spec) == []


def test_cli_multiple_inputs(tmp_path, rng):
    spec = ModelSpec.from_widths([1, 3, 1])
    model_dir = str(tmp_path / "models")
    _write_models(model_dir, spec)
    srcs = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.png")
        w2x_io.imwrite_bgr(p, rng.integers(0, 256, (10 + 2 * i, 12, 3),
                                           dtype=np.uint8))
        srcs.append(p)
    rc = main(["-i", *srcs, "-m", "scale", "--model_dir", model_dir])
    assert rc == 0
    # repeated -i accumulates too (argparse last-wins would silently
    # drop all but the last input — a real data-loss footgun)
    import itertools
    rep = list(itertools.chain.from_iterable(("-i", s) for s in srcs))
    rc = main([*rep, "-m", "scale", "--model_dir", model_dir])
    assert rc == 0
    for i in range(3):
        out = str(tmp_path / f"f{i}(scale)(x2.000000).png")
        assert w2x_io.imread_bgr(out).shape == ((10 + 2 * i) * 2, 24, 3)
    # -o with multiple inputs is rejected
    rc = main(["-i", *srcs, "-o", str(tmp_path / "x.png"),
               "--model_dir", model_dir])
    assert rc == 1


def test_cli_device_cpu(tmp_path, rng):
    # --device cpu must convert with no TPU attached (tests already run on
    # the CPU platform; this pins the flag's plumbing end-to-end)
    spec = ModelSpec.from_widths([1, 3, 1])
    model_dir = str(tmp_path / "models")
    _write_models(model_dir, spec)
    src = str(tmp_path / "input.png")
    w2x_io.imwrite_bgr(src, rng.integers(0, 256, (20, 24, 3), dtype=np.uint8))
    dst = str(tmp_path / "out.png")
    rc = main(["-i", src, "-o", dst, "--model_dir", model_dir,
               "--device", "cpu", "-m", "scale"])
    assert rc == 0
    assert w2x_io.imread_bgr(dst).shape == (40, 48, 3)


def test_zoo_prefers_shipped_demo_weights(tmp_path):
    """ensure_default_models must materialize missing *_model.json from the
    shipped TPU-trained *_demo.json (identity placeholders only as a last
    resort), so a fresh clone converts with real weights."""
    import json
    import numpy as np
    from waifu2x_tpu.models.zoo import ensure_default_models
    from waifu2x_tpu.models.weights import save_model_json
    from waifu2x_tpu.models.srcnn import ModelSpec
    from waifu2x_tpu.models import init_params
    import jax

    spec = ModelSpec.from_widths([1, 4, 4, 1])
    trained = init_params(jax.random.PRNGKey(3), spec)
    save_model_json(str(tmp_path / "noise1_demo.json"), trained)
    made = ensure_default_models(str(tmp_path), spec)
    assert len(made) == 3
    demo = json.load(open(tmp_path / "noise1_demo.json"))
    got = json.load(open(tmp_path / "noise1_model.json"))
    assert got == demo  # copied from the demo, not an identity placeholder
    ident = json.load(open(tmp_path / "noise2_model.json"))
    assert ident != demo  # no demo shipped for this one -> placeholder


def test_cli_alpha_flatten(tmp_path, rng):
    spec = ModelSpec.from_widths([1, 3, 1])
    model_dir = str(tmp_path / "models")
    _write_models(model_dir, spec)
    src = str(tmp_path / "rgba.png")
    rgba = rng.integers(0, 256, (12, 12, 4), dtype=np.uint8)
    w2x_io.imwrite_bgr(src, rgba)
    dst = str(tmp_path / "out.png")
    rc = main(["-i", src, "-o", dst, "-m", "scale", "--alpha", "flatten",
               "--model_dir", model_dir])
    assert rc == 0
    out = w2x_io.imread_bgr(dst)
    assert out.shape == (24, 24, 3)  # flattened: no alpha in the output
    # the converted image is the conversion OF the flattened input
    flat = str(tmp_path / "flat.png")
    w2x_io.imwrite_bgr(flat, w2x_io.flatten_white(rgba))
    dst2 = str(tmp_path / "out2.png")
    rc = main(["-i", flat, "-o", dst2, "-m", "scale",
               "--model_dir", model_dir])
    assert rc == 0
    assert np.array_equal(out, w2x_io.imread_bgr(dst2))
