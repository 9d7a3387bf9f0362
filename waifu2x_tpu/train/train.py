"""JAX training loop — the TPU-native successor of the reference's
minibatch_adam.lua (appendix/waifu2x-nocuda/lib/minibatch_adam.lua:5-60)
and train settings (settings.lua:21-32: lr 2.5e-4, crop 128, epoch 200).

The C++ converter is inference-only; the Lua appendix holds the original
training stack. Here training is a pure jitted step (MSE criterion, optax
Adam), shardable over a ("dp", "sp") mesh: batch data-parallel over "dp" and
spatial width sharding over "sp" — GSPMD inserts the conv halo exchanges and
gradient reductions. (tp/pp/ep are deliberately absent: seven <=128-channel
conv layers have nothing to tensor- or pipeline-partition; SURVEY.md §2.)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from waifu2x_tpu.ops.convstack import conv_stack_valid
from waifu2x_tpu.utils.logging import get_logger

log = get_logger("train")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 0.00025   # settings.lua:28
    crop_size: int = 128             # settings.lua:29
    batch_size: int = 32             # minibatch_adam.lua:14 default
    epochs: int = 200                # settings.lua:31
    precision: str | None = "highest"
    # Optional cosine decay to `learning_rate * lr_min_ratio` over
    # `decay_steps` (0 = the reference's constant-lr Adam). The Lua
    # trainer has no schedule; decay measurably improves the final dB of
    # long runs, so the demo-weights trainer opts in (tools/train_demo.py).
    decay_steps: int = 0
    lr_min_ratio: float = 0.05
    # Optional linear lr warmup (0 = none). Only meaningful with decay.
    warmup_steps: int = 0
    # Optional exponential moving average of the params (0 = off). The
    # EMA weights are what long SR runs should ship: they average out the
    # tail-of-training SGD noise (Polyak averaging).
    ema_decay: float = 0.0
    # Optional global-norm gradient clipping (0 = off). Long runs at
    # healthy lr occasionally hit a pathological JPEG/crop batch whose
    # spike poisons Adam's moments for thousands of steps (measured:
    # round-4 pilot A lost 4 dB to one step-5k spike); clipping is the
    # cheap insurance.
    clip_norm: float = 0.0

    def make_optimizer(self) -> optax.GradientTransformation:
        opt = self._base_optimizer()
        if self.clip_norm > 0:
            return optax.chain(optax.clip_by_global_norm(self.clip_norm),
                               opt)
        return opt

    def _base_optimizer(self) -> optax.GradientTransformation:
        if self.decay_steps > 0:
            if self.warmup_steps > 0:
                sched = optax.warmup_cosine_decay_schedule(
                    0.0, self.learning_rate, self.warmup_steps,
                    self.decay_steps,
                    self.learning_rate * self.lr_min_ratio)
            else:
                sched = optax.cosine_decay_schedule(
                    self.learning_rate, self.decay_steps, self.lr_min_ratio)
            return optax.adam(sched)
        return optax.adam(self.learning_rate)


def loss_fn(params, x: jax.Array, y: jax.Array,
            precision: str | None = "highest") -> jax.Array:
    """MSE criterion on the valid output region (the Lua trainer's
    nn.MSECriterion over the offset-cropped target)."""
    pred = conv_stack_valid(x, params, precision=precision)
    return jnp.mean((pred - y) ** 2)


def make_train_step(optimizer: optax.GradientTransformation,
                    precision: str | None = "highest",
                    loss: Callable | None = None) -> Callable:
    """`loss(params, x, y, precision)` defaults to the MSE criterion;
    QAT / range-regularized finetunes pass their own (train/qat.py)."""
    _loss = loss or loss_fn

    @jax.jit
    def train_step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(
            lambda p: _loss(p, x, y, precision))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def make_sharded_train_step(mesh: Mesh,
                            optimizer: optax.GradientTransformation,
                            precision: str | None = "highest",
                            loss: Callable | None = None) -> Callable:
    """Train step jitted over a ("dp", "sp") mesh.

    Inputs are NHWC with N sharded over "dp" and W over "sp"; params and
    optimizer state are replicated. XLA/GSPMD partitions the valid convs
    spatially (halo exchange over ICI) and all-reduces the gradients.
    `loss` as in make_train_step (defaults to the MSE criterion)."""
    _loss = loss or loss_fn
    batch_sharding = NamedSharding(mesh, P("dp", None, "sp", None))
    # targets are valid-conv outputs (W - 2*offset): not generally divisible
    # by |sp|, so shard them on batch only; GSPMD reshards at the loss.
    target_sharding = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    @partial(jax.jit,
             in_shardings=(repl, repl, batch_sharding, target_sharding),
             out_shardings=(repl, repl, repl))
    def train_step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(
            lambda p: _loss(p, x, y, precision))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def train_loop(params, batches: Iterable, cfg: TrainConfig = TrainConfig(),
               mesh: Mesh | None = None, log_every: int = 50,
               eval_every: int = 0, eval_fn: Callable | None = None,
               loss: Callable | None = None):
    """Run Adam over an iterable of (x, y) NHWC batches; returns
    (params, losses) — or (params, losses, ema_params) when
    cfg.ema_decay > 0. Replaces minibatch_adam's feval/optim.adam loop.

    eval_fn(step, params, ema_params_or_None) is called every
    `eval_every` steps (and once at the end) when given — the hook long
    runs use to record a held-out steps-vs-dB curve and keep a
    best-so-far snapshot (tools/train_demo.py).

    Losses are accumulated as device scalars and fetched in chunks: a
    per-step float(loss) would force a host sync every step, capping the
    dispatch pipeline at depth 1 — through a remote-TPU relay (~3 ms per
    round trip) that serialization dominates small-model step time."""
    optimizer = cfg.make_optimizer()
    opt_state = optimizer.init(params)
    step = (make_sharded_train_step(mesh, optimizer, cfg.precision,
                                    loss=loss)
            if mesh is not None
            else make_train_step(optimizer, cfg.precision, loss=loss))
    ema = None
    if cfg.ema_decay > 0.0:
        d = cfg.ema_decay
        ema = params
        # separate tiny jitted dispatch (keeps the step fns' signatures
        # stable for their other callers); it rides the async queue
        ema_step = jax.jit(lambda e, p: jax.tree_util.tree_map(
            lambda ev, pv: ev * d + pv * (1.0 - d), e, p))
    losses: list[float] = []
    pending: list[jax.Array] = []

    def _drain():
        if pending:
            losses.extend(np.asarray(jnp.stack(pending)).tolist())
            pending.clear()

    last_eval = -1
    for i, (x, y) in enumerate(batches):
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x), jnp.asarray(y))
        if ema is not None:
            ema = ema_step(ema, params)
        pending.append(loss)
        if (i + 1) % log_every == 0:
            _drain()
            log.info("step %d  mse %.6f", i + 1,
                     np.mean(losses[-log_every:]))
        if eval_fn is not None and eval_every > 0 and (i + 1) % eval_every == 0:
            _drain()
            eval_fn(i + 1, params, ema)
            last_eval = i + 1
    _drain()
    if eval_fn is not None and len(losses) != last_eval:
        # honor the "once at the end" contract even when the step count
        # isn't a multiple of eval_every (or eval_every is 0)
        eval_fn(len(losses), params, ema)
    if ema is not None:
        return params, losses, ema
    return params, losses
