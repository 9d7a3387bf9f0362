"""Can the fused kernel's in-kernel u8/BGR tail (measured 1.49 ms/4f of
4-16-lane VPU work) move to a dense XLA post-pass?  The kernel emits Y in
s2d layout (stack_scale) and a separate jitted program does polyphase
bicubic U/V + YUV->BGR + saturate-cast at full 128-lane width (the phase
dim merged into width).

Variants:
  planar  -> [N, 3, h, 4w] u8 (pure dense; needs a new host interleave)
  cmajor  -> [N, h, w, 16] u8 (drop-in for d2s_host_cmajor; pays a minor-
             dim concatenate at the end)

Run on the TPU:  python tools/xla_tail_probe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from waifu2x_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
from waifu2x_tpu.ops import pallas_stack as ps
from waifu2x_tpu.ops import color as color_mod
from waifu2x_tpu.ops.resize import CUBIC, resize2x_phases
from waifu2x_tpu.pipeline import FastStack, _fused_step, _uv_phases_cmajor

params = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
fast = FastStack.build(params, scale_input=True)
rng = np.random.default_rng(0)
N, S = 4, 512
yuv = jnp.asarray(rng.random((N, S, S, 3), dtype=np.float32))
tile = (64, 128)
inv = color_mod._INV
off = color_mod._INV_OFF


def sync(a):
    return int(np.asarray(jnp.max(a.reshape(-1)[:8].astype(jnp.float32))))


def _dense_bgr(y_s2d, yuv):
    n, h, w, _ = yuv.shape
    ph = resize2x_phases(yuv[..., 1:3], CUBIC, h_axis=1)   # [n,h,w,2,4] f32
    y2 = y_s2d[:, :h, :w, :].astype(jnp.float32).reshape(n, h, w * 4)
    u2 = ph[..., 0, :].reshape(n, h, w * 4)
    v2 = ph[..., 1, :].reshape(n, h, w * 4)
    chans = []
    for c in range(3):
        val = (y2 * inv[c, 0] + u2 * inv[c, 1] + v2 * inv[c, 2]
               + off[c]) * jnp.float32(255.0)
        chans.append(jnp.clip(jnp.round(val), 0, 255).astype(jnp.uint8))
    return chans                                            # 3 x [n,h,4w]


@jax.jit
def tail_planar(y_s2d, yuv):
    return jnp.stack(_dense_bgr(y_s2d, yuv), axis=1)        # [n,3,h,4w]


@jax.jit
def tail_cmajor(y_s2d, yuv):
    n, h, w, _ = yuv.shape
    chans = [c.reshape(n, h, w, 4) for c in _dense_bgr(y_s2d, yuv)]
    chans.append(jnp.zeros_like(chans[0]))
    return jnp.concatenate(chans, axis=-1)                  # [n,h,w,16]


def step_planar(yuv):
    ys = ps.stack_scale(yuv[..., 0].astype(fast.dtype), fast.kp, fast.spec,
                        tile)
    return tail_planar(ys, yuv)


def step_cmajor(yuv):
    ys = ps.stack_scale(yuv[..., 0].astype(fast.dtype), fast.kp, fast.spec,
                        tile)
    return tail_cmajor(ys, yuv)


def step_cur(yuv):
    return _fused_step(yuv, fast.kp, tile, fast.spec, False, jnp.bfloat16)


# correctness: cmajor vs the current fused-u8 kernel
ref = np.asarray(step_cur(yuv))
got = np.asarray(step_cmajor(yuv))
d = np.abs(got[..., :12].astype(int) - ref[..., :12].astype(int))
print("cmajor vs fused-u8: maxdiff", d.max(), "fracdiff", (d != 0).mean())

for name, fn in (("cur", step_cur), ("planar", step_planar),
                 ("cmajor", step_cmajor)):
    out = fn(yuv)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(30):
        out = fn(yuv)
    sync(out)
    dt = (time.perf_counter() - t0) / 30 * 1e3
    mps = N * S * S * 4 / (dt * 1e3)
    print(f"{name:8s}: {dt:6.2f} ms per 4x512^2   {mps:6.1f} MP/s")
