"""Where does the bf16 fused-path error live spatially? (VERDICT r2 weak #4)

Runs the fused scale step (interpret mode, bf16) and the f32 XLA reference
on a pure-random plane — the adversarial content class that measured
49.36 dB through the CLI at 512^2 — and reports Y-plane RMS error by
distance to the nearest image edge, plus the PSNR that would result from
replacing an N-px border ring with exact values.

CPU-safe (interpret mode); use modest sizes.
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
from waifu2x_tpu.ops.convstack import convert_plane
from waifu2x_tpu.ops.resize import NEAREST, resize
from waifu2x_tpu.pipeline import FastStack

S = int(sys.argv[1]) if len(sys.argv) > 1 else 160
rng = np.random.default_rng(0)
params = init_params(jax.random.PRNGKey(0), WAIFU2X_7LAYER)
fast = FastStack.build(params, scale_input=True, interpret=True)

ylow = rng.random((S, S), np.float32)
# f32 reference: nearest-2x + conv stack (monolithic, highest precision)
y2 = resize(jnp.asarray(ylow), (2 * S, 2 * S), NEAREST)
ref = np.asarray(convert_plane(y2, params, precision="highest"))

# fused bf16 path (s2d layout -> interleave)
from waifu2x_tpu.ops.s2d import d2s

got = np.asarray(d2s(fast.scale(jnp.asarray(ylow)[None])))[0, :, :, 0]
assert got.shape == ref.shape, (got.shape, ref.shape)

err = (got.astype(np.float64) - ref.astype(np.float64)) * 255.0
H = 2 * S
iy, ix = np.mgrid[0:H, 0:H]
d = np.minimum(np.minimum(iy, ix), np.minimum(H - 1 - iy, H - 1 - ix))
print(f"size {H}x{H}, overall rms {np.sqrt(np.mean(err**2)):.4f} "
      f"(PSNR {10*np.log10(255**2/np.mean(err**2)):.2f} dB)")
for lo, hi in ((0, 1), (1, 2), (2, 4), (4, 8), (8, 16), (16, 32), (32, 64),
               (64, 10 ** 9)):
    m = (d >= lo) & (d < hi)
    if not m.any():
        continue
    print(f"  edge-dist [{lo:3d},{hi if hi < 1e9 else H:3d}): "
          f"rms {np.sqrt(np.mean(err[m]**2)):8.4f}  max {np.abs(err[m]).max():8.3f}")
for b in (0, 2, 4, 8, 16, 32):
    m = d >= b
    mse = np.mean(err[m] ** 2)
    print(f"  if border {b:2d} px were exact: PSNR {10*np.log10(255**2/mse):.2f} dB")
