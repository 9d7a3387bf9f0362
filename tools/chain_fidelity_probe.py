"""noise_scale chain fidelity decomposition (VERDICT r2 weak #4 / next #6).

The edge_error_probe showed the bf16 error on random content is spatially
UNIFORM — not border-concentrated — so the fix must reduce global rounding,
not restitch edges. Candidates, measured here on pure-random content
(interpret mode, CPU; PSNR of final u8 BGR vs the f32-highest chain):

  bf/bf     noise bf16 kernel -> scale bf16 kernel       [shipping CLI]
  f32/bf    noise f32 kernel  -> scale bf16 kernel       [+~20% chain cost]
  bf/f32    noise bf16        -> scale f32               [+~80% cost]
  f32/f32   both f32 kernels                             [~2x cost]

Usage: python tools/chain_fidelity_probe.py [size=128]
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from waifu2x_tpu.config import Config
from waifu2x_tpu.models.srcnn import WAIFU2X_7LAYER, init_params
from waifu2x_tpu.ops.color import saturate_cast_u8, yuv_to_bgr, bgr_to_yuv, u8_to_unit_f32
from waifu2x_tpu.pipeline import (
    Converter,
    FastStack,
    noise_batch_fast,
    scale2x_batch_fast,
)
from waifu2x_tpu.utils.metrics import psnr

S = int(sys.argv[1]) if len(sys.argv) > 1 else 128
rng = np.random.default_rng(0)
img = rng.integers(0, 256, (S, S, 3), dtype=np.uint8)
from waifu2x_tpu.models.weights import load_model_json
noise_p = load_model_json("models/noise1_demo.json")
scale_p = load_model_json("models/scale2.0x_demo.json")

# f32-highest reference chain via the XLA path
cfg_ref = Config(mode="noise_scale", precision="highest",
                 use_pallas=False)
ref = Converter(cfg_ref, noise_p, scale_p).process_bgr_u8(img)

yuv = bgr_to_yuv(u8_to_unit_f32(jnp.asarray(img)))


def chain(noise_dtype, scale_dtype):
    fn = FastStack.build(noise_p, scale_input=False, interpret=True,
                         dtype=noise_dtype)
    fs = FastStack.build(scale_p, scale_input=True, interpret=True,
                         dtype=scale_dtype)
    y1 = noise_batch_fast(yuv[None], fn)
    out = scale2x_batch_fast(y1, fs)[0]
    return np.asarray(saturate_cast_u8(yuv_to_bgr(out)))


for name, dn, ds in (("bf/bf", jnp.bfloat16, jnp.bfloat16),
                     ("f32/bf", jnp.float32, jnp.bfloat16),
                     ("bf/f32", jnp.bfloat16, jnp.float32),
                     ("f32/f32", jnp.float32, jnp.float32)):
    got = chain(dn, ds)
    print(f"{name:8s}: {psnr(got.astype(np.float64), ref.astype(np.float64)):6.2f} dB",
          flush=True)
