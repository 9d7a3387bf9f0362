"""Fused Pallas TPU kernels for the polyphase 7-layer conv stack.

This is the performance core of the framework — the TPU replacement for the
reference's hot loop (modelHandler.cpp:117-159: 32,672 single-plane 3x3
filter2D passes per 512x512 block) and for XLA's generic conv lowering,
which runs this stack at ~45 MXU passes/px. The polyphase math (ops/s2d.py)
needs only ~23: every 3x3 layer becomes shift-and-matmul in space-to-depth
layout with the contraction dim packed to >=128 lanes.

ONE kernel fuses all 7 layers so activations never leave VMEM:

  layers 1-4:  xcol [N,.,.,16] -> X4 in a VMEM scratch [tr+3,.,256]
      L1 is a single 1x1 matmul over the precomputed 3x3 im2col of the raw
      LOW-RES plane (scale path; the nearest-2x upscale is algebraically
      folded away — see pack_l1_scale) or of the 4-lane s2d input (noise
      path). L2-L4 are 4-tap shift-matmuls with dense packed W2.

  layers 5-7:  X4 scratch -> Y in s2d layout [N,.,.,4] (or fused u8 BGR)
      L5/L6 use the phase-sparse decomposition (6 resp. 9 MXU passes/px,
      skipping the structural zeros of W2). L7 is the block-diagonal tap
      matmul + 0/1 selection matmul shift-sum.

(The stack originally ran as two kernels handing X4 off through HBM;
measurement showed a computed value stored into a pipelined HBM out block
costs ~1.5 ms/4 frames of serialized tail VPU time that a scratch store
does not — tools/l4_shift_probe.py — and the handoff round-trip was
1.26 GB per 16-frame batch. Single-kernel is bit-identical and faster.)

Tiling: 2-D spatial tiles on the s2d (= low-res) grid, batch in the grid.
Valid convs look "forward" only, so halos are one-sided: an output tile of
TAU rows needs TAU+6 input rows. The overlapping input window is assembled
in VMEM from four non-overlapping neighbor blocks of the 16-lane im2col
map (pipelined BlockSpec fetches). All matmuls run in bf16 with f32
accumulation on the MXU; cross-tap sums, bias and LeakyReLU(0.1) are f32.

Numerics and semantics are proven equal to the reference conv stack
(conv_stack_valid) via ops/s2d.py in tests/test_s2d.py and directly in
tests/test_pallas_stack.py (interpret mode on CPU; real kernels on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waifu2x_tpu.ops import s2d as s2d_ops

DEF_TILE = (64, 128)   # s2d-grid tile (rows, cols); rows are exact (no
#                        alignment), cols pay a +8 compute pad that amortises
#                        with width — (64, 128) measured fastest of the
#                        shapes that compile within the 128 MB VMEM
import os as _os

VMEM_LIMIT = int(_os.environ.get("W2X_VMEM_LIMIT_MB", "110")) * 1024 * 1024
# chip has 128 MB; the fused-u8 stack with quadrant-direct L1 needs
# ~101.3 MB scoped at the default tile. Env knob exists for tile probes.

ALIAS_SCRATCH = _os.environ.get("W2X_ALIAS_SCRATCH", "1") == "1"
# default ON (opt-out W2X_ALIAS_SCRATCH=0): activations time-share two
# scratch buffers (x1/x3/x5 in A, x2/x4 in B; ~9.5 MB less VMEM at the
# default tile). Bit-exact in interpret mode; process-level switch, set
# the env var before the first kernel trace. TPU A/B at the default
# tile: 193.6 vs 191.3 MP/s on scale512, PSNR 51.65 dB — the kernel is
# scoped-VMEM-pressure-bound, so the relief also speeds it up.

PAIR_DIRECT = _os.environ.get("W2X_PAIR_DIRECT", "") == "1"
# opt-in: store each phase-pair half (L3/L4) directly instead of through
# a concatenated temporary — time-neutral (measured), less scoped VMEM;
# exists for big-tile fit experiments (see block_pair).

_DIMSEM_OPTS = {
    "": None,
    "parallel": ("parallel", "parallel", "parallel"),
    "batch": ("parallel", "arbitrary", "arbitrary"),
    "rows": ("parallel", "parallel", "arbitrary"),
}
if _os.environ.get("W2X_DIMSEM", "") not in _DIMSEM_OPTS:
    raise ValueError(   # fail fast WITH the valid options, not a KeyError
        f"W2X_DIMSEM must be one of {sorted(_DIMSEM_OPTS)}, got "
        f"{_os.environ['W2X_DIMSEM']!r}")
DIMSEM = _DIMSEM_OPTS[_os.environ.get("W2X_DIMSEM", "")]
# A/B knob for the (n, ny, nx) grid's dimension_semantics (VERDICT r3
# weak #5: the L1/input-stage scheduling gap). Default None = Mosaic's
# own choice; round-1 measured all-parallel neutral at the old kernel.

XCOL_SAFE = _os.environ.get("W2X_XCOL_SAFE", "") == "1"
# opt-in: build the scale-path im2col by stacking taps on a MAJOR axis +
# one explicit transpose, sidestepping the XLA lanes-on-taps layout
# pathology that HBM-OOMs at some (batch, shape, tile) combos (see the
# NOTE in _xcol_scale). Costs ~one extra dense HBM round-trip.
XCOL_SAFE_PX = int(_os.environ.get("W2X_XCOL_SAFE_PX", 6_000_000))
# ... and the auto threshold (low-res px per dispatch, batch included)
# above which the safe build is used unconditionally (_xcol_scale).

UVP_MODE = _os.environ.get(
    "W2X_UVP", "bf16" if _os.environ.get("W2X_UVP_BF16", "") == "1"
    else "i16")
# The fused-u8 kernel's polyphase U/V input has 8 lanes, which Mosaic
# pads to a 128-lane vreg granule: at f32 x 2 buffering the window costs
# 16x its nominal bytes (~8 MB at the default tile — the single biggest
# input allocation). Narrowing it to 2 bytes halves that and the uvp HBM
# traffic. Modes (W2X_UVP env; W2X_UVP_BF16=1 kept as a bf16 alias):
#   i16 (default): fixed-point (v - 0.5) * 32767 over v in [-0.5, 1.5].
#       Step 3.05e-5 -> <=0.016/255 of output error — measurably zero dB
#       (U/V hold post-bicubic values in [0.5 +- ~0.52]); decoded to f32
#       by two VPU ops in-kernel. Same speed as bf16, none of its cost.
#   bf16: raw bf16 U/V — spends ~0.8 dB (50.82 vs 51.65 measured r1);
#       kept for A/B comparisons only.
#   f32: the round-1 default.

L6_WINO = _os.environ.get("W2X_L6_WINO", "0") == "1"
# opt-in (A/B experiment): run layer 6 (128->128, 54% of the stack's MXU
# passes) via F(2x2,3x3) Winograd in the transformed domain
# (s2d.pack_wino): 16 full-K MXU passes/cell instead of the phase-sparse
# 36 (the 2.25x classic reduction), paid for with VPU shift-adds for the
# 0/±1 input/output transforms and a 4-phase f32 accumulator scratch
# (~19 MB at the default tile). Bit-level: not identical (different
# summation order); equal within the usual f32 tolerance in interpret
# tests, PSNR-neutral in bf16 (B^T entries are exact, G only touches
# weights — same one-time rounding as the direct pack).

YOUT_F32 = _os.environ.get("W2X_YOUT", "") == "f32"
# opt-in A/B: emit the y-only (xla-tail) kernel output as f32 instead of
# bf16. Same [N,h,w,4] shape, but 16-byte HBM minor runs instead of 8 —
# the 4-lane minor dim makes this write scatter-ish, and the out-only
# probes (tools/stage_time.py) measure the run-length effect directly.
# The xla tail consumes either dtype (it upcasts to f32 anyway), so this
# also skips one rounding of the final Y.

L6_I8 = _os.environ.get("W2X_L6_I8", "0") == "1"
# opt-in A/B: run layer 6's matmuls (44% of the kernel's MXU rows — the
# in-situ layer probe tools/layer_time_probe.py) on the int8 MXU path,
# measured 1.63x the bf16 row rate at the exact L6 shape on this chip.
# x5 is quantized once per tile with a DYNAMIC scale (max|x5| -> sx =
# m/127, content-independent safety; the junk compute columns beyond wc
# are excluded from the max — they are written-but-meaningless, and col
# wc is uninitialized scratch), weights carry per-output-channel scales
# (w6q/w6s in pack_for_kernels), partial dots accumulate EXACTLY in
# int32 (K<=512 of +-127^2 stays < 2^24) and convert to f32 into the
# existing accumulator, so the only approximation is the single
# round-to-int8 of the activations/weights. Mutually exclusive with
# L6_WINO.

L7_FOLD = _os.environ.get("W2X_L7_FOLD", "1") == "1"
# default ON (opt-out W2X_L7_FOLD=0): fold the L7 selection into the tap
# matmul (s2d.pack_l7_fold) — zt carries lanes s*4+q accumulated over
# phases and the four f32 sel MXU passes become four 4-lane VPU
# shift-adds. Same partial products, different f32 summation order (not
# bit-identical to the sel path; equal within 1e-5 —
# tests/test_pallas_stack.py). TPU A/B: 191.3 vs 190.0 MP/s on scale512.


# ---------------------------------------------------------------------------
# packing (host, numpy) — kernel-shaped weight tensors
# ---------------------------------------------------------------------------

def pack_mid_kernel(w) -> tuple[np.ndarray, tuple]:
    """Phase-sparse mid layer (3x3, ci->co) packed for the kernel.

    Returns (wcat [4, 9*ci, co], spec): per output phase p=A*2+B, wcat[p]
    stacks the non-zero K-rows of all matmul groups; spec[p] is a tuple of
    (Dy, Dx, lane_slices, k0, klen) — concatenate the input lane slices
    ((lo, hi), ...) read at block shift (Dy, Dx) and multiply by
    wcat[p, k0:k0+klen]. Groups sharing a block shift are merged into one
    matmul (their operands have identical sublane offsets, so the lane
    concat is layout-free): for the 64->128 layer this packs the two
    64-lane runs into one full-K pass — 5 MXU passes/px instead of 6.
    """
    w = np.asarray(w, np.float32)
    ci, co = w.shape[2], w.shape[3]
    groups = s2d_ops.phase_groups(w)
    wcat = np.zeros((4, 9 * ci, co), np.float32)
    spec = []
    for p, glist in enumerate(groups):
        merged: dict[tuple[int, int], list] = {}
        for (Dy, Dx, lo, hi, wm) in glist:
            merged.setdefault((Dy, Dx), []).append((lo, hi, wm))
        k0 = 0
        entries = []
        for (Dy, Dx), runs in merged.items():
            klen = sum(hi - lo for lo, hi, _ in runs)
            ofs = k0
            for lo, hi, wm in runs:
                wcat[p, ofs:ofs + (hi - lo)] = wm
                ofs += hi - lo
            entries.append((Dy, Dx, tuple((lo, hi) for lo, hi, _ in runs),
                            k0, klen))
            k0 += klen
        assert k0 == 9 * ci
        spec.append(tuple(entries))
    return wcat, tuple(spec)


def pack_pair_kernel(w) -> tuple[np.ndarray, tuple]:
    """Phase-PAIR packing of one s2d layer (3x3, ci->co): compute both
    column phases B=0,1 of one row phase A in a single matmul.

    The dense packed W2 runs the MXU at 9/16 utilisation; per-phase sparsity
    recovers K-util but leaves N=co (<=64 for layers 3-4) underfilled.
    Pairing doubles N to 2co while the K-union over B grows only from 9ci
    to 12ci (75% K-util): layer 4 drops from 4 to 3 MXU passes/px, layer 3
    from 2 to 1.5.

    Returns (wpair [2, 12ci, 2co], spec): spec[A] = tuple of
    (Dy, Dx, lane_lo, lane_hi, k0, klen) — input lanes are contiguous
    because each (Dy, Dx) group uses a contiguous row-parity set with all
    column parities. Output lanes [A*2co, (A+1)*2co) follow the standard
    (a*2+b)*co + c order.
    """
    w = np.asarray(w, np.float32)
    ci, co = w.shape[2], w.shape[3]
    wpair = np.zeros((2, 12 * ci, 2 * co), np.float32)
    spec = []
    for A in range(2):
        ymap: dict[int, dict[int, int]] = {0: {}, 1: {}}
        for dy in range(3):
            ymap[(A + dy) // 2][(A + dy) % 2] = dy
        k0 = 0
        entries = []
        for Dy in (0, 1):
            for Dx in (0, 1):
                a_set = sorted(ymap[Dy])
                if not a_set:
                    continue
                lo = a_set[0] * 2 * ci
                hi = (a_set[-1] + 1) * 2 * ci
                klen = hi - lo
                for a in a_set:
                    dy = ymap[Dy][a]
                    for b in (0, 1):
                        krow = k0 + (a - a_set[0]) * 2 * ci + b * ci
                        for B in (0, 1):
                            dx = 2 * Dx + b - B
                            if 0 <= dx < 3:
                                wpair[A, krow:krow + ci, B * co:(B + 1) * co] \
                                    = w[dy, dx]
                entries.append((Dy, Dx, lo, hi, k0, klen))
                k0 += klen
        assert k0 == 12 * ci
        spec.append(tuple(entries))
    return wpair, tuple(spec)


def pack_for_kernels(params, scale_input: bool) -> tuple[dict, tuple]:
    """Pack a 7-layer pytree into the arrays the Pallas kernels consume.

    Returns (arrays, static_spec). arrays values are numpy f32; cast/upload
    once per model via `prep_params`.
    """
    packed = s2d_ops.pack_stack(params, scale_input)
    w = [np.asarray(p["w"], np.float32) for p in params]
    l1 = np.zeros((16, 128), np.float32)              # K padded to 16 lanes
    l1[: packed["l1"].shape[0]] = packed["l1"]
    arrays = {
        "l1": l1, "b1": packed["b1"][None],
        "w2a": packed["w2"][0]["w"].reshape(4, 128, 128),
        "b2a": packed["w2"][0]["b"][None],
        "b2b": packed["w2"][1]["b"][None],
        "b2c": packed["w2"][2]["b"][None],
        "b5": packed["mid"][0]["b"][None],
        "b6": packed["mid"][1]["b"][None],
        "l7_blk": packed["l7_blk"], "l7_sel": packed["l7_sel"],
        "l7_blk2": packed["l7_blk2"],
        "b7": np.asarray(packed["b7"], np.float32).reshape(1, 1),
    }
    arrays["w2b"], spec3 = pack_pair_kernel(w[2])
    arrays["w2c"], spec4 = pack_pair_kernel(w[3])
    arrays["w5"], spec5 = pack_mid_kernel(w[4])
    arrays["w6"], spec6 = pack_mid_kernel(w[5])
    arrays["w6w"] = s2d_ops.pack_wino(w[5])     # Winograd-domain L6
    # int8 L6 (L6_I8): symmetric per-output-channel weight quantization of
    # the phase-sparse pack; w6s holds the per-(phase, channel) dequant
    # scales (the activation scale is dynamic, computed in-kernel)
    w6 = arrays["w6"]                           # [4, 1152, 128] f32
    w6s = np.maximum(np.abs(w6).max(axis=1), 1e-12) / 127.0   # [4, 128]
    arrays["w6q"] = np.clip(np.round(w6 / w6s[:, None, :]),
                            -127, 127).astype(np.int8)
    arrays["w6s"] = w6s.astype(np.float32)
    return arrays, (spec3, spec4, spec5, spec6)


def prep_params(params, scale_input: bool, dtype=jnp.bfloat16):
    """Device-ready kernel params: (dict of jax arrays, static spec).
    Biases stay f32 (accumulation dtype); weights cast to `dtype`."""
    arrays, spec = pack_for_kernels(params, scale_input)
    out = {}
    for k, v in arrays.items():
        if k == "w6q":                                 # int8 stays int8
            out[k] = jnp.asarray(v, jnp.int8)
            continue
        keep_f32 = (k.startswith("b") or k == "l7_sel"  # sel multiplies the
                    or k == "w6s")                      # f32 tap partials
        out[k] = jnp.asarray(v, jnp.float32 if keep_f32 else dtype)
    return out, spec


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------

def _dot3(x, w, out_dtype=jnp.float32):
    """[h, w, K] @ [K, N] -> [h, w, N] on the MXU. Mosaic only supports
    32-bit matmul accumulators, so the dot is always f32 and any narrower
    out_dtype is a post-cast."""
    out = jax.lax.dot_general(
        x, w, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out if out_dtype == jnp.float32 else out.astype(out_dtype)


def _leaky(x):
    return jnp.maximum(x, 0) + jnp.float32(0.1) * jnp.minimum(x, 0)


def _stack_body(tr, tc, cdtype, accdt, spec, fuse_u8, l7_fold, l6_wino,
                l6_i8, narrow, dense_out, upto, xa, xb, xc, xd, l1_ref,
                b1_ref, w2a_ref, b2a_ref,
                w2b_ref, b2b_ref, w2c_ref, b2c_ref, w5_ref, b5_ref, w6_ref,
                b6_ref, blk_ref, sel_ref, blk2_ref, b7_ref, *rest):
    """The whole 7-layer stack as ONE kernel body (w6w_ref present iff
    l6_wino, uvp_ref present iff fuse_u8). Fusing K1+K2 keeps the X4
    handoff in a VMEM scratch: storing a computed value into a pipelined
    HBM out block costs ~1.5 ms per 4 frames of serialized VPU time at the
    body's tail (measured, tools/l4_shift_probe.py) and the round-trip was
    1.26 GB per 16-frame batch; scratch stores run at model speed."""
    if l6_wino:   # the Winograd L6 weights ride along only when used —
        #           the default config otherwise keeps ~512 KB of dead
        #           VMEM resident in a kernel with tight fit margins
        w6w_ref, *rest = rest
    else:
        w6w_ref = None
    if l6_i8:     # int8 L6: w6_ref IS the int8 weights (same slot/shape —
        #           no dead bf16 copy rides along); only the per-channel
        #           dequant scale vector is an extra operand
        w6s_ref, *rest = rest
    else:
        w6s_ref = None
    if fuse_u8:
        uvp_ref, out_ref, *scr = rest
    else:
        out_ref, *scr = rest
    yacc = scr.pop() if l6_wino else None
    x5q = scr.pop() if l6_i8 else None
    if len(scr) == 8:
        xin, x1, x2, x3, x4, x5, zt, acc = scr
    elif len(scr) == 7:         # l1_direct: no xin assembly scratch
        xin = None
        x1, x2, x3, x4, x5, zt, acc = scr
    else:                       # l1_direct + aliased scratch: activations
        # time-share two buffers (lifetimes alternate A/B down the stack:
        # each layer reads one buffer and writes the other, so x1/x3/x5
        # can overlay in A and x2/x4 in B — saves ~40% activation VMEM)
        xin = None
        bufa, bufb, zt, acc = scr
        x1 = bufa.at[:, :, 0:128]
        x2 = bufb.at[0:tr + 5, :, 0:128]
        x3 = bufa.at[0:tr + 4, :, 0:256]
        x4 = bufb.at[0:tr + 3, :, 0:256]
        x5 = bufa.at[0:tr + 2, :, 0:512]
    spec3, spec4, spec5, spec6 = spec
    # Mosaic alignment: the sublane (second-minor) dim of every VMEM slice
    # and store must be a multiple of 8, so all buffers carry tau+16 columns
    # and compute runs at width tau+8; the columns beyond the valid tau are
    # padding/garbage that downstream stages never read (the valid-conv halo
    # is one-sided, so junk only ever propagates rightward within the pad
    # region). Row (untiled) dims are exact.
    #
    # The overlapping (tr+6, tc+16) input window is assembled from four
    # NON-overlapping grid blocks of the im2col array (this tile, right
    # neighbor, below, below-right) so the fetches ride the automatically
    # double-buffered BlockSpec pipeline instead of a serial DMA, and the
    # array keeps its compact 16-lane form (a manual HBM DMA would force
    # 128-lane alignment = 8x the traffic).
    wc = tc + 8
    if upto == 0:
        # forensic input-stage floor (tools/layer_time_probe.py): touch
        # all four window fetches (so none is elided) and store a 4-lane
        # combine — BEFORE the L1 block, so no L1 matmul or x1 store
        # runs. The delta upto1 - upto0 is L1's true in-situ cost; upto0
        # itself is the per-cell fetch + out-store floor the full kernel
        # must also pay (or hide).
        val = xa[0][0:tr, 0:tc, 0:4].astype(jnp.float32)
        s = jnp.float32(0)
        for ref in (xb, xc, xd):
            s = s + jnp.sum(ref[0][:, :, 0:1].astype(jnp.float32))
        out_ref[0] = (val + s).astype(out_ref.dtype)
        return
    if xin is None:
        # L1 applied DIRECTLY to the four window quadrants: the 16-lane
        # im2col blocks never get copied into a contiguous scratch.
        # 16-lane vregs are 1/8 utilized, so the assembly copies cost ~8x
        # their nominal bytes in vreg ops; routing each quadrant through
        # its own L1 matmul writes only the 128-lane x1 (measured: -1.5
        # ms / 4 frames at (64,128), tools/noxin_probe.py).
        b1v = b1_ref[0].astype(accdt)

        def l1q(q):
            return _leaky(_dot3(q, l1_ref[:], accdt) + b1v).astype(cdtype)

        # `narrow`: the right/below/diag inputs arrive as stripe blocks
        # (16 cols / 8 rows) instead of full neighbor tiles — ~4x less
        # input DMA and window VMEM (the corner slivers were fetched whole)
        x1[0:tr, 0:tc, :] = l1q(xa[0])
        x1[0:tr, tc:tc + 16, :] = l1q(xb[0] if narrow else xb[0][:, 0:16, :])
        x1[tr:tr + 6, 0:tc, :] = l1q(xc[0][0:6, :, :])
        x1[tr:tr + 6, tc:tc + 16, :] = l1q(
            xd[0][0:6, :, :] if narrow else xd[0][0:6, 0:16, :])
    else:
        xin[0:tr, 0:tc, :] = xa[0]
        xin[0:tr, tc:tc + 16, :] = xb[0] if narrow else xb[0][:, 0:16, :]
        xin[tr:tr + 6, 0:tc, :] = xc[0][0:6, :, :]
        xin[tr:tr + 6, tc:tc + 16, :] = (
            xd[0][0:6, :, :] if narrow else xd[0][0:6, 0:16, :])
        # L1: one matmul over the 16-lane im2col
        x1[:] = _leaky(_dot3(xin[:], l1_ref[:], accdt)
                       + b1_ref[0].astype(accdt)).astype(cdtype)

    # `upto`: forensic truncation (tools/layer_time_probe.py) — stop after
    # layer k and emit a 4-lane slice of its activation, IN SITU: the same
    # specs, scratches and VMEM pressure as the production kernel, so the
    # deltas between consecutive k attribute real per-layer time. None in
    # production.
    def _trunc(buf):
        out_ref[0] = buf[0:tr, 0:tc, 0:4].astype(out_ref.dtype)

    if upto == 1:
        return _trunc(x1)
    # L2-L4: 4-tap shift-matmuls with dense packed W2. Tap partials
    # accumulate IN PLACE into one f32 scratch — accumulating by value made
    # Mosaic hold every partial product alive at once (>100 MB of scoped
    # VMEM at useful tile sizes).
    def block4(src, w_ref, b_ref, rows):
        co = w_ref.shape[2]
        a = acc.at[0:rows, 0:wc, 0:co]
        a[...] = _dot3(src[0:rows, 0:wc, :], w_ref[0], accdt)
        a[...] += _dot3(src[0:rows, 1:wc + 1, :], w_ref[1], accdt)
        a[...] += _dot3(src[1:rows + 1, 0:wc, :], w_ref[2], accdt)
        a[...] += _dot3(src[1:rows + 1, 1:wc + 1, :], w_ref[3], accdt)
        return _leaky(a[...] + b_ref[0].astype(accdt)).astype(cdtype)

    x2[:, 0:wc, :] = block4(x1, w2a_ref, b2a_ref, tr + 5)
    if upto == 2:
        return _trunc(x2)

    # L3-L4: phase-pair matmuls (see pack_pair_kernel) — N packed to 2co,
    # K-union 12ci. Default: both row-parity halves are stored in ONE
    # full-lane write. PAIR_DIRECT stores each half as it finishes —
    # time-measured exactly 0 in the full kernel (downstream absorbs it),
    # but it skips the concatenated temporary, lowering the scoped-VMEM
    # high-water mark for big-tile fits; the co2=128 halves are full
    # lane-granule slices, so the partial store is not a masked RMW.
    def block_pair(src, w_ref, b_ref, pspec, rows, dst):
        co2 = w_ref.shape[2]
        vals = []
        for A, entries in enumerate(pspec):
            a = acc.at[0:rows, 0:wc, 0:co2]
            for g, (Dy, Dx, lo, hi, k0, klen) in enumerate(entries):
                part = _dot3(src[Dy:Dy + rows, Dx:Dx + wc, lo:hi],
                             w_ref[A, k0:k0 + klen, :], accdt)
                if g == 0:
                    a[...] = part
                else:
                    a[...] += part
            val = _leaky(a[...] + b_ref[0, A * co2:(A + 1) * co2]
                         .astype(accdt)).astype(cdtype)
            if PAIR_DIRECT:
                dst[:, 0:wc, A * co2:(A + 1) * co2] = val
            else:
                vals.append(val)
        if not PAIR_DIRECT:
            dst[:, 0:wc, :] = jnp.concatenate(vals, axis=-1)

    block_pair(x2, w2b_ref, b2b_ref, spec3, tr + 4, x3)
    if upto == 3:
        return _trunc(x3)
    block_pair(x3, w2c_ref, b2c_ref, spec4, tr + 3, x4)
    if upto == 4:
        return _trunc(x4)

    # L5: phase-sparse mid layer out of the X4 scratch
    _mid_sparse(x4, w5_ref, b5_ref, spec5, tr + 2, wc, 128, cdtype, x5, acc)
    if upto == 5:
        return _trunc(x5)
    # L6 fused with L7's block-diagonal tap matmul, one output phase at a
    # time: the full 512-lane X6 never exists (VMEM), and the tap partials
    # stay f32 (zt is the only intermediate the XLA path doesn't round to
    # bf16 — keeping it f32 preserves the stack's 54+ dB fidelity).
    rows = tr + 1

    def l7_tap(p, x6p):
        if l7_fold:
            # tap partials land directly on output lanes s*4+q (see
            # s2d.pack_l7_fold), summed over phases in the f32 scratch
            part = _dot3(x6p, blk2_ref[p * 128:(p + 1) * 128, :])
            if p == 0:
                zt[:, 0:wc, :] = part.astype(zt.dtype)
            else:
                zt[:, 0:wc, :] += part.astype(zt.dtype)
        else:
            zt[:, 0:wc, p * 16:(p + 1) * 16] = _dot3(
                x6p, blk_ref[p * 128:(p + 1) * 128, p * 16:(p + 1) * 16]
            ).astype(zt.dtype)

    if l6_wino:
        # L6 in the Winograd F(2x2,3x3) domain (s2d.pack_wino): V[p] is a
        # 4-term signed shift-add of x5's phase lane-blocks (B^T entries
        # 0/±1 — exact in bf16), M[p] = V @ U[p] is ONE full-K MXU pass
        # (16 total vs the phase-sparse 36), and the separable output
        # transform (A^T ⊗ A^T) streams M into the 4 output phases of the
        # f32 yacc scratch with 12 RMW passes.
        from waifu2x_tpu.ops.s2d import _WINO_AT, _WINO_BT_TAPS
        written = [False] * 4
        for py in range(4):
            ms = []
            for px in range(4):
                v = None
                for (ty, sy) in _WINO_BT_TAPS[py]:
                    for (tx, sx) in _WINO_BT_TAPS[px]:
                        lb = ((ty % 2) * 2 + (tx % 2)) * 128
                        t = x5[ty // 2:ty // 2 + rows,
                               tx // 2:tx // 2 + wc, lb:lb + 128]
                        if sy * sx < 0:
                            v = -t if v is None else v - t
                        else:
                            v = t if v is None else v + t
                ms.append(_dot3(v, w6w_ref[py * 4 + px], jnp.float32))
            nb0 = ms[0] + ms[1] + ms[2]          # A^T row 0 = [1, 1, 1, 0]
            nb1 = ms[1] - ms[2] - ms[3]          # A^T row 1 = [0, 1,-1,-1]
            for A in (0, 1):
                ca = _WINO_AT[A][py]
                if ca == 0.0:
                    continue
                for B, nb in ((0, nb0), (1, nb1)):
                    q = A * 2 + B
                    blk_q = yacc.at[0:rows, 0:wc, q * 128:(q + 1) * 128]
                    val = nb if ca > 0 else -nb
                    if written[q]:
                        blk_q[...] += val
                    else:
                        blk_q[...] = val
                        written[q] = True
        for q in range(4):
            x6q = _leaky(yacc[0:rows, 0:wc, q * 128:(q + 1) * 128]
                         + b6_ref[0, q * 128:(q + 1) * 128]).astype(cdtype)
            l7_tap(q, x6q)
    elif l6_i8:
        # int8 L6 (see L6_I8): quantize x5 once with a per-tile dynamic
        # scale, run the same phase-sparse passes on the int8 MXU (1.63x
        # the bf16 row rate measured at this exact shape), accumulate
        # int32-exact per group and dequantize into the f32 acc.
        # Scale region: columns >= tc+5 of x5 are poisoned by the unwritten
        # scratch cols >= wc propagating leftward one col per layer (NaN in
        # interpret mode, nondeterministic stale bytes on hardware), and
        # only cols < tc+2 influence valid output. Reduce over exactly
        # [0, tc+2) so the scale depends only on influential activations —
        # the pad-halo cols [tc+2, tc+4) are deterministic but meaningless
        # and would otherwise inflate sx.
        m = jnp.max(jnp.abs(x5[0:tr + 2, 0:tc + 2, :].astype(jnp.float32)))
        sx = jnp.maximum(m, jnp.float32(1e-8)) * jnp.float32(1.0 / 127.0)
        x5q[:, 0:wc, :] = jnp.clip(
            jnp.round(x5[0:tr + 2, 0:wc, :].astype(jnp.float32)
                      * (jnp.float32(1.0) / sx)),
            -127, 127).astype(jnp.int8)
        for p, entries in enumerate(spec6):
            a = acc.at[0:rows, 0:wc, 0:128]
            sv = sx * w6s_ref[p]                        # [128] f32 dequant
            for g, (Dy, Dx, lanes, k0, klen) in enumerate(entries):
                part = jax.lax.dot_general(
                    _gather_k(x5q, rows, wc, Dy, Dx, lanes),
                    w6_ref[p, k0:k0 + klen, :],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                if g == 0:
                    a[...] = part
                else:
                    a[...] += part
            x6p = _leaky(a[...] * sv
                         + b6_ref[0, p * 128:(p + 1) * 128].astype(accdt)
                         ).astype(cdtype)
            l7_tap(p, x6p)
    else:
        for p, entries in enumerate(spec6):
            a = acc.at[0:rows, 0:wc, 0:128]
            for g, (Dy, Dx, lanes, k0, klen) in enumerate(entries):
                part = _dot3(_gather_k(x5, rows, wc, Dy, Dx, lanes),
                             w6_ref[p, k0:k0 + klen, :], accdt)
                if g == 0:
                    a[...] = part
                else:
                    a[...] += part
            x6p = _leaky(a[...]
                         + b6_ref[0, p * 128:(p + 1) * 128].astype(accdt)
                         ).astype(cdtype)
            l7_tap(p, x6p)
    if upto == 6:
        return _trunc(zt)
    y = None
    if l7_fold:
        # the 9-tap shift-sum is four 4-lane slice adds, no MXU pass
        for Dy in (0, 1):
            for Dx in (0, 1):
                s = Dy * 2 + Dx
                part = zt[Dy:Dy + tr, Dx:Dx + tc, s * 4:s * 4 + 4]
                y = part if y is None else y + part
    else:
        for Dy in (0, 1):
            for Dx in (0, 1):
                part = _dot3(
                    zt[Dy:Dy + tr, Dx:Dx + tc, :],
                    sel_ref[(Dy * 2 + Dx) * 64:(Dy * 2 + Dx + 1) * 64, :])
                y = part if y is None else y + part
    y = _leaky(y + b7_ref[0, 0])                   # f32 [tr, tc, 4 phases]
    if not fuse_u8:
        if dense_out:
            # phase-chunked DENSE out block (tr, 4*tc): lane-extract the four
            # phase planes and store at full 128-lane width. The 4-lane
            # (tr, tc, 4) out block costs ~0.76 ms/4f of store relayout at
            # the headline shape (tools/stage_time.py outonly vs outdense)
            # while the in-kernel extract+concat is ~0.1 (outcat) — the
            # phase un-chunking moves to one dense XLA transpose in the
            # tail, where it runs at full VPU width.
            out_ref[0] = jnp.concatenate(
                [y[:, :, q] for q in range(4)], axis=-1).astype(out_ref.dtype)
        else:
            out_ref[0] = y.astype(out_ref.dtype)
        return
    # Fused output: combine with the polyphase bicubic U/V (channel-major
    # lanes: u phases 0:4, v phases 4:8), apply OpenCV's YUV2RGB transform
    # on BGR-ordered data (the reference's R/B-swap quirk, ops/color.py) and
    # saturate-cast to u8 — all phases at once, no lane extracts. Output
    # lanes are channel-major too: (c*4 + phase), c in {B, G, R, pad}.
    from waifu2x_tpu.ops import color as _color
    inv = _color._INV
    off = _color._INV_OFF
    u = uvp_ref[0][:, :, 0:4].astype(jnp.float32)
    v = uvp_ref[0][:, :, 4:8].astype(jnp.float32)
    if uvp_ref.dtype == jnp.int16:
        # fixed-point uvp (see UVP_MODE): v = q / 32767 + 0.5
        s = jnp.float32(1.0 / 32767.0)
        half = jnp.float32(0.5)
        u = u * s + half
        v = v * s + half
    chans = []
    for c in range(3):
        val = y * inv[c, 0] + u * inv[c, 1] + v * inv[c, 2] + off[c]
        chans.append(val)
    chans.append(jnp.zeros_like(y))
    bgr = jnp.concatenate(chans, axis=-1) * jnp.float32(255.0)
    q = jnp.clip(jnp.round(bgr), 0, 255).astype(jnp.int32)
    out_ref[0] = q.astype(jnp.uint8)  # Mosaic: no direct f32->u8 cast


def _gather_k(src, rows, wc, Dy, Dx, lane_slices):
    """Operand for one merged group: lane slices at one block shift,
    concatenated along lanes (identical sublane offsets -> layout-free)."""
    parts = [src[Dy:Dy + rows, Dx:Dx + wc, lo:hi] for lo, hi in lane_slices]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _mid_sparse(src, w_ref, b_ref, spec, rows, wc, co, cdtype, dst, acc):
    """One phase-sparse mid layer: src [rows+1, >=wc+1, 4ci] -> dst
    [rows, wc, 4co] (written per-phase in lane chunks of co); `acc` is a
    reused scratch for the in-place group accumulation."""
    accdt = acc.dtype
    for p, entries in enumerate(spec):
        a = acc.at[0:rows, 0:wc, 0:co]
        for g, (Dy, Dx, lanes, k0, klen) in enumerate(entries):
            part = _dot3(_gather_k(src, rows, wc, Dy, Dx, lanes),
                         w_ref[p, k0:k0 + klen, :], accdt)
            if g == 0:
                a[...] = part
            else:
                a[...] += part
        dst[:, 0:wc, p * co:(p + 1) * co] = _leaky(
            a[...] + b_ref[0, p * co:(p + 1) * co].astype(accdt)
        ).astype(cdtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _full(shape, dtype=None):
    """Constant-index full-array VMEM spec (fetched once, reused)."""
    return pl.BlockSpec(shape, lambda n, i, j: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.partial(
    jax.jit,
    static_argnames=("tr", "tc", "ny", "nx", "spec", "interpret",
                     "acc_f32", "l1_direct", "l7_fold", "l6_wino",
                     "l6_i8", "dense_out", "upto"))
def _run_stack(xcol, kp, tr, tc, ny, nx, spec, interpret=False,
               acc_f32=True, uvp=None, l1_direct=True, l7_fold=None,
               l6_wino=None, l6_i8=None, dense_out=False, upto=None):
    """uvp=None: emit converted Y in s2d layout (cdtype) — or, with
    dense_out, phase-chunked dense layout [N, ny*tr, nx*4*tc] where within
    tile column j the chunks [j*4tc + q*tc : j*4tc + (q+1)*tc] hold phase q
    (see _stack_body; undo with dense_to_s2d). uvp given
    ([N, ny*tr, nx*tc, 8] channel-major U/V phases): K2 additionally fuses
    the YUV->BGR + saturate-cast and emits u8, lanes (c*4 + phase)."""
    if xcol.shape[-1] != 16:
        raise ValueError(f"xcol must have exactly 16 lanes (the kernel's "
                         f"input block depth), got {xcol.shape}")
    n = xcol.shape[0]
    cdtype = xcol.dtype
    accdt = jnp.float32 if acc_f32 else cdtype
    fuse_u8 = uvp is not None
    if l7_fold is None:
        l7_fold = L7_FOLD
    if l6_wino is None:
        l6_wino = L6_WINO
    if l6_i8 is None:
        l6_i8 = L6_I8
    if l6_i8 and l6_wino:
        raise ValueError("L6_I8 and L6_WINO are mutually exclusive")
    if l6_i8 and not acc_f32:
        # the int8 path dequantizes int32-exact partials into the shared
        # acc scratch as f32; a bf16 acc would mismatch the ref store dtype
        raise ValueError("L6_I8 requires acc_f32=True")

    def _xblk(di, dj):
        # The kernel assembles its overlapping (tr+6, tc+16) input window
        # from four non-overlapping im2col blocks: this tile + right/below/
        # diag neighbors — pipelined BlockSpec fetches, no manual DMA.
        return pl.BlockSpec((1, tr, tc, 16),
                            lambda nn, i, j, di=di, dj=dj:
                            (nn, i + di, j + dj, 0),
                            memory_space=pltpu.VMEM)

    # Stripe blocks for the three neighbor fetches: only the first 16 cols
    # of the right tile, 8 rows of the below tile and the 8x16 corner of
    # the diag tile are ever read, so fetch exactly those (block grids of
    # 16-col / 8-row stripes over the same array; index maps point at the
    # neighbor tile's leading stripe). Requires tr % 8 == tc % 16 == 0.
    # W2X_NARROW=0 kills the stripes (diagnostic knob; the stripes
    # measured +0.3% on scale512 and are innocent of the batch-8-1080p
    # HBM OOM, which was per-dispatch pixel volume — pipeline.BAND_PX).
    narrow = (tr % 8 == 0 and tc % 16 == 0
              and _os.environ.get("W2X_NARROW", "1") == "1")
    cb, rb = tc // 16, tr // 8
    # The x1/x3/x5 lane-overlay scratch aliasing is bf16-only: at f32 the
    # same scheme produced NaNs on real TPU (Mosaic misorders the
    # overlapping lane-slice lifetimes under (8,128) f32 tiling; bisected
    # on-chip — alias off is clean, and bf16 aliasing measures bit-exact
    # across tile shapes). f32 kernels take the separate-scratch path.
    alias = l1_direct and ALIAS_SCRATCH and cdtype == jnp.bfloat16

    def _xblk_right():
        return pl.BlockSpec((1, tr, 16, 16),
                            lambda nn, i, j: (nn, i, (j + 1) * cb, 0),
                            memory_space=pltpu.VMEM)

    def _xblk_below():
        return pl.BlockSpec((1, 8, tc, 16),
                            lambda nn, i, j: (nn, (i + 1) * rb, j, 0),
                            memory_space=pltpu.VMEM)

    def _xblk_diag():
        return pl.BlockSpec((1, 8, 16, 16),
                            lambda nn, i, j: (nn, (i + 1) * rb,
                                              (j + 1) * cb, 0),
                            memory_space=pltpu.VMEM)

    uvp_specs = []
    uvp_args = []
    if fuse_u8:
        uvp_specs = [pl.BlockSpec((1, tr, tc, 8),
                                  lambda nn, i, j: (nn, i, j, 0),
                                  memory_space=pltpu.VMEM)]
        uvp_args = [uvp]
        out_shape = jax.ShapeDtypeStruct((n, ny * tr, nx * tc, 16), jnp.uint8)
    elif dense_out:
        out_shape = jax.ShapeDtypeStruct(
            (n, ny * tr, nx * 4 * tc),
            jnp.float32 if YOUT_F32 else cdtype)
    else:
        out_shape = jax.ShapeDtypeStruct(
            (n, ny * tr, nx * tc, 4),
            jnp.float32 if YOUT_F32 else cdtype)
    if upto is not None:                    # forensic truncation: 4-lane
        out_shape = jax.ShapeDtypeStruct(   # slice of layer `upto`'s
            (n, ny * tr, nx * tc, 4), cdtype)   # activation
        dense_out = False
    if dense_out and not fuse_u8:
        out_spec = pl.BlockSpec((1, tr, 4 * tc), lambda nn, i, j: (nn, i, j),
                                memory_space=pltpu.VMEM)
    else:
        out_spec = pl.BlockSpec((1, tr, tc, out_shape.shape[-1]),
                                lambda nn, i, j: (nn, i, j, 0),
                                memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_stack_body, tr, tc, cdtype, accdt, spec, fuse_u8,
                          l7_fold, l6_wino, l6_i8, narrow,
                          dense_out and not fuse_u8, upto),
        grid=(n, ny, nx),
        in_specs=[
            _xblk(0, 0),
            _xblk_right() if narrow else _xblk(0, 1),
            _xblk_below() if narrow else _xblk(1, 0),
            _xblk_diag() if narrow else _xblk(1, 1),
            _full((16, 128)), _full((1, 128)),
            _full((4, 128, 128)), _full((1, 128)),
            _full((2, 384, 128)), _full((1, 256)),
            _full((2, 768, 128)), _full((1, 256)),
            _full((4, 576, 128)), _full((1, 512)),
            _full((4, 1152, 128)), _full((1, 512)),
            _full((512, 64)), _full((256, 4)), _full((512, 16)),
            pl.BlockSpec((1, 1), lambda nn, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            *([_full((16, 128, 128))] if l6_wino else []),
            *([_full((4, 128))] if l6_i8 else []),
            *uvp_specs,
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=(
            [
                pltpu.VMEM((tr + 6, tc + 16, 512), cdtype),  # A: x1/x3/x5
                pltpu.VMEM((tr + 5, tc + 16, 256), cdtype),  # B: x2/x4
            ] if alias else
            ([] if l1_direct else [
                pltpu.VMEM((tr + 6, tc + 16, 16), cdtype),  # xin (im2col win)
            ]) + [
                pltpu.VMEM((tr + 6, tc + 16, 128), cdtype),   # x1
                pltpu.VMEM((tr + 5, tc + 16, 128), cdtype),   # x2
                pltpu.VMEM((tr + 4, tc + 16, 256), cdtype),   # x3
                pltpu.VMEM((tr + 3, tc + 16, 256), cdtype),   # x4 (in-VMEM
                #                                               handoff)
                pltpu.VMEM((tr + 2, tc + 16, 512), cdtype),   # x5
            ]
        ) + [
            pltpu.VMEM((tr + 1, tc + 16, 16 if l7_fold else 64),
                       jnp.float32),                         # zt (L7 taps)
            pltpu.VMEM((tr + 5, tc + 16, 128), accdt),    # shared acc
        ] + ([
            pltpu.VMEM((tr + 1, tc + 16, 512), jnp.float32),  # wino yacc
        ] if l6_wino else []) + ([
            pltpu.VMEM((tr + 2, tc + 16, 512), jnp.int8),     # x5q (int8 L6)
        ] if l6_i8 else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
            **({"dimension_semantics": DIMSEM} if DIMSEM else {})),
        interpret=interpret,
    )(xcol, xcol, xcol, xcol, kp["l1"], kp["b1"], kp["w2a"], kp["b2a"],
      kp["w2b"], kp["b2b"], kp["w2c"], kp["b2c"], kp["w5"], kp["b5"],
      kp["w6q"] if l6_i8 else kp["w6"], kp["b6"], kp["l7_blk"],
      kp["l7_sel"], kp["l7_blk2"], kp["b7"],
      *([kp["w6w"]] if l6_wino else []),
      *([kp["w6s"]] if l6_i8 else []), *uvp_args)
    return y


def _grid_for(hl: int, wl: int, tr: int, tc: int) -> tuple[int, int]:
    if tr < 6 or tc < 16:
        raise ValueError("tile must be at least (6, 16): K1 assembles its "
                         "halo window from neighbor blocks of that depth")
    return -(-hl // tr), -(-wl // tc)


# VMEM budget expressed in tile cells: (tr+2)*(tc+16) for the known-good
# (64, 128) default ~= 9500 at bf16 activations; larger tiles hit the
# 128 MB compile limit. Scratch VMEM scales with the activation itemsize,
# so f32 kernels get half the cell budget.
_MAX_CELLS = (64 + 2) * (128 + 16)


def pick_tile(hl: int, wl: int, itemsize: int = 2) -> tuple[int, int]:
    """Choose an (rows, cols) s2d tile for an hl x wl low-res image.

    Minimizes total kernel work — grid padding (ceil to tile multiples)
    plus the per-tile halo (+4.5 rows avg across K1/K2 layers, +8 compute
    columns) — under the VMEM cell budget, over even rows and mult-of-8
    columns. Stripe-fetch-aligned tiles (tr % 8 == 0, tc % 16 == 0, the
    `narrow` condition in _run_stack) get a small work discount: the
    stripes measured +0.3%% on scale512, so alignment should win ties but
    never buy more than ~1%% of grid-pad waste (forcing alignment cost
    ns1080 2-4%% — 1080/18 = 60-row tiles beat any mult-of-8 pick there).
    For 512-multiples this returns the measured-best (64, 128)."""
    budget = _MAX_CELLS * 2 // max(itemsize, 2)
    best = None
    # (A brief column pin to 128 was reverted: the mixed64 HBM OOM that
    # motivated it was per-dispatch pixel volume — pipeline.BAND_PX —
    # while the pin cost non-128-multiple widths real pad work: 960-wide
    # planes padded to 1024 = ns1080 146 -> 140.6 MP/s.)
    for tr in range(24, 129, 2):
        for tc in range(96, 161, 8):
            if (tr + 2) * (tc + 16) > budget:
                continue
            ny, nx = -(-hl // tr), -(-wl // tc)
            work = ny * nx * (tr + 4.5) * (tc + 8)
            if tr % 8 == 0 and tc % 16 == 0:
                work *= 0.997                     # stripe-fetch discount
            if best is None or work < best[0]:
                best = (work, tr, tc)
    return best[1], best[2]


@functools.partial(jax.jit, static_argnames=("tr", "tc"))
def _xcol_scale(ylow, tr, tc):
    """Edge-pad the low-res plane to the tile grid and build the 16-lane
    3x3 im2col (lanes 9-15 zero) consumed by K1."""
    n, hl, wl = ylow.shape
    ny, nx = _grid_for(hl, wl, tr, tc)
    hp, wp = ny * tr, nx * tc
    yp = jnp.pad(ylow, ((0, 0), (4, 4 + hp - hl), (4, 14 + wp - wl)),
                 mode="edge")
    # taps in (dy, dx) row-major order (pack_l1_scale). NOTE on the build
    # form: the 9-slice last-axis stack is the fastest variant measured
    # (1.4 ms vs 5.4 for conv_general_dilated_patches and a catastrophic
    # in-context slowdown for .at[].set lane updates), but XLA's layout
    # assignment sometimes picks a lanes-on-the-taps-dim layout for the
    # tap temporaries (128x padding per tap -> HBM OOM; seen at batch-4
    # unbanded 1080p). XCOL_SAFE stacks on a MAJOR axis instead (taps can
    # never become the minor dim) and pays one explicit dense transpose
    # (~0.4% on scale512). NOTE the batch-8 1080p mixed64 OOM was NOT
    # this: it was per-dispatch pixel volume (pipeline.BAND_PX).
    taps = [yp[:, dy:hp + 6 + dy, dx:wp + 16 + dx]
            for dy in range(3) for dx in range(3)]
    # Round 4: dispatches at >= XCOL_SAFE_PX low-res px take the safe
    # build automatically — the layout pathology strikes shape-by-shape
    # at large frames (no volume rule predicts it), and 0.4% is cheap
    # insurance there. This is what lets ns1080 run UNBANDED at batch 4
    # (153 -> 159 MP/s with the band overlap gone); scale512's b16 fast
    # path (4.2M px) stays on the fast build.
    if XCOL_SAFE or n * hp * wp >= XCOL_SAFE_PX:
        x = jnp.moveaxis(jnp.stack(taps, axis=1), 1, -1)
    else:
        x = jnp.stack(taps, axis=-1)
    # pad to an (ny+1) x (nx+1) block grid (K1 assembles each overlapping
    # window from 4 neighboring blocks) and to 16 lanes
    return jnp.pad(x, ((0, 0), (0, (ny + 1) * tr - (hp + 6)),
                       (0, (nx + 1) * tc - (wp + 16)), (0, 16 - 9)))


@functools.partial(jax.jit, static_argnames=("tr", "tc"))
def _xcol_noise(y, tr, tc):
    """Full-res plane -> 16-lane s2d im2col (K row order (Dy*2+Dx)*4+(a*2+b),
    matching pack_l1_noise). y: [N, h, w] with h, w even."""
    n, h, w = y.shape
    hl, wl = h // 2, w // 2
    ny, nx = _grid_for(hl, wl, tr, tc)
    hp, wp = ny * tr, nx * tc
    yp = jnp.pad(y, ((0, 0), (7, 7 + 2 * (hp - hl)),
                     (7, 27 + 2 * (wp - wl))), mode="edge")
    x0 = s2d_ops.s2d(yp[..., None])                 # [N, hp+7, wp+17, 4]
    cols = [x0[:, Dy:hp + 6 + Dy, Dx:wp + 16 + Dx, :]
            for Dy in (0, 1) for Dx in (0, 1)]
    x = jnp.concatenate(cols, axis=-1)              # [N, hp+6, wp+16, 16]
    # lane dim is already 16 (4 block shifts x 4 s2d lanes) — no lane pad;
    # the kernel's (.., 16) input blocks must equal the array's lane dim
    return jnp.pad(x, ((0, 0), (0, (ny + 1) * tr - (hp + 6)),
                       (0, (nx + 1) * tc - (wp + 16)), (0, 0)))


def stack_scale(ylow: jax.Array, kernel_params, spec,
                tile: tuple[int, int] | None = None,
                interpret: bool = False, acc_f32: bool = True) -> jax.Array:
    """SCALE-path fused stack: low-res luma [N, hl, wl] -> converted Y in
    s2d layout [N, hl, wl, 4] (channel (A*2+B) = full-res pixel (2i+A, 2j+B);
    equals the reference's nearest-2x + pad-7 + 7-layer stack)."""
    n, hl, wl = ylow.shape
    tr, tc = tile or pick_tile(hl, wl, ylow.dtype.itemsize)
    ny, nx = _grid_for(hl, wl, tr, tc)
    xcol = _xcol_scale(ylow, tr, tc)
    y = _run_stack(xcol, kernel_params, tr, tc, ny, nx, spec,
                   interpret=interpret, acc_f32=acc_f32)
    return y[:, :hl, :wl, :]


def stack_scale_dense(ylow: jax.Array, kernel_params, spec,
                      tile: tuple[int, int] | None = None,
                      interpret: bool = False,
                      acc_f32: bool = True) -> tuple[jax.Array, int]:
    """SCALE-path fused stack emitting the kernel's phase-chunked DENSE
    layout: [N, hp, nx*4*tc] uncropped, where within tile column j the
    columns [j*4tc + q*tc : j*4tc + (q+1)*tc] hold phase q = A*2+B. The
    dense (tr, 4*tc) out block stores at full 128-lane width (the classic
    4-lane-minor block costs ~0.76 ms/4f of relayout at the headline shape);
    the consumer un-chunks with ONE dense XLA transpose (dense_to_s2d) fused
    into its own program. Returns (ydense, tc)."""
    n, hl, wl = ylow.shape
    tr, tc = tile or pick_tile(hl, wl, ylow.dtype.itemsize)
    ny, nx = _grid_for(hl, wl, tr, tc)
    xcol = _xcol_scale(ylow, tr, tc)
    y = _run_stack(xcol, kernel_params, tr, tc, ny, nx, spec,
                   interpret=interpret, acc_f32=acc_f32, dense_out=True)
    return y, tc


def dense_to_s2d(ydense: jax.Array, tc: int, hl: int, wl: int) -> jax.Array:
    """Un-chunk stack_scale_dense output to the classic s2d [N, hl, wl, 4]
    (one XLA transpose; jit into the consumer so it fuses with its math)."""
    n, hp, wd = ydense.shape
    nx = wd // (4 * tc)
    y5 = ydense.reshape(n, hp, nx, 4, tc)
    y4 = jnp.transpose(y5, (0, 1, 2, 4, 3)).reshape(n, hp, nx * tc, 4)
    return y4[:, :hl, :wl, :]


def stack_scale_fused_u8(ylow: jax.Array, uvp: jax.Array, kernel_params,
                         spec, tile: tuple[int, int] | None = None,
                         interpret: bool = False) -> jax.Array:
    """Fully fused SCALE-path 2x step: low-res luma [N, hl, wl] + channel-
    major polyphase U/V [N, hp, wp, 8] (hp/wp = tile-grid-padded dims; build
    with `uv_phases_for`) -> uint8 BGR, lanes (c*4 + phase), [N, hl, wl, 16]
    after cropping. K2 performs the YUV->BGR + saturate-cast in-kernel."""
    n, hl, wl = ylow.shape
    tr, tc = tile or pick_tile(hl, wl, ylow.dtype.itemsize)
    ny, nx = _grid_for(hl, wl, tr, tc)
    xcol = _xcol_scale(ylow, tr, tc)
    uvp = encode_uvp(uvp)
    out = _run_stack(xcol, kernel_params, tr, tc, ny, nx, spec,
                     interpret=interpret, uvp=uvp)
    return out[:, :hl, :wl, :]


@jax.jit
def _uvp_to_i16(uvp: jax.Array) -> jax.Array:
    q = jnp.round((uvp - jnp.float32(0.5)) * jnp.float32(32767.0))
    return jnp.clip(q, -32768, 32767).astype(jnp.int16)


def encode_uvp(uvp: jax.Array) -> jax.Array:
    """Narrow the f32 channel-major U/V phase window per UVP_MODE (the
    kernel decodes int16 back to f32 in two VPU ops). A caller that
    already narrowed its uvp (A/B tests) is left alone."""
    if uvp.dtype != jnp.float32:
        return uvp
    if UVP_MODE == "i16":
        return _uvp_to_i16(uvp)
    if UVP_MODE == "bf16":
        return uvp.astype(jnp.bfloat16)
    return uvp


def grid_dims(hl: int, wl: int,
              tile: tuple[int, int] | None) -> tuple[int, int]:
    """Tile-grid-padded dims (hp, wp) for a given image/tile size (bf16
    tile budget when auto-picking)."""
    tr, tc = tile or pick_tile(hl, wl)
    ny, nx = _grid_for(hl, wl, tr, tc)
    return ny * tr, nx * tc


def stack_noise_s2d(y: jax.Array, kernel_params, spec,
                    tile: tuple[int, int] | None = None,
                    interpret: bool = False,
                    acc_f32: bool = True, crop: bool = True) -> jax.Array:
    """NOISE-path fused stack returning the converted plane in s2d layout
    [N, h/2, w/2, 4] (phase a*2+b = full-res pixel (2i+a, 2j+b)); h and w
    must be even. Skips the device d2s that stack_noise pays — throughput
    surfaces interleave on the host (d2s_host_cmajor) like the scale path.
    crop=False returns the tile-grid-padded [N, hp, wp, 4] so a consumer
    that slices anyway (the u8 tail) can fold the crop into its own
    program instead of paying a standalone slice dispatch."""
    n, h, w = y.shape
    if h % 2 or w % 2:
        raise ValueError(f"stack_noise_s2d needs even dims, got {h}x{w}")
    hl, wl = h // 2, w // 2
    tr, tc = tile or pick_tile(hl, wl, y.dtype.itemsize)
    ny, nx = _grid_for(hl, wl, tr, tc)
    xcol = _xcol_noise(y, tr, tc)
    ys = _run_stack(xcol, kernel_params, tr, tc, ny, nx, spec,
                    interpret=interpret, acc_f32=acc_f32)
    return ys[:, :hl, :wl, :] if crop else ys


def stack_noise(y: jax.Array, kernel_params, spec,
                tile: tuple[int, int] | None = None,
                interpret: bool = False, acc_f32: bool = True) -> jax.Array:
    """NOISE-path fused stack: [N, h, w] -> same-size converted plane.
    Odd sizes are edge-padded to even first (replicate-pad composition
    keeps the interior bit-identical — convertRoutine.cpp:35-36 semantics).
    """
    n, h, w = y.shape
    tr, tc = tile or pick_tile(-(-h // 2), -(-w // 2), y.dtype.itemsize)
    he, we = h + (h % 2), w + (w % 2)
    if (he, we) != (h, w):
        y = jnp.pad(y, ((0, 0), (0, he - h), (0, we - w)), mode="edge")
    hl, wl = he // 2, we // 2
    ny, nx = _grid_for(hl, wl, tr, tc)
    xcol = _xcol_noise(y, tr, tc)
    ys = _run_stack(xcol, kernel_params, tr, tc, ny, nx, spec,
                    interpret=interpret, acc_f32=acc_f32)
    out = s2d_ops.d2s(ys[:, :hl, :wl, :])[..., 0]
    return out[:, :h, :w]
