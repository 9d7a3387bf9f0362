"""Space-to-depth (polyphase) reformulation of the 7-layer conv stack.

This module is the mathematical core of the TPU fast path. The reference
computes the stack as 32,672 single-plane 3x3 filter2D passes
(modelHandler.cpp:117-159); the XLA conv lowering of the same stack wastes
most MXU passes because the channel counts (1/32/64) underfill the 128-lane
contraction and output dims. The fix is the classic polyphase identity:

    For a stride-1 VALID 3x3 conv  Yv = conv3x3(X, W):
        s2d(Yv) = conv2x2_valid(s2d(X), W2)
    where s2d packs 2x2 pixel blocks into 4x channels
        s2d(X)[i, j, (a, b, c)] = X[2i + a, 2j + b, c],   a, b in {0, 1}
    and W2[Dy, Dx, (a, b, ci), (A, B, co)] = W[2Dy + a - A, 2Dx + b - B, ci, co]
    (zero where the tap index falls outside [0, 3)).

In s2d space the contraction dim is 4*cin and the output dim 4*cout, so the
32->32 and 32->64 layers run the MXU at 4x the lane utilisation (56% dense
ceiling instead of ~6-19%). Because both sides of the identity use plain
even space-to-depth, the identity CHAINS: a stack of 3x3 valid convs is one
s2d, a chain of 2x2 valid convs, one d2s. No phase bookkeeping survives.

Three more structural wins fall out (see also ops/pallas_stack.py):

  * Scale path never materialises the nearest-2x upscale: the s2d channels
    of a nearest-2x image are shifted copies of the LOW-RES plane
    (up[2i+a] = low[i]), so layer 1 collapses to a 3x3 im2col on the raw
    low-res plane (`pack_l1_scale`). The whole pipeline runs on the low-res
    grid; output is Y in s2d layout, interleaved to full-res on the host
    (a pure u8 memory reshape).
  * The last layer (128->1) would waste 127/128 output lanes; instead a
    block-diagonal 1x1 matmul produces per-tap partials ("l7_blk") and a
    0/1 selection matmul ("l7_sel") does the 9-tap shift-sum (`pack_l7`).
  * For layers where 4*cin exceeds 128 the dense W2 carries 7/16 zeros; a
    phase-sparse decomposition (`phase_groups`) splits the computation per
    output phase (A, B) into <=6 matmuls whose K-slices contain only
    non-zero rows — 6 MXU passes/px instead of 8 for the 64->128 layer.

The reference semantics replicated here are those of conv_stack_valid
(ops/convstack.py): correlation, bias + LeakyReLU(0.1) after every layer
incl. the last (modelHandler.cpp:141-152), 7-px replicate pre-pad
(convertRoutine.cpp:35-36). tests/test_s2d.py proves equality against it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from waifu2x_tpu.ops.convstack import leaky_relu

# Lane order convention everywhere: s2d channel index = (a*2 + b)*C + c,
# a = row parity, b = column parity, c = original channel.


# ---------------------------------------------------------------------------
# layout helpers (XLA level)
# ---------------------------------------------------------------------------

def s2d(x: jax.Array) -> jax.Array:
    """[..., H, W, C] -> [..., H/2, W/2, 4C] even space-to-depth."""
    *n, h, w, c = x.shape
    x = x.reshape(*n, h // 2, 2, w // 2, 2, c)
    x = jnp.moveaxis(x, -4, -3)          # [..., h2, w2, 2, 2, c]
    return x.reshape(*n, h // 2, w // 2, 4 * c)


def d2s(x: jax.Array) -> jax.Array:
    """[..., H2, W2, 4C] -> [..., 2*H2, 2*W2, C] inverse of s2d."""
    *n, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(*n, h2, w2, 2, 2, c)
    x = jnp.moveaxis(x, -3, -4)          # [..., h2, 2, w2, 2, c]
    return x.reshape(*n, h2 * 2, w2 * 2, c)


def d2s_host(x: np.ndarray) -> np.ndarray:
    """Host-side d2s for u8 output images (zero flops; native C++ fast path
    when built — see native/w2x_host.cpp w2x_d2s_u8 — else numpy)."""
    if x.dtype == np.uint8:
        from waifu2x_tpu import native
        out = native.d2s_u8(x) if native.available() else None
        if out is not None:
            return out
    *n, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(*n, h2, w2, 2, 2, c)
    x = np.moveaxis(x, -3, -4)
    return x.reshape(*n, h2 * 2, w2 * 2, c)


def d2s_host_cmajor(x: np.ndarray, channels: int = 3) -> np.ndarray:
    """Host d2s for CHANNEL-MAJOR polyphase layouts (lane = c*4 + (A*2+B)),
    the layout the fully fused u8 kernel emits: [..., h, w, 4c'] ->
    [..., 2h, 2w, channels] (trailing pad channels dropped)."""
    *n, h2, w2, c4 = x.shape
    c = c4 // 4
    v = x.reshape(*n, h2, w2, c, 2, 2)
    # [..., i, j, c, A, B] -> [..., i, A, j, B, c]
    v = np.moveaxis(np.moveaxis(v, -2, -4), -1, -2)
    return v.reshape(*n, h2 * 2, w2 * 2, c)[..., :channels]


# ---------------------------------------------------------------------------
# weight packing (host side, numpy f32)
# ---------------------------------------------------------------------------

def pack_w2(w) -> np.ndarray:
    """[3,3,ci,co] -> [2,2,4ci,4co] weights of the s2d-space 2x2 conv."""
    w = np.asarray(w, np.float32)
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3, "polyphase packing is for 3x3 kernels"
    out = np.zeros((2, 2, 2, 2, ci, 2, 2, co), np.float32)  # Dy Dx a b ci A B co
    for Dy in range(2):
        for Dx in range(2):
            for a in range(2):
                for b in range(2):
                    for A in range(2):
                        for B in range(2):
                            dy = 2 * Dy + a - A
                            dx = 2 * Dx + b - B
                            if 0 <= dy < 3 and 0 <= dx < 3:
                                out[Dy, Dx, a, b, :, A, B, :] = w[dy, dx]
    return out.reshape(2, 2, 4 * ci, 4 * co)


def pack_l1_scale(w1) -> np.ndarray:
    """First-layer weights for the SCALE path: [3,3,1,co] -> [9, 4co].

    The stack input is nearest-2x(ylow) edge-padded by 7 (main.cpp:136-140 +
    convertRoutine.cpp:35-36). Its s2d channels are shifted clamped copies of
    the low-res plane: X0[K,J,(a,b)] = pad4(ylow)[K+a, J+b]. Substituting
    into the s2d conv collapses tap (Dy,Dx) and channel (a,b) into a single
    3x3 im2col tap (Dy+a, Dx+b) on pad4(ylow):
        Weff[dy', dx', :] = sum_{Dy+a=dy', Dx+b=dx'} W2_l1[Dy, Dx, (a,b,0), :]
    Rows ordered t = dy'*3 + dx'.
    """
    w2 = pack_w2(np.asarray(w1, np.float32)).reshape(2, 2, 2, 2, -1)
    co4 = w2.shape[-1]
    eff = np.zeros((3, 3, co4), np.float32)
    for Dy in range(2):
        for Dx in range(2):
            for a in range(2):
                for b in range(2):
                    eff[Dy + a, Dx + b] += w2[Dy, Dx, a, b]
    return eff.reshape(9, co4)


def pack_l1_noise(w1) -> np.ndarray:
    """First-layer weights for the NOISE path (true 4-channel s2d input):
    [3,3,1,co] -> [16, 4co] im2col matrix, K ordered (Dy*2+Dx)*4 + (a*2+b)."""
    w2 = pack_w2(np.asarray(w1, np.float32))          # [2,2,4,4co]
    return w2.reshape(4 * 4, w2.shape[-1])


def phase_groups(w) -> list[list[tuple[int, int, int, int, np.ndarray]]]:
    """Phase-sparse decomposition of one s2d layer for 3x3 weights
    [3,3,ci,co]. Returns groups[phase] = list of
    (Dy, Dx, lane_lo, lane_hi, Wm[lane_hi-lane_lo, co]):

        Xout_s2d[I, J, phase*co:(phase+1)*co] =
            sum_g  Xin_s2d[I+Dy, J+Dx, lane_lo:lane_hi] @ Wm_g

    phase = A*2 + B. Only non-zero rows of the dense W2 are included: for
    output phase A, tap row dy maps to input block Dy=(A+dy)//2 with row
    parity a=(A+dy)%2, so each (phase, block) sees a row-parity set that is
    {0},{1} or {0,1} — a product of contiguous ranges in the (a,b,c) lane
    order except the full-a x single-b case, which splits into two slices.
    """
    w = np.asarray(w, np.float32)
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3
    groups: list[list[tuple[int, int, int, int, np.ndarray]]] = []
    for A in range(2):
        for B in range(2):
            # per block: which (parity -> tap) rows are live
            ymap: dict[int, dict[int, int]] = {0: {}, 1: {}}
            xmap: dict[int, dict[int, int]] = {0: {}, 1: {}}
            for dy in range(3):
                ymap[(A + dy) // 2][(A + dy) % 2] = dy
            for dx in range(3):
                xmap[(B + dx) // 2][(B + dx) % 2] = dx
            glist = []
            for Dy in (0, 1):
                for Dx in (0, 1):
                    ya, xb = ymap[Dy], xmap[Dx]
                    if not ya or not xb:
                        continue
                    # lane ranges: contiguous runs over (a, b) products
                    a_set = sorted(ya)
                    b_set = sorted(xb)
                    # build runs of contiguous (a*2+b) combos
                    combos = sorted(a * 2 + b for a in a_set for b in b_set)
                    runs: list[list[int]] = []
                    for ab in combos:
                        if runs and runs[-1][-1] == ab - 1:
                            runs[-1].append(ab)
                        else:
                            runs.append([ab])
                    for run in runs:
                        lo, hi = run[0] * ci, (run[-1] + 1) * ci
                        wm = np.zeros((hi - lo, co), np.float32)
                        for ab in run:
                            a, b = ab // 2, ab % 2
                            dy, dx = ya[a], xb[b]
                            r0 = (ab - run[0]) * ci
                            wm[r0:r0 + ci] = w[dy, dx]
                        glist.append((Dy, Dx, lo, hi, wm))
            groups.append(glist)
    return groups


def pack_l7(w7) -> tuple[np.ndarray, np.ndarray]:
    """Last layer (3x3, ci->1) as two matmuls in s2d space.

    Returns (blk [4ci, 64], sel [256, 4]):
      Zt = X6_s2d @ blk            — per-phase per-tap partial products;
                                     out lane (A*2+B)*16 + t, t = dy*3+dx,
                                     lanes t in [9,16) are zero padding.
      Y_s2d[I,J,(A,B)] = sum over 4 block shifts (Dy,Dx) of
                         (Zt[I+Dy, J+Dx] @ sel)[:, A*2+B-block]  — realised
      as concat([Zt[I+Dy, J+Dx] for Dy,Dx in 2x2], lanes) @ sel, with
      sel[(Dy*2+Dx)*64 + (ab)*16 + t, (A*2+B)] = 1 iff tap t of input phase
      ab at block offset (Dy,Dx) contributes to output phase (A,B).
    """
    w7 = np.asarray(w7, np.float32)
    kh, kw, ci, co = w7.shape
    assert (kh, kw, co) == (3, 3, 1)
    blk = np.zeros((4 * ci, 4 * 16), np.float32)
    for ab in range(4):
        for dy in range(3):
            for dx in range(3):
                t = dy * 3 + dx
                blk[ab * ci:(ab + 1) * ci, ab * 16 + t] = w7[dy, dx, :, 0]
    sel = np.zeros((4 * 64, 4), np.float32)
    for A in range(2):
        for B in range(2):
            for dy in range(3):
                for dx in range(3):
                    Dy, a = (A + dy) // 2, (A + dy) % 2
                    Dx, b = (B + dx) // 2, (B + dx) % 2
                    t = dy * 3 + dx
                    sel[(Dy * 2 + Dx) * 64 + (a * 2 + b) * 16 + t, A * 2 + B] = 1.0
    return blk, sel


def pack_l7_fold(w7) -> np.ndarray:
    """Last layer (3x3, ci->1) with the 0/1 selection FOLDED into the
    block-diagonal tap matmul (the fast-kernel alternative to `pack_l7`).

    Key fact: for an input phase (a, b) and tap (dy, dx) there is exactly
    ONE (output phase (A, B), block shift (Dy, Dx)) it contributes to
    (A = (a - dy) mod 2, Dy = (A + dy) // 2; same for columns). So the
    per-tap partials can be emitted directly on output lanes
    s*4 + q  (s = Dy*2+Dx, q = A*2+B), summed over input phases:

        Zt[I, J, s*4 + q] = sum_ab X6_s2d[I, J, ab-lanes] @ blk2[ab]
        Y_s2d[I, J, q]    = sum_s  Zt[I + Dy, J + Dx, s*4 + q]

    which replaces `pack_l7`'s four f32 selection matmuls with four 4-lane
    VPU shift-adds. Returns blk2 [4ci, 16].
    """
    w7 = np.asarray(w7, np.float32)
    kh, kw, ci, co = w7.shape
    assert (kh, kw, co) == (3, 3, 1)
    blk2 = np.zeros((4 * ci, 16), np.float32)
    for a in range(2):
        for b in range(2):
            ab = a * 2 + b
            for dy in range(3):
                for dx in range(3):
                    A, B = (a - dy) % 2, (b - dx) % 2
                    Dy, Dx = (A + dy) // 2, (B + dx) // 2
                    s = Dy * 2 + Dx
                    q = A * 2 + B
                    blk2[ab * ci:(ab + 1) * ci, s * 4 + q] += w7[dy, dx, :, 0]
    return blk2


_WINO_G = np.array([[1.0, 0.0, 0.0],
                    [0.5, 0.5, 0.5],
                    [0.5, -0.5, 0.5],
                    [0.0, 0.0, 1.0]], np.float32)
# F(2x2, 3x3) Winograd in correlation orientation (the stack's filter2D
# semantics, modelHandler.cpp:134-145): y[A] = sum_m d[A+m] g[m] with
#   B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
#   A^T = [[1,1,1,0],[0,1,-1,-1]]
# The 4x4 input window of one s2d cell is exactly its 2x2 block of s2d
# cells (taps t: cell row +t//2, parity t%2), so V builds from lane-block
# slices of the s2d activation — no relayout. B^T/A^T entries are 0/±1:
# the in-kernel transforms are pure shift-adds; only G touches weights.
_WINO_BT_TAPS = (((0, 1.0), (2, -1.0)), ((1, 1.0), (2, 1.0)),
                 ((1, -1.0), (2, 1.0)), ((1, 1.0), (3, -1.0)))
_WINO_AT = ((1.0, 1.0, 1.0, 0.0), (0.0, 1.0, -1.0, -1.0))


def pack_wino(w) -> np.ndarray:
    """One 3x3 layer's weights in the Winograd-transformed domain:
    [3,3,ci,co] -> U[16, ci, co] with p = py*4 + px, U[p] = (G g G^T)[py,px]
    per (ci, co) pair. M[p] = V[p] @ U[p] replaces the phase-sparse
    shift-matmuls: 16 full-K MXU passes instead of 36 for ci=co=128
    (2.25x fewer useful MACs — the classic F(2,3) reduction)."""
    w = np.asarray(w, np.float32)
    assert w.shape[:2] == (3, 3)
    u = np.einsum("ak,bl,klio->abio", _WINO_G, _WINO_G, w)
    return np.ascontiguousarray(u.reshape(16, w.shape[2], w.shape[3]))


def pack_stack(params, scale_input: bool) -> dict:
    """Pack a 7-layer parameter pytree for the polyphase fast path.

    Returns numpy arrays (cast to the compute dtype at use site):
      l1  [9,128] (scale) or [16,128] (noise); b1 [128]
      w2  list of 3 dicts {w: [2,2,4ci,4co], b: [4co]}          (layers 2-4)
      mid list of 2 dicts {w: [2,2,4ci,4co], b: [4co],
                           gmats: tuple of K-slice matrices}     (layers 5-6)
      gspec: STATIC phase-sparse structure, one tuple per mid layer of
             (phase, Dy, Dx, lane_lo, lane_hi) per matrix in gmats order —
             keep this out of jit-traced pytrees (ints would become tracers);
             the jitted entry points below take it as a static argument.
      l7_blk [512,64], l7_sel [256,4], b7 [1]
    """
    assert len(params) == 7, "polyphase packing is for the 7-layer model"
    w = [np.asarray(p["w"], np.float32) for p in params]
    b = [np.asarray(p["b"], np.float32) for p in params]
    packed = {
        "l1": pack_l1_scale(w[0]) if scale_input else pack_l1_noise(w[0]),
        "b1": np.tile(b[0], 4),
        "w2": [{"w": pack_w2(w[i]), "b": np.tile(b[i], 4)} for i in (1, 2, 3)],
        "mid": [],
    }
    gspec = []
    for i in (4, 5):
        spec_i = []
        mats_i = []
        for p, glist in enumerate(phase_groups(w[i])):
            for (Dy, Dx, lo, hi, wm) in glist:
                spec_i.append((p, Dy, Dx, lo, hi))
                mats_i.append(wm)
        packed["mid"].append({"w": pack_w2(w[i]), "b": np.tile(b[i], 4),
                              "gmats": tuple(mats_i)})
        gspec.append(tuple(spec_i))
    packed["gspec"] = tuple(gspec)
    packed["l7_blk"], packed["l7_sel"] = pack_l7(w[6])
    packed["l7_blk2"] = pack_l7_fold(w[6])
    packed["b7"] = b[6]
    return packed


def split_static(packed: dict) -> tuple[dict, tuple]:
    """(traced-arrays-only dict, static gspec) — jit the former, close over
    the latter as a static argument."""
    traced = {k: v for k, v in packed.items() if k != "gspec"}
    return traced, packed["gspec"]


# ---------------------------------------------------------------------------
# XLA reference implementation of the polyphase algorithm (the SPEC for the
# Pallas kernels; also the CPU test vehicle). Not the fast path itself.
# ---------------------------------------------------------------------------

def _conv2x2(x, w2, prec):
    return lax.conv_general_dilated(
        x, jnp.asarray(w2, x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec)


def _im2col3(x):
    """[N,H,W] -> [N,H-2,W-2,9] 3x3 patch matrix (t = dy*3+dx)."""
    n, h, w = x.shape
    taps = [x[:, dy:h - 2 + dy, dx:w - 2 + dx] for dy in range(3)
            for dx in range(3)]
    return jnp.stack(taps, axis=-1)


def _l7_tail(x6, packed, dtype, prec):
    """Zt matmul + selection shift-sum + bias + leaky: [N,h+1,w+1,512] ->
    [N,h,w,4]."""
    blk = jnp.asarray(packed["l7_blk"], dtype)
    sel = jnp.asarray(packed["l7_sel"], dtype)
    zt = jnp.einsum("nhwk,kt->nhwt", x6, blk,
                    precision=prec)                     # [N,h+1,w+1,64]
    n, h1, w1, _ = zt.shape
    h, w = h1 - 1, w1 - 1
    cat = jnp.concatenate(
        [zt[:, Dy:Dy + h, Dx:Dx + w, :] for Dy in (0, 1) for Dx in (0, 1)],
        axis=-1)                                        # [N,h,w,256]
    y = jnp.einsum("nhwk,kp->nhwp", cat, sel, precision=prec)
    return leaky_relu(y + jnp.asarray(packed["b7"], dtype))


def _mid_phase_sparse(x, layer, spec, dtype, prec):
    """One 3x3 layer in s2d space via the phase-sparse matmul groups —
    exactly the algorithm the Pallas kernel runs (cross-validation).
    spec: static tuple of (phase, Dy, Dx, lane_lo, lane_hi) per gmats entry.
    """
    n, h, w, _ = x.shape
    accs: dict[int, jax.Array] = {}
    for (p, Dy, Dx, lo, hi), wm in zip(spec, layer["gmats"]):
        part = jnp.einsum(
            "nhwk,kc->nhwc",
            x[:, Dy:h - 1 + Dy, Dx:w - 1 + Dx, lo:hi],
            jnp.asarray(wm, dtype), precision=prec)
        accs[p] = part if p not in accs else accs[p] + part
    out = jnp.concatenate([accs[p] for p in range(4)], axis=-1)
    return leaky_relu(out + jnp.asarray(layer["b"], dtype))


def _mid_layers(x, packed, gspec, use_sparse_mid, dtype, prec):
    for layer, spec in zip(packed["mid"], gspec):
        if use_sparse_mid:
            x = _mid_phase_sparse(x, layer, spec, dtype, prec)
        else:
            x = _conv2x2(x, layer["w"], prec)
            x = leaky_relu(x + jnp.asarray(layer["b"], dtype))
    return x


@partial(jax.jit, static_argnames=("gspec", "use_sparse_mid"))
def _s2d_stack_scale(ylow, packed, gspec, use_sparse_mid):
    dtype = ylow.dtype
    prec = lax.Precision.DEFAULT
    yp = jnp.pad(ylow, ((0, 0), (4, 4), (4, 4)), mode="edge")
    x = _im2col3(yp)                                    # [N,hl+6,wl+6,9]
    x = jnp.einsum("nhwk,kc->nhwc", x, jnp.asarray(packed["l1"], dtype),
                   precision=prec)
    x = leaky_relu(x + jnp.asarray(packed["b1"], dtype))
    for layer in packed["w2"]:
        x = _conv2x2(x, layer["w"], prec)
        x = leaky_relu(x + jnp.asarray(layer["b"], dtype))
    x = _mid_layers(x, packed, gspec, use_sparse_mid, dtype, prec)
    return _l7_tail(x, packed, dtype, prec)


def s2d_stack_scale(ylow: jax.Array, packed, use_sparse_mid: bool = True):
    """SCALE-path stack on the low-res grid: [N, hl, wl] -> Y_s2d
    [N, hl, wl, 4] (== s2d of the reference's full-res converted Y plane:
    nearest-2x, pad-7 replicate, 7 conv+LeakyReLU layers, crop).
    """
    traced, gspec = split_static(packed)
    return _s2d_stack_scale(ylow, traced, gspec, use_sparse_mid)


@partial(jax.jit, static_argnames=("gspec", "use_sparse_mid"))
def _s2d_stack_noise(y, packed, gspec, use_sparse_mid):
    dtype = y.dtype
    prec = lax.Precision.DEFAULT
    yp = jnp.pad(y, ((0, 0), (7, 7), (7, 7)), mode="edge")
    x0 = s2d(yp[..., None])                             # [N,h/2+7,w/2+7,4]
    n, h0, w0, _ = x0.shape
    cols = jnp.concatenate(
        [x0[:, Dy:h0 - 1 + Dy, Dx:w0 - 1 + Dx, :]
         for Dy in (0, 1) for Dx in (0, 1)], axis=-1)   # [N,h0-1,w0-1,16]
    x = jnp.einsum("nhwk,kc->nhwc", cols, jnp.asarray(packed["l1"], dtype),
                   precision=prec)
    x = leaky_relu(x + jnp.asarray(packed["b1"], dtype))
    for layer in packed["w2"]:
        x = _conv2x2(x, layer["w"], prec)
        x = leaky_relu(x + jnp.asarray(layer["b"], dtype))
    x = _mid_layers(x, packed, gspec, use_sparse_mid, dtype, prec)
    y_s2d = _l7_tail(x, packed, dtype, prec)
    return d2s(y_s2d)[..., 0]


def s2d_stack_noise(y: jax.Array, packed, use_sparse_mid: bool = True):
    """NOISE-path stack: [N, h, w] (h, w even) -> [N, h, w] same-size
    converted plane (replicate-pad 7 + 7 layers + crop, in s2d space)."""
    traced, gspec = split_static(packed)
    return _s2d_stack_noise(y, traced, gspec, use_sparse_mid)
