"""Exact space-to-depth convolution transform ("packed" convs).

The CrossCNN branch runs 32-channel convs over big spatial grids — on
the 128x128 MXU that is <=6% utilisation and it dominates the model's
runtime (profiled: 64% of inference).  Packing 2x2 fine pixels into
channels turns a [B,H,W,32] stride-1 conv into a [B,H/2,W/2,128] conv —
full-width MXU contractions — via an EXACT kernel rewrite:

    fine   y[m,n,co]        = sum_{ky,kx,ci} x[m+ky-ph, n+kx-pw, ci] W[ky,kx,ci,co]
    packed y'[i,j,(q,co)]   = sum_{d} sum_{p,ci} x'[i+du, j+dv, (p,ci)] W'[du,dv,(p,ci),(q,co)]

with, for each output phase q=(qy,qx) and fine tap (ky,kx):
    u = qy+ky-ph, du = u>>1, py = u&1   (same for x),
    W'[du+pad, dv+pad, (py,px,ci), (qy,qx,co)] += W[ky,kx,ci,co].

Zero-padding is exact too: a zero coarse cell supplies exactly the zero
fine rows/cols the original padding would (H, W must be even).
Elementwise ops (bias, LeakyReLU, BN affine, GELU) act per fine pixel,
so on the packed layout they are the same ops with channel-tiled
parameters.  A fine 2x2/2 maxpool is a max over the 4 phase groups.

Alignment alternation (round 3): a 3x3 conv between a standard-packed
input and an OFFSET-packed output (cells shifted one fine pixel) needs
only a [2,2] coarse kernel — 64C^2 vs the [3,3] form's 144C^2 MACs per
coarse pixel — because each output phase's taps then span exactly two
coarse cells per axis.  Chaining convs std->off->off->std per block
(parity-optimal; see ``_packed_block``) cuts the packed 3x3 overhead
from 4x to ~2.3x average at full MXU lane width.  Offset tensors carry
two PHANTOM border phases per axis (fine -1 and N) that stand in for
zero padding; ``mask_phantoms`` re-zeroes them before each consuming
conv and BN statistics divide by the real element count.

``cross_resnet_packed`` applies this to the first levels of CrossResNet
(where the pixels are); deeper levels fall back to the plain modules.
"""

from __future__ import annotations

import contextlib
import functools
import os
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# pack/unpack lowering: 'reshape' (6-D reshape+transpose) or 'conv'
# (constant 0/1 permutation kernel on the MXU).
#
# The round-4 train trace itemizes ~1.3 ms/step of XLA copies around the
# reshape form's 6-D intermediates ([8,64,64,2,2,C]{5,4,3,0,2,1:T(2,128)}
# relayout chains at every level boundary and skip unpack); the conv
# form (EXACT: each output element is 1.0*x + zeros) was built to kill
# them.  MEASURED ON CHIP r4 (tools/bench_pack.py, v5e): serving is a
# wash (6.53 vs 6.51 ms/step) but TRAINING LOSES 29.17 vs 19.69 ms/step
# — the unpack's lhs_dilation=2 conv and both forms' input-dilated
# backwards take XLA's slow dilated-conv path, costing far more than
# the relayout chains they replace.  DEFAULT: 'reshape' ('auto' is the
# same policy gate but routes to conv — kept, with the exactness test,
# for re-measurement on stacks with better dilated-conv handling; arm
# via TCCT_PACK_IMPL=auto|conv).
# ---------------------------------------------------------------------------

_PACK_IMPL = os.environ.get("TCCT_PACK_IMPL", "reshape")  # reshape | auto | conv | slice
_PACK_CONV_MIN_C = 16

# BN-statistic / phase-maxpool lowerings on the packed layout, MEASURED
# on chip r4 (tools/bench_statpool.py, flagship train epoch, v5e):
#   stats reshape/vector = 19.74/19.73 ms/step (wash — the [..,4,C]
#     reshape was NOT a relayout cost; 'vector' kept: fewer ops, no 5-D
#     intermediate);
#   pool slices = 20.49/20.51 vs reshape 19.74 ms/step (the lane-offset
#     channel-slice max tree LOSES 0.76 ms — XLA's reshape+reduce_max
#     is the better form; 'slices' kept only as a measured-and-rejected
#     record).
_STAT_IMPL = os.environ.get("TCCT_PACK_STATS", "vector")  # vector | reshape
_POOL_IMPL = os.environ.get("TCCT_PACK_POOL", "reshape")  # reshape | slices

# r5 stretch (VERDICT item 7): fused act+BN-stats+normalize Pallas
# epilogue for the packed train-mode BN sites (ops/pallas/bnstats.py).
# Same HBM traffic as the XLA fragments it replaces.  MEASURED ON CHIP
# and REJECTED (tools/bench_r5.py pbn: 25.54 vs 18.61 ms/step — the
# pallas boundary breaks XLA's conv-epilogue fusion; BACKLOG.md); kept
# gated for re-measurement on future stacks.
_PALLAS_BN = os.environ.get("TCCT_PALLAS_BN", "0") == "1"


def set_pallas_bn(enable: bool):
    global _PALLAS_BN
    _PALLAS_BN = bool(enable)

# r5 layout experiment: constrain packed-branch level outputs to the
# standard NHWC tiled layout (minor-to-major {3,0,2,1}) via
# jax.experimental.layout.with_layout_constraint — the r5 HBM audit
# itemized ~0.7 ms/step of {1,3,0,2}<->{2,3,1,0}<->{3,0,2,1} flip-flop
# copies around the 128^2 packed level in fwd+bwd.  The constraint is
# differentiable (the cotangent gets the same pin).
_PIN_LAYOUT = os.environ.get("TCCT_PIN_LAYOUT", "0") == "1"


def set_pin_layout(enable: bool):
    global _PIN_LAYOUT
    _PIN_LAYOUT = bool(enable)


def _pin(x):
    if not _PIN_LAYOUT or x.ndim != 4:
        return x
    from jax.experimental.layout import Layout, with_layout_constraint

    # major_to_minor (1,2,0,3) == XLA minor-to-major {3,0,2,1}
    return with_layout_constraint(x, Layout((1, 2, 0, 3)))


@contextlib.contextmanager
def stat_pool_lowering(stats: str = None, pool: str = None):
    """Trace-time switch for the packed BN-stats ('vector' | 'reshape')
    and phase-maxpool ('slices' | 'reshape') lowerings."""
    global _STAT_IMPL, _POOL_IMPL
    prev = (_STAT_IMPL, _POOL_IMPL)
    _STAT_IMPL = stats or _STAT_IMPL
    _POOL_IMPL = pool or _POOL_IMPL
    try:
        yield
    finally:
        _STAT_IMPL, _POOL_IMPL = prev


def stat_impl() -> str:
    return _STAT_IMPL


@contextlib.contextmanager
def pack_lowering(impl: str):
    """Trace-time switch for the pack/unpack lowering ('auto' | 'conv' |
    'reshape' | 'slice') — A/B'd by tools/bench_pack.py."""
    global _PACK_IMPL
    prev = _PACK_IMPL
    _PACK_IMPL = impl
    try:
        yield
    finally:
        _PACK_IMPL = prev


def _use_conv_pack(dtype, C: int) -> bool:
    if _PACK_IMPL == "conv":
        return True
    if _PACK_IMPL in ("reshape", "slice"):
        return False
    return jnp.issubdtype(dtype, jnp.floating) and C >= _PACK_CONV_MIN_C


@functools.lru_cache(maxsize=None)
def _pack_conv_kernel_np(C: int):
    """[2,2,C,4C] 0/1 kernel: stride-2 VALID conv == pack_nhwc (channel
    order (py, px, c), matching the reshape form exactly)."""
    k = np.zeros((2, 2, C, 4 * C), np.float32)
    for py in range(2):
        for px in range(2):
            for c in range(C):
                k[py, px, c, (py * 2 + px) * C + c] = 1.0
    return k


@functools.lru_cache(maxsize=None)
def _unpack_conv_kernel_np(C: int):
    """[2,2,4C,C] 0/1 kernel: lhs_dilation=2 conv with padding (1,1) on
    each axis == unpack_nhwc.  Output fine pixel (p,q) reads dilated
    position (p+ky-1, q+kx-1); even dilated positions hold cell
    (p+ky-1)/2 and odd ones are zeros, so exactly one tap fires per
    output pixel: phase (1-ky, 1-kx) of the covering cell."""
    k = np.zeros((2, 2, 4 * C, C), np.float32)
    for ky in range(2):
        for kx in range(2):
            py, px = 1 - ky, 1 - kx
            for c in range(C):
                k[ky, kx, (py * 2 + px) * C + c, c] = 1.0
    return k


def pack_nhwc(x, align=(0, 0)):
    """[B,H,W,C] -> [B,H/2+ar,W/2+ac,4C], channel order (py, px, c).
    For an offset-aligned axis the fine tensor is zero-padded by one on
    each side first, so the phantom border phases start out exactly
    zero."""
    if align[0] or align[1]:
        x = jnp.pad(
            x,
            ((0, 0), (align[0], align[0]), (align[1], align[1]), (0, 0)),
        )
    B, H, W, C = x.shape
    if _use_conv_pack(x.dtype, C):
        return jax.lax.conv_general_dilated(
            x,
            jnp.asarray(_pack_conv_kernel_np(C), x.dtype),
            window_strides=(2, 2),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if _PACK_IMPL == "slice":
        # four strided phase slices + channel concat (rank-4 ops only).
        # MEASURED ON CHIP r4 and REJECTED: infer 6.92 vs 6.41 ms/step,
        # train 27.48 vs 20.4 (the strided-slice backwards land on the
        # interior-padding path).  Kept behind TCCT_PACK_IMPL=slice as the
        # measured record; default stays 'reshape'.
        return jnp.concatenate(
            [
                x[:, 0::2, 0::2],
                x[:, 0::2, 1::2],
                x[:, 1::2, 0::2],
                x[:, 1::2, 1::2],
            ],
            axis=-1,
        )
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def unpack_nhwc(xp, align: Tuple[int, int] = (0, 0)):
    """[B,h,w,4C] -> fine [B,H,W,C].  For an offset-aligned axis the
    interleaved sequence spans fine rows -1..N; the phantom border rows
    are sliced away (H = 2*(h - align))."""
    B, h, w, C4 = xp.shape
    C = C4 // 4
    if _use_conv_pack(xp.dtype, C):
        x = jax.lax.conv_general_dilated(
            xp,
            jnp.asarray(_unpack_conv_kernel_np(C), xp.dtype),
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    elif _PACK_IMPL == "slice":
        # two axis-interleave stacks on rank-4 channel slices (5-D peak
        # rank instead of the 6-D reshape+transpose form)
        r = jnp.stack([xp[..., : 2 * C], xp[..., 2 * C :]], axis=2)
        r = r.reshape(B, 2 * h, w, 2 * C)  # rows interleaved, (px, c) chans
        x = jnp.stack([r[..., :C], r[..., C:]], axis=3).reshape(B, 2 * h, 2 * w, C)
    else:
        x = xp.reshape(B, h, w, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, 2 * h, 2 * w, C)
    if align[0]:
        x = x[:, 1:-1]
    if align[1]:
        x = x[:, :, 1:-1]
    return x


# ---------------------------------------------------------------------------
# alignment-aware kernel assembly
#
# A packed axis carries an ALIGNMENT: 0 = standard (stored cell s holds
# fine rows {2s, 2s+1}) or 1 = offset (stored cell s holds fine rows
# {2s-1, 2s}; cell 0's first phase and the last cell's second phase are
# PHANTOM positions: fine -1 and fine N — junk values that stand in for
# the fine chain's zero padding and must be masked before any consuming
# conv).  The payoff: a 3x3 fine conv that FLIPS alignment (std<->off)
# needs only a [2,2] coarse kernel — 64*C^2 MACs/coarse px instead of the
# alignment-preserving [3,3]'s 144 — because each output phase's tap
# window then spans exactly 2 coarse cells.  Chaining convs so alignments
# alternate (std->off->off->std per CrossCNN block, parity-optimal) cuts
# the packed 3x3 FLOP overhead from 4x to an average ~2.3x at full
# 128-lane MXU utilisation, with no Mosaic involvement.
# ---------------------------------------------------------------------------

def _axis_plan(k: int, a_in: int, a_out: int):
    """Per-axis tap plan: [(q, ktap, d_rel, p)], coarse kernel size, and
    explicit (lo, hi) padding.  Output fine row for stored cell t, phase
    q is ``2t + q - a_out``; input fine row u lands in stored cell
    ``(u + a_in) >> 1``, phase ``(u + a_in) & 1``."""
    ph = (k - 1) // 2
    entries = []
    ds = []
    for q in range(2):
        for kk in range(k):
            u = q + kk - ph - a_out  # output cell t = 0
            s = (u + a_in) >> 1
            p = (u + a_in) & 1
            entries.append((q, kk, s, p))
            ds.append(s)
    dmin, dmax = min(ds), max(ds)
    K = dmax - dmin + 1
    pad_lo = -dmin
    pad_hi = (a_out - a_in) + dmax
    assert pad_lo >= 0 and pad_hi >= 0, (k, a_in, a_out)
    return tuple(entries), dmin, K, (pad_lo, pad_hi)


@functools.lru_cache(maxsize=None)
def _pack_matrix(kh: int, kw: int, aligns: Tuple[int, int, int, int] = (0, 0, 0, 0)):
    """Constant 0/1 scatter tensor M[ky,kx,du,dv,p,q] realizing the
    fine-tap -> packed-tap mapping for the given
    (row_in, row_out, col_in, col_out) alignments."""
    ar_in, ar_out, ac_in, ac_out = aligns
    rows, rdmin, KH, pad_r = _axis_plan(kh, ar_in, ar_out)
    cols, cdmin, KW, pad_c = _axis_plan(kw, ac_in, ac_out)
    M = np.zeros((kh, kw, KH, KW, 4, 4), np.float32)
    for qy, ky, sy, py in rows:
        for qx, kx, sx, px in cols:
            M[ky, kx, sy - rdmin, sx - cdmin, py * 2 + px, qy * 2 + qx] = 1.0
    return M, pad_r, pad_c


def pack_kernel(W, in_align=(0, 0), out_align=(0, 0)):
    """HWIO fine kernel -> (packed HWIO kernel [KH,KW,4Ci,4Co],
    ((lo,hi) row pad, (lo,hi) col pad) explicit coarse padding).

    One einsum against a constant selection tensor — NOT a scatter chain:
    the ``.at[].add`` formulation unrolled to ~50 dynamic-update-slices
    per conv per step inside the epoch scan (profiled: ~1 ms/step of DUS
    + their backward gathers on v5e)."""
    kh, kw, ci, co = W.shape
    aligns = (in_align[0], out_align[0], in_align[1], out_align[1])
    M, pad_r, pad_c = _pack_matrix(kh, kw, aligns)
    Wp = jnp.einsum(
        "yxuvpq,yxio->uvpiqo", jnp.asarray(M, W.dtype), W
    )
    KH, KW = M.shape[2], M.shape[3]
    return Wp.reshape(KH, KW, 4 * ci, 4 * co), pad_r, pad_c


def tile4(v):
    """Per-fine-channel parameter -> packed channels (phase-major)."""
    return jnp.tile(v, 4)


@functools.lru_cache(maxsize=None)
def _phantom_masks_np(S1: int, S2: int, C: int, align: Tuple[int, int]):
    """Per-axis multiplicative masks zeroing the phantom phases of an
    offset-aligned packed tensor (fine rows -1 and N).  Returned as two
    rank-2 arrays ([S1, 4C], [S2, 4C]) so the multiply stays two cheap
    broadcast ops XLA fuses into the producer; None for std axes."""
    mr = mc = None
    if align[0]:
        m = np.ones((S1, 2, 2, C), np.float32)
        m[0, 0] = 0.0   # phase (py=0, *): fine row -1
        m[-1, 1] = 0.0  # phase (py=1, *): fine row N
        mr = m.reshape(S1, 4 * C)
    if align[1]:
        m = np.ones((S2, 2, 2, C), np.float32)
        m[0, :, 0] = 0.0   # phase (*, px=0): fine col -1
        m[-1, :, 1] = 0.0  # phase (*, px=1): fine col N
        mc = m.reshape(S2, 4 * C)
    return mr, mc


def mask_phantoms(xp, align: Tuple[int, int]):
    """Zero the phantom positions of offset-aligned axes (they carry
    bias/BN/activation junk from previous elementwise ops, but stand in
    for the fine chain's zero padding)."""
    if not (align[0] or align[1]):
        return xp
    B, S1, S2, C4 = xp.shape
    mr, mc = _phantom_masks_np(S1, S2, C4 // 4, align)
    if mr is not None:
        xp = xp * jnp.asarray(mr, xp.dtype)[None, :, None, :]
    if mc is not None:
        xp = xp * jnp.asarray(mc, xp.dtype)[None, None, :, :]
    return xp


def packed_conv(xp, W_fine, bias=None, in_align=(0, 0), out_align=(0, 0)):
    """Apply a fine-grid conv (HWIO, odd kernel, SAME zero pad) on the
    packed representation, between the given axis alignments.  Exact:
    offset-aligned inputs are phantom-masked so out-of-range fine taps
    read zero, exactly like the fine conv's SAME padding."""
    xp = mask_phantoms(xp, in_align)
    Wp, pad_r, pad_c = pack_kernel(W_fine.astype(xp.dtype), in_align, out_align)
    # optional Winograd lowering of the coarse [3,3] form (the one conv
    # per block alignment alternation cannot reduce to [2,2]) — gated,
    # see ops/winograd.py
    from tcct_tpu.ops.winograd import conv3x3_winograd, winograd_active

    if (
        winograd_active()
        and Wp.shape[:2] == (3, 3)
        and (tuple(pad_r), tuple(pad_c)) == ((1, 1), (1, 1))
        and xp.shape[1] % 2 == 0
        and xp.shape[2] % 2 == 0
    ):
        y = conv3x3_winograd(xp, Wp)
        if bias is not None:
            y = y + tile4(bias).astype(y.dtype)
        return y
    y = jax.lax.conv_general_dilated(
        xp,
        Wp,
        window_strides=(1, 1),
        padding=(pad_r, pad_c),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + tile4(bias).astype(y.dtype)
    return y


def packed_maxpool2(xp):
    """Fine 2x2/2 maxpool == max over the 4 phase groups; returns the
    UNPACKED pooled map (which is at the packed spatial resolution).

    Default 'reshape' ([B,h,w,4,C] + reduce_max) — measured fastest on
    chip; the 'slices' channel-slice max tree lost 0.76 ms/step (see the
    _POOL_IMPL note above).  Tie-gradient routing differs between the
    forms only on exact ties (measure-zero post-activation)."""
    B, h, w, C4 = xp.shape
    C = C4 // 4
    if _POOL_IMPL == "reshape":
        return jnp.max(xp.reshape(B, h, w, 4, C), axis=3)
    return jnp.maximum(
        jnp.maximum(xp[..., :C], xp[..., C : 2 * C]),
        jnp.maximum(xp[..., 2 * C : 3 * C], xp[..., 3 * C :]),
    )


# ---------------------------------------------------------------------------
# CrossResNet fast path
# ---------------------------------------------------------------------------

def _fold_bn(bn: Dict, stats: Dict):
    scale = bn["scale"] / jnp.sqrt(stats["var"] + 1e-5)
    shift = bn["bias"] - stats["mean"] * scale
    return scale, shift


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.01 * x)


def _gelu(x):
    from tcct_tpu.models.layers import gelu

    return gelu(x)  # shared impl: exact in f32, TCCT_GELU_BF16-selectable in bf16


STD = (0, 0)
OFF = (1, 1)


def _packed_block(xp, params: Dict, stats: Dict):
    """One CrossCNNBlock (eval) on the packed layout.

    Alignment plan (parity-optimal, see the header comment): the two
    flipping 3x3s per branch get [2,2] coarse kernels; only block12_1
    (off->off) keeps the [3,3] form.  The 1xk/kx1 cross convs are
    alignment-preserving at their standard cost.  std -> OFF -> std per
    block, so skips/pool stay on the standard layout."""
    dt = xp.dtype

    def conv(name, src, ia=STD, oa=STD):
        p = params[name]
        return packed_conv(src, p["kernel"], p["bias"], in_align=ia, out_align=oa)

    def affine(name, src):
        s, t = _fold_bn(params[name], stats[name])
        return src * tile4(s).astype(dt) + tile4(t).astype(dt)

    a = conv("block12_0", xp, STD, OFF).astype(dt)
    a = conv("block12_1", a, OFF, OFF).astype(dt)
    a = affine("block12_3", _lrelu(a))
    b = conv("block34_0", xp).astype(dt)
    b = conv("block34_1", b).astype(dt)
    b = conv("block34_2", b, STD, OFF).astype(dt)
    b = affine("block34_4", _lrelu(b))
    g = _gelu(a + b)
    y = conv("block5_0", g.astype(dt), OFF, STD).astype(dt)
    return affine("block5_2", _lrelu(y))


# ---------------------------------------------------------------------------
# training path: phase-aware BN batch statistics
# ---------------------------------------------------------------------------

def _bn_train_packed(
    xp,
    bn: Dict,
    stats: Dict,
    momentum: float = 0.9,
    eps: float = 1e-5,
    align: Tuple[int, int] = (0, 0),
):
    """Train-mode BatchNorm on the packed layout.

    Fine-channel statistics reduce over (B, H, W) — on the packed tensor
    that is (B, h, w, the 4 phase groups), the exact same element set, so
    numerics match flax BatchNorm up to reassociation.  On an
    offset-aligned tensor the phantom border phases are masked out of the
    sums and the divisor is the REAL fine element count, so statistics
    stay exact.  Returns the normalized tensor and the EMA-updated
    running stats (phantom positions get normalized junk — harmless, the
    next conv masks them)."""
    B, h, w, C4 = xp.shape
    C = C4 // 4
    # f32 accumulation happens INSIDE the reductions (fused convert) —
    # materializing an f32 copy of the activation costs real HBM traffic
    # (see models/layers.py::BatchNorm)
    xm = mask_phantoms(xp, align)
    n = B * 2 * (h - align[0]) * 2 * (w - align[1])
    # 'vector': reduce to a per-PACKED-channel [4C] vector first, then
    # fold the 4 phase groups on the tiny vector — same element set as
    # fine-channel (B,H,W) statistics, reassociated.  Measured a wash vs
    # the [..,4,C] 'reshape' form on chip (see the _STAT_IMPL note).
    if _STAT_IMPL == "reshape":
        xg = xm.reshape(B, h, w, 4, C)
        mean = jnp.sum(xg.astype(jnp.float32), axis=(0, 1, 2, 3)) / n
        var = (
            jnp.sum(xg.astype(jnp.float32) * xg.astype(jnp.float32), axis=(0, 1, 2, 3)) / n
            - mean * mean
        )
    else:
        s1 = jnp.sum(xm.astype(jnp.float32), axis=(0, 1, 2))
        s2 = jnp.sum(jnp.square(xm.astype(jnp.float32)), axis=(0, 1, 2))
        mean = jnp.sum(s1.reshape(4, C), axis=0) / n
        var = jnp.sum(s2.reshape(4, C), axis=0) / n - mean * mean
    inv = bn["scale"] / jnp.sqrt(var + eps)
    y = xp * tile4(inv).astype(xp.dtype) + tile4(bn["bias"] - mean * inv).astype(xp.dtype)
    new_stats = {
        "mean": momentum * stats["mean"] + (1 - momentum) * mean,
        "var": momentum * stats["var"] + (1 - momentum) * var,
    }
    return y, new_stats


def _bn_act_train_packed(
    xp,
    bn: Dict,
    stats: Dict,
    align: Tuple[int, int] = (0, 0),
    leaky: bool = False,
    momentum: float = 0.9,
    eps: float = 1e-5,
):
    """Train-mode (optional LeakyReLU +) BatchNorm on the packed layout.
    Routes to the fused Pallas epilogue when armed (TCCT_PALLAS_BN=1 /
    ``set_pallas_bn``), else to ``_lrelu`` + ``_bn_train_packed``."""
    if _PALLAS_BN:
        from tcct_tpu.ops.pallas.bnstats import bn_act_train_packed_pallas

        out = bn_act_train_packed_pallas(
            xp, bn["scale"], bn["bias"], align=align, leaky=leaky, eps=eps
        )
        if out is not None:
            y, mean, var = out
            new_stats = {
                "mean": momentum * stats["mean"] + (1 - momentum) * mean,
                "var": momentum * stats["var"] + (1 - momentum) * var,
            }
            return y, new_stats
    src = _lrelu(xp) if leaky else xp
    return _bn_train_packed(src, bn, stats, momentum, eps, align)


def _packed_block_train(xp, params: Dict, stats: Dict):
    """Train-mode CrossCNNBlock on the packed layout, same
    alignment-alternating plan as ``_packed_block`` (std -> OFF -> std);
    BN statistics on offset tensors are phantom-masked (exact)."""
    dt = xp.dtype
    new_stats = {}

    def conv(name, src, ia=STD, oa=STD):
        p = params[name]
        return packed_conv(src, p["kernel"], p["bias"], in_align=ia, out_align=oa)

    def bn(name, src, align=STD):
        y, ns = _bn_act_train_packed(
            src, params[name], stats[name], align=align, leaky=True
        )
        new_stats[name] = ns
        return y

    a = conv("block12_0", xp, STD, OFF).astype(dt)
    a = conv("block12_1", a, OFF, OFF).astype(dt)
    a = bn("block12_3", a, OFF)
    b = conv("block34_0", xp).astype(dt)
    b = conv("block34_1", b).astype(dt)
    b = conv("block34_2", b, STD, OFF).astype(dt)
    b = bn("block34_4", b, OFF)
    g = _gelu(a + b)
    y = conv("block5_0", g.astype(dt), OFF, STD).astype(dt)
    return bn("block5_2", y), new_stats


def cross_resnet_packed_train(x, params: Dict, stats: Dict, return_packed: bool = False):
    """Train-mode CrossResNet on the packed layout (all 5 levels).
    Returns (5 unpacked pre-pool feature maps, updated batch_stats
    subtree).  Differentiable; grads flow to ``params`` as usual.

    ``return_packed``: additionally return the still-packed skips (one per
    level, same tensors pre-unpack) so a packed-aware consumer (the FTC
    fusion/decoder tail, models/ftc.py) can take them without the
    unpack->repack round trip; XLA dead-code-eliminates whichever form
    goes unused."""
    dt = x.dtype
    new_stats: Dict = {}
    xp = pack_nhwc(x)
    y = packed_conv(xp, params["cnn_0"]["kernel"].astype(dt), params["cnn_0"]["bias"]).astype(dt)
    y, new_stats["cnn_1"] = _bn_act_train_packed(y, params["cnn_1"], stats["cnn_1"])
    y = y.astype(dt)
    xs: List[jnp.ndarray] = []
    xs_pk: List[jnp.ndarray] = []
    for level in range(5):
        y, ns = _packed_block_train(
            y, params[f"path_estan_{level}"], stats[f"path_estan_{level}"]
        )
        y = _pin(y.astype(dt))
        new_stats[f"path_estan_{level}"] = ns
        xs.append(unpack_nhwc(y))
        xs_pk.append(y)
        pooled = packed_maxpool2(y)
        if level < 4:
            if pooled.shape[1] % 2 == 0 and pooled.shape[2] % 2 == 0:
                y = pack_nhwc(pooled)
            else:
                raise ValueError(
                    f"packed training needs even dims at every level; got "
                    f"{pooled.shape} at level {level}"
                )
    if return_packed:
        return xs, new_stats, xs_pk
    return xs, new_stats


def ftc_forward_packed(model, variables, x, n_packed: int = 2):
    """Full FTC/RegNet forward (eval) with the CNN branch on the packed
    layout: compute the pyramid with ``cross_resnet_packed`` and inject
    it via the model's ``cnn_feats`` hook as (fine, packed) pairs — the
    FTC tail then consumes the packed skips directly (packed dec4 +
    1x1 heads via packed_io, no unpack->repack round trips).  Measured
    on v5e: the CNN branch drops 7.1 -> 3.0 ms (bs=8, 256^2, bf16),
    exact numerics."""
    p = variables["params"]
    s = variables["batch_stats"]
    if "base" in p:  # RegNet wrapper
        p, s = p["base"], s["base"]
    feats, feats_pk = cross_resnet_packed(
        x, p["base_cnn"], s["base_cnn"], n_packed=n_packed, return_packed=True
    )
    pairs = [(f, pk) for f, pk in zip(feats, feats_pk)]
    return model.apply(variables, x, train=False, cnn_feats=pairs)


def cross_resnet_packed(
    x, params: Dict, stats: Dict, n_packed: int = 2, return_packed: bool = False
):
    """CrossResNet forward (eval) with the first ``n_packed`` levels on
    the space-to-depth layout.  Numerically equivalent to the plain
    module (same convolutions, reassociated).  Returns the 5 pre-pool
    feature maps, unpacked; with ``return_packed``, also the still-packed
    per-level skips (None for levels computed on the plain path)."""
    from tcct_tpu.models.crosscnn import CrossCNNBlock
    from tcct_tpu.ops.pool import max_pool_2d

    dt = x.dtype
    # stem conv + BN on the packed layout too
    xp = pack_nhwc(x)
    y = packed_conv(xp, params["cnn_0"]["kernel"].astype(dt), params["cnn_0"]["bias"]).astype(dt)
    s, t = _fold_bn(params["cnn_1"], stats["cnn_1"])
    y = y * tile4(s).astype(dt) + tile4(t).astype(dt)

    if n_packed < 1:
        raise ValueError("n_packed must be >= 1")
    xs: List[jnp.ndarray] = []
    xs_pk: List = []
    level = 0
    while True:
        y = _packed_block(
            y, params[f"path_estan_{level}"], stats[f"path_estan_{level}"]
        ).astype(dt)
        xs.append(unpack_nhwc(y))
        xs_pk.append(y)
        pooled = packed_maxpool2(y)  # unpacked, at the packed resolution
        level += 1
        if (
            level < min(n_packed, 5)
            and pooled.shape[1] % 2 == 0
            and pooled.shape[2] % 2 == 0
        ):
            y = pack_nhwc(pooled)
        else:
            cur = pooled
            break

    # remaining levels on the plain module path
    ksizes = (13, 11, 9, 7, 5)
    for i in range(level, 5):
        blk = CrossCNNBlock(
            params[f"path_estan_{i}"]["block5_0"]["kernel"].shape[-1],
            ksizes[i],
        )
        cur = blk.apply(
            {
                "params": params[f"path_estan_{i}"],
                "batch_stats": stats[f"path_estan_{i}"],
            },
            cur,
            train=False,
        )
        xs.append(cur)
        xs_pk.append(None)
        cur = max_pool_2d(cur, 2)
    if return_packed:
        return xs, xs_pk
    return xs
