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

``cross_resnet_packed`` applies this to the first levels of CrossResNet
(where the pixels are); deeper levels fall back to the plain modules.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pack_nhwc(x):
    """[B,H,W,C] -> [B,H/2,W/2,4C], channel order (py, px, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def unpack_nhwc(xp):
    """[B,h,w,4C] -> [B,2h,2w,C]."""
    B, h, w, C4 = xp.shape
    C = C4 // 4
    x = xp.reshape(B, h, w, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, 2 * h, 2 * w, C)


@functools.lru_cache(maxsize=None)
def _pack_plan(kh: int, kw: int):
    """Static scatter plan: list of (du_idx, dv_idx, p_phase, q_phase,
    ky, kx) plus the coarse kernel geometry."""
    ph, pw = (kh - 1) // 2, (kw - 1) // 2
    us = [qy + ky - ph for qy in range(2) for ky in range(kh)]
    vs = [qx + kx - pw for qx in range(2) for kx in range(kw)]
    du_min, du_max = min(u >> 1 for u in us), max(u >> 1 for u in us)
    dv_min, dv_max = min(v >> 1 for v in vs), max(v >> 1 for v in vs)
    KH, KW = du_max - du_min + 1, dv_max - dv_min + 1
    entries = []
    for qy in range(2):
        for qx in range(2):
            for ky in range(kh):
                for kx in range(kw):
                    u, v = qy + ky - ph, qx + kx - pw
                    entries.append(
                        (
                            (u >> 1) - du_min,
                            (v >> 1) - dv_min,
                            (u & 1) * 2 + (v & 1),  # input phase p
                            qy * 2 + qx,  # output phase q
                            ky,
                            kx,
                        )
                    )
    return KH, KW, -du_min, -dv_min, tuple(entries)


@functools.lru_cache(maxsize=None)
def _pack_matrix(kh: int, kw: int):
    """Constant 0/1 scatter tensor M[ky,kx,du,dv,p,q] realizing the
    fine-tap -> packed-tap mapping of ``_pack_plan``."""
    KH, KW, pad_h, pad_w, entries = _pack_plan(kh, kw)
    M = np.zeros((kh, kw, KH, KW, 4, 4), np.float32)
    for du, dv, p, q, ky, kx in entries:
        M[ky, kx, du, dv, p, q] = 1.0
    return M, pad_h, pad_w


def pack_kernel(W) -> Tuple[jnp.ndarray, Tuple[int, int], Tuple[int, int]]:
    """HWIO fine kernel -> (packed HWIO kernel [KH,KW,4Ci,4Co],
    (pad_h, pad_w) explicit coarse padding).

    One einsum against a constant selection tensor — NOT a scatter chain:
    the ``.at[].add`` formulation unrolled to ~50 dynamic-update-slices
    per conv per step inside the epoch scan (profiled: ~1 ms/step of DUS
    + their backward gathers on v5e)."""
    kh, kw, ci, co = W.shape
    M, pad_h, pad_w = _pack_matrix(kh, kw)
    Wp = jnp.einsum(
        "yxuvpq,yxio->uvpiqo", jnp.asarray(M, W.dtype), W
    )
    KH, KW = M.shape[2], M.shape[3]
    return Wp.reshape(KH, KW, 4 * ci, 4 * co), (pad_h, pad_w)


def tile4(v):
    """Per-fine-channel parameter -> packed channels (phase-major)."""
    return jnp.tile(v, 4)


def packed_conv(xp, W_fine, bias=None):
    """Apply a fine-grid conv (HWIO, odd kernel, SAME zero pad) on the
    packed representation.  Exact."""
    Wp, (ph, pw) = pack_kernel(W_fine.astype(xp.dtype))
    y = jax.lax.conv_general_dilated(
        xp,
        Wp,
        window_strides=(1, 1),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + tile4(bias).astype(y.dtype)
    return y


def packed_maxpool2(xp):
    """Fine 2x2/2 maxpool == max over the 4 phase groups; returns the
    UNPACKED pooled map (which is at the packed spatial resolution)."""
    B, h, w, C4 = xp.shape
    C = C4 // 4
    return jnp.max(xp.reshape(B, h, w, 4, C), axis=3)


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
    return jax.nn.gelu(x, approximate=False)


def _packed_block(xp, params: Dict, stats: Dict):
    """One CrossCNNBlock (eval) on the packed layout."""
    dt = xp.dtype

    def conv(name, src):
        p = params[name]
        return packed_conv(src, p["kernel"], p["bias"])

    def affine(name, src):
        s, t = _fold_bn(params[name], stats[name])
        return src * tile4(s).astype(dt) + tile4(t).astype(dt)

    a = conv("block12_1", conv("block12_0", xp).astype(dt)).astype(dt)
    a = affine("block12_3", _lrelu(a))
    b = conv("block34_0", xp).astype(dt)
    b = conv("block34_1", b).astype(dt)
    b = conv("block34_2", b).astype(dt)
    b = affine("block34_4", _lrelu(b))
    g = _gelu(a + b)
    y = conv("block5_0", g.astype(dt)).astype(dt)
    return affine("block5_2", _lrelu(y))


# ---------------------------------------------------------------------------
# training path: phase-aware BN batch statistics
# ---------------------------------------------------------------------------

def _bn_train_packed(xp, bn: Dict, stats: Dict, momentum: float = 0.9, eps: float = 1e-5):
    """Train-mode BatchNorm on the packed layout.

    Fine-channel statistics reduce over (B, H, W) — on the packed tensor
    that is (B, h, w, the 4 phase groups), the exact same element set, so
    numerics match flax BatchNorm up to reassociation.  Returns the
    normalized tensor and the EMA-updated running stats."""
    B, h, w, C4 = xp.shape
    C = C4 // 4
    # f32 accumulation happens INSIDE the reductions (fused convert) —
    # materializing an f32 copy of the activation costs real HBM traffic
    # (see models/layers.py::BatchNorm)
    xg = xp.reshape(B, h, w, 4, C)
    mean = jnp.mean(xg.astype(jnp.float32), axis=(0, 1, 2, 3))
    var = (
        jnp.mean(xg.astype(jnp.float32) * xg.astype(jnp.float32), axis=(0, 1, 2, 3))
        - mean * mean
    )
    inv = bn["scale"] / jnp.sqrt(var + eps)
    y = xp * tile4(inv).astype(xp.dtype) + tile4(bn["bias"] - mean * inv).astype(xp.dtype)
    new_stats = {
        "mean": momentum * stats["mean"] + (1 - momentum) * mean,
        "var": momentum * stats["var"] + (1 - momentum) * var,
    }
    return y, new_stats


def _packed_block_train(xp, params: Dict, stats: Dict):
    dt = xp.dtype
    new_stats = {}

    def conv(name, src):
        p = params[name]
        return packed_conv(src, p["kernel"], p["bias"])

    def bn(name, src):
        y, ns = _bn_train_packed(src, params[name], stats[name])
        new_stats[name] = ns
        return y

    a = conv("block12_1", conv("block12_0", xp).astype(dt)).astype(dt)
    a = bn("block12_3", _lrelu(a))
    b = conv("block34_0", xp).astype(dt)
    b = conv("block34_1", b).astype(dt)
    b = conv("block34_2", b).astype(dt)
    b = bn("block34_4", _lrelu(b))
    g = _gelu(a + b)
    y = conv("block5_0", g.astype(dt)).astype(dt)
    return bn("block5_2", _lrelu(y)), new_stats


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
    y, new_stats["cnn_1"] = _bn_train_packed(y, params["cnn_1"], stats["cnn_1"])
    y = y.astype(dt)
    xs: List[jnp.ndarray] = []
    xs_pk: List[jnp.ndarray] = []
    for level in range(5):
        y, ns = _packed_block_train(
            y, params[f"path_estan_{level}"], stats[f"path_estan_{level}"]
        )
        y = y.astype(dt)
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
