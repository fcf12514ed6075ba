"""Fused CrossCNNBlock inference kernel (Pallas, TPU).

One CrossCNNBlock (reference task1/nets/tcct.py:803-828) is six chained
convolutions:

    a = BN12(lrelu(conv3x3(conv3x3(x))))
    b = BN34(lrelu(conv3x3(conv13x1(conv1x13(x)))))
    y = BN5(lrelu(conv3x3(gelu(a + b))))

The whole chain runs in VMEM per spatial tile (one HBM read of x, one
write of y) with bias / LeakyReLU / BN-affine / GELU in-register; tiles
carry a (k//2+2)-pixel halo and per-stage zero-masking reproduces each
conv's zero-padding exactly (bit-close to the torch reference through
the full model).

STATUS — correct but NOT the default serving path.  Measured on v5e
(bs=8, 256^2, bf16): XLA's conv fusions run the CrossResNet branch in
7.1 ms; this kernel's best formulation reached 20-37 ms.  The K-packed
im2col that would lift MXU utilisation (K = taps*C = 288/416 instead of
32) is blocked by current Mosaic restrictions: vector concatenation of
lane-misaligned shifted slices does not lower, channel-offset scratch
stores lane-rotate (slow), and tpu.matmul rejects multi-dim
contractions, leaving per-tap [M,32]x[32,32] dots whose pipeline
overhead dominates.  Kept as a tested, documented kernel (exactness
tests in tests/test_fused_crosscnn.py) and a base for revisiting when
Mosaic grows the needed layouts.  Inference only (eval-mode BN).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _halo(k: int) -> int:
    """Total receptive radius of the block chain for cross-kernel size k:
    block34 path k//2 + 1 (1xk -> kx1 -> 3x3), block12 path 2, block5 +1."""
    return k // 2 + 2


def _lrelu(x):
    return jnp.where(x >= 0, x, 0.01 * x)


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf, |error| < 1.5e-7 (Mosaic has
    no erf primitive; this is f32-exact for gelu purposes)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * np.float32(1.0 / np.sqrt(2.0))))


def _conv_im2col(src, w_ref, b_ref, taps_h: int, taps_w: int):
    """src [H, W, C] -> out [H-th+1, W-tw+1, Co]: per-tap accumulated
    3-D dots (single contracting dim over C).

    This is the only formulation current Mosaic lowers: tap-packed
    K = taps*C would need either vector concatenation of lane-misaligned
    shifted slices (doesn't lower), channel-offset scratch stores (lane-
    rotate, slow), or a multi-dim tpu.matmul contraction (rejected) —
    see the module STATUS note.

    w_ref: [taps, C, Co] (tap-major); b_ref: [1, Co]."""
    H, W, C = src.shape
    Ho, Wo = H - taps_h + 1, W - taps_w + 1
    w = w_ref[:]
    acc = None
    i = 0
    for di in range(taps_h):
        for dj in range(taps_w):
            part = jax.lax.dot_general(
                src[di : di + Ho, dj : dj + Wo, :],
                w[i],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
            i += 1
    return acc + b_ref[0]


def _affine(x, s_ref, t_ref):
    return x * s_ref[0] + t_ref[0]


def _block_kernel(
    x_hbm,
    w121, b121, w122, b122, s12, t12,
    w341, b341, w342, b342, w343, b343, s34, t34,
    w5, b5, s5, t5,
    out_ref,
    *, tile_h: int, tile_w: int, img_h: int, img_w: int, k: int,
):
    halo = _halo(k)
    k2 = k // 2
    th = pl.program_id(1)
    tw = pl.program_id(2)
    C = out_ref.shape[-1]

    def mask_outside(buf, off_h, off_w):
        """Zero values whose global position lies outside the image —
        each reference conv zero-pads its own input, so every chained
        intermediate must read as 0 beyond the image bounds."""
        Hb, Wb, _ = buf.shape
        g_r = jax.lax.broadcasted_iota(jnp.int32, (Hb, Wb, 1), 0) + (
            th * tile_h - halo + off_h
        )
        g_c = jax.lax.broadcasted_iota(jnp.int32, (Hb, Wb, 1), 1) + (
            tw * tile_w - halo + off_w
        )
        ok = (g_r >= 0) & (g_r < img_h) & (g_c >= 0) & (g_c < img_w)
        return jnp.where(ok, buf, 0.0)
    # whole padded image lives in VMEM per batch element (refetched only
    # when the outer grid axis changes); slice this cell's haloed tile
    x = x_hbm[
        0,
        pl.ds(th * tile_h, tile_h + 2 * halo),
        pl.ds(tw * tile_w, tile_w + 2 * halo),
        :,
    ]

    # block12: conv3x3 -> conv3x3 -> lrelu -> BN affine      (radius 2)
    a = _conv_im2col(x, w121, b121, 3, 3)
    a = mask_outside(a, 1, 1)
    a = _conv_im2col(a.astype(x.dtype), w122, b122, 3, 3)
    a = _affine(_lrelu(a), s12, t12)  # [T+12, T+12, C] region

    # block34: conv1xk -> convkx1 -> conv3x3 -> lrelu -> BN (radius k//2+1)
    bb = _conv_im2col(x, w341, b341, 1, k)
    bb = mask_outside(bb, 0, k2)
    bb = _conv_im2col(bb.astype(x.dtype), w342, b342, k, 1)
    bb = mask_outside(bb, k2, k2)
    bb = _conv_im2col(bb.astype(x.dtype), w343, b343, 3, 3)
    bb = _affine(_lrelu(bb), s34, t34)  # [T+2, T+2, C]

    # align: a (offset 2 from x) to bb's frame (offset k2+1):
    # crop a by k2-1 on each side.
    cr = k2 - 1
    a_c = a[cr : a.shape[0] - cr, cr : a.shape[1] - cr, :] if cr else a

    g = _gelu_exact(a_c + bb)
    g = mask_outside(g, k2 + 1, k2 + 1)

    # block5: conv3x3 -> lrelu -> BN affine                   (radius 1)
    y = _conv_im2col(g.astype(x.dtype), w5, b5, 3, 3)
    y = _affine(_lrelu(y), s5, t5)
    out_ref[0] = y.astype(out_ref.dtype)


def pack_conv(kernel_hwio: jnp.ndarray, dtype) -> jnp.ndarray:
    """HWIO conv kernel -> [taps, Ci, Co] tap-major contraction weights."""
    kh, kw, ci, co = kernel_hwio.shape
    return kernel_hwio.reshape(kh * kw, ci, co).astype(dtype)


def fold_bn(bn: Dict, stats: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eval-mode BN as a (scale, shift) affine pair (f32)."""
    scale = bn["scale"] / jnp.sqrt(stats["var"] + 1e-5)
    shift = bn["bias"] - stats["mean"] * scale
    return scale.astype(jnp.float32)[None], shift.astype(jnp.float32)[None]


def cross_resnet_fused(x, params: Dict, stats: Dict, interpret: bool = False):
    """Full CrossResNet forward (eval) with every CrossCNNBlock fused.

    ``params``/``stats``: the flax ``base_cnn`` subtree.  Returns the five
    pre-pool feature maps like ``CrossResNet.__call__``."""
    from tcct_tpu.ops.pool import max_pool_2d

    k = params["cnn_0"]["kernel"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["cnn_0"]["bias"].astype(x.dtype)
    s, t = fold_bn(params["cnn_1"], stats["cnn_1"])
    y = (y * s[0] + t[0]).astype(x.dtype)
    xs = []
    for i in range(5):
        tile = min(64, y.shape[1], y.shape[2])
        y = fused_cross_block(
            y, params[f"path_estan_{i}"], stats[f"path_estan_{i}"],
            tile=tile, interpret=interpret,
        )
        xs.append(y)
        y = max_pool_2d(y, 2)
    return xs


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_cross_block(
    x, params: Dict, stats: Dict, tile: int = 64, interpret: bool = False
):
    """Run one CrossCNNBlock (eval) fused.  ``params``/``stats`` are the
    flax subtree of a single ``CrossCNNBlock`` (block12_0..block5_2).

    x: [B, H, W, C] with H, W multiples of ``tile``; C_in == C_out.
    """
    B, H, W, C = x.shape
    assert H % tile == 0 and W % tile == 0, (H, W, tile)
    dt = x.dtype
    k = params["block34_0"]["kernel"].shape[1]
    halo = _halo(k)
    xp = jnp.pad(x, ((0, 0), (halo, halo), (halo, halo), (0, 0)))

    def conv_args(name):
        p = params[name]
        return pack_conv(p["kernel"].astype(dt), dt), p["bias"].astype(jnp.float32)[None]

    w121, b121 = conv_args("block12_0")
    w122, b122 = conv_args("block12_1")
    s12, t12 = fold_bn(params["block12_3"], stats["block12_3"])
    w341, b341 = conv_args("block34_0")
    w342, b342 = conv_args("block34_1")
    w343, b343 = conv_args("block34_2")
    s34, t34 = fold_bn(params["block34_4"], stats["block34_4"])
    w5, b5 = conv_args("block5_0")
    s5, t5 = fold_bn(params["block5_2"], stats["block5_2"])

    C_out = params["block5_0"]["kernel"].shape[-1]
    grid = (B, H // tile, W // tile)
    Hp, Wp = H + 2 * halo, W + 2 * halo
    full = lambda a: pl.BlockSpec(a.shape, lambda b, i, j: (0,) * a.ndim, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_block_kernel, tile_h=tile, tile_w=tile, img_h=H, img_w=W, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, C), lambda b, i, j: (b, 0, 0, 0), memory_space=pltpu.VMEM)
        ]
        + [full(a) for a in (w121, b121, w122, b122, s12, t12,
                             w341, b341, w342, b342, w343, b343, s34, t34,
                             w5, b5, s5, t5)],
        out_specs=pl.BlockSpec(
            (1, tile, tile, C_out), lambda b, i, j: (b, i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C_out), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, w121, b121, w122, b122, s12, t12,
      w341, b341, w342, b342, w343, b343, s34, t34,
      w5, b5, s5, t5)
