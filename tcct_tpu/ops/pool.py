"""Pooling primitives (NHWC) with torch-exact edge semantics.

Key subtlety reproduced here: the reference's active token mixer
``MetaPool`` (reference task1/nets/tcct.py:405-415) feeds a **[B, N, C]
token tensor** to ``nn.AvgPool2d(3, stride=1, padding=1,
count_include_pad=False)``.  Torch interprets a 3-D input as (C, H, W), so
the 3x3 window slides over the *(token, channel)* axes — not over 2-D
space.  The shipped checkpoints were trained with exactly this op, so
``metapool_tokens`` reproduces it bit-for-bit; ``metapool_spatial`` is the
"intended" PoolFormer mixer offered as a config option.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _axis_counts(size: int, window: int, stride: int, pad: int) -> np.ndarray:
    """Valid (non-pad) element count per output position along one axis —
    computed statically so XLA never constant-folds a full-size ones
    tensor through reduce_window."""
    out = (size + 2 * pad - window) // stride + 1
    i = np.arange(out) * stride - pad
    lo = np.maximum(i, 0)
    hi = np.minimum(i + window, size)
    return np.maximum(hi - lo, 0).astype(np.float32)


def avg_pool_2d(
    x,
    window: int = 3,
    stride: int = 1,
    padding: int = 1,
    count_include_pad: bool = False,
    spatial_axes=(1, 2),
):
    """AvgPool over two axes of ``x`` with torch padding semantics."""
    h_axis, w_axis = spatial_axes
    win = [1] * x.ndim
    strd = [1] * x.ndim
    pad = [(0, 0)] * x.ndim
    win[h_axis] = win[w_axis] = window
    strd[h_axis] = strd[w_axis] = stride
    pad[h_axis] = pad[w_axis] = (padding, padding)
    summed = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add, tuple(win), tuple(strd), tuple(pad)
    )
    if count_include_pad:
        out = summed / float(window * window)
    else:
        ch = _axis_counts(x.shape[h_axis], window, stride, padding)
        cw = _axis_counts(x.shape[w_axis], window, stride, padding)
        counts = np.ones((len(ch), len(cw)), np.float32) * ch[:, None] * cw[None, :]
        shape = [1] * summed.ndim
        shape[h_axis], shape[w_axis] = len(ch), len(cw)
        out = summed * jnp.asarray(1.0 / counts).reshape(shape)
    return out.astype(x.dtype)


def max_pool_2d(x, window: int = 2, stride: int | None = None, spatial_axes=(1, 2)):
    """MaxPool with torch's default floor-mode VALID semantics
    (reference task1/nets/tcct.py:867 ``nn.MaxPool2d(kernel_size=2)``).

    The common 2x2/2 NHWC case lowers to reshape+max (profiled ~2x faster
    than reduce_window on v5e and fuses with neighbours); everything else
    uses reduce_window."""
    stride = stride or window
    h_axis, w_axis = spatial_axes
    if (
        window == 2
        and stride == 2
        and x.ndim == 4
        and (h_axis, w_axis) == (1, 2)
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
    ):
        B, H, W, C = x.shape
        return jnp.max(x.reshape(B, H // 2, 2, W // 2, 2, C), axis=(2, 4))
    win = [1] * x.ndim
    strd = [1] * x.ndim
    win[h_axis] = win[w_axis] = window
    strd[h_axis] = strd[w_axis] = stride
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, neg_inf, lax.max, tuple(win), tuple(strd), "VALID"
    )


def metapool_tokens_reference(x):
    """Reference-faithful MetaPool on a [B, N, C] token tensor via
    reduce_window — the semantics anchor for :func:`metapool_tokens`.

    Computes ``AvgPool2d(3, 1, pad=1, count_include_pad=False)(x) - x``
    where the 3x3 window slides over the (N, C) axes, exactly as the
    reference applies it (task1/nets/tcct.py:412-415 on a 3-D tensor).
    """
    return avg_pool_2d(x, 3, 1, 1, count_include_pad=False, spatial_axes=(1, 2)) - x


def _tridiag_ones(n: int) -> np.ndarray:
    m = np.zeros((n, n), np.float32)
    i = np.arange(n)
    m[i, i] = 1.0
    m[i[:-1], i[:-1] + 1] = 1.0
    m[i[1:], i[1:] - 1] = 1.0
    return m


def metapool_tokens(x):
    """MetaPool on [B, N, C] tokens, TPU-lowered: the 3x3 (token, channel)
    window sum factorizes into shift-adds along N (cheap sublane slices)
    and a tridiagonal ones-matrix contraction along C (rides the MXU with
    f32 accumulation), then the static count_include_pad=False count map
    divides it.  Same math as :func:`metapool_tokens_reference`
    (reassociated; ~1e-6 in f32) — reduce_window was 1.5 ms/step of the
    v5e train step.

    The shift-add runs in the INPUT dtype (a 3-term sum costs ~1 ulp):
    under bf16 mixed precision this halves the mixer's HBM traffic — the
    stage-0 [8,16384,64] tensors are ~17 MB each in bf16 vs 33 MB f32.
    f32 inputs take the exact f32 path as before."""
    B, N, C = x.shape
    rows = (
        x
        + jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0)))
        + jnp.pad(x[:, :-1], ((0, 0), (1, 0), (0, 0)))
    )
    summed = jnp.einsum(
        "bnc,cd->bnd", rows, jnp.asarray(_tridiag_ones(C), x.dtype),
        preferred_element_type=jnp.float32,
    )
    cn = _axis_counts(N, 3, 1, 1)
    cc = _axis_counts(C, 3, 1, 1)
    inv = jnp.asarray(1.0 / (cn[:, None] * cc[None, :]))
    return (summed * inv).astype(x.dtype) - x


def metapool_spatial(x, size):
    """PoolFormer-style spatial MetaPool: tokens reshaped to (H, W) and a
    3x3 spatial average pool applied per channel.  The mixer the reference
    *meant* (PoolFormer) — offered as a config option, not checkpoint
    compatible."""
    B, N, C = x.shape
    H, W = size
    y = x.reshape(B, H, W, C)
    y = avg_pool_2d(y, 3, 1, 1, count_include_pad=False, spatial_axes=(1, 2))
    return y.reshape(B, N, C) - x
