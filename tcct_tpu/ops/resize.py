"""Torch-exact image resizing in pure XLA (gather + lerp along each axis).

The reference relies on three interpolation flavours
(reference task1/nets/tcct.py:890, 941, 926):

- bilinear ``align_corners=True``  — decoder 2x upsampling (``MPUpBlock``)
- bilinear ``align_corners=False`` — aux-head / feats upsampling
- bicubic  ``align_corners=False`` — GateFusion's random alpha map

``jax.image.resize`` implements none of these with bit-exact PyTorch
semantics (it uses a symmetric kernel formulation), so we implement the
separable gather form directly.  Each axis is resized independently with
precomputed (static) indices and weights — XLA turns this into two fused
gathers, which map well onto TPU vector loads.

All functions take NHWC (or any rank-N array with the two spatial axes
specified) and are jit/vmap/grad friendly: weights depend only on static
shapes, so nothing here introduces dynamic shapes under ``jit``.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np


def _linear_coeffs(in_size: int, out_size: int, align_corners: bool):
    """Static source indices + weights for 1-D linear interpolation.

    Matches torch's ``area_pixel_compute_source_index``: half-pixel centers
    with a clamp to 0 when ``align_corners=False``; endpoint-aligned
    otherwise.
    """
    if out_size == in_size:
        idx = np.arange(in_size)
        return idx, idx, np.zeros(in_size, np.float32)
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros(1, np.float64)
        else:
            src = i * (in_size - 1) / (out_size - 1)
    else:
        src = (i + 0.5) * in_size / out_size - 0.5
        src = np.maximum(src, 0.0)
    i0 = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w = (src - i0).astype(np.float32)
    return i0, i1, w


@functools.lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool):
    """[out, in] interpolation matrix (2 nonzeros per row)."""
    i0, i1, w = _linear_coeffs(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, i0), 1.0 - w)
    np.add.at(m, (rows, i1), w)
    return m


# Below this input size, lower the per-axis resize to a dense
# constant-matrix contraction: on TPU a [out,in] matmul rides the MXU and
# beats the gather formulation (gathers don't vectorize well); above it
# the matrix itself would dominate memory, so fall back to gathers.
_MATMUL_RESIZE_MAX_IN = 4096

# Measured on v5e: the matmul form is faster FORWARD (bf16 13.6->13.2 ms,
# f32 18.0->16.3 ms full-model) but its autodiff transpose regresses the
# TRAIN step 40->68 ms — so the train step traces with gathers.
_USE_MATMUL = True


@contextlib.contextmanager
def resize_impl(mode: str):
    """Trace-time resize lowering choice: 'matmul' (inference default) or
    'gather' (used while tracing the train step)."""
    global _USE_MATMUL
    prev = _USE_MATMUL
    _USE_MATMUL = mode == "matmul"
    try:
        yield
    finally:
        _USE_MATMUL = prev


_EINSUM_LETTERS = "abcdefghijklmnpqrstuvwxyz"  # 'o' reserved for the out axis


def _apply_axis_matrix(x, m: np.ndarray, axis: int):
    """Contract the interpolation matrix directly over ``axis`` (a single
    dot_general, no moveaxis — explicit transposes cost real HBM traffic
    in the backward pass)."""
    mm = jnp.asarray(m, dtype=x.dtype if x.dtype != jnp.float64 else jnp.float32)
    axis = axis % x.ndim
    in_sub = "".join(_EINSUM_LETTERS[i] for i in range(x.ndim))
    out_sub = in_sub[:axis] + "o" + in_sub[axis + 1 :]
    eq = f"{in_sub},o{in_sub[axis]}->{out_sub}"
    return jnp.einsum(eq, x, mm, preferred_element_type=x.dtype)


@functools.lru_cache(maxsize=None)
def _adjoint_table(i0_t, i1_t, w_t, in_size: int):
    """Static transpose of a gather-lerp axis map: for each INPUT index i,
    the (output index, weight) pairs that read it, padded to a fixed K."""
    contrib = [[] for _ in range(in_size)]
    for j, (a, b, w) in enumerate(zip(i0_t, i1_t, w_t)):
        contrib[a].append((j, 1.0 - w))
        contrib[b].append((j, w))
    K = max(len(c) for c in contrib)
    idx = np.zeros((in_size, K), np.int32)
    wt = np.zeros((in_size, K), np.float32)
    for i, c in enumerate(contrib):
        for k, (j, w) in enumerate(c):
            idx[i, k] = j
            wt[i, k] = w
    return idx, wt, K


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _gather_lerp(x, i0_t, i1_t, w_t, axis: int, in_size: int):
    """1-D linear interpolation along ``axis`` via two gathers, with a
    GATHER-based adjoint: jax's autodiff transposes ``take`` into
    scatter-adds, which don't vectorize on TPU — the transpose of a
    static lerp is just another static gather-weighted sum."""
    x0 = jnp.take(x, jnp.asarray(np.asarray(i0_t)), axis=axis)
    x1 = jnp.take(x, jnp.asarray(np.asarray(i1_t)), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = len(i0_t)
    w = jnp.asarray(np.asarray(w_t)).reshape(shape).astype(x.dtype)
    return x0 * (1 - w) + x1 * w


def _gather_lerp_fwd(x, i0_t, i1_t, w_t, axis, in_size):
    return _gather_lerp(x, i0_t, i1_t, w_t, axis, in_size), None


def _gather_lerp_bwd(i0_t, i1_t, w_t, axis, in_size, _res, g):
    idx, wt, K = _adjoint_table(i0_t, i1_t, w_t, in_size)
    shape = [1] * g.ndim
    shape[axis] = in_size
    acc = None
    for k in range(K):
        term = jnp.take(g, jnp.asarray(idx[:, k]), axis=axis) * jnp.asarray(
            wt[:, k]
        ).reshape(shape).astype(g.dtype)
        acc = term if acc is None else acc + term
    return (acc,)


_gather_lerp.defvjp(_gather_lerp_fwd, _gather_lerp_bwd)


def _lerp_axis(x, i0, i1, w, axis: int):
    """Gather-lerp with the custom gather-adjoint backward."""
    return _gather_lerp(
        x, tuple(int(v) for v in i0), tuple(int(v) for v in i1),
        tuple(float(v) for v in w), axis % x.ndim, x.shape[axis % x.ndim],
    )


def _resize_axis_linear(x, out_size: int, axis: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if _USE_MATMUL and in_size <= _MATMUL_RESIZE_MAX_IN:
        return _apply_axis_matrix(x, _linear_matrix(in_size, out_size, align_corners), axis)
    i0, i1, w = _linear_coeffs(in_size, out_size, align_corners)
    return _lerp_axis(x, i0, i1, w, axis)


def resize_bilinear(x, size, align_corners: bool = False, spatial_axes=(1, 2)):
    """Bilinear resize of ``x`` to ``size=(H, W)`` along ``spatial_axes``.

    Default axes assume NHWC. Matches ``torch.nn.functional.interpolate``
    (mode='bilinear') for both align_corners settings.
    """
    h_axis, w_axis = spatial_axes
    x = _resize_axis_linear(x, size[0], h_axis, align_corners)
    x = _resize_axis_linear(x, size[1], w_axis, align_corners)
    return x


def resize_bilinear_2x_packed(x, align_corners: bool = True):
    """2x bilinear upsample of NHWC ``x`` emitted directly in the packed
    space-to-depth layout: [B,H,W,C] -> [B,H,W,4C] whose channel blocks are
    the four fine phases (py,px) of the [B,2H,2W,C] result, matching
    ``ops.packed_conv.pack_nhwc`` ordering.

    Exactly ``pack_nhwc(resize_bilinear(x, (2H,2W), align_corners))`` with
    the transpose fused away — the decoder's full-resolution stage can then
    stay on the packed layout end-to-end (lane-starved 32-channel fine
    tensors are the train step's main HBM cost; see
    models/layers.py::MaybePackedConv)."""
    B, H, W, C = x.shape
    if _USE_MATMUL and H <= _MATMUL_RESIZE_MAX_IN and W <= _MATMUL_RESIZE_MAX_IN:
        # inference lowering: per-phase rows of the same interpolation
        # matrices the fine resize uses — each phase is one MXU matmul.
        # The gather form below costs ~0.5 ms/batch of serial `take`s in
        # the serving trace (duke 256x576 itemization, SERVTRACE_r05);
        # the autodiff of this matmul form regresses the TRAIN backward
        # (BACKLOG), so the train step keeps gathers via resize_impl.
        mh = _linear_matrix(H, 2 * H, align_corners)
        mw = _linear_matrix(W, 2 * W, align_corners)
        rows = [_apply_axis_matrix(x, mh[py::2], 1) for py in (0, 1)]
        outs = [
            _apply_axis_matrix(rows[py], mw[px::2], 2)
            for py in (0, 1)
            for px in (0, 1)
        ]
        return jnp.concatenate(outs, axis=-1)
    i0, i1, w = _linear_coeffs(H, 2 * H, align_corners)
    rows = [_lerp_axis(x, i0[py::2], i1[py::2], w[py::2], 1) for py in (0, 1)]
    j0, j1, v = _linear_coeffs(W, 2 * W, align_corners)
    outs = [
        _lerp_axis(rows[py], j0[px::2], j1[px::2], v[px::2], 2)
        for py in (0, 1)
        for px in (0, 1)
    ]
    return jnp.concatenate(outs, axis=-1)


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), torch uses a=-0.75."""
    t = np.abs(t)
    out = np.where(
        t <= 1,
        (a + 2) * t**3 - (a + 3) * t**2 + 1,
        np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
    )
    return out


def _cubic_coeffs(in_size: int, out_size: int, align_corners: bool):
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = i * (in_size - 1) / max(out_size - 1, 1)
    else:
        src = (i + 0.5) * in_size / out_size - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = (src - i0).astype(np.float64)
    idxs, ws = [], []
    for k in range(-1, 3):
        idxs.append(np.clip(i0 + k, 0, in_size - 1))
        ws.append(_cubic_kernel(t - k).astype(np.float32))
    return idxs, ws


@functools.lru_cache(maxsize=None)
def _cubic_matrix(in_size: int, out_size: int, align_corners: bool):
    idxs, ws = _cubic_coeffs(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    for idx, w in zip(idxs, ws):
        np.add.at(m, (rows, idx), w)
    return m


def _resize_axis_cubic(x, out_size: int, axis: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if _USE_MATMUL and in_size <= _MATMUL_RESIZE_MAX_IN:
        return _apply_axis_matrix(x, _cubic_matrix(in_size, out_size, align_corners), axis)
    idxs, ws = _cubic_coeffs(in_size, out_size, align_corners)
    shape = [1] * x.ndim
    shape[axis] = out_size
    acc = 0
    for idx, w in zip(idxs, ws):
        acc = acc + jnp.take(x, jnp.asarray(idx), axis=axis) * jnp.asarray(
            w
        ).reshape(shape).astype(x.dtype)
    return acc


def resize_bicubic(x, size, align_corners: bool = False, spatial_axes=(1, 2)):
    """Bicubic resize (torch kernel a=-0.75), used by GateFusion's alpha map
    (reference task1/nets/tcct.py:926)."""
    h_axis, w_axis = spatial_axes
    x = _resize_axis_cubic(x, size[0], h_axis, align_corners)
    x = _resize_axis_cubic(x, size[1], w_axis, align_corners)
    return x


@functools.lru_cache(maxsize=None)
def _nearest_idx(in_size: int, out_size: int):
    # torch 'nearest': src = floor(i * in/out)
    i = np.arange(out_size, dtype=np.float64)
    return np.minimum((i * in_size / out_size).astype(np.int64), in_size - 1)


def resize_nearest(x, size, spatial_axes=(1, 2)):
    """Nearest-neighbour resize matching torch/cv2 INTER_NEAREST
    (reference task1/data/octnpy.py:72 uses cv2.INTER_NEAREST)."""
    h_axis, w_axis = spatial_axes
    if x.shape[h_axis] != size[0]:
        x = jnp.take(x, jnp.asarray(_nearest_idx(x.shape[h_axis], size[0])), axis=h_axis)
    if x.shape[w_axis] != size[1]:
        x = jnp.take(x, jnp.asarray(_nearest_idx(x.shape[w_axis], size[1])), axis=w_axis)
    return x
