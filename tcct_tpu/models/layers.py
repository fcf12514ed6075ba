"""Shared flax building blocks (NHWC).

Naming convention (load-bearing): submodule attribute names mirror the
reference's torch attribute paths, with Sequential/ModuleList numeric
indices merged as ``name_i`` (e.g. torch ``stem.0.conv.weight`` lives at
flax path ``stem_0/conv/kernel``).  The torch-checkpoint importer
(tcct_tpu/infer/importer.py) is then a mechanical rename+transpose.

Parity notes vs the reference (task1/nets/tcct.py):
- BatchNorm: eps 1e-5, torch momentum 0.1 == flax momentum 0.9.
- Hardswish == jax.nn.hard_swish; GELU must be exact (approximate=False);
  LeakyReLU negative_slope 0.01.
- LayerNorm eps 1e-6 (tcct.py:427).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Activations matching torch defaults
hardswish = jax.nn.hard_swish
leaky_relu = lambda x: jax.nn.leaky_relu(x, negative_slope=0.01)

# GELU: exact (erf) in f32 to match torch bit-for-bit in the golden /
# train-parity tests; in bf16 compute the tanh form is the DEFAULT —
# its ~1e-3 relative error sits below bf16's own quantization (~4e-3)
# while skipping the erfc VPU transcendental that the r5 HBM audit
# measured at 6.8x its roofline floor (0.28 ms/step fwd alone).
# Measured A/B (v5e, bs=8 256^2 train epoch-scan): 19.31 -> 18.60 ms/step
# wall, 18.57 -> 17.81 ms device self.  TCCT_GELU_BF16=exact restores
# the erf form in bf16 too.
import os as _os

_GELU_BF16 = _os.environ.get("TCCT_GELU_BF16", "tanh")  # tanh | exact


def gelu(x):
    if _GELU_BF16 == "tanh" and x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def conv_init(fan: str = "fan_out", scale: float = 2.0):
    """He-normal over fan_out, matching torch ``normal_(0, sqrt(2/fan_out))``
    (reference tcct.py:86-87, 549-556)."""
    return nn.initializers.variance_scaling(scale, fan, "normal")


trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


# ---------------------------------------------------------------------------
# trace-time conv packing (space-to-depth lowering)
#
# Small-channel convs over large grids run at <=25% MXU lane width and a
# fraction of effective HBM bandwidth (profiled: the full-res decoder/aux
# 1x1 convs dominate the train step).  ``packed_convs()`` switches every
# eligible stride-1 conv to the EXACT space-to-depth rewrite
# (ops/packed_conv.py) at trace time — same parameters, same math,
# reassociated — exactly like ops/resize.py::resize_impl selects the
# resize lowering.
# ---------------------------------------------------------------------------

_PACK_CONVS = False
_PACK_IO = False
_PACK_MAX_CIN = 32  # 64-ch convs already run at 50% lane width; measured
#                     on v5e the per-conv pack/unpack round trip costs
#                     more than the 2x lane win (ViT stage-0 cpe/proj)
_PACK_MIN_PIXELS = 128 * 128  # measured on v5e: packing 64^2 grids is
#                               perf-neutral (round trip ~= lane win);
#                               restricting to 128^2+ keeps the graph
#                               smaller at the same speed

import contextlib


@contextlib.contextmanager
def packed_convs(enable: bool = True):
    """Trace-time switch: lower eligible convs via space-to-depth."""
    global _PACK_CONVS
    prev = _PACK_CONVS
    _PACK_CONVS = bool(enable)
    try:
        yield
    finally:
        _PACK_CONVS = prev


def packing_active() -> bool:
    return _PACK_CONVS


_PACKED_HEADS = False


@contextlib.contextmanager
def packed_heads(enable: bool = True):
    """Trace-time switch: the FTC packed tail returns its MAIN head still
    in the packed space-to-depth layout ([B,h,w,4*nc]) instead of
    unpacking — the packed-aware DS loss (train/step.py) consumes it via
    a phase-grouped reshape (dice is pixel-permutation-invariant, so the
    value is exact up to reassociation)."""
    global _PACKED_HEADS
    prev = _PACKED_HEADS
    _PACKED_HEADS = bool(enable)
    try:
        yield
    finally:
        _PACKED_HEADS = prev


def packed_heads_active() -> bool:
    return _PACKED_HEADS


_WANT_FEATS = True


@contextlib.contextmanager
def feats_gate(want: bool = True):
    """Trace-time switch: compute the polarization feats (norm_add) or
    skip them entirely.  The train step sets this from cfg.udh — the r5
    HBM audit caught the whole feats chain (L2 norms, bilinear resizes,
    and a full-res unpack of the packed decoder output) alive in the
    compiled step with the loss off; XLA did not DCE it through the
    scan + jvp structure."""
    global _WANT_FEATS
    prev = _WANT_FEATS
    _WANT_FEATS = bool(want)
    try:
        yield
    finally:
        _WANT_FEATS = prev


def feats_wanted() -> bool:
    return _WANT_FEATS


# ---------------------------------------------------------------------------
# trace-time depthwise-3x3 lowering (Pallas)
#
# XLA's TPU lowering of depthwise 3x3 convs runs ~8x off the HBM roofline
# (profiled: 1.54 ms/step across the ViT branch's cpe/proj, patch-embed
# and ResBlock dwconvs, plus the space-to-batch reshape/copy chains
# around the stride-2 patch embeds).  ``ops/pallas/dwconv.py`` replaces
# the eligible ones (3x3, stride 1 or 2, SAME, groups == channels) with
# a VMEM-resident kernel whose FUSED backward reads x and g once for
# both dx and all nine dw taps.  Tri-state gate: None = auto (real TPU
# backend, single device — a Pallas call under a >1-device mesh would be
# replicated by GSPMD); True = force (CPU tests run the interpreter);
# False = off.
#
# DEFAULT: OFF — measured on-chip r4 (tools/bench_dwconv.py, v5e) and
# it LOSES: train epoch 23.15 vs XLA 19.71 ms/step, infer 7.69 vs 6.48,
# micro fwd+bwd 1.344 vs 0.958 ms at [8,128,128,64] bf16 (full numbers
# in BACKLOG.md).  The kernel is exact (tests/test_dwconv.py) and the
# stride-1 path Mosaic-compiles; stride-2's fused backward trips a
# Mosaic reduction bug and is excluded from the compiled path.  Set
# TCCT_PALLAS_DW=1 to arm for re-measurement on a newer stack.
# ---------------------------------------------------------------------------

import os as _os

_PALLAS_DW = None if _os.environ.get("TCCT_PALLAS_DW", "0") == "1" else False


@contextlib.contextmanager
def pallas_dw(enable):
    """Trace-time switch for the Pallas depthwise-3x3 lowering
    (True / False / None=auto)."""
    global _PALLAS_DW
    prev = _PALLAS_DW
    _PALLAS_DW = enable
    try:
        yield
    finally:
        _PALLAS_DW = prev


@contextlib.contextmanager
def packed_io(enable: bool = True):
    """Trace-time switch: inside this context, eligible convs take
    ALREADY-PACKED inputs ([B,h,w,4*C_fine]) and return packed outputs —
    no internal pack/unpack round trip.  The caller owns the layout
    (models/ftc.py's decoder tail).  Parameters stay fine-shaped."""
    global _PACK_IO
    prev = _PACK_IO
    _PACK_IO = bool(enable)
    try:
        yield
    finally:
        _PACK_IO = prev


class MaybePackedConv(nn.Conv):
    """nn.Conv that lowers to the exact packed (space-to-depth) form when
    ``packed_convs()`` is active and the geometry is eligible: stride 1,
    ungrouped, odd kernel with torch-SAME padding, even H/W, small C_in,
    enough pixels to matter.  Parameter tree is identical to nn.Conv."""

    def _geom_eligible(self) -> bool:
        kh, kw = self.kernel_size
        strides = self.strides if self.strides is not None else (1, 1)
        pad = self.padding
        return (
            strides in ((1, 1), 1)
            and self.feature_group_count == 1
            and kh % 2 == 1
            and kw % 2 == 1
            and isinstance(pad, (tuple, list))
            and tuple(map(tuple, pad)) == ((kh // 2, kh // 2), (kw // 2, kw // 2))
            and (self.kernel_dilation in (None, 1, (1, 1)))
            and (self.input_dilation in (None, 1, (1, 1)))
        )

    def _pack_eligible(self, x) -> bool:
        return (
            _PACK_CONVS
            and x.ndim == 4
            and self._geom_eligible()
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
            and x.shape[1] * x.shape[2] >= _PACK_MIN_PIXELS
            and x.shape[-1] <= _PACK_MAX_CIN
        )

    def _dw_pallas_eligible(self, x) -> bool:
        from tcct_tpu.ops.pallas.dwconv import dwconv3x3_eligible, on_tpu

        if _PALLAS_DW is False or x.ndim != 4:
            return False
        if _PALLAS_DW is None and (not on_tpu() or jax.device_count() != 1):
            return False
        strides = self.strides if self.strides is not None else (1, 1)
        if strides == 1:
            strides = (1, 1)
        return (
            tuple(self.kernel_size) == (3, 3)
            and strides in ((1, 1), (2, 2))
            and self.feature_group_count == self.features
            and x.shape[-1] == self.features
            and isinstance(self.padding, (tuple, list))
            and tuple(map(tuple, self.padding)) == ((1, 1), (1, 1))
            and self.kernel_dilation in (None, 1, (1, 1))
            and self.input_dilation in (None, 1, (1, 1))
            # compiled (non-interpreter) lowering excludes stride-2: its
            # backward trips a Mosaic reduction bug (see dwconv.py)
            and dwconv3x3_eligible(
                x.shape, x.dtype, stride=strides[0], compiled=on_tpu()
            )
        )

    def _params(self, cin):
        kshape = tuple(self.kernel_size) + (cin, self.features)
        kernel = self.param("kernel", self.kernel_init, kshape, self.param_dtype)
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        return kernel, bias

    @nn.compact
    def __call__(self, x):
        from tcct_tpu.ops.packed_conv import pack_nhwc, packed_conv, unpack_nhwc

        # packed_io is an explicit caller-owned layout contract — it does
        # not require the global packed_convs() heuristic switch (the
        # serving path packs its tail without per-conv auto-packing)
        if _PACK_IO and x.ndim == 4:
            # caller-managed packed layout: x is [B,h,w,4*C_fine].  A
            # geometry-ineligible conv must NOT silently fall through to
            # the plain path — it would consume the packed tensor with a
            # fine-shaped kernel (wrong layout, possibly silently if
            # params were initialized under this context).
            if not self._geom_eligible():
                raise ValueError(
                    f"MaybePackedConv '{self.name}': packed_io() is active but "
                    f"the conv geometry (kernel {self.kernel_size}, strides "
                    f"{self.strides}, padding {self.padding}, groups "
                    f"{self.feature_group_count}) is not packed-eligible — the "
                    "caller owns the packed layout and must unpack first"
                )
            kernel, bias = self._params(x.shape[-1] // 4)
            return packed_conv(
                x,
                kernel.astype(x.dtype),
                bias.astype(x.dtype) if bias is not None else None,
            )
        if self._dw_pallas_eligible(x):
            from tcct_tpu.ops.pallas.dwconv import dwconv3x3

            strides = self.strides if self.strides not in (None, 1) else (1, 1)
            kernel, bias = self._params(1)
            y = dwconv3x3(x, kernel.astype(x.dtype), stride=strides[0])
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y
        if not self._pack_eligible(x):
            from tcct_tpu.ops.winograd import (
                conv3x3_winograd,
                winograd_active,
                winograd_eligible,
            )

            if (
                winograd_active()
                and self.feature_group_count == 1
                and winograd_eligible(
                    x.shape, tuple(self.kernel_size) + (0, 0),
                    self.strides, self.padding,
                )
            ):
                kernel, bias = self._params(x.shape[-1])
                return conv3x3_winograd(
                    x,
                    kernel.astype(x.dtype),
                    bias=bias.astype(x.dtype) if bias is not None else None,
                )
            return super().__call__(x)
        kernel, bias = self._params(x.shape[-1])
        yp = packed_conv(
            pack_nhwc(x),
            kernel.astype(x.dtype),
            bias.astype(x.dtype) if bias is not None else None,
        )
        return unpack_nhwc(yp)


def conv2d(
    features,
    kernel_size=3,
    stride=1,
    padding=None,
    groups=1,
    use_bias=True,
    name=None,
    kernel_init=None,
    dtype=None,
):
    """torch-style nn.Conv2d constructor: int kernel/stride/padding,
    explicit symmetric padding (torch semantics, not XLA SAME)."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    if padding is None:
        padding = (kernel_size[0] // 2, kernel_size[1] // 2)
    if isinstance(padding, int):
        padding = (padding, padding)
    pad = ((padding[0], padding[0]), (padding[1], padding[1]))
    if isinstance(stride, int):
        stride = (stride, stride)
    return MaybePackedConv(
        features=features,
        kernel_size=kernel_size,
        strides=stride,
        padding=pad,
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=kernel_init or conv_init(),
        dtype=dtype,
        name=name,
    )


class BatchNorm(nn.Module):
    """Drop-in for nn.BatchNorm (same param/stats tree, same semantics:
    torch momentum 0.1 == 0.9 here, eps 1e-5, fast variance), with the
    batch statistics accumulated in f32 INSIDE the reductions
    (``jnp.mean(..., dtype=f32)``) instead of materializing an f32 copy of
    the activation first.  Profiled on v5e: flax's force_float32_reductions
    cast was ~1.5 ms/step of pure convert_element_type traffic in the bf16
    train step.  Normalization itself runs in the input dtype, exactly as
    flax's promote-then-cast does for bf16 inputs with bf16 scale/bias."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x, use_running_average: bool, packed: bool = False):
        """``packed=True``: x is a space-to-depth tensor [B,h,w,4C] whose
        channel blocks are the four fine phases (ops/packed_conv.py) —
        statistics reduce over (B, h, w, phase), the exact fine-pixel
        element set, and the (C,) affine/stats are phase-tiled.  Param and
        batch_stats shapes are identical to the fine layout."""
        C = x.shape[-1] // 4 if packed else x.shape[-1]
        scale = self.param("scale", self.scale_init, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        from tcct_tpu.ops.packed_conv import stat_impl

        vector_stats = not packed or stat_impl() == "vector"
        xs = x if vector_stats else x.reshape(x.shape[:-1] + (4, C))
        axes = tuple(range(xs.ndim - 1))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = xs.astype(jnp.float32) if xs.dtype != jnp.float32 else xs
            # packed 'vector' lowering: reduce to a per-PACKED-channel [4C]
            # vector first and fold the phase groups on the vector (phases
            # have equal element counts, so mean-of-phase-means is the fine
            # mean exactly, reassociated).  Measured a wash vs the [..,4,C]
            # reshape form on chip (ops/packed_conv.py _STAT_IMPL note)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(xf * xf, axis=axes)
            if packed and vector_stats:
                mean = jnp.mean(mean.reshape(4, C), axis=0)
                var = jnp.mean(var.reshape(4, C), axis=0)
            var = var - mean * mean
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value.astype(jnp.float32) + (1 - m) * mean.astype(jnp.float32)
                ra_var.value = m * ra_var.value.astype(jnp.float32) + (1 - m) * var.astype(jnp.float32)
        # normalize with flax's exact expression order ((x-mean)*inv+bias,
        # not the folded x*inv+shift form) — the folded form's different
        # rounding structure measurably perturbs deep-backward gradients
        # (tests/test_train_parity.py)
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.epsilon) * scale.astype(
            jnp.float32
        )
        dt = x.dtype
        if packed:
            mean, inv, bias = (jnp.tile(v, 4) for v in (mean, inv, bias))
        return (x - mean.astype(dt)) * inv.astype(dt) + bias.astype(dt)


def batchnorm(name=None, bn_weight_init: float = 1.0, epsilon: float = 1e-5):
    return BatchNorm(
        momentum=0.9,
        epsilon=epsilon,
        scale_init=nn.initializers.constant(bn_weight_init),
        name=name,
    )


class ConvBN(nn.Module):
    """Conv(bias=False) + BN + optional act (reference tcct.py:55-97)."""

    out_ch: int
    kernel_size: int = 1
    stride: int = 1
    pad: int = 0
    groups: int = 1
    bn_weight_init: float = 1.0
    act: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(
            self.out_ch,
            self.kernel_size,
            self.stride,
            self.pad,
            groups=self.groups,
            use_bias=False,
            name="conv",
        )(x)
        x = batchnorm(name="bn", bn_weight_init=self.bn_weight_init)(
            x, use_running_average=not train
        )
        if self.act is not None:
            x = self.act(x)
        return x


class DWConvBN(nn.Module):
    """Depthwise + pointwise conv + BN + act (reference tcct.py:99-147)."""

    out_ch: int
    kernel_size: int = 1
    stride: int = 1
    act: Optional[Callable] = hardswish

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(
            self.out_ch,
            self.kernel_size,
            self.stride,
            (self.kernel_size - 1) // 2,
            groups=self.out_ch,
            use_bias=False,
            name="dwconv",
        )(x)
        x = conv2d(self.out_ch, 1, 1, 0, use_bias=False, name="pwconv")(x)
        x = batchnorm(name="bn")(x, use_running_average=not train)
        if self.act is not None:
            x = self.act(x)
        return x


class Mlp(nn.Module):
    """fc1 -> GELU -> fc2 (reference tcct.py:29-53; DROP_RATE==0)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=trunc_normal_init, name="fc1")(x)
        x = gelu(x)
        x = nn.Dense(self.out, kernel_init=trunc_normal_init, name="fc2")(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth per-sample (timm DropPath; reference tcct.py:452)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class ResBlock(nn.Module):
    """Conv-BN-act / depthwise / Conv-BN residual (reference tcct.py:518-572)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBN(self.features, act=hardswish, name="conv1")(x, train)
        y = conv2d(self.features, 3, 1, 1, groups=self.features, use_bias=False, name="dwconv")(y)
        y = batchnorm(name="norm")(y, use_running_average=not train)
        y = hardswish(y)
        y = ConvBN(self.features, name="conv2")(y, train)
        return identity + y


def layer_norm(name=None):
    return nn.LayerNorm(epsilon=1e-6, name=name)


class ShiftConv3x3(nn.Module):
    """3x3 depthwise conv as 9 shifted multiply-adds.

    For tiny channel counts (the RegNet lap heads are 1-4 channels) a real
    conv op wastes the MXU and — worse — its filter-backprop trips an XLA
    TPU space_to_batch_converter compiler bug (observed: 'Operands to
    select must be the same shape' CHECK-crash).  Nine shifted elementwise
    FMAs lower to pure VPU code, fuse with their neighbours, and have a
    trivial backward.  Param shapes match ``nn.Conv`` (kernel (3,3,1,C),
    bias (C,)) so the torch importer needs no special case."""

    features: int

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", conv_init(), (3, 3, 1, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        B, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = b.reshape(1, 1, 1, -1).astype(x.dtype) * jnp.ones_like(x)
        for i in range(3):
            for j in range(3):
                y = y + xp[:, i : i + H, j : j + W, :] * k[i, j, 0]
        return y
