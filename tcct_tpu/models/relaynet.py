"""ReLayNet baseline (reference task1/onnx/tcct_heg.py:29-151).

Classic OCT-layer U-Net: 7x3 conv blocks with PReLU, MaxPool with
*indices* and MaxUnpool index-skips in the decoder, channel-concat skips,
plus the reference's instrumentation heads (eran/dran 1x1 convs feeding
``norm_add`` feats for polarization-loss comparability).

TPU note: torch's MaxUnpool scatters pooled values back to their argmax
positions.  Here the pool stage records a one-hot argmax mask over each
2x2 window (computed with comparisons, no gather) and unpooling is a
broadcast-multiply — fully vectorized, no scatter.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcct_tpu.models.ftc import norm_add
from tcct_tpu.models.layers import batchnorm, conv2d
from tcct_tpu.ops.resize import resize_bilinear


def max_pool_with_mask(x):
    """2x2/2 max pool returning (pooled, argmax one-hot mask).

    The mask has the input's shape and is 1 exactly where the max of each
    window lives (ties broken toward the first element, matching torch's
    return_indices semantics closely enough for training)."""
    B, H, W, C = x.shape
    w = x.reshape(B, H // 2, 2, W // 2, 2, C)
    pooled = jnp.max(w, axis=(2, 4))
    # one-hot of the max position, first-wins tie-break via cumsum trick
    eq = (w == pooled[:, :, None, :, None, :]).astype(jnp.float32)
    flat = eq.transpose(0, 1, 3, 5, 2, 4).reshape(B, H // 2, W // 2, C, 4)
    first = (jnp.cumsum(flat, axis=-1) == 1.0) & (flat > 0)
    mask = (
        first.astype(jnp.float32)
        .reshape(B, H // 2, W // 2, C, 2, 2)
        .transpose(0, 1, 4, 2, 5, 3)
        .reshape(B, H, W, C)
    )
    return pooled, mask


def max_unpool(x, mask):
    """Inverse: place each pooled value at its recorded argmax position."""
    B, h, w, C = x.shape
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return up * mask


class BasicBlock(nn.Module):
    """7x3 conv + BN + PReLU (reference tcct_heg.py:29-59)."""

    filters: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.filters, (7, 3), 1, (3, 1), name="conv")(x)
        x = batchnorm(name="batchnorm")(x, use_running_average=not train)
        alpha = self.param("prelu", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, alpha * x)


class ReLayNet(nn.Module):
    """3-level encoder/decoder with unpool index skips
    (reference tcct_heg.py:94-148)."""

    out_channels: int = 8
    filters: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        out1 = BasicBlock(f, name="encode1")(x, train)
        e1, m1 = max_pool_with_mask(out1)
        out2 = BasicBlock(f, name="encode2")(e1, train)
        e2, m2 = max_pool_with_mask(out2)
        out3 = BasicBlock(f, name="encode3")(e2, train)
        e3, m3 = max_pool_with_mask(out3)
        bn = BasicBlock(f, name="bottleneck")(e3, train)

        d3 = BasicBlock(f, name="decode1")(
            jnp.concatenate([out3, max_unpool(bn, m3)], -1), train
        )
        d2 = BasicBlock(f, name="decode2")(
            jnp.concatenate([out2, max_unpool(d3, m2)], -1), train
        )
        d1 = BasicBlock(f, name="decode3")(
            jnp.concatenate([out1, max_unpool(d2, m1)], -1), train
        )
        prob = conv2d(self.out_channels, 1, 1, 0, name="classifier_conv")(d1)

        from tcct_tpu.models.layers import feats_wanted

        e1u = resize_bilinear(e1, x.shape[1:3], align_corners=False)
        # polarization feats, trace-time gated like FTC's (layers.feats_gate)
        feats = [
            norm_add(
                [
                    conv2d(32, 1, 1, 0, name="eran1")(e1u),
                    conv2d(32, 1, 1, 0, name="eran2")(e2),
                    conv2d(32, 1, 1, 0, name="eran3")(e3),
                    conv2d(32, 1, 1, 0, name="dran1")(d1),
                    conv2d(32, 1, 1, 0, name="dran2")(d2),
                    conv2d(32, 1, 1, 0, name="dran3")(d3),
                ]
            )
            if feats_wanted()
            else None
        ]
        return [prob], feats
