"""MSCA — SegNeXt multi-scale convolutional attention.

The reference carries this module as dead code (task1/onnx/tcct_goals.py:
803-834, constructed nowhere); ported here as a usable spatial-attention
block: a 5x5 depthwise context conv, three separable multi-scale strip
convs (7, 11, 21 — strip kernels suit the horizontal retina-layer
anatomy), a 1x1 mixing conv, gating the input multiplicatively.

Usable as a drop-in extra for CrossCNNBlock outputs (the reference's
commented ``self.att = MSCA(out_c)``, tcct.py:824) via
``CrossResNet(..., msca=True)`` — an extension beyond the reference's
live surface, off by default.
"""

from __future__ import annotations

from flax import linen as nn

from tcct_tpu.models.layers import conv2d


class MSCA(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        u = x
        attn = conv2d(self.dim, 5, 1, 2, groups=self.dim, name="conv0")(x)
        a0 = conv2d(self.dim, (1, 7), 1, (0, 3), groups=self.dim, name="conv0_1")(attn)
        a0 = conv2d(self.dim, (7, 1), 1, (3, 0), groups=self.dim, name="conv0_2")(a0)
        a1 = conv2d(self.dim, (1, 11), 1, (0, 5), groups=self.dim, name="conv1_1")(attn)
        a1 = conv2d(self.dim, (11, 1), 1, (5, 0), groups=self.dim, name="conv1_2")(a1)
        a2 = conv2d(self.dim, (1, 21), 1, (0, 10), groups=self.dim, name="conv2_1")(attn)
        a2 = conv2d(self.dim, (21, 1), 1, (10, 0), groups=self.dim, name="conv2_2")(a2)
        attn = attn + a0 + a1 + a2
        attn = conv2d(self.dim, 1, 1, 0, name="conv3")(attn)
        return attn * u
