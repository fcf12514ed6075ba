"""Cross-convolution CNN branch (reference task1/nets/tcct.py:803-885).

Each block runs two parallel paths — {3x3, 3x3} and {1xk -> kx1 -> 3x3} —
fused by GELU, then a 3x3 head.  Kernel sizes shrink per level
(13, 11, 9, 7, 5) with 2x2 max-pooling between levels.

Note the reference's activation ordering inside the Sequentials is
LeakyReLU *then* BatchNorm — reproduced exactly.  Submodule names keep the
torch Sequential indices (gaps where the activation has no params) so the
checkpoint importer is mechanical.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from tcct_tpu.models.layers import batchnorm, conv2d, gelu, leaky_relu
from tcct_tpu.ops.pool import max_pool_2d


class CrossCNNBlock(nn.Module):
    """Parallel {3x3,3x3} + {1xk,kx1,3x3} paths (reference tcct.py:803-828).

    ``plain=True`` forces k=3 (PlainCNNBlock ablation, tcct.py:830-855).
    """

    out_ch: int
    ksize: int = 9
    plain: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = 3 if self.plain else self.ksize
        # block12: conv3 -> conv3 -> LReLU -> BN
        a = conv2d(self.out_ch, 3, 1, 1, name="block12_0")(x)
        a = conv2d(self.out_ch, 3, 1, 1, name="block12_1")(a)
        a = leaky_relu(a)
        a = batchnorm(name="block12_3")(a, use_running_average=not train)
        # block34: conv(1,k) -> conv(k,1) -> conv3 -> LReLU -> BN
        b = conv2d(self.out_ch, (1, k), 1, (0, k // 2), name="block34_0")(x)
        b = conv2d(self.out_ch, (k, 1), 1, (k // 2, 0), name="block34_1")(b)
        b = conv2d(self.out_ch, 3, 1, 1, name="block34_2")(b)
        b = leaky_relu(b)
        b = batchnorm(name="block34_4")(b, use_running_average=not train)
        out = gelu(a + b)
        # block5: conv3 -> LReLU -> BN
        out = conv2d(self.out_ch, 3, 1, 1, name="block5_0")(out)
        out = leaky_relu(out)
        out = batchnorm(name="block5_2")(out, use_running_average=not train)
        return out


class CrossResNet(nn.Module):
    """5-level cross-conv pyramid (reference tcct.py:857-885).

    ``tiny`` -> channels (32,)*5; else (32,64,96,128,256).
    Returns the 5 pre-pool feature maps.
    """

    tiny: bool = False
    plain: bool = False
    in_ch: int = 3
    msca: bool = False  # optional SegNeXt attention after each block
    #                     (dead code in the reference, tcct.py:824)

    @property
    def layer_dims(self) -> Tuple[int, ...]:
        return (32, 32, 32, 32, 32) if self.tiny else (32, 64, 96, 128, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims = self.layer_dims
        ksizes = (13, 11, 9, 7, 5)
        x = conv2d(dims[0], 3, 1, 1, name="cnn_0")(x)
        x = batchnorm(name="cnn_1")(x, use_running_average=not train)
        xs = []
        for i in range(5):
            x = CrossCNNBlock(
                dims[i], ksizes[i], plain=self.plain, name=f"path_estan_{i}"
            )(x, train)
            if self.msca:
                from tcct_tpu.models.msca import MSCA

                x = MSCA(dims[i], name=f"att_{i}")(x)
            xs.append(x)
            x = max_pool_2d(x, 2)
        return xs
