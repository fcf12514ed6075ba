"""Task-2 glaucoma classifier (reference task2/t2_train.py:128-153).

The reference wraps a Paddle ResNet-18/34/50 with per-stage Dropout
(0.1/0.2/0.3/0.4) and an fc -> 256 -> 2 head.  Here the ResNet is
implemented natively in flax (NHWC); ImageNet-pretrained torchvision or
paddle weights are grafted via :func:`load_resnet_checkpoint` when a
weight file is supplied.  This environment cannot download the ImageNet
weights (zero egress), so training here starts from scratch — an explicit
deviation from the reference's ``pretrained=True`` (t2_train.py:129-137);
production users pass the checkpoint path (or set ``TCCT_RESNET_PT``).
"""

from __future__ import annotations

import re
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcct_tpu.models.layers import batchnorm, conv2d
from tcct_tpu.ops.pool import max_pool_2d


class ResBasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = conv2d(self.features, 3, self.stride, 1, use_bias=False, name="conv1")(x)
        y = batchnorm(name="bn1")(y, use_running_average=not train)
        y = jax.nn.relu(y)
        y = conv2d(self.features, 3, 1, 1, use_bias=False, name="conv2")(y)
        y = batchnorm(name="bn2")(y, use_running_average=not train)
        if self.stride != 1 or identity.shape[-1] != self.features:
            identity = conv2d(
                self.features, 1, self.stride, 0, use_bias=False, name="downsample_0"
            )(x)
            identity = batchnorm(name="downsample_1")(
                identity, use_running_average=not train
            )
        return jax.nn.relu(y + identity)


class ResBottleneck(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out_ch = self.features * 4
        y = conv2d(self.features, 1, 1, 0, use_bias=False, name="conv1")(x)
        y = batchnorm(name="bn1")(y, use_running_average=not train)
        y = jax.nn.relu(y)
        y = conv2d(self.features, 3, self.stride, 1, use_bias=False, name="conv2")(y)
        y = batchnorm(name="bn2")(y, use_running_average=not train)
        y = jax.nn.relu(y)
        y = conv2d(out_ch, 1, 1, 0, use_bias=False, name="conv3")(y)
        y = batchnorm(name="bn3")(y, use_running_average=not train)
        if self.stride != 1 or identity.shape[-1] != out_ch:
            identity = conv2d(
                out_ch, 1, self.stride, 0, use_bias=False, name="downsample_0"
            )(x)
            identity = batchnorm(name="downsample_1")(
                identity, use_running_average=not train
            )
        return jax.nn.relu(y + identity)


_ARCH = {
    "res18": (ResBasicBlock, (2, 2, 2, 2)),
    "res34": (ResBasicBlock, (3, 4, 6, 3)),
    "res50": (ResBottleneck, (3, 4, 6, 3)),
}


class ClsModel(nn.Module):
    """ResNet backbone + per-stage dropout (0.1/0.2/0.3/0.4) +
    fc->256->2 head (reference t2_train.py:141-149)."""

    net: str = "res18"
    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layout = _ARCH.get(self.net, _ARCH["res18"])
        x = conv2d(64, 7, 2, 3, use_bias=False, name="conv1")(x)
        x = batchnorm(name="bn1")(x, use_running_average=not train)
        x = jax.nn.relu(x)
        x = max_pool_2d(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf), 3, 2)
        drops = (0.1, 0.2, 0.3, 0.4)
        feats = (64, 128, 256, 512)
        for li, (n_blocks, f, dp) in enumerate(zip(layout, feats, drops)):
            for bi in range(n_blocks):
                stride = 2 if (bi == 0 and li > 0) else 1
                x = block(f, stride, name=f"layer{li+1}_{bi}")(x, train)
            x = nn.Dropout(dp, deterministic=not train, name=f"drop{li+1}")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(256, name="fc_0")(x)
        x = nn.Dense(self.num_classes, name="fc_1")(x)
        return x


# ---------------------------------------------------------------------------
# pretrained-backbone grafting (reference t2_train.py:129-137)
# ---------------------------------------------------------------------------

def _canon_resnet_key(key: str) -> str:
    """Normalize torchvision / paddle / reference-wrapped ResNet keys to
    plain torchvision naming so the generic importer's merged-index
    convention lines up with ClsModel's module names.

    - ``base.`` prefix (the reference Model wraps the backbone as
      ``self.base``) is stripped;
    - ``layerN.0.B.`` (the reference re-wraps each stage as
      ``Sequential(layer, Dropout)``, t2_train.py:141-144) unwraps to
      ``layerN.B.``;
    - paddle BatchNorm ``._mean`` / ``._variance`` map to torch
      ``.running_mean`` / ``.running_var``.
    """
    if key.startswith("base."):
        key = key[5:]
    key = re.sub(r"^(layer\d)\.0\.(\d+)\.", r"\1.\2.", key)
    key = key.replace("._mean", ".running_mean").replace(
        "._variance", ".running_var"
    )
    return key


def load_resnet_checkpoint(path_or_state, variables):
    """Graft ImageNet-pretrained ResNet weights onto ClsModel variables.

    ``path_or_state``: a torch ``.pt``/``.pth`` path or an already-loaded
    ``{key: array}`` dict (torchvision, paddle.vision, or the reference's
    wrapped naming).  The ImageNet fc head is dropped (ours is
    fc -> 256 -> 2).  Raises if any backbone conv/bn stays unmatched, so a
    silent partial graft is impossible.  Returns (variables, report).
    """
    from tcct_tpu.infer.importer import import_torch_state, load_torch_file

    if isinstance(path_or_state, str):
        state = load_torch_file(path_or_state)
    else:
        state = {k: v for k, v in path_or_state.items()}
    state = {_canon_resnet_key(k): v for k, v in state.items()}
    state = {k: v for k, v in state.items() if not k.startswith("fc.")}
    variables, report = import_torch_state(state, variables, strict_shapes=False)
    unmatched = [
        k
        for k in report.untouched_target
        if any(s in k for s in ("conv", "bn", "downsample"))
    ]
    if unmatched:
        raise ValueError(
            f"pretrained graft left {len(unmatched)} backbone tensors "
            f"untouched, e.g. {unmatched[:4]} — wrong architecture or naming?"
        )
    return variables, report
