"""Segmentation losses and metrics (pure jnp, jit/grad/vmap friendly).

Numerics mirror the reference exactly so golden tests against torch pass:

- ``DiceLoss`` / ``IouLoss`` / ``MultiLoss``   <- task1/kite/losses/loss.py
- ``mdice_*`` / ``miou_*`` scoring statics     <- task1/kite/losses/miou.py
- ``deep_supervision_loss``                    <- task1/kite/loopback.py:62-73

Tensors are NHWC with the class axis last (``[B, H, W, C]``), the natural
TPU layout; the reference's channel-first math maps 1:1.  All reductions
are whole-array (no per-class Python loops at trace time beyond a static
class count, which XLA unrolls into one fused kernel).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Per-class coefficient primitives (reference loss.py:21-37, 51-56)
# ---------------------------------------------------------------------------

def dice_coef(pr, gt, smooth: float = 1.0):
    """Soft Dice over the flattened tensors: (s + 2*|A.B|) / (s + |A|+|B|)."""
    pr = pr.reshape(-1)
    gt = gt.reshape(-1)
    inter = jnp.sum(pr * gt)
    union = jnp.sum(pr) + jnp.sum(gt)
    return (smooth + 2.0 * inter) / (smooth + union)


def dice2_coef(pr, gt, smooth: float = 1.0):
    """Squared-denominator Dice variant (reference loss.py:22-26)."""
    pr = pr.reshape(-1)
    gt = gt.reshape(-1)
    inter = jnp.sum(pr * gt)
    union = jnp.sum(pr**2) + jnp.sum(gt**2)
    return (smooth + 2.0 * inter) / (smooth + union)


def iou_coef(pr, gt, smooth: float = 1e-12):
    pr = pr.reshape(-1)
    gt = gt.reshape(-1)
    inter = jnp.sum(pr * gt)
    union = jnp.sum(pr) + jnp.sum(gt) - inter
    return (inter + smooth) / (union + smooth)


# ---------------------------------------------------------------------------
# Loss callables
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiceLoss:
    """1 - dice (reference loss.py:9-32)."""

    bi: bool = False

    def __call__(self, pr, gt):
        fn = dice2_coef if self.bi else dice_coef
        return 1.0 - fn(pr, gt)


@dataclasses.dataclass(frozen=True)
class IouLoss:
    """1 - iou (reference loss.py:41-56)."""

    def __call__(self, pr, gt):
        return 1.0 - iou_coef(pr, gt)


@dataclasses.dataclass(frozen=True)
class MSELoss:
    def __call__(self, pr, gt):
        return jnp.mean((pr - gt) ** 2)


@dataclasses.dataclass(frozen=True)
class MultiLoss:
    """Softmax over classes, then per-class base loss x weight, summed.

    Reference loss.py:70-99: weights default to 1.  ``pr`` is raw logits
    [B, H, W, C]; ``gt`` is one-hot [B, H, W, C] (or int labels [B, H, W],
    one-hot encoded on the fly like the reference does).
    """

    base: Callable = DiceLoss()
    weights: Sequence[float] | None = None

    def __call__(self, pr, gt):
        nc = pr.shape[-1]
        pr = jax.nn.softmax(pr, axis=-1)
        if gt.ndim == pr.ndim - 1 or gt.shape[-1] != nc:
            gt = jax.nn.one_hot(gt, nc, dtype=pr.dtype)
        w = self.weights if self.weights is not None else (1.0,) * nc
        axes = tuple(range(pr.ndim - 1))
        # vectorized per-class forms: ONE pass over the tensor instead of
        # nc strided channel-slice reductions (profiled on v5e; same math
        # as the per-class loop, reassociated)
        if isinstance(self.base, DiceLoss) and not self.base.bi:
            inter = jnp.sum(pr * gt, axis=axes)
            union = jnp.sum(pr, axis=axes) + jnp.sum(gt, axis=axes)
            dice = (1.0 + 2.0 * inter) / (1.0 + union)
            return jnp.sum(jnp.asarray(w) * (1.0 - dice))
        if isinstance(self.base, MSELoss):
            mse = jnp.mean((pr - gt) ** 2, axis=axes)
            return jnp.sum(jnp.asarray(w) * mse)
        total = 0.0
        for i in range(nc):
            total = total + w[i] * self.base(pr[..., i], gt[..., i])
        return total


def get_loss(name: str = "di", **_):
    """Loss registry (reference loss.py:101-110): 'di'/'dice' -> Dice,
    anything else -> MSE, both wrapped in MultiLoss."""
    if name in ("dice", "di"):
        return MultiLoss(DiceLoss(bi=False))
    return MultiLoss(MSELoss())


@dataclasses.dataclass(frozen=True)
class MDiceLoss:
    """Soft multi-class dice training loss (reference miou.py:64-117):
    softmax over classes, per-(sample,class) dice, 1 - mean."""

    bi: bool = False

    def __call__(self, pr, gt):
        nc = pr.shape[-1]
        B = pr.shape[0]
        if gt.ndim == pr.ndim - 1 or gt.shape[-1] != nc:
            gt = jax.nn.one_hot(gt, nc, dtype=jnp.float32)
        pr = jax.nn.softmax(pr, axis=-1)
        prf = pr.reshape(B, -1, nc).transpose(0, 2, 1)
        gtf = gt.reshape(B, -1, nc).transpose(0, 2, 1)

        def dice(p, g, smooth=1e-6):
            inter = jnp.sum(p * g, -1) + smooth
            union = jnp.sum(p, -1) + jnp.sum(g, -1) + smooth
            return 1.0 - jnp.sum(2.0 * inter / union) / (B * nc)

        if self.bi:
            return dice(prf, gtf) + dice(1 - prf, 1 - gtf)
        return dice(prf, gtf)


@dataclasses.dataclass(frozen=True)
class CrossEntropyLoss:
    """torch nn.CrossEntropyLoss equivalent (mean, optional class weights)."""

    weight: Sequence[float] | None = None

    def __call__(self, pr, gt):
        nc = pr.shape[-1]
        if gt.ndim == pr.ndim:  # one-hot -> indices
            gt = jnp.argmax(gt, -1)
        logp = jax.nn.log_softmax(pr, axis=-1)
        nll = -jnp.take_along_axis(logp, gt[..., None], axis=-1)[..., 0]
        if self.weight is not None:
            w = jnp.asarray(self.weight)[gt]
            return jnp.sum(nll * w) / jnp.sum(w)
        return jnp.mean(nll)


def get_mloss(name: str = "di", weight=None):
    """Reference kite/losses/lossm.py:8-21 (unused upstream, live here):
    'di' -> soft MDice, 'd2' -> bi-dice, else CrossEntropy."""
    if name == "di":
        return MDiceLoss(bi=False)
    if name == "d2":
        return MDiceLoss(bi=True)
    return CrossEntropyLoss(weight=weight)


# ---------------------------------------------------------------------------
# Validation scores (reference miou.py:22-117) — per-sample means
# ---------------------------------------------------------------------------

def mdice_score(pr, gt, smooth: float = 1.0):
    """Per-batch-sample dice of one channel, averaged over the batch
    (reference miou.py:69-80).  pr/gt: [B, ...] for a single class."""
    B = pr.shape[0]
    pr = pr.reshape(B, -1)
    gt = gt.reshape(B, -1)
    inter = jnp.sum(pr * gt, axis=-1)
    union = jnp.sum(pr, axis=-1) + jnp.sum(gt, axis=-1) + smooth
    return jnp.mean((2.0 * inter + smooth) / union)


def _dice_by_class(pr, gt, smooth: float = 1.0):
    """Per-class, per-sample dice in ONE pass over [B, ..., C] tensors
    (the per-class channel-slice loop costs nc strided full-tensor
    reductions), batch-averaged -> [C]."""
    B, nc = pr.shape[0], pr.shape[-1]
    prf = pr.reshape(B, -1, nc)
    gtf = gt.reshape(B, -1, nc)
    inter = jnp.sum(prf * gtf, axis=1)
    union = jnp.sum(prf, axis=1) + jnp.sum(gtf, axis=1) + smooth
    return jnp.mean((2.0 * inter + smooth) / union, axis=0)


def mdice_scorem(pr, gt, start_idx: int = 0):
    """Mean per-class dice over classes >= start_idx (miou.py:87-91).
    pr/gt: [B, H, W, C] one-hot / binarized."""
    return jnp.mean(_dice_by_class(pr, gt)[start_idx:])


def mdice_scores(pr, gt):
    """Per-class dice vector (miou.py:82-85)."""
    return _dice_by_class(pr, gt)


def miou_score(pr, gt, smooth: float = 1.0):
    """Per-batch-sample IoU of one channel, batch mean (miou.py:28-38)."""
    B = pr.shape[0]
    pr = pr.reshape(B, -1)
    gt = gt.reshape(B, -1)
    inter = jnp.sum(pr * gt, axis=-1)
    union = jnp.sum(pr, axis=-1) + jnp.sum(gt, axis=-1) - inter + smooth
    return jnp.mean((inter + smooth) / union)


def miou_scorem(pr, gt, start_idx: int = 0):
    B, nc = pr.shape[0], pr.shape[-1]
    prf = pr.reshape(B, -1, nc)
    gtf = gt.reshape(B, -1, nc)
    inter = jnp.sum(prf * gtf, axis=1)
    union = jnp.sum(prf, axis=1) + jnp.sum(gtf, axis=1) - inter + 1.0
    iou = jnp.mean((inter + 1.0) / union, axis=0)
    return jnp.mean(iou[start_idx:])


# ---------------------------------------------------------------------------
# Deep supervision (reference loopback.py:62-73)
# ---------------------------------------------------------------------------

def deep_supervision_loss(
    outs, true, criterion, ds: bool = True, coff_ds: float = 0.5, true0=None
):
    """Weighted pyramid loss: full weight on outs[0], coff_ds on the rest.

    ``true0``: target for the MAIN head only — used when outs[0] lives in
    a different (but sum-equivalent) layout, e.g. the packed
    space-to-depth head grouped as [B,h,w,4,C] against phase-grouped
    one-hot labels (dice sums are pixel-permutation-invariant, so the
    loss value is the fine-layout value reassociated)."""
    if not isinstance(outs, (list, tuple)):
        return criterion(outs, true)
    total = 0.0
    if ds:
        for i in range(len(outs) - 1, 0, -1):
            total = total + criterion(outs[i], true) * coff_ds
    return total + criterion(outs[0], true if true0 is None else true0)
