"""Feature-polarization prototype losses (reference task1/nets/fcp.py,
fcs.py, reg.py:86-105), re-expressed with static shapes for jit.

The reference's ``points_selection_bins`` (fcs.py:25-50) boolean-masks the
pixels of a class, ranks them by predicted confidence, splits the ranked
list into 32 bins and mean-pools each bin.  Boolean masking produces
data-dependent shapes, which cannot trace under jit — here the same math
is computed with a full-length ``argsort`` (masked pixels pushed to the
tail with -inf keys), an inverse-permutation rank, and a fixed
32-segment ``segment_sum``.  Identical results, fully static shapes, and
the whole thing fuses into a handful of TPU kernels instead of the
reference's per-class Python loop with host-side gathers.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Prototypes (reference fcp.py)
# ---------------------------------------------------------------------------

def polar_prototypes(rng, num_cls: int, num_emb: int = 32) -> jnp.ndarray:
    """Random frozen prototypes, L2-normalized — the ``init=False`` path the
    reference actually uses (reg.py:57, fcp.py:60-61): ``vec_grad`` is
    U[0,1) and only normalized, never optimized."""
    vec = jax.random.uniform(rng, (num_cls, num_emb), jnp.float32)
    return vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)


def _uniformity_loss(vec):
    v = vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)
    return jnp.mean(jnp.log(jnp.mean(jnp.exp(v @ v.T), axis=-1)))


def optimize_prototypes(
    rng,
    num_cls: int,
    num_emb: int = 32,
    steps: int = 333,
    lr: float = 1e-2,
    weight_decay: float = 2e-4,
) -> jnp.ndarray:
    """The ``init=True`` self-optimization (fcp.py:36-57): Adam on the
    log-sum-exp uniformity loss with a reduce-on-plateau LR (factor 0.7,
    patience 2, cooldown 2, min_lr 1e-5), run for a fixed step count
    inside one ``lax.scan`` — no host round-trips."""
    vec0 = jax.random.uniform(rng, (num_cls, num_emb), jnp.float32)
    b1, b2, eps = 0.9, 0.999, 1e-8

    def step(carry, i):
        vec, m, v, lr_t, best, bad, cool = carry
        loss, g = jax.value_and_grad(_uniformity_loss)(vec)
        g = g + weight_decay * vec
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        t = i + 1
        mh = m / (1 - b1**t)
        vh = v / (1 - b2**t)
        vec = vec - lr_t * mh / (jnp.sqrt(vh) + eps)
        # ReduceLROnPlateau(min, factor=.7, patience=2, cooldown=2, rel 1e-4)
        improved = loss < best * (1 - 1e-4)
        best = jnp.where(improved, loss, best)
        bad = jnp.where(improved | (cool > 0), 0, bad + 1)
        cool = jnp.maximum(cool - 1, 0)
        reduce = (bad > 2) & (cool == 0)
        lr_t = jnp.where(reduce, jnp.maximum(lr_t * 0.7, 1e-5), lr_t)
        bad = jnp.where(reduce, 0, bad)
        cool = jnp.where(reduce, 2, cool)
        return (vec, m, v, lr_t, best, bad, cool), loss

    init = (
        vec0,
        jnp.zeros_like(vec0),
        jnp.zeros_like(vec0),
        jnp.float32(lr),
        jnp.float32(jnp.inf),
        jnp.int32(0),
        jnp.int32(0),
    )
    (vec, *_), _ = jax.lax.scan(step, init, jnp.arange(steps))
    return vec / jnp.linalg.norm(vec, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Confidence-ranked bin pooling (reference fcs.py:25-50), static-shape form
# ---------------------------------------------------------------------------

def points_selection_bins(feat, prob, true, bins: int = 32):
    """feat: [P, L]; prob, true: [P].  Returns [bins, L]: the mean embedding
    of each confidence-ranked bin of the class pixels (true > 0.5).

    Matches the reference exactly: masked pixels are sorted by descending
    prob; with n masked pixels, bin i is ranks [i*(n//bins), (i+1)*(n//bins))
    (the lowest-confidence remainder is dropped)."""
    P, L = feat.shape
    mask = true > 0.5
    n = jnp.sum(mask.astype(jnp.int32))
    nper = jnp.maximum(n // bins, 1)

    key = jnp.where(mask, prob, -jnp.inf)
    order = jnp.argsort(-key)  # descending; masked pixels first
    rank = jnp.zeros(P, jnp.int32).at[order].set(jnp.arange(P, dtype=jnp.int32))

    bin_id = rank // nper
    valid = (rank < nper * bins) & mask
    bin_id = jnp.where(valid, bin_id, bins)  # overflow bucket

    w = valid.astype(jnp.float32)
    sums = jax.ops.segment_sum(
        feat.astype(jnp.float32) * w[:, None], bin_id, num_segments=bins + 1
    )[:bins]
    return sums / nper.astype(jnp.float32)


def cosinesim_loss(q, k):
    """- mean(q @ k^T) / L (reference fcs.py:63-67)."""
    return -jnp.mean(q @ k.T) / q.shape[-1]


def feature_polarization_loss(
    feats: Sequence[jnp.ndarray],
    pred,
    true,
    prototypes,
    con: str = "cos",
    bins: int = 32,
):
    """Reference reg.py:86-105 + fcs.py:69-96.

    feats: list of [B, H, W, L] embedding maps; pred: raw logits
    [B, H, W, C]; true: one-hot [B, H, W, C]; prototypes: [C, L] unit rows.

    Per scale and class: bin-pooled embeddings vs the class prototype via
    the diagonal cosine loss; plus (faithfully reproducing the reference's
    loop-variable leak) an extra MSE between the *last* class's pooled
    embeddings and its prototype.
    """
    prob = jax.nn.softmax(jax.lax.stop_gradient(pred), axis=-1)
    nc = true.shape[-1]
    L = prototypes.shape[-1]
    total = 0.0
    for feat in feats:
        f2 = feat.reshape(-1, feat.shape[-1])
        los = 0.0
        pro_last = tgt_last = None
        for i in range(nc):
            pro = points_selection_bins(
                f2, prob[..., i].reshape(-1), true[..., i].reshape(-1).astype(jnp.float32), bins
            )
            tgt = jnp.tile(prototypes[i : i + 1], (bins, 1))
            if con == "cos":
                los = los + cosinesim_loss(pro, tgt)
            else:
                los = los + jnp.mean((pro - tgt) ** 2)
            pro_last, tgt_last = pro, tgt
        total = total + los + jnp.mean((pro_last - tgt_last) ** 2)
    return total
