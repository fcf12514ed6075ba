"""Boundary-regression loss (reference task1/nets/reg.py:109-156).

Drops the background channel, derives a GT boundary-probability map from
row-wise one-hot differences, pushes predicted & true layer maps through a
learned grouped-conv Laplacian, applies a Gumbel-noise column softmax over
the height axis, and penalises (a) the symmetric MSE between the noisy
soft-argmax edge positions and (b) MSE between boundary probability maps.

All tensors are NHWC ([B, H, W, C]); the height axis is axis=1 (the
reference's ``dim=-2`` in NCHW).  Randomness is an explicit PRNG key; pass
``rng=None`` to get the deterministic variant (all uniforms pinned to 0.5)
used by golden parity tests against the torch implementation.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _uniform_like(rng, shape):
    if rng is None:
        return jnp.full(shape, 0.5, jnp.float32)
    return jax.random.uniform(rng, shape, jnp.float32)


def soft_argmax(x, beta: float = 100.0):
    """Differentiable argmax over the channel axis (reference
    nets/reg.py:27-35): expected class index under softmax(x*beta).
    NHWC: returns [B, H, W, 1]."""
    soft = jnp.clip(jax.nn.softmax(x * beta, axis=-1), 0.0, 1.0)
    idx = jnp.arange(x.shape[-1], dtype=x.dtype).reshape(
        (1,) * (x.ndim - 1) + (-1,)
    )
    return jnp.sum(soft * idx, axis=-1, keepdims=True)


def sampling_softmax(x, rng=None, eps_floor: float = 1e-20):
    """Gumbel-perturbed column softmax over height, renormalised
    (reference reg.py:118-126)."""
    u = _uniform_like(rng, x.shape)
    log_eps = jnp.log(-jnp.log(jnp.maximum(u, eps_floor)))
    g = x - log_eps / 2.0
    g = jax.nn.softmax(g, axis=1)
    return g / (1e-6 + jnp.sum(g, axis=1, keepdims=True))


def boundary_regression_loss(
    pred,
    true,
    lap_reg: Callable,
    lap_map: Callable,
    rng: Optional[jax.Array] = None,
):
    """pred: raw logits [B, H, W, C]; true: one-hot [B, H, W, C]."""
    pred = pred[..., 1:]
    true = true[..., 1:].astype(jnp.float32)
    B, H, W, C = pred.shape

    # GT boundary map: row-wise |diff| of one-hot, top row zero-padded,
    # channel-summed, clamped to <=1 (reg.py:113-114).
    d = jnp.abs(true[:, 1:] - true[:, :-1])
    d = jnp.pad(d, ((0, 0), (1, 0), (0, 0), (0, 0)))
    prob_true = jnp.clip(jnp.sum(d, axis=-1, keepdims=True), None, 1.0)

    pseu_pred = jnp.abs(lap_reg(pred))
    pseu_true = jnp.abs(lap_reg(true))

    if rng is None:
        k1 = k2 = k3 = k4 = None
    else:
        k1, k2, k3, k4 = jax.random.split(rng, 4)

    # channel-sum -> 1 channel -> learned smoothing head (reg.py:128-129)
    pseu_pred = lap_map(jnp.sum(sampling_softmax(pseu_pred, k1), axis=-1, keepdims=True))
    pseu_true = lap_map(jnp.sum(sampling_softmax(pseu_true, k2), axis=-1, keepdims=True))

    # noisy soft-argmax over height (reg.py:146-150): idx noise is a single
    # (1, H, 1, 1) vector shared over batch/width, exactly as torch's
    # rand_like on the (1,1,H,1) index tensor.
    idx = jnp.arange(H, dtype=jnp.float32).reshape(1, H, 1, 1)
    idxt = idx + _uniform_like(k3, idx.shape) - 0.5
    idxp = idx + _uniform_like(k4, idx.shape) - 0.5
    edge_true = jnp.sum(pseu_true * idxt, axis=1) / H
    edge_pred = jnp.sum(pseu_pred * idxp, axis=1) / H

    mse = lambda a, b: jnp.mean((a - b) ** 2)
    sg = jax.lax.stop_gradient
    los_edge = mse(edge_pred, sg(edge_true)) + mse(sg(edge_pred), edge_true)
    los_prob = mse(prob_true, jax.nn.softmax(pseu_true, axis=1)) + mse(
        prob_true, jax.nn.softmax(pseu_pred, axis=1)
    )
    return los_edge + los_prob
