"""Mixed precision: master params in f32, compute in bfloat16.

The model is HBM-bandwidth-bound on v5e (measured: 119 GFLOP forward,
~6.8 GB accessed -> fp32 runs at ~4% MXU utilisation), so halving the
byte traffic with bf16 activations/weights is the single biggest lever.

Strategy: cast every floating leaf of (params, batch_stats, inputs) to
bf16 right before ``apply``; gradients flow back through the casts to the
f32 masters, and flax normalisation layers force their statistics
reductions to f32 regardless of input dtype
(flax.linen.normalization._compute_stats force_float32_reductions), so
numerics stay sane.  Losses are computed on f32-cast logits.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype) -> Any:
    """Cast all floating-point array leaves to ``dtype`` (others pass)."""
    if dtype is None:
        return tree

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def to_f32(tree: Any) -> Any:
    return cast_floating(tree, jnp.float32)
