"""Pallas TPU kernel for the MetaPool token mixer.

Computes ``AvgPool2d(3, stride=1, pad=1, count_include_pad=False)(x) - x``
over the (token, channel) axes of a [B, N, C] tensor — the reference's
active "attention" (task1/nets/tcct.py:405-415; see
tcct_tpu/ops/pool.py for why the window slides over (N, C)).

One fused kernel does the 3x3 windowed sum (shifted adds), the
valid-count division, and the subtract in VMEM; the XLA reduce_window
path materializes the window sum before the divide/subtract.

Each grid cell handles one batch element's full (N, C) token map — for
every geometry bucket in this framework that is <= 4 MB (256^2 input ->
stage-0 N=16384, C=64).  Inputs too large for VMEM fall back to the XLA
implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tcct_tpu.ops.pool import metapool_tokens as _metapool_xla

_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _window_sum(x):
    """3x3 zero-padded windowed sum over the last two axes of a 2-D array."""
    N, C = x.shape
    zc = jnp.zeros((N, 1), jnp.float32)
    h = jnp.concatenate([zc, x[:, :-1]], 1) + x + jnp.concatenate([x[:, 1:], zc], 1)
    zr = jnp.zeros((1, C), jnp.float32)
    return jnp.concatenate([zr, h[:-1]], 0) + h + jnp.concatenate([h[1:], zr], 0)


def _count_map(N, C):
    row = jax.lax.broadcasted_iota(jnp.int32, (N, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, C), 1)
    return jnp.where((row == 0) | (row == N - 1), 2.0, 3.0) * jnp.where(
        (col == 0) | (col == C - 1), 2.0, 3.0
    )


def _kernel(x_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # [N, C]
    N, C = x.shape
    o_ref[0] = (_window_sum(x) / _count_map(N, C) - x).astype(o_ref.dtype)


def _bwd_kernel(g_ref, o_ref):
    # adjoint of avgpool(cip=False) - id:  window_sum(g / cnt) - g
    g = g_ref[0].astype(jnp.float32)
    N, C = g.shape
    o_ref[0] = (_window_sum(g / _count_map(N, C)) - g).astype(o_ref.dtype)


def _call(kernel, x, interpret):
    B, N, C = x.shape
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        interpret=interpret,
    )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _metapool_pallas(x, interpret):
    return _call(_kernel, x, interpret)


def _fwd(x, interpret):
    return _call(_kernel, x, interpret), None


def _bwd(interpret, _res, g):
    return (_call(_bwd_kernel, g, interpret),)


_metapool_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def metapool_tokens_pallas(x, interpret=None):
    """[B, N, C] -> [B, N, C]; numerically identical to
    tcct_tpu.ops.pool.metapool_tokens (0.0 max diff measured on-chip).
    Differentiable (custom VJP).  ``interpret=None`` auto-selects
    interpreter mode off-TPU so the same code runs in CPU tests."""
    B, N, C = x.shape
    if N * C * 4 * 3 > _VMEM_BUDGET_BYTES:  # in + f32 temps + out
        return _metapool_xla(x)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _metapool_pallas(x, interpret)
