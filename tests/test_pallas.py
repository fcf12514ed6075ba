"""Pallas kernels vs XLA references (interpret mode on CPU; compiled on
TPU via bench/graft paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcct_tpu.ops.pallas import metapool_tokens_pallas
from tcct_tpu.ops.pool import metapool_tokens


@pytest.mark.parametrize("shape", [(2, 50, 24), (1, 1024, 64), (3, 256, 96)])
def test_metapool_pallas_forward(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    a = metapool_tokens(x)
    b = metapool_tokens_pallas(x, interpret=True)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_metapool_pallas_grad():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))

    f_ref = lambda x: jnp.sum(jnp.sin(metapool_tokens(x)))
    f_pal = lambda x: jnp.sum(jnp.sin(metapool_tokens_pallas(x, interpret=True)))
    g_ref = jax.grad(f_ref)(x)
    g_pal = jax.grad(f_pal)(x)
    np.testing.assert_allclose(g_ref, g_pal, rtol=1e-4, atol=1e-6)


def test_metapool_pallas_large_falls_back():
    # above the VMEM budget the XLA path is used transparently
    x = jnp.ones((1, 65536, 64), jnp.float32)
    out = metapool_tokens_pallas(x, interpret=True)
    np.testing.assert_allclose(out, metapool_tokens(x), rtol=1e-5, atol=1e-6)
