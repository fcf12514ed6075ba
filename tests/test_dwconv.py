"""Pallas depthwise-3x3 kernel: parity vs the grouped-conv form.

Runs the kernel in interpreter mode on CPU (same code path the TPU
compiles); checks forward values and BOTH gradients (the backward is a
single fused kernel producing dx and the nine dw tap sums)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcct_tpu.ops.pallas.dwconv import dwconv3x3, dwconv3x3_eligible


def _ref_dw(x, kernel, stride=1):
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


@pytest.mark.parametrize("shape", [(2, 12, 24, 8), (1, 9, 130, 16)])
def test_dwconv3x3_forward_matches(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 1, shape[-1])).astype(np.float32))
    got = dwconv3x3(x, k, interpret=True)
    want = _ref_dw(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_dwconv3x3_grads_match():
    rng = np.random.default_rng(1)
    shape = (2, 10, 24, 8)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 1, shape[-1])).astype(np.float32))
    co = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def loss_pallas(x, k):
        return jnp.sum(dwconv3x3(x, k, interpret=True) * co)

    def loss_ref(x, k):
        return jnp.sum(_ref_dw(x, k) * co)

    gx, gk = jax.grad(loss_pallas, argnums=(0, 1))(x, k)
    rx, rk = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gk).reshape(3, 3, -1),
        np.asarray(rk).reshape(3, 3, -1),
        rtol=1e-4,
        atol=1e-4,
    )


@pytest.mark.parametrize("shape", [(2, 12, 24, 8), (1, 10, 64, 16)])
def test_dwconv3x3_stride2_forward_matches(shape):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 1, shape[-1])).astype(np.float32))
    got = dwconv3x3(x, k, interpret=True, stride=2)
    want = _ref_dw(x, k, stride=2)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_dwconv3x3_stride2_grads_match():
    rng = np.random.default_rng(4)
    shape = (2, 12, 24, 8)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 1, shape[-1])).astype(np.float32))
    co = jnp.asarray(rng.normal(size=(2, 6, 12, 8)).astype(np.float32))

    def loss_pallas(x, k):
        return jnp.sum(dwconv3x3(x, k, interpret=True, stride=2) * co)

    def loss_ref(x, k):
        return jnp.sum(_ref_dw(x, k, stride=2) * co)

    gx, gk = jax.grad(loss_pallas, argnums=(0, 1))(x, k)
    rx, rk = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gk).reshape(3, 3, -1),
        np.asarray(rk).reshape(3, 3, -1),
        rtol=1e-4,
        atol=1e-4,
    )


def test_layer_routing_matches_plain_conv():
    """MaybePackedConv routes eligible depthwise convs through the Pallas
    kernel under pallas_dw(True) with the SAME param tree."""
    from tcct_tpu.models.layers import conv2d, pallas_dw

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 12, 16, 8)).astype(np.float32))
    layer = conv2d(8, 3, 1, 1, groups=8, use_bias=True, name=None)
    v = layer.init(jax.random.PRNGKey(0), x)
    want = layer.apply(v, x)
    with pallas_dw(True):
        got = layer.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_dwconv3x3_bf16_close_to_f32():
    """bf16 inputs, f32 accumulation — same contract as XLA's bf16 conv."""
    rng = np.random.default_rng(5)
    shape = (2, 16, 32, 8)
    xf = rng.normal(size=shape).astype(np.float32)
    kf = rng.normal(size=(3, 3, 1, shape[-1])).astype(np.float32)
    got = dwconv3x3(
        jnp.asarray(xf).astype(jnp.bfloat16),
        jnp.asarray(kf).astype(jnp.bfloat16),
        interpret=True,
    ).astype(jnp.float32)
    want = _ref_dw(jnp.asarray(xf), jnp.asarray(kf))
    scale = float(jnp.max(jnp.abs(want)))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.05 * scale
    )


def test_eligibility_budget():
    assert dwconv3x3_eligible((8, 128, 128, 64), jnp.bfloat16)
    # work-res serving shapes are eligible via row-blocking
    assert dwconv3x3_eligible((1, 304, 256, 64), jnp.bfloat16)
    # a single padded row over budget -> no feasible block
    assert not dwconv3x3_eligible((1, 64, 8192, 512), jnp.float32)
