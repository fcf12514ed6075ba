"""Winograd F(2x2,3x3) lowering: exactness vs the direct conv (fwd and
grads), and the packed-conv / MaybePackedConv routing gates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcct_tpu.ops.winograd import (
    conv3x3_winograd,
    transform_kernel,
    winograd_convs,
    winograd_eligible,
)


def _direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize(
    "shape,cout",
    [((2, 8, 8, 5), 7), ((1, 16, 12, 32), 32), ((3, 4, 20, 3), 4), ((1, 2, 2, 2), 2)],
)
def test_winograd_matches_direct_f32(shape, cout):
    rng = np.random.default_rng(hash(shape) % 2**31)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], cout)), jnp.float32)
    ref = _direct(x, w)
    got = conv3x3_winograd(x, w, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_winograd_gradients_match_direct():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 6)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 6, 4)), jnp.float32)
    hi = jax.lax.Precision.HIGHEST

    def loss_direct(x, w):
        return jnp.sum(jnp.sin(_direct(x, w)))

    def loss_wino(x, w):
        return jnp.sum(jnp.sin(conv3x3_winograd(x, w, precision=hi)))

    gx_r, gw_r = jax.grad(loss_direct, (0, 1))(x, w)
    gx_w, gw_w = jax.grad(loss_wino, (0, 1))(x, w)
    np.testing.assert_allclose(gx_w, gx_r, rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(gw_w, gw_r, rtol=3e-5, atol=3e-5)


def test_transform_kernel_identity():
    # a delta filter at the center tap must pass tiles through unchanged
    w = np.zeros((3, 3, 1, 1), np.float32)
    w[1, 1, 0, 0] = 1.0
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 6, 6, 1)), jnp.float32)
    y = conv3x3_winograd(x, jnp.asarray(w), precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(y, x, rtol=1e-6, atol=1e-6)
    assert transform_kernel(jnp.asarray(w)).shape == (4, 4, 1, 1)


def test_winograd_bias():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 2)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2,)), jnp.float32)
    got = conv3x3_winograd(x, w, bias=b, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(got, _direct(x, w) + b, rtol=2e-5, atol=2e-5)


def test_eligibility():
    pad = ((1, 1), (1, 1))
    assert winograd_eligible((1, 8, 8, 4), (3, 3, 4, 4), (1, 1), pad)
    assert not winograd_eligible((1, 7, 8, 4), (3, 3, 4, 4), (1, 1), pad)  # odd H
    assert not winograd_eligible((1, 8, 8, 4), (3, 3, 4, 4), (2, 2), pad)  # stride
    assert not winograd_eligible((1, 8, 8, 4), (1, 3, 4, 4), (1, 1), pad)  # kernel
    assert not winograd_eligible((1, 8, 8, 4), (3, 3, 4, 4), (1, 1), ((0, 0), (1, 1)))


def test_packed_conv_winograd_gate_exact():
    """The coarse [3,3] packed conv (OFF->OFF, the alignment-preserving
    one) must produce the same result with the Winograd gate armed."""
    from tcct_tpu.ops.packed_conv import OFF, pack_nhwc, packed_conv

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    xp = pack_nhwc(x, align=OFF)
    ref = packed_conv(xp, w, b, in_align=OFF, out_align=OFF)
    with winograd_convs():
        got = packed_conv(xp, w, b, in_align=OFF, out_align=OFF)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_maybe_packed_conv_winograd_gate_exact():
    """Plain (unpacked) 3x3 convs through MaybePackedConv match with the
    gate armed — the deeper-level CrossCNN path."""
    from tcct_tpu.models.layers import conv2d

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64)), jnp.float32)
    net = conv2d(64, 3, 1, 1, name="c")
    v = net.init(jax.random.PRNGKey(0), x)
    ref = net.apply(v, x)
    with winograd_convs():
        got = net.apply(v, x)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
