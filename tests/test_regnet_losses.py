"""Golden tests: boundary-regression and feature-polarization losses vs
the torch reference with pinned randomness (all uniforms = 0.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tcct_tpu.infer.importer import import_torch_state
from tcct_tpu.losses.polar import feature_polarization_loss
from tcct_tpu.models.regnet import RegNet


class _DummyBase(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        return [x], [x]


def _nhwc(x):
    return jnp.asarray(np.moveaxis(x, 1, -1))


@pytest.fixture(scope="module")
def regnet_env(golden):
    g = golden("regnet_losses")
    net = RegNet(base=_DummyBase(), out_channels=5)
    pred = _nhwc(g["pred"])
    true = _nhwc(g["true"])
    variables = net.init(
        {"params": jax.random.PRNGKey(0)},
        pred,
        true,
        method=RegNet.init_loss_heads,
    )
    sd = {k[len("w::") :]: g[k] for k in g.files if k.startswith("w::")}
    variables, report = import_torch_state(sd, variables, strict_shapes=True)
    unskippable = [k for k in report.skipped_source if "num_batches" not in k]
    assert not unskippable, report
    return net, variables, g, pred, true


def test_regular_reg_deterministic(regnet_env):
    net, variables, g, pred, true = regnet_env
    loss = net.apply(
        variables, pred, true, rng=None, train=False, method=RegNet.regular_reg
    )
    np.testing.assert_allclose(loss, g["los_reg"], rtol=2e-4, atol=2e-5)


def test_regular_udh(regnet_env):
    _, _, g, pred, true = regnet_env
    feat = _nhwc(g["feat"])
    protos = jnp.asarray(g["fcp_buf"])
    loss = feature_polarization_loss([feat] * 4, pred, true, protos, con="cos")
    np.testing.assert_allclose(loss, g["los_udh"], rtol=1e-3, atol=1e-4)


def test_regular_udh_jit(regnet_env):
    _, _, g, pred, true = regnet_env
    feat = _nhwc(g["feat"])
    protos = jnp.asarray(g["fcp_buf"])
    f = jax.jit(lambda fe, p, t: feature_polarization_loss([fe] * 4, p, t, protos))
    loss = f(feat, pred, true)
    np.testing.assert_allclose(loss, g["los_udh"], rtol=1e-3, atol=1e-4)
