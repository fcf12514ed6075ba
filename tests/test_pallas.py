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


# ---------------------------------------------------------------------------
# fused act+BN-stats epilogue (ops/pallas/bnstats.py, TCCT_PALLAS_BN)
# ---------------------------------------------------------------------------

from tcct_tpu.ops.packed_conv import _bn_train_packed, _lrelu
from tcct_tpu.ops.pallas.bnstats import bn_act_train_packed_pallas


def _bn_ref(x, scale, bias, stats, align, leaky):
    src = _lrelu(x) if leaky else x
    return _bn_train_packed(src, {"scale": scale, "bias": bias}, stats, align=align)


@pytest.mark.parametrize(
    "shape,align,leaky",
    [
        ((2, 8, 8, 32), (0, 0), False),
        ((2, 9, 9, 32), (1, 1), True),
        ((3, 17, 16, 32), (1, 0), True),
    ],
)
def test_bnstats_pallas_forward_and_stats(shape, align, leaky):
    rng = np.random.default_rng(2)
    B, S1, S2, C = shape
    x = jnp.asarray(rng.normal(size=(B, S1, S2, 4 * C)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, C).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=C).astype(np.float32) * 0.1)
    stats = {"mean": jnp.zeros(C), "var": jnp.ones(C)}
    y0, ns0 = _bn_ref(x, scale, bias, stats, align, leaky)
    y1, mean, var = bn_act_train_packed_pallas(
        x, scale, bias, align=align, leaky=leaky, interpret=True
    )
    np.testing.assert_allclose(y0, y1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ns0["mean"], 0.9 * stats["mean"] + 0.1 * mean, atol=1e-6)
    np.testing.assert_allclose(ns0["var"], 0.9 * stats["var"] + 0.1 * var, atol=1e-6)


def test_bnstats_pallas_bf16_forward_bitwise():
    # the normalize mirrors the XLA path's exact rounding structure
    # (f32 inv/shift cast to the activation dtype, madd in that dtype)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 9, 9, 128)), jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 32).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=32).astype(np.float32) * 0.1)
    stats = {"mean": jnp.zeros(32), "var": jnp.ones(32)}
    y0, _ = _bn_ref(x, scale, bias, stats, (1, 1), True)
    y1, _, _ = bn_act_train_packed_pallas(
        x, scale, bias, align=(1, 1), leaky=True, interpret=True
    )
    assert jnp.array_equal(y0, y1)


@pytest.mark.parametrize("align,leaky", [((0, 0), True), ((1, 1), True), ((0, 0), False)])
def test_bnstats_pallas_grads(align, leaky):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 9 if align[0] else 8, 9 if align[1] else 8, 128)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 32).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=32).astype(np.float32) * 0.1)
    stats = {"mean": jnp.zeros(32), "var": jnp.ones(32)}

    def loss_ref(args):
        y, ns = _bn_ref(*args, stats, align, leaky)
        return jnp.sum(jnp.sin(y)) + jnp.sum(ns["mean"] * ns["var"])

    def loss_pal(args):
        y, m, v = bn_act_train_packed_pallas(
            args[0], args[1], args[2], align=align, leaky=leaky, interpret=True
        )
        ns = {"mean": 0.9 * stats["mean"] + 0.1 * m, "var": 0.9 * stats["var"] + 0.1 * v}
        return jnp.sum(jnp.sin(y)) + jnp.sum(ns["mean"] * ns["var"])

    g0 = jax.grad(loss_ref)((x, scale, bias))
    g1 = jax.grad(loss_pal)((x, scale, bias))
    for a, b in zip(g0, g1):
        scale_ref = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(a / scale_ref, b / scale_ref, atol=2e-5)


def test_bnstats_pallas_oversize_returns_none():
    x = jnp.ones((1, 512, 512, 128), jnp.float32)  # 128 MB block
    assert bn_act_train_packed_pallas(x, jnp.ones(32), jnp.zeros(32)) is None


@pytest.mark.slow
def test_bnstats_pallas_in_train_forward():
    # armed via set_pallas_bn, the packed train forward + grads still
    # match the XLA lowering on a small CrossResNet subtree
    from tcct_tpu.models.crosscnn import CrossResNet
    from tcct_tpu.ops import packed_conv as pc

    rng = np.random.default_rng(5)
    net = CrossResNet(32)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    v = net.init(jax.random.PRNGKey(0), x, train=True)

    def run(x):
        return pc.cross_resnet_packed_train(x, v["params"], v["batch_stats"])

    def tot(x):
        xs, ns = run(x)
        return sum(jnp.sum(u) for u in xs) + sum(
            jnp.sum(l) for l in jax.tree_util.tree_leaves(ns)
        )

    y0 = run(x)
    g0 = jax.grad(tot)(x)
    pc.set_pallas_bn(True)
    try:
        y1 = run(x)
        g1 = jax.grad(tot)(x)
    finally:
        pc.set_pallas_bn(False)
    for a, b in zip(y0[0], y1[0]):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(y0[1])[0], jax.tree_util.tree_leaves(y1[1])[0], atol=1e-5
    )
    np.testing.assert_allclose(g0, g1, rtol=1e-3, atol=1e-3)
