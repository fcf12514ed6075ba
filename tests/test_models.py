"""Model zoo: every registry entry builds and forwards (the reference's
__main__ smoke block, nets/tcct.py:1154-1198, as real tests); mixers;
ReLayNet max-unpool correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcct_tpu.models import get_model, list_models
from tcct_tpu.models.relaynet import max_pool_with_mask, max_unpool

SMALL = (1, 32, 64, 3)


@pytest.mark.parametrize("name", list_models())
def test_zoo_forward(name):
    model = get_model(name, 5)
    x = jnp.zeros(SMALL)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "gate": jax.random.PRNGKey(1)}, x, train=False
    )
    pyr, feats = model.apply(v, x, train=False)
    assert pyr[0].shape == SMALL[:3] + (5,)
    for y in pyr:
        assert y.shape == pyr[0].shape
    assert feats[0].shape[:3] == SMALL[:3]


@pytest.mark.parametrize("name", list_models())
def test_zoo_accepts_cli_kwargs(name):
    # the CLI passes these unconditionally (cli/main.py); every factory
    # must accept (or discard) them — relay once crashed here
    get_model(name, 5, variant="train", mixer="metapool")


@pytest.mark.parametrize("mixer", ["metapool", "metapool2d", "factor", "hydra"])
def test_mixers(mixer):
    model = get_model("stc_tt", 5, mixer=mixer)
    x = jnp.zeros(SMALL)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    pyr, _ = model.apply(v, x, train=False)
    assert pyr[0].shape == SMALL[:3] + (5,)


def test_gate_fusion_train_uses_rng():
    model = get_model("gtc_tt", 5)
    x = jnp.ones(SMALL)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "gate": jax.random.PRNGKey(1),
         "droppath": jax.random.PRNGKey(2)},
        x, train=True,
    )
    run = lambda k: model.apply(
        v, x, train=True,
        rngs={"gate": jax.random.PRNGKey(k), "droppath": jax.random.PRNGKey(9)},
        mutable=["batch_stats"],
    )[0][0][0]
    a, b = run(1), run(2)
    assert not np.allclose(a, b)  # alpha map is key-driven
    c = run(1)
    np.testing.assert_allclose(a, c)  # and deterministic per key


def test_msca():
    from tcct_tpu.models.crosscnn import CrossResNet

    m = CrossResNet(tiny=True, msca=True)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    xs = m.apply(v, x, train=False)
    assert len(xs) == 5 and "att_0" in v["params"]
    # the registry entry plumbs the flag through FTC into the CNN branch
    ftc = get_model("msca", 5)
    vf = ftc.init({"params": jax.random.PRNGKey(0)}, jnp.zeros(SMALL), train=False)
    assert "att_0" in vf["params"]["base_cnn"]
    # and stc_tt stays MSCA-free (param tree unchanged by the new field)
    vp = get_model("stc_tt", 5).init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros(SMALL), train=False
    )
    assert "att_0" not in vp["params"]["base_cnn"]


def test_max_unpool_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    pooled, mask = max_pool_with_mask(x)
    assert pooled.shape == (2, 4, 4, 3)
    # mask: exactly one hot per window
    assert np.allclose(np.asarray(mask).reshape(2, 4, 2, 4, 2, 3).sum((2, 4)), 1.0)
    up = max_unpool(pooled, mask)
    assert up.shape == x.shape
    # unpooled values live exactly at the argmax positions
    sel = np.asarray(up)[np.asarray(mask) > 0]
    np.testing.assert_allclose(np.sort(sel), np.sort(np.asarray(pooled).ravel()))


def test_feats_gate_skips_feats_and_preserves_pyramid():
    """r5: layers.feats_gate(False) drops the polarization-feats chain at
    trace time (the HBM audit caught it alive when unused); the pyramid
    must be bitwise unchanged and feats must come back None."""
    from tcct_tpu.models.layers import feats_gate

    model = get_model("stc_tt", 5)
    x = jnp.linspace(0, 1, int(np.prod(SMALL))).reshape(SMALL).astype(jnp.float32)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "gate": jax.random.PRNGKey(1)}, x, train=False
    )
    pyr_on, feats_on = model.apply(v, x, train=False)
    with feats_gate(False):
        pyr_off, feats_off = model.apply(v, x, train=False)
    assert feats_on[0] is not None
    assert feats_off[0] is None
    for a, b in zip(pyr_on, pyr_off):
        assert jnp.array_equal(a, b)


def test_gelu_bf16_tanh_flag():
    """r5: TCCT_GELU_BF16=tanh switches ONLY the bf16 compute path to the
    tanh form (error below bf16 quantization); f32 stays exact-erf."""
    from tcct_tpu.models import layers

    x32 = jnp.linspace(-4, 4, 1001, dtype=jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    exact32 = jax.nn.gelu(x32, approximate=False)
    prev = layers._GELU_BF16
    try:
        layers._GELU_BF16 = "tanh"
        assert jnp.array_equal(layers.gelu(x32), exact32)  # f32 untouched
        got16 = layers.gelu(x16).astype(jnp.float32)
        assert np.max(np.abs(got16 - exact32)) < 2e-2  # within bf16 noise
        layers._GELU_BF16 = "exact"
        exact16 = jax.nn.gelu(x16, approximate=False)
        assert jnp.array_equal(layers.gelu(x16), exact16)
    finally:
        layers._GELU_BF16 = prev
