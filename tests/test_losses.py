"""Golden tests: segmentation losses/metrics and polarization primitives
vs the torch reference."""

import jax
import jax.numpy as jnp
import numpy as np

from tcct_tpu.losses import (
    get_loss,
    mdice_scorem,
    mdice_scores,
    miou_scorem,
    points_selection_bins,
)
from tcct_tpu.losses.polar import cosinesim_loss


def _nhwc(x):
    return jnp.asarray(np.moveaxis(x, 1, -1))


def test_multiloss_dice(golden):
    g = golden("losses_seg")
    logits = _nhwc(g["logits"])
    onehot = jax.nn.one_hot(jnp.asarray(g["labels"]), 5)
    loss = get_loss("di")(logits, onehot)
    np.testing.assert_allclose(loss, g["loss_di"], rtol=1e-5)


def test_multiloss_mse(golden):
    g = golden("losses_seg")
    logits = _nhwc(g["logits"])
    onehot = jax.nn.one_hot(jnp.asarray(g["labels"]), 5)
    loss = get_loss("mse")(logits, onehot)
    np.testing.assert_allclose(loss, g["loss_mse"], rtol=1e-5)


def test_scores(golden):
    g = golden("losses_seg")
    logits = _nhwc(g["logits"])
    onehot = jax.nn.one_hot(jnp.asarray(g["labels"]), 5)
    pred = jax.nn.one_hot(jnp.argmax(logits, -1), 5)
    np.testing.assert_allclose(
        mdice_scorem(pred, onehot, start_idx=1), g["mdice_scorem"], rtol=1e-5
    )
    np.testing.assert_allclose(
        miou_scorem(pred, onehot, start_idx=1), g["miou_scorem"], rtol=1e-5
    )
    np.testing.assert_allclose(mdice_scores(pred, onehot), g["mdice_scores"], rtol=1e-5)


def test_points_selection_bins(golden):
    g = golden("binpool")
    out = points_selection_bins(
        jnp.asarray(g["feat"]), jnp.asarray(g["prob"]), jnp.asarray(g["true"])
    )
    np.testing.assert_allclose(out, g["bins_out"], rtol=1e-4, atol=1e-5)


def test_points_selection_bins_jit(golden):
    g = golden("binpool")
    f = jax.jit(points_selection_bins)
    out = f(jnp.asarray(g["feat"]), jnp.asarray(g["prob"]), jnp.asarray(g["true"]))
    np.testing.assert_allclose(out, g["bins_out"], rtol=1e-4, atol=1e-5)


def test_cosinesim(golden):
    g = golden("binpool")
    loss = cosinesim_loss(jnp.asarray(g["cos_q"]), jnp.asarray(g["cos_k"]))
    np.testing.assert_allclose(loss, g["cos_loss"], rtol=1e-5)


def test_cyclic_lr_matches_torch(golden):
    from tcct_tpu.train.schedule import cyclic_lr

    g = golden("schedule")
    ours = np.array([float(cyclic_lr(e)) for e in range(130)])
    np.testing.assert_allclose(ours, g["lrs"], rtol=1e-6, atol=1e-12)


def test_get_mloss_and_soft_argmax(golden):
    from tcct_tpu.losses.seg import get_mloss
    from tcct_tpu.losses.boundary import soft_argmax

    g = golden("lossm")
    x = _nhwc(g["x"])
    lab = jnp.asarray(g["lab"])
    np.testing.assert_allclose(get_mloss("di")(x, lab), g["mdice"], rtol=1e-5)
    np.testing.assert_allclose(get_mloss("d2")(x, lab), g["mdice2"], rtol=1e-5)
    np.testing.assert_allclose(get_mloss("ce")(x, lab), g["ce"], rtol=1e-5)
    ref = np.moveaxis(g["soft_argmax"], 1, -1)
    np.testing.assert_allclose(soft_argmax(x), ref, rtol=1e-4, atol=1e-5)
