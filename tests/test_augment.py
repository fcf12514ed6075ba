"""On-device augmentation graph invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from tcct_tpu.data.augment import (
    crop_non_empty,
    train_augment_batch,
    val_augment_batch,
)


def _batch(B=4, H=96, W=128, nc=5, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8)
    labs = np.zeros((B, H, W), np.uint8)
    labs[:, 40:70, 30:100] = rng.integers(1, nc, (B, 30, 70))
    return jnp.asarray(imgs), jnp.asarray(labs)


def test_train_augment_shapes_and_range():
    imgs, labs = _batch()
    out_img, out_lab = train_augment_batch(imgs, labs, jax.random.PRNGKey(0), (64, 64))
    assert out_img.shape == (4, 64, 64, 3)
    assert out_lab.shape == (4, 64, 64)
    assert float(out_img.min()) >= 0.0 and float(out_img.max()) <= 1.0
    assert out_lab.dtype == jnp.int32


def test_crop_contains_mask():
    imgs, labs = _batch(B=1)
    hits = 0
    for i in range(10):
        _, lab_c = crop_non_empty(
            imgs[0].astype(jnp.float32), labs[0].astype(jnp.int32),
            jax.random.PRNGKey(i), (64, 64),
        )
        hits += int(jnp.sum(lab_c > 0) > 0)
    # CropNonEmptyMaskIfExists guarantee: every crop contains foreground
    assert hits == 10


def test_crop_empty_mask_fallback():
    imgs, _ = _batch(B=1)
    empty = jnp.zeros((96, 128), jnp.int32)
    img_c, lab_c = crop_non_empty(
        imgs[0].astype(jnp.float32), empty, jax.random.PRNGKey(0), (64, 64)
    )
    assert img_c.shape == (64, 64, 3) and int(lab_c.sum()) == 0


def test_val_flip_reference_quirk():
    imgs, labs = _batch()
    out_img, _ = val_augment_batch(imgs, labs, jax.random.PRNGKey(0), stochastic=True)
    # HFlip p=1: never equal to the plain normalization
    plain = imgs.astype(jnp.float32) / 255.0
    assert not np.allclose(out_img, plain)
    out2, _ = val_augment_batch(imgs, labs, jax.random.PRNGKey(0), stochastic=False)
    np.testing.assert_allclose(out2, plain)


def test_determinism_same_key():
    imgs, labs = _batch()
    a = train_augment_batch(imgs, labs, jax.random.PRNGKey(7), (64, 64))
    b = train_augment_batch(imgs, labs, jax.random.PRNGKey(7), (64, 64))
    np.testing.assert_allclose(a[0], b[0])


def test_folded_u8_crop_matches_crop_non_empty():
    """ADVICE r3: the folded-u8 crop is the default train-path crop and
    claims byte-exactness + identical PRNG consumption vs crop_non_empty
    on the converted image — pin it (foreground AND empty-mask cases)."""
    from tcct_tpu.data.augment import crop_non_empty_folded_u8

    imgs, labs = _batch(B=2)
    empty = jnp.zeros(labs[0].shape, labs.dtype)
    cases = [(imgs[0], labs[0]), (imgs[1], empty)]
    for i, (img_u8, lab) in enumerate(cases):
        for seed in (0, 1, 2):
            key = jax.random.PRNGKey(10 * i + seed)
            a_img, a_lab = crop_non_empty_folded_u8(
                img_u8, lab.astype(jnp.uint8), key, (64, 64)
            )
            b_img, b_lab = crop_non_empty(img_u8, lab, key, (64, 64))
            np.testing.assert_array_equal(np.asarray(a_img), np.asarray(b_img))
            np.testing.assert_array_equal(np.asarray(a_lab), np.asarray(b_lab).astype(np.uint8))
