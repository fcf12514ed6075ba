"""Jitted on-device augmentation graph.

TPU-native replacement for the reference's CPU-side albumentations
pipeline (task1/data/octgen.py:9-25):

  train: PadIfNeeded -> CropNonEmptyMaskIfExists(256,256) -> HFlip(0.5) ->
         VFlip(0.5) -> RGBShift -> HueSaturationValue -> RandomContrast ->
         RandomBrightness                                   (octgen.py:10-17)
  val:   HFlip(p=1) -> VFlip(0.5)  — the reference validates on randomly
         flipped inputs (octgen.py:21-25); kept behind a flag.

The whole batch transform is one jit-compiled function driven by an
explicit PRNG key (vmapped per-sample), so augmentation runs fused on
device as part of the train step — no host round trips, no worker
processes.  This also replaces the unpublished Kornia-style on-GPU ``aug``
module evidenced in the shipped checkpoints (SURVEY §0).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# colour ops (float images in [0,1])
# ---------------------------------------------------------------------------

def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    diff = maxc - minc
    s = jnp.where(maxc > 0, diff / jnp.maximum(maxc, 1e-12), 0.0)
    diff_safe = jnp.maximum(diff, 1e-12)
    rc = (maxc - r) / diff_safe
    gc = (maxc - g) / diff_safe
    bc = (maxc - b) / diff_safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(diff > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def rgb_shift(img, key, limit: float = 20.0 / 255.0):
    shift = jax.random.uniform(key, (3,), minval=-limit, maxval=limit)
    return img + shift


def hue_saturation_value(img, key, hue_limit=20.0 / 180.0, sat_limit=30.0 / 255.0, val_limit=20.0 / 255.0):
    kh, ks, kv = jax.random.split(key, 3)
    hsv = _rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
    h = (hsv[..., 0] + jax.random.uniform(kh, (), minval=-hue_limit, maxval=hue_limit)) % 1.0
    s = jnp.clip(hsv[..., 1] + jax.random.uniform(ks, (), minval=-sat_limit, maxval=sat_limit), 0, 1)
    v = jnp.clip(hsv[..., 2] + jax.random.uniform(kv, (), minval=-val_limit, maxval=val_limit), 0, 1)
    return _hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


def random_contrast(img, key, limit: float = 0.2):
    alpha = 1.0 + jax.random.uniform(key, (), minval=-limit, maxval=limit)
    mean = jnp.mean(img)
    return (img - mean) * alpha + mean


def random_brightness(img, key, limit: float = 0.2):
    alpha = 1.0 + jax.random.uniform(key, (), minval=-limit, maxval=limit)
    return img * alpha


# ---------------------------------------------------------------------------
# geometric ops
# ---------------------------------------------------------------------------

def _crop_offsets(lab, key, crop_hw: Tuple[int, int]):
    """CropNonEmptyMaskIfExists window origin: random crop guaranteed to
    contain a (uniformly sampled) nonzero mask pixel (albumentations
    semantics, reference octgen.py:12)."""
    H, W = lab.shape
    ch, cw = crop_hw
    kpix, ky, kx, kfall = jax.random.split(key, 4)
    flat = (lab > 0).reshape(-1).astype(jnp.float32)
    has_fg = jnp.sum(flat) > 0
    # gumbel-max uniform sample over nonzero pixels
    g = jax.random.gumbel(kpix, flat.shape)
    pick = jnp.argmax(jnp.where(flat > 0, g, -jnp.inf))
    py, px = pick // W, pick % W
    # fallback: uniform random crop when the mask is empty
    ry = jax.random.randint(kfall, (2,), 0, max(H - ch, 1))
    y_off = jax.random.randint(ky, (), 0, ch)
    x_off = jax.random.randint(kx, (), 0, cw)
    y0 = jnp.clip(py - y_off, 0, max(H - ch, 0))
    x0 = jnp.clip(px - x_off, 0, max(W - cw, 0))
    y0 = jnp.where(has_fg, y0, jnp.clip(ry[0], 0, max(H - ch, 0)))
    x0 = jnp.where(has_fg, x0, jnp.clip(ry[1], 0, max(W - cw, 0)))
    return y0, x0


def crop_non_empty(img, lab, key, crop_hw: Tuple[int, int]):
    """Static-output-shape CropNonEmptyMaskIfExists — jit friendly."""
    ch, cw = crop_hw
    y0, x0 = _crop_offsets(lab, key, crop_hw)
    img_c = jax.lax.dynamic_slice(img, (y0, x0, 0), (ch, cw, img.shape[-1]))
    lab_c = jax.lax.dynamic_slice(lab, (y0, x0), (ch, cw))
    return img_c, lab_c


def crop_non_empty_folded_u8(img_u8, lab_u8, key, crop_hw: Tuple[int, int]):
    """The crop on the uint8 source with channels FOLDED into the width
    axis: the dynamic slices then move full-lane-width uint8 rows instead
    of 3-channel-minor pixels, and only the 256^2 crop gets converted to
    f32 — not the whole source scan.  (The earlier 'u8-first is 2.3 ms
    slower' measurement was WITHOUT folding: an 8-bit dynamic slice with
    a 3-wide minor dim is the worst possible lane layout.)  Byte-exact
    with crop_non_empty on the converted image, same PRNG consumption."""
    ch, cw = crop_hw
    H, W, C = img_u8.shape
    y0, x0 = _crop_offsets(lab_u8, key, crop_hw)
    imgf = img_u8.reshape(H, W * C)
    img_c = jax.lax.dynamic_slice(imgf, (y0, x0 * C), (ch, cw * C)).reshape(ch, cw, C)
    lab_c = jax.lax.dynamic_slice(lab_u8, (y0, x0), (ch, cw))
    return img_c, lab_c


def random_flips(img, lab, key, p_h: float = 0.5, p_v: float = 0.5):
    kh, kv = jax.random.split(key)
    do_h = jax.random.bernoulli(kh, p_h)
    do_v = jax.random.bernoulli(kv, p_v)
    img = jnp.where(do_h, img[:, ::-1], img)
    lab = jnp.where(do_h, lab[:, ::-1], lab)
    img = jnp.where(do_v, img[::-1], img)
    lab = jnp.where(do_v, lab[::-1], lab)
    return img, lab


# ---------------------------------------------------------------------------
# batch pipelines
# ---------------------------------------------------------------------------

def _train_one(img_u8, lab_u8, key, crop_hw):
    k_crop, k_flip, k_rgb, k_hsv, k_con, k_bri = jax.random.split(key, 6)
    img_c, lab_c = crop_non_empty_folded_u8(img_u8, lab_u8, k_crop, crop_hw)
    img = img_c.astype(jnp.float32) / 255.0
    lab = lab_c.astype(jnp.int32)
    img, lab = random_flips(img, lab, k_flip)
    img = rgb_shift(img, k_rgb)
    img = hue_saturation_value(img, k_hsv)
    img = random_contrast(img, k_con)
    img = random_brightness(img, k_bri)
    return jnp.clip(img, 0.0, 1.0), lab


@functools.partial(jax.jit, static_argnames=("crop_hw",))
def train_augment_batch(imgs_u8, labs_u8, key, crop_hw: Tuple[int, int] = (256, 256)):
    """[B,H,W,3] u8, [B,H,W] u8 -> ([B,ch,cw,3] f32 in [0,1], [B,ch,cw] i32)."""
    keys = jax.random.split(key, imgs_u8.shape[0])
    return jax.vmap(lambda i, l, k: _train_one(i, l, k, crop_hw))(imgs_u8, labs_u8, keys)


def _val_one(img_u8, lab_u8, key, stochastic):
    img = img_u8.astype(jnp.float32) / 255.0
    lab = lab_u8.astype(jnp.int32)
    if stochastic:
        # reference ALB_VALID: HFlip p=1, VFlip p=0.5 (octgen.py:21-25)
        img = img[:, ::-1]
        lab = lab[:, ::-1]
        do_v = jax.random.bernoulli(key, 0.5)
        img = jnp.where(do_v, img[::-1], img)
        lab = jnp.where(do_v, lab[::-1], lab)
    return jnp.clip(img, 0.0, 1.0), lab


@functools.partial(jax.jit, static_argnames=("stochastic",))
def val_augment_batch(imgs_u8, labs_u8, key, stochastic: bool = True):
    keys = jax.random.split(key, imgs_u8.shape[0])
    return jax.vmap(lambda i, l, k: _val_one(i, l, k, stochastic))(imgs_u8, labs_u8, keys)
