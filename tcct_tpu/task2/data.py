"""Task-2 dataset: GOALS fundus-OCT classification PNGs + xlsx labels
(reference task2/t2_train.py:76-124).

Host decode happens once; pad-to-1120^2 + resize-to-224^2 is
deterministic prep.  Train-time augmentation (RandomResizedCrop
0.6-1.5, flips, colour jitter — t2_train.py:65-73) is a jitted on-device
graph like Task 1's.  Oversampling x20 (t2_train.py:123) becomes an
epoch-length multiplier.  Synthetic fallback generates label-correlated
images so the loop runs without the competition data.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tcct_tpu.data.augment import (
    hue_saturation_value,
    random_brightness,
    random_contrast,
    random_flips,
    rgb_shift,
)
from tcct_tpu.ops.resize import resize_bilinear

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _load_labels(label_file: str) -> Dict[str, int]:
    import pandas as pd

    df = pd.read_excel(label_file)
    return {str(int(str(r[0]).split(".")[0])): int(r[1]) for _, r in df.iterrows()}


def _prep_image(path: str, img_size: int) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    h, w = img.shape[:2]
    ph, pw = max(1120 - h, 0), max(1120 - w, 0)
    img = np.pad(img, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))
    return cv2.resize(img, (img_size, img_size), interpolation=cv2.INTER_LINEAR)


def synthesize_cls(n: int, img_size: int = 224, seed: int = 0):
    """Label-correlated synthetic fundus images (cup/disc-like blobs whose
    size correlates with the glaucoma label)."""
    rng = np.random.default_rng(seed)
    imgs = np.zeros((n, img_size, img_size, 3), np.uint8)
    labels = rng.integers(0, 2, size=(n,)).astype(np.int32)
    yy, xx = np.mgrid[0:img_size, 0:img_size]
    for i in range(n):
        cy, cx = rng.uniform(0.3, 0.7, 2) * img_size
        r_disc = img_size * rng.uniform(0.12, 0.18)
        r_cup = r_disc * (0.75 if labels[i] else 0.4) * rng.uniform(0.9, 1.1)
        d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        img = rng.normal(90, 12, (img_size, img_size))
        img[d < r_disc] += 70
        img[d < r_cup] += 60
        imgs[i] = np.clip(img, 0, 255).astype(np.uint8)[..., None].repeat(3, -1)
    return imgs, labels


@dataclasses.dataclass
class GoalClsSet:
    imgs: np.ndarray  # [N, S, S, 3] uint8
    labels: np.ndarray  # [N] int (9 == unlabeled/infer)
    names: List[str]
    synthetic: bool = False
    oversample: int = 20  # t2_train.py:123

    @classmethod
    def load(
        cls,
        dataset_root: str = "",
        label_file: str = "",
        img_size: int = 224,
        synthetic_n: int = 40,
        seed: int = 0,
    ) -> "GoalClsSet":
        if dataset_root and os.path.isdir(dataset_root) and cv2 is not None:
            files = sorted(f for f in os.listdir(dataset_root) if f.endswith(".png"))
            labels_map = _load_labels(label_file) if label_file else {}
            imgs, labels, names = [], [], []
            for f in files:
                imgs.append(_prep_image(os.path.join(dataset_root, f), img_size))
                key = str(int(f.split(".")[0]))
                labels.append(labels_map.get(key, 9))
                names.append(f)
            return cls(np.stack(imgs), np.asarray(labels, np.int32), names)
        imgs, labels = synthesize_cls(synthetic_n, img_size, seed)
        names = [f"{i:04d}.png" for i in range(len(imgs))]
        return cls(imgs, labels, names, synthetic=True)


# ---------------------------------------------------------------------------
# on-device train augmentation (t2_train.py:65-73)
# ---------------------------------------------------------------------------

def _random_resized_crop(img, key, scale=(0.6, 1.5)):
    """albumentations RandomResizedCrop-ish with scale in [0.6, 1.5]:
    scale > 1 pads (zoom out), < 1 crops (zoom in); output size fixed."""
    S = img.shape[0]
    ks, ky, kx = jax.random.split(key, 3)
    s = jax.random.uniform(ks, (), minval=scale[0], maxval=scale[1])
    # implement as scaled resample grid with random offset
    crop = jnp.clip(S * s, 16, 2 * S)
    y0 = jax.random.uniform(ky, ()) * jnp.maximum(S - crop, 0.0)
    x0 = jax.random.uniform(kx, ()) * jnp.maximum(S - crop, 0.0)
    pos = jnp.arange(S, dtype=jnp.float32) / (S - 1)
    ys = y0 + pos * (crop - 1)
    xs = x0 + pos * (crop - 1)
    yi = jnp.clip(ys, 0, S - 1)
    xi = jnp.clip(xs, 0, S - 1)
    y_lo = jnp.floor(yi).astype(jnp.int32)
    y_hi = jnp.minimum(y_lo + 1, S - 1)
    wy = (yi - y_lo)[:, None, None]
    x_lo = jnp.floor(xi).astype(jnp.int32)
    x_hi = jnp.minimum(x_lo + 1, S - 1)
    wx = (xi - x_lo)[None, :, None]
    g = lambda a, b: img[a][:, b]
    out = (
        g(y_lo, x_lo) * (1 - wy) * (1 - wx)
        + g(y_lo, x_hi) * (1 - wy) * wx
        + g(y_hi, x_lo) * wy * (1 - wx)
        + g(y_hi, x_hi) * wy * wx
    )
    return out


def _train_one(img_u8, key):
    k_crop, k_flip, k_rgb, k_hsv, k_con, k_bri = jax.random.split(key, 6)
    img = img_u8.astype(jnp.float32) / 255.0
    img = _random_resized_crop(img, k_crop)
    dummy = jnp.zeros(img.shape[:2], jnp.int32)
    img, _ = random_flips(img, dummy, k_flip)
    img = rgb_shift(img, k_rgb)
    img = hue_saturation_value(img, k_hsv)
    img = random_contrast(img, k_con)
    img = random_brightness(img, k_bri)
    return jnp.clip(img, 0.0, 1.0)


@jax.jit
def cls_train_augment(imgs_u8, key):
    keys = jax.random.split(key, imgs_u8.shape[0])
    return jax.vmap(_train_one)(imgs_u8, keys)
