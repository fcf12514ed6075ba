"""Native C++ data plane: PNG decode + threaded geometry-prep batch load
vs the cv2 reference path."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tcct_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built (needs g++/zlib)"
)


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(496, 536), (128, 256), (64, 64)]):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        lab = (rng.integers(0, 5, (h, w)) * 30).astype(np.uint8)
        ip = str(d / f"img{i}.png")
        lp = str(d / f"lab{i}.png")
        cv2.imwrite(ip, img)
        cv2.imwrite(lp, lab)
        paths.append((ip, lp, img, lab))
    return paths


def test_decode_matches_cv2(png_dir):
    for ip, lp, img, lab in png_dir:
        out = native.decode_png(ip, channels=3)
        # cv2.imwrite stores BGR; cv2.imread returns the same BGR bytes.
        ref = cv2.imread(ip, cv2.IMREAD_COLOR)
        np.testing.assert_array_equal(out, ref)
        lout = native.decode_png(lp, channels=1)
        lref = cv2.imread(lp, cv2.IMREAD_GRAYSCALE)
        np.testing.assert_array_equal(lout, lref)


def test_batch_load_geometry(png_dir):
    img_paths = [p[0] for p in png_dir]
    lab_paths = [p[1] for p in png_dir]
    imgs, labs, n_ok = native.load_batch(
        img_paths,
        lab_paths,
        hw=(256, 576),
        height_stt=0,
        height_end=224,
        prep_mode="pad",
        divide=30,
    )
    assert n_ok == 3
    assert imgs.shape == (3, 256, 576, 3) and labs.shape == (3, 256, 576)
    assert labs.max() <= 4  # //30 decode applied
    # centered pad: the 496x536 image cropped to 224 rows sits in rows 16..240
    assert imgs[0, :16].sum() == 0 and imgs[0, 16:240].sum() > 0


def test_batch_load_resize(png_dir):
    img_paths = [p[0] for p in png_dir]
    imgs, labs, n_ok = native.load_batch(
        img_paths, None, hw=(128, 128), prep_mode="resize"
    )
    assert n_ok == 3 and imgs.shape == (3, 128, 128, 3)
    # nearest resize of img0 must match cv2.INTER_NEAREST
    ref = cv2.resize(
        cv2.imread(img_paths[0], cv2.IMREAD_COLOR), (128, 128),
        interpolation=cv2.INTER_NEAREST,
    )
    np.testing.assert_array_equal(imgs[0], ref)


def test_bad_path_zero_filled(png_dir):
    imgs, labs, n_ok = native.load_batch(
        ["/nonexistent.png", png_dir[0][0]], None, hw=(64, 64), prep_mode="resize"
    )
    assert n_ok == 1
    assert imgs[0].sum() == 0 and imgs[1].sum() > 0


def test_reflect_pad_matches_cv2_border_reflect(png_dir):
    """duke2 prep (reference octnpy.py:69): PadIfNeeded with
    cv2.BORDER_REFLECT — edge-INCLUDING reflect, not REFLECT_101."""
    ip = png_dir[0][0]
    img = cv2.imread(ip, cv2.IMREAD_COLOR)
    band = img[:384]
    H, W = 512, 576  # pad on both axes
    imgs, _, n_ok = native.load_batch(
        [ip], None, hw=(H, W), height_stt=0, height_end=384,
        prep_mode="pad", prep_reflect=True,
    )
    assert n_ok == 1
    ph, pw = H - band.shape[0], W - band.shape[1]
    ref = cv2.copyMakeBorder(
        band, ph // 2, ph - ph // 2, pw // 2, pw - pw // 2, cv2.BORDER_REFLECT
    )
    np.testing.assert_array_equal(imgs[0], ref)
