"""Dataset geometry table + synthetic generator + postprocess round trip."""

import numpy as np
import pytest

from tcct_tpu.data import EyeSet, get_geometry
from tcct_tpu.data.geometry import GEOMETRY


def test_all_nine_geometries_present():
    assert set(GEOMETRY) == {
        "duke", "duke1", "duke2", "duke3", "hcms", "hcms1", "heg", "goals", "odsgh"
    }


@pytest.mark.parametrize("db", sorted(GEOMETRY))
def test_synthetic_load_every_geometry(db):
    ds = EyeSet.load(db, synthetic_n=3)
    geo = get_geometry(db)
    imgs, labs = ds.splits["train"]
    assert imgs.shape[1:] == geo.prep_hw + (3,)
    assert labs.shape[1:] == geo.prep_hw
    assert labs.max() < geo.out_channels
    assert ds.out_channels == geo.out_channels


def test_oversample_rule():
    ds = EyeSet.load("goals", synthetic_n=24)
    # max(1, 735 // n_train) per reference octgen.py:64
    assert ds.oversample == max(1, 735 // 24)
    assert ds.epoch_length("train") == 24 * ds.oversample


def test_postprocess_band_restore():
    ds = EyeSet.load("heg", synthetic_n=2)
    seg = np.ones(ds.geo.prep_hw, np.uint8)
    out = ds.postprocess(seg, native_hw=(496, 610))
    assert out.shape == (496, 610)
    # heg band is rows 83..339 (octnpy.py:59)
    assert out[:83].sum() == 0
    assert out[83:339].sum() > 0


def test_duke2_prep_reflect_matches_cv2_border_reflect():
    """np.pad 'symmetric' == cv2.BORDER_REFLECT, the duke2 pad mode
    (reference octnpy.py:69)."""
    import pytest

    cv2 = pytest.importorskip("cv2")
    from tcct_tpu.data.eyeset import _prep
    from tcct_tpu.data.geometry import get_geometry

    geo = get_geometry("duke2")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (360, 500, 3), dtype=np.uint8)
    lab = rng.integers(0, 9, (360, 500)).astype(np.uint8)
    pimg, plab = _prep(geo, img, lab)
    ph, pw = 384 - 360, 576 - 500
    ref = cv2.copyMakeBorder(
        img, ph // 2, ph - ph // 2, pw // 2, pw - pw // 2, cv2.BORDER_REFLECT
    )
    np.testing.assert_array_equal(pimg, ref)
    refl = cv2.copyMakeBorder(
        lab, ph // 2, ph - ph // 2, pw // 2, pw - pw // 2, cv2.BORDER_REFLECT
    )
    np.testing.assert_array_equal(plab, refl)
