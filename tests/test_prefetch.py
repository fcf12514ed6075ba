"""Streaming prefetch pipeline vs direct native loads."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tcct_tpu.data import native
from tcct_tpu.data.geometry import DatasetGeometry
from tcct_tpu.data.prefetch import BatchPrefetcher

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def disk_pairs(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    rng = np.random.default_rng(0)
    pairs = []
    for i in range(7):
        img = rng.integers(0, 255, (496, 536, 3), dtype=np.uint8)
        lab = (rng.integers(0, 5, (496, 536)) * 30).astype(np.uint8)
        ip, lp = str(d / f"i{i}.png"), str(d / f"l{i}.png")
        cv2.imwrite(ip, img)
        cv2.imwrite(lp, lab)
        pairs.append((ip, lp))
    return pairs


def test_prefetcher_streams_all(disk_pairs):
    geo = DatasetGeometry("duke", 9, 0, 224, "pad", (256, 576))
    pf = BatchPrefetcher(disk_pairs, geo, batch_size=3, device_put=False)
    assert len(pf) == 3
    batches = list(pf)
    assert len(batches) == 3
    assert batches[0][0].shape == (3, 256, 576, 3)
    assert batches[-1][0].shape == (1, 256, 576, 3)  # tail
    # matches a direct native load
    imgs, labs, _ = native.load_batch(
        [p[0] for p in disk_pairs[:3]],
        [p[1] for p in disk_pairs[:3]],
        hw=(256, 576), height_end=224, prep_mode="pad",
    )
    np.testing.assert_array_equal(batches[0][0], imgs)
    np.testing.assert_array_equal(batches[0][1], labs)


def test_prefetcher_decode_error_surfaces(disk_pairs):
    geo = DatasetGeometry("duke", 9, 0, 224, "pad", (256, 576))
    # nonexistent files zero-fill (native semantics), not raise
    pf = BatchPrefetcher([("/nope.png", None)], geo, batch_size=1, device_put=False)
    (imgs, labs) = next(iter(pf))
    assert imgs.sum() == 0
