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


def test_streaming_trainer_from_disk(tmp_path, monkeypatch):
    """Real directory layout (train_img/train_lab) -> EyeSet (non-synthetic
    branch) -> streaming epoch through BatchPrefetcher + train step.
    Runs on a shrunken goals geometry (streaming mechanics are geometry-
    independent; the 9 real geometries are covered by tests/test_data.py)."""
    import jax
    import numpy as np

    import tcct_tpu.data.eyeset as eyeset_mod
    from tcct_tpu.data import EyeSet
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.train import TrainConfig, Trainer

    small = DatasetGeometry("goals", 5, 0, 1 << 30, "resize", (128, 256))
    monkeypatch.setattr(eyeset_mod, "get_geometry", lambda db: small)

    root = str(tmp_path)
    import os

    os.makedirs(root + "/goals/train_img")
    os.makedirs(root + "/goals/train_lab")
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (200, 512, 3), dtype=np.uint8)
        lab = (rng.integers(0, 5, (200, 512)) * 30).astype(np.uint8)
        cv2.imwrite(f"{root}/goals/train_img/{i}.png", img)
        cv2.imwrite(f"{root}/goals/train_lab/{i}.png", lab)
    ds = EyeSet.load("goals", root=root)
    assert not ds.synthetic and len(ds.paths["train"]) == 4
    model = RegNet(
        base=get_model("relay", ds.out_channels, filters=16),
        out_channels=ds.out_channels,
    )
    cfg = TrainConfig(n_class=ds.out_channels, crop_hw=(64, 64), ds=True)
    tr = Trainer(model, ds, cfg, root=str(tmp_path / "exp"), bs=2, debug=True)
    logs = tr.train_epoch_streaming(epoch=0)
    assert np.isfinite(logs["los_epoch"]) and logs["los_epoch"] > 0

    # auto-select: a 1-byte HBM budget forces streaming; the train split
    # must NOT be materialized on device then
    tr2 = Trainer(
        model, ds, cfg, root=str(tmp_path / "exp2"), bs=2, debug=True,
        hbm_budget_bytes=1,
    )
    assert tr2.streaming and "train" not in tr2._dev
    # fit() dispatches to the streaming epoch and still best-checkpoints
    tr2.fit(epochs=1)
    assert os.path.isdir(str(tmp_path / "exp2" / "val_top"))
    assert tr2.best_dice > -1.0

    # forcing streaming without paths is a clear error
    ds_syn = EyeSet.load("goals", root="")
    with pytest.raises(ValueError):
        Trainer(model, ds_syn, cfg, root=str(tmp_path / "exp3"), bs=2,
                streaming=True)


def test_streaming_caps_oversized_val_alias(tmp_path):
    """When the dataset has no val dir, EyeSet aliases val to the train
    split; streaming mode must not upload the whole beyond-HBM alias."""
    import os as _os

    from tcct_tpu.data import EyeSet
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.train import TrainConfig, Trainer

    root = str(tmp_path)
    _os.makedirs(root + "/goals/train_img")
    _os.makedirs(root + "/goals/train_lab")
    rng = np.random.default_rng(1)
    for i in range(6):
        img = rng.integers(0, 255, (200, 512, 3), dtype=np.uint8)
        lab = (rng.integers(0, 5, (200, 512)) * 30).astype(np.uint8)
        cv2.imwrite(f"{root}/goals/train_img/{i}.png", img)
        cv2.imwrite(f"{root}/goals/train_lab/{i}.png", lab)
    ds = EyeSet.load("goals", root=root)
    model = RegNet(
        base=get_model("relay", ds.out_channels, filters=16),
        out_channels=ds.out_channels,
    )
    cfg = TrainConfig(n_class=ds.out_channels, crop_hw=(64, 64), ds=True)
    _os.environ["TCCT_VAL_CAP"] = "2"
    try:
        tr = Trainer(model, ds, cfg, root=str(tmp_path / "exp"), bs=2,
                     debug=True, hbm_budget_bytes=1)
    finally:
        del _os.environ["TCCT_VAL_CAP"]
    assert tr.streaming and "train" not in tr._dev
    assert tr._dev["val"][0].shape[0] == 2  # capped, not the full alias
