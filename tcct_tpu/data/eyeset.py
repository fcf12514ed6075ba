"""Device-resident OCT dataset.

Host side does *only* file decode + the deterministic per-dataset geometry
prep (crop band, pad/resize — reference task1/data/octnpy.py:58-129), once
at load time.  The prepped uint8 stacks then live on device; random
augmentation happens inside the jitted train step
(tcct_tpu/data/augment.py).  For these dataset sizes (<=100 B-scans per
split) the whole epoch is device-resident — the reference's
DataLoader-worker/H2D-copy hot path (SURVEY §3.1) disappears entirely.

Directory layout matches the reference: <root>/<db>/{train_img,train_lab,
val_img,val_lab,test_img,test_lab}/(optionally nested one level).  Labels
decode as ``gray // 30`` (octnpy.py:116).  When no dataset folder exists
(e.g. CI), a deterministic synthetic layered-OCT generator stands in so
train/val/bench run end-to-end anywhere.
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from tcct_tpu.data.geometry import DatasetGeometry, get_geometry

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _glob_pair(folder: str, sub: str) -> List[str]:
    return sorted(
        glob.glob(os.path.join(folder, sub, "*", "*.*"))
        + glob.glob(os.path.join(folder, sub, "*.*"))
    )


def _prep(geo: DatasetGeometry, img: np.ndarray, lab: Optional[np.ndarray]):
    """Crop band + pad/resize to the static working shape (octnpy.py:117-129)."""
    img = img[geo.height_stt : geo.height_end]
    if lab is not None:
        lab = lab[geo.height_stt : geo.height_end]
    H, W = geo.prep_hw
    if geo.prep_mode == "resize":
        interp = cv2.INTER_NEAREST
        img = cv2.resize(img, (W, H), interpolation=interp)
        if lab is not None:
            lab = cv2.resize(lab, (W, H), interpolation=interp)
    else:  # pad (centered, like alb.PadIfNeeded)
        h, w = img.shape[:2]
        ph, pw = max(H - h, 0), max(W - w, 0)
        top, left = ph // 2, pw // 2
        # 'symmetric' = cv2.BORDER_REFLECT (edge-including), the duke2 mode
        # (reference octnpy.py:69); numpy 'reflect' would be REFLECT_101
        mode = "symmetric" if geo.prep_reflect else "constant"
        img = np.pad(img, ((top, ph - top), (left, pw - left), (0, 0)), mode=mode)
        if lab is not None:
            lab = np.pad(lab, ((top, ph - top), (left, pw - left)), mode=mode)
        img = img[:H, :W]
        if lab is not None:
            lab = lab[:H, :W]
    return img, lab


def synthesize_oct(
    geo: DatasetGeometry, n: int, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic synthetic layered B-scans: smooth per-layer boundaries,
    per-layer intensity bands + speckle noise.  Shapes/labels match the
    real geometry so the full pipeline (aug, train, metrics) runs without
    the competition data."""
    rng = np.random.default_rng(seed)
    H, W = geo.prep_hw
    nc = geo.out_channels
    imgs = np.zeros((n, H, W, 3), np.uint8)
    labs = np.zeros((n, H, W), np.uint8)
    yy = np.arange(H)[:, None]
    for i in range(n):
        # nc-1 ordered smooth boundaries in a central band
        base = np.sort(rng.uniform(0.2 * H, 0.8 * H, size=(nc - 1,)))
        freq = rng.uniform(0.5, 2.0, size=(nc - 1, 1))
        phase = rng.uniform(0, 2 * np.pi, size=(nc - 1, 1))
        amp = rng.uniform(2, max(H * 0.03, 2.1), size=(nc - 1, 1))
        xs = np.linspace(0, 2 * np.pi, W)[None, :]
        bounds = base[:, None] + amp * np.sin(freq * xs + phase)
        bounds = np.sort(bounds, axis=0)  # keep layers ordered
        # class = number of boundaries above y (0..nc-1); the region below
        # the last boundary maps back to background
        cnt = (yy[None] >= bounds[:, None, :]).sum(0)  # [H,W] in 0..nc-1
        lab = np.where(cnt == nc - 1, 0, cnt).astype(np.uint8)
        intens = rng.uniform(40, 220, size=(nc,))
        img = intens[lab]
        img = img + rng.normal(0, 18, size=(H, W))  # speckle
        img = np.clip(img, 0, 255).astype(np.uint8)
        imgs[i] = img[..., None].repeat(3, axis=-1)
        labs[i] = lab
    return imgs, labs


@dataclasses.dataclass
class EyeSet:
    """Loaded, geometry-prepped dataset with device-friendly uint8 stacks."""

    name: str
    geo: DatasetGeometry
    splits: Dict[str, Tuple[np.ndarray, np.ndarray]]  # split -> (imgs, labs)
    paths: Dict[str, List[str]]
    synthetic: bool = False
    # (img_path, lab_path-or-None) pairs as resolved at load time — the
    # streaming pipeline consumes these instead of re-deriving label paths
    # by substring replacement
    pairs: Dict[str, List[Tuple[str, Optional[str]]]] = dataclasses.field(
        default_factory=dict
    )

    @property
    def out_channels(self) -> int:
        return self.geo.out_channels

    @property
    def oversample(self) -> int:
        """exeNums['train'] = max(1, 735 // n_train) (octgen.py:64)."""
        n = len(self.splits["train"][0])
        return max(1, self.geo.oversample_target // max(n, 1))

    def epoch_length(self, split: str = "train") -> int:
        n = len(self.splits[split][0])
        return n * (self.oversample if split == "train" else 1)

    def sample_indices(self, rng: np.random.Generator, bs: int) -> np.ndarray:
        return rng.integers(0, len(self.splits["train"][0]), size=(bs,))

    @classmethod
    def load(
        cls,
        dbname: str,
        root: Optional[str] = None,
        synthetic_n: int = 24,
        synthetic_seed: int = 0,
    ) -> "EyeSet":
        geo = get_geometry(dbname)
        root = root or os.environ.get("TCCT_DATA_ROOT", "")
        folder = os.path.join(root, dbname) if root else ""
        splits: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        paths: Dict[str, List[str]] = {}
        if folder and os.path.isdir(folder) and cv2 is not None:
            train_imgs = _glob_pair(folder, "train_img")
            val_imgs = _glob_pair(folder, "val_img") or list(train_imgs)
            test_imgs = _glob_pair(folder, "test_img")
            pairs: Dict[str, List[Tuple[str, Optional[str]]]] = {}
            for split, img_paths, img_key, lab_key in [
                ("train", train_imgs, "train_img", "train_lab"),
                ("val", val_imgs, "val_img", "val_lab"),
                ("test", test_imgs, "test_img", "test_lab"),
            ]:
                ims, lbs = [], []
                split_pairs: List[Tuple[str, Optional[str]]] = []
                for p in img_paths:
                    lp = p.replace(img_key, lab_key).replace("train_img", "train_lab")
                    img = cv2.imread(p, cv2.IMREAD_COLOR)
                    if img is None:
                        raise IOError(f"unreadable image file in {split} split: {p}")
                    has_lab = os.path.exists(lp)
                    lab = (
                        cv2.imread(lp, cv2.IMREAD_GRAYSCALE)
                        if has_lab
                        else np.zeros(img.shape[:2], np.uint8)
                    )
                    lab = lab // geo.divide
                    img, lab = _prep(geo, img, lab)
                    ims.append(img)
                    lbs.append(lab)
                    split_pairs.append((p, lp if has_lab else None))
                if ims:
                    splits[split] = (np.stack(ims), np.stack(lbs))
                    paths[split] = img_paths
                    pairs[split] = split_pairs
            if "train" in splits:
                splits.setdefault("val", splits["train"])
                splits.setdefault("test", splits["val"])
                return cls(dbname, geo, splits, paths, pairs=pairs)
        # synthetic fallback.  TCCT_SYNTH_N / TCCT_SYNTH_HW ("96x128")
        # shrink the generated set — the test suite uses these to keep
        # engine/CLI smoke tests off the full 608x512 geometry on the
        # 1-core CI host (geometry-correct shapes are covered separately).
        synthetic_n = int(os.environ.get("TCCT_SYNTH_N", synthetic_n))
        hw_env = os.environ.get("TCCT_SYNTH_HW", "")
        if hw_env:
            h, w = (int(v) for v in hw_env.lower().split("x"))
            geo = dataclasses.replace(geo, prep_hw=(h, w))
        tr = synthesize_oct(geo, synthetic_n, seed=synthetic_seed)
        va = synthesize_oct(geo, max(synthetic_n // 3, 2), seed=synthetic_seed + 1)
        te = synthesize_oct(geo, max(synthetic_n // 3, 2), seed=synthetic_seed + 2)
        return cls(
            dbname,
            geo,
            {"train": tr, "val": va, "test": te},
            {"train": [], "val": [], "test": []},
            synthetic=True,
        )

    def postprocess(self, seg: np.ndarray, native_hw: Tuple[int, int]) -> np.ndarray:
        """Inverse of prep: map a working-resolution segmentation back to
        native resolution (reference octnpy.py:95-112)."""
        geo = self.geo
        H, W = native_hw
        out = np.zeros((H, W), seg.dtype)
        band = seg
        if geo.post_hw is not None and cv2 is not None:
            band = cv2.resize(
                seg.astype(np.uint8),
                (geo.post_hw[1], geo.post_hw[0]),
                interpolation=cv2.INTER_NEAREST,
            )
        else:
            # center-crop back (pad datasets)
            bh = min(geo.height_end - geo.height_stt, H) if geo.height_end < 9999 else H
            h, w = band.shape
            y0 = max((h - bh) // 2, 0)
            x0 = max((w - W) // 2, 0)
            band = band[y0 : y0 + bh, x0 : x0 + W]
        bh, bw = band.shape
        he = min(geo.height_stt + bh, H)
        out[geo.height_stt : he, : min(bw, W)] = band[: he - geo.height_stt, :W]
        return out
