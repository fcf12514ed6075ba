"""Per-dataset geometry as data (replacing the reference's if-chains at
task1/data/octnpy.py:58-89 and task1/data/octgen.py:38-65).

Nine dataset configs: crop band (height_stt/end), deterministic prep
transform (pad or resize to the static working shape), inverse postprocess
target, label divisor (gray // 30, octnpy.py:116), class count, and the
oversampling factor ``max(1, 735 // n_train)`` (octgen.py:64).

Native resolutions (octnpy.py:15-19): duke 536x496 (variable height),
hcms 1024x496, heg 610x496, goals 1100x800-ish.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class DatasetGeometry:
    name: str
    out_channels: int
    height_stt: int
    height_end: int
    # prep: 'pad' (constant 0 unless reflect) or 'resize' (nearest)
    prep_mode: str
    prep_hw: Tuple[int, int]
    prep_reflect: bool = False
    # postprocess target (None -> center-crop back to native label shape)
    post_hw: Optional[Tuple[int, int]] = None
    divide: int = 30
    oversample_target: int = 735


GEOMETRY = {
    g.name: g
    for g in [
        DatasetGeometry("heg", 8, 83, 339, "pad", (256, 672)),
        DatasetGeometry("duke", 9, 0, 224, "pad", (256, 576)),
        DatasetGeometry("duke1", 9, 0, 224, "pad", (256, 576)),
        DatasetGeometry("duke3", 9, 0, 224, "pad", (256, 576)),
        DatasetGeometry("duke2", 9, 0, 384, "pad", (384, 576), prep_reflect=True),
        DatasetGeometry("hcms", 9, 0, 1024, "resize", (256, 512), post_hw=(128, 1024)),
        DatasetGeometry("hcms1", 9, 0, 1024, "resize", (256, 512), post_hw=(128, 1024)),
        DatasetGeometry("goals", 5, 0, 608, "resize", (608, 512), post_hw=(608, 1100)),
        DatasetGeometry("odsgh", 8, 0, 992, "resize", (496, 512), post_hw=(992, 1024)),
    ]
}


def get_geometry(name: str) -> DatasetGeometry:
    if name not in GEOMETRY:
        raise KeyError(f"unknown dataset '{name}'; have {sorted(GEOMETRY)}")
    return GEOMETRY[name]
