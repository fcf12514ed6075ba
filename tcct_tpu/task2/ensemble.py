"""Task-2 TTA + checkpoint ensemble (reference task2/t2_ensemble.py).

Per checkpoint: average predictions over 4 flip combinations
(t2_ensemble.py:130-134) — here the 4 flips run as ONE vmapped batch in a
single jitted call instead of 4 sequential forwards.  Per-model CSVs are
then averaged and rounded into the final submission
(t2_ensemble.py:178-190).  CSV IO uses the stdlib.
"""

from __future__ import annotations

import csv
import glob
import os
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tcct_tpu.task2.model import ClsModel


def build_tta_predict(model: ClsModel):
    """One jitted call -> mean softmax-argmax over the 4 flip variants."""

    @jax.jit
    def predict(params, batch_stats, imgs_u8):
        img = imgs_u8.astype(jnp.float32) / 255.0
        variants = jnp.stack(
            [img, img[:, ::-1], img[:, :, ::-1], img[:, ::-1, ::-1]], 0
        )  # [4, B, H, W, C]

        def fwd(v):
            logits = model.apply(
                {"params": params, "batch_stats": batch_stats}, v, train=False
            )
            return jnp.argmax(jax.nn.softmax(logits, -1), -1).astype(jnp.float32)

        preds = jax.vmap(fwd)(variants)  # [4, B]
        return jnp.mean(preds, axis=0)

    return predict


def write_csv(path: str, names: Sequence[str], preds: Sequence[float]):
    rows = sorted(zip(names, preds))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["ImgName", "GC Pred"])
        w.writerows(rows)


def read_csv(path: str) -> Dict[str, float]:
    with open(path) as f:
        r = csv.DictReader(f)
        return {row["ImgName"]: float(row["GC Pred"]) for row in r}


def ensemble_csvs(csv_paths: Sequence[str], out_path: str) -> Dict[str, int]:
    """Mean the per-model prediction CSVs, round to the final label
    (t2_ensemble.py:180-190)."""
    acc: Dict[str, float] = {}
    for p in csv_paths:
        for name, v in read_csv(p).items():
            acc[name] = acc.get(name, 0.0) + v
    final = {k: int(round(v / len(csv_paths))) for k, v in sorted(acc.items())}
    write_csv(out_path, list(final.keys()), list(final.values()))
    return final
