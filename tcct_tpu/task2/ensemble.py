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


def main(argv=None):
    """CLI mirroring t2_ensemble.py's __main__: per-checkpoint TTA CSVs,
    then the mean+round ensemble."""
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tcct_tpu.task2.data import GoalClsSet
    from tcct_tpu.task2.train import ClsTrainer

    p = argparse.ArgumentParser(description="GOALS Task-2 TTA ensemble")
    p.add_argument("--weights", type=str, default="task2/weights",
                   help="folder of per-model checkpoint dirs (name contains res18/res34/res50)")
    p.add_argument("--data_root", type=str, default="", help="GOALS folder (else synthetic)")
    p.add_argument("--out", type=str, default="task2/prediction")
    p.add_argument("--img_size", type=int, default=224)
    args = p.parse_args(argv)

    from tcct_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    ds = (
        GoalClsSet.load(
            dataset_root=os.path.join(args.data_root, "Validation", "Image"),
            img_size=args.img_size,
        )
        if args.data_root
        else GoalClsSet.load(img_size=args.img_size)
    )
    imgs = jnp.asarray(ds.imgs)
    csvs = []
    ckpts = sorted(glob.glob(os.path.join(args.weights, "*")))
    for i, ck in enumerate(ckpts):
        tag = "res34" if "res34" in ck else "res50" if "res50" in ck else "res18"
        tr = ClsTrainer(net=tag, img_size=args.img_size, dataset=ds, root="/tmp/_ens")
        tr.load(ck)
        tta = build_tta_predict(tr.model)
        preds = []
        for j in range(0, len(ds.imgs), 8):
            preds.append(np.asarray(tta(tr.state.params, tr.state.batch_stats, imgs[j : j + 8])))
        csv_path = os.path.join(args.out, f"Classification_Results{i}.csv")
        write_csv(csv_path, ds.names, list(np.concatenate(preds)))
        csvs.append(csv_path)
        print("tta4:", ck, "->", csv_path)
    if csvs:
        final = ensemble_csvs(csvs, os.path.join(args.out, "Classification_Results.csv"))
        print("ensemble:", list(final.items())[:5], "...")
    else:
        print("no checkpoints found under", args.weights)


if __name__ == "__main__":
    main()
