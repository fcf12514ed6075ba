"""End-to-end serving demo — the onnx_infer.py equivalent
(reference task1/onnx/onnx_infer.py:35-46 runs tcct_duke.onnx on a
160x160 crop of oct_duke.png through onnxruntime's CPU EP).

Here: native C++ PNG decode -> geometry prep -> shipped tcct_duke.pt
imported into the JAX model -> bf16 bucketed predictor on TPU ->
segmentation PNG.

    python examples/predict_duke.py [image.png] [out.png]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tcct_tpu.data import native
from tcct_tpu.infer.predictor import load_predictor

IMG = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/task1/onnx/oct_duke.png"
OUT = sys.argv[2] if len(sys.argv) > 2 else "seg_duke.png"


def main():
    imgs, _, n_ok = native.load_batch(
        [IMG], None, hw=(256, 576), height_stt=0, height_end=224, prep_mode="pad"
    )
    assert n_ok == 1, f"failed to decode {IMG}"
    pred = load_predictor(
        "duke", pt_path="/root/reference/task1/onnx/tcct_duke.pt", batch_size=1
    )
    seg = pred.predict_scans(imgs)[0]
    classes, counts = np.unique(seg, return_counts=True)
    print("shape-output:", seg.shape)
    print("class histogram:", dict(zip(classes.tolist(), counts.tolist())))
    try:
        import cv2

        cv2.imwrite(OUT, (seg * (255 // max(seg.max(), 1))).astype(np.uint8))
        print("wrote", OUT)
    except Exception:
        np.save(OUT + ".npy", seg)
        print("wrote", OUT + ".npy")


if __name__ == "__main__":
    main()
