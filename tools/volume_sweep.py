"""Full-volume batched inference sweep over every dataset geometry
(BASELINE configs[4]) — compiles one bucket per geometry, streams a
synthetic volume through each, reports per-geometry throughput.

    python tools/volume_sweep.py [n_scans_per_volume]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main(n: int = 32):
    import jax

    from tcct_tpu.data.eyeset import synthesize_oct
    from tcct_tpu.data.geometry import GEOMETRY
    from tcct_tpu.infer.predictor import load_predictor

    print(f"devices: {jax.devices()}")
    results = {}
    ckpts = {
        "goals": "/root/reference/task1/onnx/tcct_goals.pt",
        "hcms": "/root/reference/task1/onnx/tcct_hcms.pt",
        "heg": "/root/reference/task1/onnx/tcct_heg.pt",
        "duke": "/root/reference/task1/onnx/tcct_duke.pt",
    }
    import os

    for db in ["goals", "duke", "hcms", "heg"]:
        geo = GEOMETRY[db]
        pt = ckpts.get(db)
        pt = pt if pt and os.path.exists(pt) else None
        pred = load_predictor(db, pt_path=pt, batch_size=8)
        vol, _ = synthesize_oct(geo, n, seed=1)
        t0 = time.time()
        seg = pred.predict_scans(vol)  # includes compile
        compile_and_first = time.time() - t0
        t0 = time.time()
        seg = pred.predict_scans(vol)
        dt = time.time() - t0
        tput = n / dt
        results[db] = tput
        print(
            f"{db:6s} {geo.prep_hw}: {n} B-scans in {dt*1e3:.1f} ms = "
            f"{tput:.0f} B-scans/s (first pass incl. compile {compile_and_first:.1f}s)"
            f"  classes={sorted(np.unique(seg).tolist())}"
        )
    return results


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
