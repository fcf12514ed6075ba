"""Full-volume batched inference sweep over every dataset geometry
(BASELINE configs[4]) — compiles one bucket per geometry, streams a
synthetic volume through each, reports per-geometry throughput, and
persists the numbers to VOLSWEEP_r{N}.json so serving regressions are a
diff, not an anecdote.

Two numbers per geometry:
- ``e2e``     — host u8 volume in, class maps out (includes the
                host<->device tunnel, ~47 MB/s here: wildly variable).
- ``device``  — chained-dependency on-device forward (the relay dedups
                independent identical dispatches, so each call's input
                depends on the previous output; see bench.py).

    python tools/volume_sweep.py [n_scans_per_volume] [out.json]
"""

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def default_out() -> str:
    """VOLSWEEP_r{N}.json with N = current round (max BENCH_r{N} + 1)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    n = (max(rounds) + 1) if rounds else 1
    return os.path.join(repo, f"VOLSWEEP_r{n:02d}.json")


def main(n: int = 32, out_path: str = ""):
    import jax
    import jax.numpy as jnp

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

    for db in ["goals", "duke", "hcms", "heg"]:
        geo = GEOMETRY[db]
        pt = ckpts.get(db)
        pt = pt if pt and os.path.exists(pt) else None
        bs = 8
        pred = load_predictor(db, pt_path=pt, batch_size=bs)
        vol, _ = synthesize_oct(geo, n, seed=1)
        t0 = time.time()
        seg = pred.predict_scans(vol)  # includes compile
        compile_and_first = time.time() - t0
        t0 = time.time()
        seg = pred.predict_scans(vol)
        dt = time.time() - t0
        e2e = n / dt

        # chained device-only: one resident batch, each forward's input
        # depends on the previous segmentation (dedup-proof)
        fwd = pred._fwd

        @jax.jit
        def chained(variables, x_u8, prev_seg):
            tok = (jnp.max(prev_seg) * 0).astype(jnp.uint8)
            return fwd(variables, x_u8 + tok)

        x = jnp.asarray(vol[:bs])
        s = chained(pred.variables, x, jnp.zeros((1,), jnp.uint8))
        jax.block_until_ready(s)
        # warm the steady-state signature too (prev_seg is now [bs,H,W]
        # — a different shape than the zeros seed, i.e. a second compile
        # that must NOT land inside the timed loop)
        s = chained(pred.variables, x, s)
        jax.block_until_ready(s)
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            s = chained(pred.variables, x, s)
        jax.block_until_ready(s)
        dt_dev = (time.time() - t0) / iters
        dev_tput = bs / dt_dev

        results[db] = {
            "prep_hw": list(geo.prep_hw),
            "n_scans": n,
            "e2e_bscans_per_sec": round(e2e, 1),
            "device_ms_per_batch8": round(dt_dev * 1e3, 2),
            "device_bscans_per_sec": round(dev_tput, 1),
            "compile_and_first_s": round(compile_and_first, 1),
            "imported_ckpt": bool(pt),
        }
        print(
            f"{db:6s} {geo.prep_hw}: e2e {e2e:.0f} B-scans/s | device "
            f"{dt_dev*1e3:.2f} ms/batch8 = {dev_tput:.0f} B-scans/s "
            f"(compile+first {compile_and_first:.1f}s) "
            f"classes={sorted(np.unique(seg).tolist())}"
        )

    out_path = out_path or default_out()
    payload = {
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "devices": str(jax.devices()),
        "note": "e2e includes the ~47 MB/s host tunnel (variable); "
        "device is chained-dependency on-chip time",
        "geometries": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_path}")
    return results


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 32,
        sys.argv[2] if len(sys.argv) > 2 else "",
    )
