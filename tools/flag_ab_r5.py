"""Finish the r4 XLA-flag A/B (the r4 log recorded only the baseline):
time the default train epoch-scan under candidate XLA flags, one clean
subprocess per arm (XLA_FLAGS is read at process start; the persistent
compile cache is disabled per arm so no stale executable can cross
arms).  Each arm reuses tools/bench_r5.py's timing methodology (chained
epochs, min over 3 windows, host-read sync).

Usage:  python tools/flag_ab_r5.py [arm ...]
"""

import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS = {
    "control": {},
    "vmem128m": {"XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=131072"},
    "lhs": {"XLA_FLAGS": "--xla_tpu_enable_latency_hiding_scheduler=true"},
    "aggr_fusion": {
        "XLA_FLAGS": "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"
    },
    "unroll2": {"TCCT_EPOCH_UNROLL": "2"},
}


def main(names):
    results = {}
    for name in names:
        env = dict(os.environ)
        env.update(ARMS[name])
        env["TCCT_NO_COMPILE_CACHE"] = "1"
        print(f"=== {name}: {ARMS[name]}", flush=True)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "tools/bench_r5.py", "gelu"],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=3000,
        )
        out = p.stdout + p.stderr
        m = re.search(r"\[gelu\] windows: .* -> ([0-9.]+) ms", out)
        if p.returncode != 0 or not m:
            print(f"  FAILED rc={p.returncode}\n{out[-2000:]}", flush=True)
            results[name] = None
            continue
        results[name] = float(m.group(1))
        print(
            f"  {results[name]:.2f} ms/step  (arm wall {(time.time()-t0)/60:.1f} min)",
            flush=True,
        )
    print("\nsummary (ms/step):")
    for k, v in results.items():
        print(f"  {k:<12} {v if v is None else f'{v:7.2f}'}")


if __name__ == "__main__":
    main(sys.argv[1:] or list(ARMS))
