"""Round-4 zoo training sweep (VERDICT r3 item 4): prove the rest of the
factory surface TRAINS on the chip, not just forwards.

Runs short reference-style recipes through the real CLI, one at a time
(single TPU client!), each into exp_r4_<name>/:

- stc_st / stc_sb / gtc_tb — the small/base width variants no test
  exercises at training scale (reference task1/nets/tcct.py:1050-1137);
- cnnu / pnnu / vitu — the branch ablations;
- stc_tt --mixer=factor / --mixer=hydra — first trained runs of the
  factorized / hydra attention mixers (functional here, dead code
  upstream, tcct.py:289-403).

Resumable: a run whose metrics.jsonl already contains its final epoch is
skipped, so the sweep can be re-fired across TPU outage windows.  Each
run is preceded by a bounded TPU availability probe (bench.wait_for_tpu).
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO) if REPO not in sys.path else None

RUNS = [
    # (name, net, epochs, extra flags)
    ("stc_st", "stc_st", 20, ["--ds=1", "--udh=1", "--reg=1"]),
    ("stc_sb", "stc_sb", 20, ["--ds=1", "--udh=1", "--reg=1"]),
    ("gtc_tb", "gtc_tb", 20, ["--ds=1", "--udh=1", "--reg=1", "--epl=1"]),
    ("cnnu", "cnnu", 10, ["--ds=1"]),
    ("pnnu", "pnnu", 10, ["--ds=1"]),
    ("vitu", "vitu", 10, ["--ds=1"]),
    ("factor", "stc_tt", 20, ["--ds=1", "--udh=1", "--reg=1", "--mixer=factor"]),
    ("hydra", "stc_tt", 20, ["--ds=1", "--udh=1", "--reg=1", "--mixer=hydra"]),
]


def done(root: str, epochs: int) -> bool:
    path = os.path.join(root, "metrics.jsonl")
    if not os.path.exists(path):
        return False
    try:
        last = [json.loads(l) for l in open(path) if l.strip()][-1]
        return int(last.get("epoch", -1)) >= epochs - 1
    except Exception:
        return False


def main():
    import bench  # wait_for_tpu

    summary = []
    for name, net, epochs, extra in RUNS:
        root = os.path.join(REPO, f"exp_r4_{name}")
        if done(root, epochs):
            print(f"[zoo] {name}: already complete, skipping", flush=True)
        else:
            bench.wait_for_tpu()
            cmd = [
                sys.executable, "-m", "tcct_tpu.cli.main",
                "--db=goals", f"--net={net}", "--bs=8", f"--epochs={epochs}",
                f"--root={root}", *extra,
            ]
            print(f"[zoo] {name}: {' '.join(cmd[2:])}", flush=True)
            os.makedirs(root, exist_ok=True)
            t0 = time.time()
            with open(os.path.join(root, "train.log"), "a") as logf:
                rc = subprocess.run(
                    cmd, cwd=REPO, stdout=logf, stderr=subprocess.STDOUT,
                    timeout=7200,
                ).returncode
            print(f"[zoo] {name}: rc={rc} in {(time.time()-t0)/60:.1f} min", flush=True)
            if rc != 0:
                summary.append((name, f"FAILED rc={rc}"))
                continue
        try:
            recs = [json.loads(l) for l in open(os.path.join(root, "metrics.jsonl")) if l.strip()]
            best = max((r.get("val_f1s", 0.0) for r in recs), default=0.0)
            summary.append((name, f"best val dice {best:.4f} over {len(recs)} epochs"))
        except Exception as e:
            summary.append((name, f"metrics unreadable: {e!r}"))
    print("\n[zoo] SUMMARY")
    for name, s in summary:
        print(f"  {name}: {s}")


if __name__ == "__main__":
    main()
