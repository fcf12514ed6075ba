"""Round-5 factor/hydra training-health probe (VERDICT r4 item 4).

The r4 sweep trained the factor/hydra mixers with the flagship recipe
verbatim (cyclic 1e-6..1e-4) and landed at 0.19/0.13 best dice @ 20
epochs vs the flagship's on-trend ~0.35 — leaving open whether the
linear-attention mixers are *mis-recipe'd* or just slower to converge.
This probe holds everything fixed except a constant LR in
{3e-5, 1e-4, 3e-4} x 20 epochs for each mixer, with a metapool control
at the same constant 1e-4 so mixers are compared under an identical
schedule.  Runs through the real CLI on the chip, one at a time;
resumable across TPU outage windows like tools/train_zoo_r4.py.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO) if REPO not in sys.path else None

EPOCHS = 20
RUNS = [
    # (name, mixer, lr)
    ("metapool_lr1e4", "metapool", 1e-4),
    ("factor_lr3e5", "factor", 3e-5),
    ("factor_lr1e4", "factor", 1e-4),
    ("factor_lr3e4", "factor", 3e-4),
    ("hydra_lr3e5", "hydra", 3e-5),
    ("hydra_lr1e4", "hydra", 1e-4),
    ("hydra_lr3e4", "hydra", 3e-4),
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
    for name, mixer, lr in RUNS:
        root = os.path.join(REPO, f"exp_r5_{name}")
        if done(root, EPOCHS):
            print(f"[probe] {name}: already complete, skipping", flush=True)
        else:
            bench.wait_for_tpu()
            cmd = [
                sys.executable, "-m", "tcct_tpu.cli.main",
                "--db=goals", "--net=stc_tt", "--bs=8", f"--epochs={EPOCHS}",
                "--ds=1", "--udh=1", "--reg=1", f"--mixer={mixer}",
                f"--lr={lr}", f"--root={root}",
            ]
            print(f"[probe] {name}: {' '.join(cmd[2:])}", flush=True)
            os.makedirs(root, exist_ok=True)
            t0 = time.time()
            with open(os.path.join(root, "train.log"), "a") as logf:
                rc = subprocess.run(
                    cmd, cwd=REPO, stdout=logf, stderr=subprocess.STDOUT,
                    timeout=7200,
                ).returncode
            print(f"[probe] {name}: rc={rc} in {(time.time()-t0)/60:.1f} min", flush=True)
            if rc != 0:
                summary.append((name, f"FAILED rc={rc}"))
                continue
        try:
            recs = [json.loads(l) for l in open(os.path.join(root, "metrics.jsonl")) if l.strip()]
            best = max((r.get("val_f1s", 0.0) for r in recs), default=0.0)
            final_loss = recs[-1].get("los", recs[-1].get("total"))
            summary.append((name, f"best val dice {best:.4f}, final loss {final_loss}"))
        except Exception as e:
            summary.append((name, f"metrics unreadable: {e!r}"))
    print("\n[probe] SUMMARY")
    for name, s in summary:
        print(f"  {name}: {s}")


if __name__ == "__main__":
    main()
