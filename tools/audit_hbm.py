"""Per-fusion HBM byte audit of a jax.profiler trace (VERDICT r4 item 1a).

Names the measured HBM traffic: for every HLO op in the trace, bytes
moved = measured HBM BW x self time, FLOPs = Model GFLOP/s x self time,
and the op's own roofline floor = max(bytes/peak_BW, flops/peak_MXU).
Aggregates forward vs backward (from the jvp/transpose markers XLA keeps
in the framework op name) and prints the top ops by bytes with their
actual/floor ratio — the table that says which milliseconds are at the
hardware floor and which are not.

Usage:
    python tools/audit_hbm.py <trace_dir> [steps_per_trace] [top_n]

steps_per_trace normalizes to per-step numbers (24 for the bench/profile
train epoch scan, 1 for a single-dispatch serving trace).
"""

import collections
import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

# v5e single-chip peaks (public spec)
PEAK_BW = 819e9
PEAK_FLOPS = 197e12


def load_rows(trace_dir):
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    j = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["label"] for c in j["cols"]]
    I = {c: i for i, c in enumerate(cols)}
    out = []
    for row in j["rows"]:
        r = [c.get("v") for c in row["c"]]
        t = (r[I["Total self time (us)"]] or 0.0) * 1e-6
        if t <= 0:
            continue
        hbw = (r[I["HBM BW (GiB/s)"]] or 0.0) * (1 << 30)
        gflops = (r[I["Model GFLOP/s"]] or 0.0) * 1e9
        out.append(
            {
                "t": t,
                "bytes": hbw * t,
                "flops": gflops * t,
                "cat": r[I["HLO op category"]] or "?",
                "hlo": r[I["HLO op name"]] or "?",
                "fw": r[I["Framework op name"]] or "",
                "bound": r[I["Bound by"]] or "?",
                "n": r[I["#Occurrences"]] or 0,
            }
        )
    return out


def direction(fw_name: str) -> str:
    """fwd/bwd attribution from the jvp markers XLA keeps in framework op
    names: 'transpose(jvp(...))' is the VJP (backward); bare 'jvp(...)'
    is the primal under grad; anything else is outside the grad closure
    (augment, loss tail, optimizer, metrics)."""
    if "transpose(jvp" in fw_name:
        return "bwd"
    if "jvp(" in fw_name:
        return "fwd"
    return "other"


def main(trace_dir, steps=1, top_n=25):
    rows = load_rows(trace_dir)
    tot_t = sum(r["t"] for r in rows)
    tot_b = sum(r["bytes"] for r in rows)
    tot_f = sum(r["flops"] for r in rows)

    print(
        f"trace: {trace_dir}  ({len(rows)} ops, normalized by steps={steps})\n"
        f"device self {tot_t/steps*1e3:.2f} ms/step, "
        f"HBM {tot_b/steps/1e6:.0f} MB/step ({tot_b/steps/PEAK_BW*1e3:.2f} ms at peak BW), "
        f"{tot_f/steps/1e9:.1f} GFLOP/step ({tot_f/steps/PEAK_FLOPS*1e3:.2f} ms at peak MXU)"
    )

    by_dir = collections.defaultdict(lambda: [0.0, 0.0])
    for r in rows:
        d = by_dir[direction(r["fw"])]
        d[0] += r["t"]
        d[1] += r["bytes"]
    print("\nforward/backward split:")
    for k in ("fwd", "bwd", "other"):
        t, b = by_dir[k]
        print(
            f"  {k:<6} {t/steps*1e3:7.2f} ms/step  {b/steps/1e6:7.0f} MB/step"
            f"  (floor {b/steps/PEAK_BW*1e3:.2f} ms at peak BW)"
        )

    # per-category bytes
    by_cat = collections.defaultdict(lambda: [0.0, 0.0])
    for r in rows:
        c = by_cat[r["cat"]]
        c[0] += r["t"]
        c[1] += r["bytes"]
    print("\nbytes by category (ms/step, MB/step, achieved GB/s):")
    for k, (t, b) in sorted(by_cat.items(), key=lambda kv: -kv[1][1]):
        if b / tot_b < 0.005:
            continue
        print(
            f"  {t/steps*1e3:7.2f} ms  {b/steps/1e6:7.0f} MB  "
            f"{b/max(t,1e-12)/1e9:6.0f} GB/s  {k}"
        )

    # the floor table: per op, floor = max(byte floor, flop floor)
    for r in rows:
        r["floor"] = max(r["bytes"] / PEAK_BW, r["flops"] / PEAK_FLOPS)
    sum_floor = sum(r["floor"] for r in rows)
    print(
        f"\nsum of per-op floors: {sum_floor/steps*1e3:.2f} ms/step "
        f"vs actual {tot_t/steps*1e3:.2f} "
        f"(if every op hit its own roofline: {100*sum_floor/tot_t:.0f}% efficient)"
    )

    rows.sort(key=lambda r: -r["bytes"])
    print(f"\ntop {top_n} ops by HBM bytes (per step):")
    print(
        "     ms    MB   GB/s  %BW  %MXU  floor  act/fl  dir   bound      op"
    )
    for r in rows[:top_n]:
        t, b, f = r["t"] / steps, r["bytes"] / steps, r["flops"] / steps
        fl = r["floor"] / steps
        name = r["fw"] if len(r["fw"]) > 3 else r["hlo"]
        print(
            f"  {t*1e3:6.2f} {b/1e6:5.0f} {b/max(t,1e-12)/1e9:6.0f}"
            f" {100*b/max(t,1e-12)/PEAK_BW:4.0f} {100*f/max(t,1e-12)/PEAK_FLOPS:5.0f}"
            f" {fl*1e3:6.2f} {t/max(fl,1e-12):7.1f}  {direction(r['fw']):<5}"
            f" {str(r['bound'])[:10]:<10} {name[:95]}"
        )
    print("\n(act/fl = actual time / this op's own roofline floor; 1.0 = at floor)")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace",
        int(sys.argv[2]) if len(sys.argv) > 2 else 1,
        int(sys.argv[3]) if len(sys.argv) > 3 else 25,
    )
