"""Summarize a jax.profiler trace (xplane.pb) into per-category and
top-op tables — the tensorboard-free profile reader used to find the
conv-utilisation bottleneck (see README perf notes).

Usage:
    python tools/summarize_profile.py /tmp/jaxtrace [category]
With a category substring (e.g. "data formatting"), also prints every op
in that category sorted by self time — the drill-down used for the
round-4 layout-copy itemization.
(needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python for the bundled
xprof protos; set automatically.)
"""

import collections
import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main(trace_dir: str, category: str = "", top: int = 15):
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    j = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["label"] for c in j["cols"]]
    I = {c: i for i, c in enumerate(cols)}
    rows = [[c.get("v") for c in r["c"]] for r in j["rows"]]

    cat = collections.Counter()
    for r in rows:
        cat[r[I["HLO op category"]]] += r[I["Total self time (us)"]] or 0
    total = sum(cat.values())
    print(f"total self time: {total/1e3:.2f} ms (all traced steps)")
    for k, v in cat.most_common():
        if v / max(total, 1) < 0.002:
            continue
        print(f"  {v/total*100:5.1f}%  {v/1e3:8.2f} ms  {k}")

    print(f"\ntop {top} ops by self time:")
    rows.sort(key=lambda r: -(r[I["Total self time (us)"]] or 0))
    name_col = "HLO op name" if "HLO op name" in I else "Framework op name"
    for r in rows[:top]:
        print(
            f"  {r[I['Total self time (us)']]/1e3:7.2f} ms"
            f"  {str(r[I['Bound by']])[:10]:<10}"
            f"  {str(r[I['HLO op category']])[:18]:<18}"
            f"  {str(r[I['Framework op name']])[:90]}"
        )

    if category:
        print(f"\nall ops in categories matching {category!r}:")
        for r in rows:
            if category.lower() not in str(r[I["HLO op category"]]).lower():
                continue
            t = r[I["Total self time (us)"]] or 0
            if t < 1:
                continue
            print(
                f"  {t/1e3:7.2f} ms  {str(r[I['HLO op category']])[:16]:<16}"
                f"  {str(r[I[name_col]])[:60]:<60}"
                f"  {str(r[I['Framework op name']])[:80]}"
            )


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace",
        sys.argv[2] if len(sys.argv) > 2 else "",
    )
