"""Tracing / profiling utilities (SURVEY §5: the reference has only
wall-clock prints, task1/kite/loop_seg.py:41,59-63, and a commented-out
fvcore FLOP count, nets/tcct32.py:1176-1183).

- ``trace(dir)``       — jax.profiler trace capture context.
- ``cost_analysis``    — FLOPs / bytes for a jitted fn from compiled HLO
                         (the fvcore analogue, but from the real compiler).
- ``StepTimer``        — wall-clock per-step timing with warmup discard.
- ``debug_nans``       — context toggling jax_debug_nans (the race/sanitizer
                         analogue relevant to a jit pipeline).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args, **kwargs) -> Dict[str, float]:
    """FLOPs / bytes accessed of ``jit(fn)(*args)`` from the compiled HLO."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per computation
        ca = ca[0]
    return {
        "flops": float(ca.get("flops", -1.0)),
        "bytes_accessed": float(ca.get("bytes accessed", -1.0)),
        "transcendentals": float(ca.get("transcendentals", 0.0)),
    }


def measured_traffic(trace_dir: str) -> Dict[str, float]:
    """Parse a jax.profiler trace (xplane.pb) into MEASURED totals:
    device self time, HBM bytes (per-op measured HBM bandwidth x self
    time — what the chip actually moved, unlike the HLO cost-analysis
    'bytes accessed' which overcounts fusion reuse), and per-category
    self times.  Used by bench.py to report an honest roofline."""
    import glob as _glob
    import json as _json
    import os as _os

    _os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(
        _glob.glob(_os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    j = _json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["label"] for c in j["cols"]]
    I = {c: i for i, c in enumerate(cols)}
    total_t = hbm_bytes = 0.0
    cats: Dict[str, float] = {}
    for row in j["rows"]:
        r = [c.get("v") for c in row["c"]]
        t = (r[I["Total self time (us)"]] or 0.0) * 1e-6
        hbw = (r[I["HBM BW (GiB/s)"]] or 0.0) * (1 << 30)
        total_t += t
        hbm_bytes += hbw * t
        cat = r[I["HLO op category"]]
        cats[cat] = cats.get(cat, 0.0) + t
    return {"self_time_s": total_t, "hbm_bytes": hbm_bytes, "categories": cats}


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Per-step wall-clock stats; discards the first ``warmup`` steps
    (compile)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"steps": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "min_s": ts[0],
            "max_s": ts[-1],
        }
