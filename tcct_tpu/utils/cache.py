"""Persistent XLA compilation cache for the serving/training entry points.

The reference pays onnxruntime's session build once per process
(reference task1/onnx/onnx_infer.py:16); the TPU-native analog is XLA
compilation, which on this stack is REMOTE and wildly variable (10 s ..
6+ min for the same program).  jax's persistent compilation cache keys
the serialized executable on the HLO fingerprint + platform, so a warm
cache turns every later cold start — new process, same model/geometry —
into a disk read.

Measured through the axon relay (duke-bucket volume predictor, bf16
packed, bs=8): first process compile 372.8 s (slow remote window),
second process 5.5 s.  The cache is shared safely across backends (the
key includes the platform), so the CPU test suite and the TPU serving
path can point at different dirs or the same one.

Enabled by default from the CLI, the volume predictor, task-2 entry
points, and bench.py.  Opt out with ``TCCT_NO_COMPILE_CACHE=1``;
relocate with ``TCCT_COMPILE_CACHE=/path``.
"""

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "tcct_tpu_xla"
)


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at ``cache_dir``.

    Idempotent; returns the directory in use, or None when disabled via
    ``TCCT_NO_COMPILE_CACHE=1`` or when a cache dir was already
    configured elsewhere (e.g. tests/conftest.py) — an existing setting
    always wins so callers can layer freely.
    """
    if os.environ.get("TCCT_NO_COMPILE_CACHE") == "1":
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    cache_dir = (
        cache_dir or os.environ.get("TCCT_COMPILE_CACHE") or _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # only persist compiles that cost real time (trivial programs churn
    # the dir without saving anything)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
