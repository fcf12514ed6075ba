"""Test config: run everything on a simulated 8-device CPU mesh.

The axon sitecustomize force-selects the TPU platform; tests override to
CPU (deterministic, no tunnel) and request 8 virtual devices so sharding
tests exercise real mesh partitioning without hardware.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite builds many near-identical stc_tt
# train/eval programs from different closures (no in-process jit reuse);
# keying on HLO hash dedups them across tests AND across runs
# (measured: 59 s -> 15 s for a repeat train-step compile).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy tier (long trajectories, multi-process) — skipped by "
        "default on this 1-core container; run with TCCT_SLOW=1 or -m slow",
    )


def pytest_collection_modifyitems(config, items):
    # Default run = fast tier (<900 s budget, BACKLOG 'Test suite').
    # TCCT_SLOW=1 or an explicit -m expression runs everything selected.
    if os.environ.get("TCCT_SLOW") == "1" or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow tier (TCCT_SLOW=1 or -m slow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def golden():
    def load(name):
        path = os.path.join(GOLDEN_DIR, name + ".npz")
        if not os.path.exists(path):
            pytest.skip(f"golden fixture {name} missing (run tools/make_golden.py)")
        return np.load(path)

    return load
