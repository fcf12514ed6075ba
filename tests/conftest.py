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


GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def golden():
    def load(name):
        path = os.path.join(GOLDEN_DIR, name + ".npz")
        if not os.path.exists(path):
            pytest.skip(f"golden fixture {name} missing (run tools/make_golden.py)")
        return np.load(path)

    return load
