"""Device mesh + sharding helpers.

The reference has no distributed code at all (SURVEY §2.4: a dead
``--pl`` flag, task1/kite/main.py:47).  Here data-parallelism is the
first-class strategy: a 1-D ``('data',)`` mesh over all chips, batches
sharded on the leading axis, parameters replicated.  Model/spatial axes
are reserved in the axis-name vocabulary (``'model'``) so TP/SP layouts
for full-volume inference are config, not code changes.

Under ``jax.jit`` with these shardings XLA inserts the gradient psum and
makes BatchNorm's batch reductions global automatically — no explicit
collectives in model code, and they ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a device mesh.  ``shape`` partitions the devices over the
    named axes (e.g. ``make_mesh(8, ('data','model'), shape=(2,4))`` for
    batch-DP x spatial sharding); default puts everything on the first
    axis."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise RuntimeError(
            f"make_mesh: need {n} devices, only {len(devs)} visible "
            f"(platform={devs[0].platform if devs else '?'}). For a virtual "
            "mesh, set XLA_FLAGS=--xla_force_host_platform_device_count=<n> "
            "and jax_platforms=cpu BEFORE the jax backend initializes "
            "(see tests/conftest.py), or use "
            "__graft_entry__.dryrun_multichip which self-provisions one."
        )
    devs = np.array(devs[:n])
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(devs.reshape(tuple(shape)), axis_names)


def pick_dp_devices(bs: int, n_devices: int) -> int:
    """Largest device count <= n_devices that divides the global batch, so
    DP keeps single-device batch semantics exactly (CLI --pl)."""
    return max(d for d in range(1, max(n_devices, 1) + 1) if bs % d == 0)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'.  When the mesh also has
    a non-trivial 'model' axis, NHWC tensors additionally shard their
    width over it (spatial sharding for wide full-volume inputs — GSPMD
    inserts the conv halo exchanges; SURVEY §5 long-input path)."""
    spec: list = ["data"] + [None] * (ndim - 1)
    if (
        ndim == 4
        and "model" in mesh.axis_names
        and mesh.shape.get("model", 1) > 1
    ):
        spec[2] = "model"
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch):
    """Shard a batch's leading axis over ('data',).  On a multi-host mesh
    each process holds the full batch and materializes only its local
    shards (see parallel/distributed.py)."""
    from tcct_tpu.parallel.distributed import is_multiprocess_mesh, make_global_array

    if is_multiprocess_mesh(mesh):
        return jax.tree_util.tree_map(
            lambda x: make_global_array(
                mesh, P("data", *([None] * (np.ndim(x) - 1))), x
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch
    )


def replicate(mesh: Mesh, tree):
    from tcct_tpu.parallel.distributed import is_multiprocess_mesh, make_global_array

    if is_multiprocess_mesh(mesh):
        return jax.tree_util.tree_map(
            lambda x: make_global_array(mesh, P(), x), tree
        )
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
