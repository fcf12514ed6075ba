"""Multi-host (DCN) initialization and global-array helpers.

The reference has no distributed code at all (SURVEY §2.4); single-host
DP over ICI is tcct_tpu's first-class strategy (parallel/mesh.py).  This
module adds the multi-host story: ``init_distributed`` brings up the
jax.distributed runtime (auto-detected on TPU pods; explicit/env-driven
elsewhere), after which ``jax.devices()`` is global and the existing
('data',) mesh helpers span hosts — batch-DP gradients then psum over
ICI within a host and DCN across hosts, inserted by XLA from the same
sharding annotations.

Cross-host arrays cannot be built with a plain ``device_put`` (a process
can only address its local devices); ``replicate``/``shard_batch`` in
parallel/mesh.py detect a multi-process mesh and construct global arrays
via ``jax.make_array_from_callback`` — each process materializes exactly
the shards it owns.  For this workload class every host holds the (tiny)
full dataset, so the callback is a pure slice, no cross-host IO.

Tested end-to-end by tests/test_distributed.py: two real processes with
4 virtual CPU devices each form one 8-device mesh and reproduce the
single-process training-step loss bit-for-bit (Gloo collectives).
"""

from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the jax.distributed runtime.

    On TPU pod slices, call with no arguments (everything is discovered
    from the TPU environment).  Elsewhere, pass explicitly or set
    ``TCCT_COORDINATOR`` / ``TCCT_NUM_PROCESSES`` / ``TCCT_PROCESS_ID``.
    Safe to call once per process, before any other jax API touches the
    backend.
    """
    import jax

    env = os.environ
    coordinator_address = coordinator_address or env.get("TCCT_COORDINATOR")
    if num_processes is None and env.get("TCCT_NUM_PROCESSES"):
        num_processes = int(env["TCCT_NUM_PROCESSES"])
    if process_id is None and env.get("TCCT_PROCESS_ID"):
        process_id = int(env["TCCT_PROCESS_ID"])
    kw = {}
    if coordinator_address is not None:
        kw = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kw)


def is_multiprocess_mesh(mesh) -> bool:
    """True if the mesh spans devices of more than one process."""
    import jax

    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def barrier(name: str, timeout_s: int = 600) -> None:
    """Cross-process barrier through the jax.distributed coordination
    service (NOT a device collective — usable to line ranks up BEFORE the
    first Gloo/ICI collective, whose peer-join timeout is short compared
    to a large XLA compile on a busy host)."""
    from jax._src import distributed as _dist

    client = getattr(_dist.global_state, "client", None)
    if client is None:
        return  # single-process: nothing to synchronize
    client.wait_at_barrier(name, timeout_in_ms=timeout_s * 1000)


def make_global_array(mesh, pspec, host_value):
    """Build a (possibly cross-host) array from a host-local full copy.

    ``host_value`` is the full global value, present identically on every
    process; each process materializes only the shards its devices own.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding

    arr = np.asarray(host_value)
    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])
