"""Multi-host (DCN) story: two REAL processes, 4 virtual CPU devices
each, one global 8-device ('data',) mesh — the full DP training step must
reproduce the single-process result (Gloo cross-process collectives
standing in for DCN; same sharding annotations as ICI).

The reference has no distributed code at all (SURVEY §2.4)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _step_loss(mesh):
    """Deterministic mini train step on the given mesh; returns the loss."""
    import jax
    import jax.numpy as jnp

    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.parallel import replicate, shard_batch
    from tcct_tpu.train import TrainConfig, build_train_step
    from tcct_tpu.train.state import create_train_state, make_optimizer

    n_class = 5
    # width-independent check: narrow relay keeps per-rank compile+compute
    # cheap (compile skew between ranks risks the Gloo join timeout)
    model = RegNet(base=get_model("relay", n_class, filters=16), out_channels=n_class)
    cfg = TrainConfig(n_class=n_class, crop_hw=(32, 32), ds=True)
    opt = make_optimizer(steps_per_epoch=4)
    state = create_train_state(
        model, opt, jax.random.PRNGKey(3),
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, n_class)),
    )
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (8, 48, 48, 3), dtype=np.uint8)
    labs = rng.integers(0, n_class, (8, 48, 48)).astype(np.uint8)
    step = build_train_step(model, opt, cfg, mesh=mesh)
    with mesh:
        state = replicate(mesh, state)
        batch = shard_batch(mesh, (imgs, labs))
        # compile first, then line the ranks up through the coordination
        # service — on a busy 1-core host, compile skew between ranks can
        # exceed the Gloo peer-join timeout if the first collective starts
        # while the other rank is still compiling
        compiled = step.lower(state, *batch).compile()
        from tcct_tpu.parallel.distributed import barrier

        barrier("compiled_train_step")
        _, metrics = compiled(state, *batch)
    return float(metrics["total"])


def _worker_main(rank: int, port: int):
    """Entry point executed inside each spawned process."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    from tcct_tpu.parallel import make_mesh
    from tcct_tpu.parallel.distributed import init_distributed

    init_distributed(f"127.0.0.1:{port}", 2, rank)
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
    mesh = make_mesh(8, ("data",))
    from tcct_tpu.parallel.distributed import is_multiprocess_mesh

    assert is_multiprocess_mesh(mesh)
    loss = _step_loss(mesh)
    print(f"DIST_LOSS {loss:.8f}", flush=True)


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    # expected value on the in-process 8-device mesh (conftest env)
    from tcct_tpu.parallel import make_mesh

    expected = _step_loss(make_mesh(8, ("data",)))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = (
        "import os, sys\n"
        "rank, port = int(sys.argv[1]), int(sys.argv[2])\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'\n"
        f"sys.path.insert(0, {REPO!r}); sys.path.insert(0, {os.path.join(REPO, 'tests')!r})\n"
        "from test_distributed import _worker_main\n"
        "_worker_main(rank, port)\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(r), str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-2000:]}"
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("DIST_LOSS")]
        assert lines, out[-1000:]
        losses.append(float(lines[-1].split()[1]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)
    np.testing.assert_allclose(losses[0], expected, rtol=1e-5)
