"""Multi-chip paths on the 8-device virtual CPU mesh: DP train step
(dryrun contract) and data-parallel full-volume inference
(BASELINE configs[4])."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8  # conftest XLA_FLAGS


def test_dryrun_multichip_contract():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finiteness internally


def test_dryrun_survives_unavailable_tpu_backend():
    """VERDICT r3 item 1a: dryrun_multichip must never initialize a backend
    in the parent process.  Simulate an axon outage by selecting the axon
    platform WITHOUT registering it — any parent-side jax.devices() then
    raises 'unknown backend' immediately (on the real stack it would hang
    ~30 min).  The dryrun must still pass via its CPU-subprocess path."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # sitecustomize skips register()
    env["JAX_PLATFORMS"] = "axon"
    code = (
        "import jax, __graft_entry__ as g\n"
        "try:\n"
        "    jax.devices()\n"
        "except Exception:\n"
        "    pass\n"
        "else:\n"
        "    raise SystemExit('expected axon backend to be unavailable')\n"
        "g.dryrun_multichip(2)\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-c", code], cwd=repo, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip ok" in res.stdout


def test_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256, 5)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_sharded_volume_predictor():
    from tcct_tpu.data.geometry import DatasetGeometry
    from tcct_tpu.infer.predictor import VolumePredictor
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.parallel import make_mesh, replicate

    mesh = make_mesh(8, ("data",))
    net = RegNet(base=get_model("relay", 5), out_channels=5)
    x = jnp.zeros((1, 64, 64, 3))
    v = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    geo = DatasetGeometry("tiny", 5, 0, 64, "resize", (64, 64))

    plain = VolumePredictor(net, v, geo, batch_size=8, dtype=jnp.float32)
    sharded = VolumePredictor(
        net, replicate(mesh, v), geo, batch_size=8, dtype=jnp.float32, mesh=mesh
    )
    vol = np.random.default_rng(0).integers(0, 255, (16, 64, 64, 3), dtype=np.uint8)
    a = plain.predict_scans(vol)
    b = sharded.predict_scans(vol)
    np.testing.assert_array_equal(a, b)


def test_spatial_sharded_predictor_matches():
    """2-D mesh (batch-DP x spatial width sharding): GSPMD inserts the
    conv halo exchanges; argmax must match the unsharded predictor
    (SURVEY §5 long-input path)."""
    from tcct_tpu.data.geometry import DatasetGeometry
    from tcct_tpu.infer.predictor import VolumePredictor
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.parallel import make_mesh, replicate

    mesh = make_mesh(8, ("data", "model"), shape=(2, 4))
    assert mesh.shape["model"] == 4
    net = RegNet(base=get_model("stc_tt", 5, variant="infer"), out_channels=5)
    x = jnp.zeros((1, 64, 256, 3))
    v = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    geo = DatasetGeometry("wide", 5, 0, 64, "resize", (64, 256))

    plain = VolumePredictor(net, v, geo, batch_size=4, dtype=jnp.float32)
    sharded = VolumePredictor(
        net, replicate(mesh, v), geo, batch_size=4, dtype=jnp.float32, mesh=mesh
    )
    vol = np.random.default_rng(5).integers(0, 255, (4, 64, 256, 3), dtype=np.uint8)
    a = plain.predict_scans(vol)
    b = sharded.predict_scans(vol)
    assert (a == b).mean() > 0.999  # halo reassociation can flip rare ties


def test_pick_dp_devices():
    from tcct_tpu.parallel import pick_dp_devices

    assert pick_dp_devices(8, 8) == 8
    assert pick_dp_devices(2, 8) == 2
    assert pick_dp_devices(6, 8) == 6
    assert pick_dp_devices(3, 8) == 3
    assert pick_dp_devices(7, 4) == 1
    assert pick_dp_devices(8, 1) == 1


def test_trainer_dp_matches_single_device(tmp_path, monkeypatch):
    """The CLI --pl path: a Trainer built on the 8-device mesh produces the
    same loss trajectory as single-device with the same global batch
    (VERDICT r1 item 2)."""
    from tcct_tpu.data import EyeSet
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.parallel import make_mesh
    from tcct_tpu.train import TrainConfig, Trainer

    monkeypatch.setenv("TCCT_SYNTH_N", "8")
    monkeypatch.setenv("TCCT_SYNTH_HW", "64x96")
    dataset = EyeSet.load("goals", root="")  # synthetic fallback
    nc = dataset.out_channels
    cfg = TrainConfig(n_class=nc, crop_hw=(32, 32), ds=True)

    def run(mesh, tag):
        # width-independent check: narrow relay keeps the 1-core cost down
        net = RegNet(base=get_model("relay", nc, filters=16), out_channels=nc)
        tr = Trainer(
            net, dataset, cfg, root=str(tmp_path / tag), bs=8,
            mesh=mesh, debug=True, seed=7,
        )
        tr.steps_per_epoch = 4  # trajectory equality needs steps, not epochs
        return [tr.train_epoch(e)["los_epoch"] for e in range(2)]

    plain = run(None, "plain")
    dp = run(make_mesh(8), "dp")
    np.testing.assert_allclose(plain, dp, rtol=5e-4)


def test_train_step_sharded_batch_matches_replicated():
    """DP invariance: the same batch sharded over 8 devices vs run on one
    device gives the same loss (global BN stats + grad psum)."""
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.parallel import make_mesh, replicate, shard_batch
    from tcct_tpu.train import TrainConfig, build_train_step
    from tcct_tpu.train.state import create_train_state, make_optimizer

    n_class = 5
    model = RegNet(base=get_model("relay", n_class), out_channels=n_class)
    cfg = TrainConfig(n_class=n_class, crop_hw=(32, 32), ds=True)
    opt = make_optimizer(steps_per_epoch=4)
    state = create_train_state(
        model, opt, jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, n_class)),
    )
    step = build_train_step(model, opt, cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (8, 48, 48, 3), dtype=np.uint8))
    labs = jnp.asarray(rng.integers(0, n_class, (8, 48, 48)).astype(np.uint8))

    _, m_plain = step(state, imgs, labs)

    mesh = make_mesh(8, ("data",))
    with mesh:
        state_r = replicate(mesh, state)
        imgs_s, labs_s = shard_batch(mesh, (imgs, labs))
        _, m_shard = step(state_r, imgs_s, labs_s)
    np.testing.assert_allclose(
        float(m_plain["total"]), float(m_shard["total"]), rtol=1e-4
    )
