"""End-to-end engine smoke on CPU: synthetic dataset, ReLayNet base (small
graph -> fast CPU compile), all aux losses on, one debug epoch, val,
checkpoint save/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcct_tpu.data import EyeSet
from tcct_tpu.models import RegNet, get_model
from tcct_tpu.train import TrainConfig, Trainer


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    import os

    # engine semantics don't need the full 608x512 geometry — shrink the
    # synthetic set (full-geometry shapes are covered by tests/test_data.py)
    env = {"TCCT_SYNTH_N": "8", "TCCT_SYNTH_HW": "96x128"}
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        ds = EyeSet.load("goals")  # synthetic fallback
    finally:
        for k, v in saved.items():
            os.environ.pop(k, None) if v is None else os.environ.update({k: v})
    assert ds.synthetic and ds.out_channels == 5
    # engine mechanics are model-width-independent: a 16-filter ReLayNet
    # exercises the same graph structure (BN, pool masks, DS pyramid,
    # feats heads) at ~1/16th the 1-core conv cost of the default 64
    model = RegNet(
        base=get_model("relay", ds.out_channels, filters=16),
        out_channels=ds.out_channels,
    )
    cfg = TrainConfig(
        n_class=ds.out_channels, crop_hw=(64, 64), ds=True, udh=True, reg=True, epl=True
    )
    root = str(tmp_path_factory.mktemp("exp"))
    tr = Trainer(model, ds, cfg, root=root, bs=2, debug=True)
    # engine smoke: 4 steps/epoch exercise the same code paths as the
    # --bug default of 12 at a third of the 1-core CI cost
    tr.steps_per_epoch = 4
    return tr


def test_fit_one_epoch(trainer):
    logs = trainer.fit(epochs=1)
    assert np.isfinite(logs["val_f1s"])
    assert len(logs["scores"]) == 5


def test_loss_decreases_with_steps(trainer):
    # a few more steps on the same data should keep loss finite & params moving
    before = jax.tree_util.tree_leaves(trainer.state.params)[0].copy()
    logs = trainer.train_epoch(epoch=1)
    after = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert np.isfinite(logs["los_epoch"])
    assert not np.allclose(before, after)


def test_checkpoint_roundtrip(trainer):
    step_before = int(trainer.state.step)
    assert trainer.resume("last")
    # 'last' was saved at the end of the debug epoch (step>=1)
    assert int(trainer.state.step) >= 1
    assert step_before >= int(trainer.state.step)


def test_bitwise_resume(trainer, tmp_path):
    """Full-TrainState checkpointing makes resume bitwise-continuous
    (the reference loses optimizer moments and PRNG on resume,
    loopback.py:105-121): save -> N steps -> loss must equal
    restore -> same N steps."""
    from tcct_tpu.train.state import restore_checkpoint, save_checkpoint

    imgs, labs = trainer._dev["train"]
    bi = jnp.arange(2)
    save_checkpoint(str(tmp_path), trainer.state, "probe")
    s1, m1 = trainer.train_step(trainer.state, jnp.take(imgs, bi, 0), jnp.take(labs, bi, 0))
    _, m2 = trainer.train_step(s1, jnp.take(imgs, bi, 0), jnp.take(labs, bi, 0))

    restored = restore_checkpoint(str(tmp_path), trainer.state, "probe")
    r1, n1 = trainer.train_step(restored, jnp.take(imgs, bi, 0), jnp.take(labs, bi, 0))
    _, n2 = trainer.train_step(r1, jnp.take(imgs, bi, 0), jnp.take(labs, bi, 0))
    assert float(m1["total"]) == float(n1["total"])
    assert float(m2["total"]) == float(n2["total"])


def test_stochastic_val_reference_quirk(trainer):
    # stochastic val (reference ALB_VALID) gives keyed, reproducible results
    a = trainer.val(epoch=3)
    b = trainer.val(epoch=3)
    assert a["val_f1s"] == b["val_f1s"]


def test_compiled_val_matches_host_loop(trainer):
    """The one-dispatch eval_epoch scan must reproduce the per-scan host
    loop (same flip keys, same bs=1 statistics)."""
    fast = trainer.val(epoch=7)  # compiled (default for bs=1)
    slow = trainer.val(epoch=7, compiled=False)
    assert abs(fast["val_f1s"] - slow["val_f1s"]) < 1e-5
    assert abs(fast["val_iou"] - slow["val_iou"]) < 1e-5
    np.testing.assert_allclose(fast["scores"], slow["scores"], atol=1e-3)


def test_scan_epoch_logs_all_loss_terms(trainer):
    """The fast (epoch-scan) path must surface every active loss term
    (reference shows per-loss postfix, task1/kite/loop_seg.py:133)."""
    logs = trainer.train_epoch(epoch=2)
    for k in ("total", "los", "udh", "reg", "epl", "los_epoch"):
        assert k in logs and np.isfinite(logs[k]), k


@pytest.mark.slow
def test_flat_optimizer_and_remat_policy_match_plain():
    """r5: optax.flatten'd optimizer (fused update — the HBM audit found
    the per-tensor AdamW fragmented into ~600 tiny HLO ops/step) and
    policy-based selective remat are trajectory-identical to the plain
    step over two full optimizer steps."""
    import numpy as np

    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.train import TrainConfig, build_train_step
    from tcct_tpu.train.state import create_train_state, make_optimizer

    model = RegNet(base=get_model("stc_tt", 5), out_channels=5)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    labs = jnp.asarray(rng.integers(0, 5, (2, 64, 64)).astype(np.uint8))
    res = {}
    for name, ckw, okw in [
        ("plain", {}, {}),
        ("flat", {}, {"flat": True}),
        ("rdots", {"remat": True, "remat_policy": "dots"}, {}),
    ]:
        cfg = TrainConfig(n_class=5, crop_hw=(64, 64), ds=True, **ckw)
        opt = make_optimizer(steps_per_epoch=4, **okw)
        state = create_train_state(
            model, opt, jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 5)),
        )
        step = build_train_step(model, opt, cfg)
        s1, m1 = step(state, imgs, labs)
        _, m2 = step(s1, imgs, labs)
        res[name] = (float(m1["total"]), float(m2["total"]))
    for name in ("flat", "rdots"):
        assert abs(res["plain"][0] - res[name][0]) < 1e-5, (name, res)
        assert abs(res["plain"][1] - res[name][1]) < 1e-4, (name, res)
