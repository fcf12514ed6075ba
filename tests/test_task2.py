"""Task-2 classification: metrics vs sklearn goldens, model forward,
debug train loop, TTA ensemble round trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcct_tpu.task2.metrics import accuracy, f1_score, roc_auc


def test_metrics_vs_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    for _ in range(5):
        y = rng.integers(0, 2, 50)
        s = rng.random(50).round(2)  # ties included
        np.testing.assert_allclose(roc_auc(y, s), sklearn.roc_auc_score(y, s), rtol=1e-9)
        np.testing.assert_allclose(
            f1_score(y, s.round()), sklearn.f1_score(y, s.round()), rtol=1e-9
        )
        np.testing.assert_allclose(
            accuracy(y, s.round()), sklearn.accuracy_score(y, s.round()), rtol=1e-9
        )


def test_cls_model_forward():
    from tcct_tpu.task2.model import ClsModel

    m = ClsModel(net="res18")
    x = jnp.zeros((2, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x)
    y = m.apply(v, x, train=False)
    assert y.shape == (2, 2)


def test_cls_trainer_debug(tmp_path):
    from tcct_tpu.task2.data import GoalClsSet
    from tcct_tpu.task2.train import ClsTrainer

    ds = GoalClsSet.load(img_size=64, synthetic_n=10)
    tr = ClsTrainer(net="res18", bs=2, root=str(tmp_path), img_size=64, dataset=ds, debug=True)
    scores = tr.fit(epochs=1)
    assert set(scores) == {"auc", "f1s", "acc"}
    # fixed reference bug: best ckpt saved from validation accuracy
    assert os.path.isdir(os.path.join(str(tmp_path), "best_model"))
    tr.load(os.path.join(str(tmp_path), "best_model"))


def test_tta_ensemble_roundtrip(tmp_path):
    from tcct_tpu.task2.data import GoalClsSet
    from tcct_tpu.task2.ensemble import build_tta_predict, ensemble_csvs, write_csv
    from tcct_tpu.task2.model import ClsModel

    ds = GoalClsSet.load(img_size=64, synthetic_n=6)
    m = ClsModel(net="res18")
    x = jnp.asarray(ds.imgs)
    v = jax.jit(
        lambda: m.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x[:1].astype(jnp.float32) / 255.0,
        )
    )()
    tta = build_tta_predict(m)
    preds = np.asarray(tta(v["params"], v.get("batch_stats", {}), x))
    assert preds.shape == (6,)
    # two model CSVs -> ensemble mean+round
    p1 = os.path.join(str(tmp_path), "Classification_Results0.csv")
    p2 = os.path.join(str(tmp_path), "Classification_Results1.csv")
    write_csv(p1, ds.names, list(preds))
    write_csv(p2, ds.names, [1.0] * 6)
    final = ensemble_csvs([p1, p2], os.path.join(str(tmp_path), "final.csv"))
    assert set(final) == set(ds.names)
    assert all(v in (0, 1) for v in final.values())


# ---------------------------------------------------------------------------
# pretrained-backbone grafting (reference t2_train.py:129-137)
# ---------------------------------------------------------------------------

def _tv_resnet18_state(rng):
    """Torchvision-named resnet18 state dict with correct shapes (random
    values stand in for the ImageNet weights this env cannot download)."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.standard_normal(c).astype(np.float32)
        sd[name + ".bias"] = rng.standard_normal(c).astype(np.float32)
        sd[name + ".running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[name + ".running_var"] = (np.abs(rng.standard_normal(c)) + 0.5).astype(np.float32)
        sd[name + ".num_batches_tracked"] = np.asarray(1)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    inc = 64
    for li, (c, nb) in enumerate(zip([64, 128, 256, 512], [2, 2, 2, 2])):
        for b in range(nb):
            pre = f"layer{li + 1}.{b}"
            conv(pre + ".conv1", c, inc if b == 0 else c, 3)
            bn(pre + ".bn1", c)
            conv(pre + ".conv2", c, c, 3)
            bn(pre + ".bn2", c)
            if b == 0 and li > 0:
                conv(pre + ".downsample.0", c, inc, 1)
                bn(pre + ".downsample.1", c)
        inc = c
    sd["fc.weight"] = rng.standard_normal((1000, 512)).astype(np.float32)
    sd["fc.bias"] = rng.standard_normal(1000).astype(np.float32)
    return sd


def test_pretrained_resnet_graft():
    from tcct_tpu.task2.model import ClsModel, load_resnet_checkpoint

    model = ClsModel(net="res18")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, x, train=False)
    sd = _tv_resnet18_state(np.random.default_rng(0))
    new_vars, report = load_resnet_checkpoint(sd, variables)

    # exact mapping spot checks: OIHW -> HWIO, BN stats into batch_stats
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["conv1"]["kernel"]),
        sd["conv1.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_array_equal(
        np.asarray(new_vars["batch_stats"]["layer3_0"]["downsample_1"]["mean"]),
        sd["layer3.0.downsample.1.running_mean"],
    )
    # the head stays ours (fc dropped from the source)
    np.testing.assert_array_equal(
        np.asarray(new_vars["params"]["fc_0"]["kernel"]),
        np.asarray(variables["params"]["fc_0"]["kernel"]),
    )
    out = model.apply(new_vars, x, train=False)
    assert np.all(np.isfinite(np.asarray(out)))


def test_pretrained_graft_accepts_wrapped_and_paddle_naming():
    """The reference wraps stages as Sequential(layer, Dropout) under
    ``self.base`` (t2_train.py:141-149); paddle BN uses _mean/_variance."""
    from tcct_tpu.task2.model import ClsModel, load_resnet_checkpoint

    model = ClsModel(net="res18")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, x, train=False)
    sd = _tv_resnet18_state(np.random.default_rng(1))
    wrapped = {}
    for k, v in sd.items():
        k2 = k.replace(".running_mean", "._mean").replace(".running_var", "._variance")
        import re
        k2 = re.sub(r"^(layer\d)\.", r"\1.0.", k2)
        wrapped["base." + k2] = v
    a, _ = load_resnet_checkpoint(sd, variables)
    b, _ = load_resnet_checkpoint(wrapped, variables)
    np.testing.assert_array_equal(
        np.asarray(a["params"]["layer4_1"]["conv2"]["kernel"]),
        np.asarray(b["params"]["layer4_1"]["conv2"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(a["batch_stats"]["bn1"]["var"]),
        np.asarray(b["batch_stats"]["bn1"]["var"]),
    )


def test_pretrained_graft_rejects_partial():
    from tcct_tpu.task2.model import ClsModel, load_resnet_checkpoint

    model = ClsModel(net="res18")
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, x, train=False)
    sd = _tv_resnet18_state(np.random.default_rng(2))
    partial = {k: v for k, v in sd.items() if "layer4" not in k}
    with pytest.raises(ValueError):
        load_resnet_checkpoint(partial, variables)
