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
