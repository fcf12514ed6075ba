"""Task-2 training loop (reference task2/t2_train.py:162-349).

Reference behaviours kept: BCEWithLogits applied to *softmaxed* outputs
vs one-hot targets (the reference's quirk at t2_train.py:183-185 — it
double-squashes; reproduced because that is what its checkpoints were
trained with), Adam lr 1e-5 wd 5e-4, val every 5 epochs with AUC/F1/ACC.
Reference bug fixed (SURVEY §2.3.5): best-model selection stores the
*validation* accuracy, not the train running accuracy.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from tcct_tpu.task2.data import GoalClsSet, cls_train_augment
from tcct_tpu.task2.metrics import accuracy, f1_score, roc_auc
from tcct_tpu.task2.model import ClsModel


class ClsState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    batch_stats: dict
    opt_state: dict
    rng: jax.Array


def bce_on_softmax(logits, onehot):
    """BCEWithLogitsLoss(softmax(out), one_hot) — t2_train.py:183-185."""
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.mean(
        jnp.maximum(p, 0) - p * onehot + jnp.log1p(jnp.exp(-jnp.abs(p)))
    )


def build_cls_train_step(model, optimizer, augment: bool = True):
    def loss_fn(params, batch_stats, img, onehot, drop_rng):
        (logits, updates) = model.apply(
            {"params": params, "batch_stats": batch_stats},
            img,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": drop_rng},
        )
        loss = bce_on_softmax(logits, onehot)
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == jnp.argmax(onehot, -1)).astype(jnp.float32)
        )
        return loss, (updates.get("batch_stats", batch_stats), acc)

    @jax.jit
    def step(state: ClsState, imgs_u8, labels):
        k_aug, k_drop = jax.random.split(jax.random.fold_in(state.rng, state.step))
        img = cls_train_augment(imgs_u8, k_aug) if augment else imgs_u8.astype(jnp.float32) / 255.0
        onehot = jax.nn.one_hot(labels, 2)
        (loss, (new_bs, acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, img, onehot, k_drop
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params, batch_stats=new_bs, opt_state=new_opt),
            {"loss": loss, "acc": acc},
        )

    return step


def build_cls_predict(model):
    @jax.jit
    def predict(params, batch_stats, imgs_u8):
        img = imgs_u8.astype(jnp.float32) / 255.0
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, img, train=False
        )
        return jnp.argmax(jax.nn.softmax(logits, -1), -1)

    return predict


class ClsTrainer:
    def __init__(
        self,
        net: str = "res18",
        lr: float = 1e-5,
        weight_decay: float = 5e-4,
        bs: int = 8,
        root: str = "goals_task2",
        img_size: int = 224,
        dataset: Optional[GoalClsSet] = None,
        seed: int = 311,
        debug: bool = False,
        pretrained: Optional[str] = None,
    ):
        self.model = ClsModel(net=net)
        self.bs = bs
        self.root = root
        self.debug = debug
        os.makedirs(root, exist_ok=True)
        self.dataset = dataset or GoalClsSet.load(img_size=img_size)
        # coupled L2 (grad += wd * param before the Adam moments), matching
        # paddle.optimizer.Adam(weight_decay=5e-4) at reference
        # task2/t2_train.py:172 — NOT decoupled AdamW
        self.optimizer = optax.chain(
            optax.add_decayed_weights(weight_decay), optax.adam(lr)
        )
        rng = jax.random.PRNGKey(seed)
        sample = jnp.zeros((1, img_size, img_size, 3))
        variables = jax.jit(
            lambda: self.model.init(
                {"params": rng, "dropout": rng}, sample, train=False
            )
        )()
        # ImageNet-pretrained backbone graft (reference t2_train.py:129:
        # pretrained=True). The weight file must be supplied — zero-egress
        # environments can't download it (documented deviation).
        pretrained = pretrained or os.environ.get("TCCT_RESNET_PT", "")
        if pretrained:
            from tcct_tpu.task2.model import load_resnet_checkpoint

            variables, report = load_resnet_checkpoint(pretrained, variables)
            print("pretrained backbone:", report)
        self.state = ClsState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.optimizer.init(variables["params"]),
            rng=rng,
        )
        self.train_step = build_cls_train_step(self.model, self.optimizer)
        self.predict_fn = build_cls_predict(self.model)
        self.imgs_dev = jnp.asarray(self.dataset.imgs)
        self.best_acc = -1.0

    def valid(self) -> Dict[str, float]:
        preds = []
        for i in range(0, len(self.dataset.imgs), self.bs):
            p = self.predict_fn(
                self.state.params, self.state.batch_stats, self.imgs_dev[i : i + self.bs]
            )
            preds.append(np.asarray(p))
        preds = np.concatenate(preds)
        labs = self.dataset.labels
        mask = labs != 9
        return {
            "auc": roc_auc(labs[mask], preds[mask]),
            "f1s": f1_score(labs[mask], preds[mask].round()),
            "acc": accuracy(labs[mask], preds[mask].round()),
        }

    def fit(self, epochs: int = 99) -> Dict[str, float]:
        n = len(self.dataset.imgs)
        steps = max(n * self.dataset.oversample // self.bs, 1)
        if self.debug:
            steps, epochs = 4, 1
        rng = np.random.default_rng(311)
        labs_dev = jnp.asarray(self.dataset.labels)
        scores: Dict[str, float] = {}
        for epoch in range(epochs):
            losses, accs = [], []
            for _ in range(steps):
                idx = jnp.asarray(rng.integers(0, n, self.bs))
                self.state, m = self.train_step(
                    self.state, jnp.take(self.imgs_dev, idx, 0), jnp.take(labs_dev, idx, 0)
                )
                losses.append(float(m["loss"]))
                accs.append(float(m["acc"]))
            print(f"[RUN] {epoch}/{epochs} loss={np.mean(losses):.4f} acc={np.mean(accs):.4f}")
            if epoch % 5 == 0:
                scores = self.valid()
                print(f"[VAL] {epoch}: {scores}")
                if scores["acc"] > self.best_acc:
                    self.best_acc = scores["acc"]
                    self.save(os.path.join(self.root, "best_model"))
        return scores

    def save(self, path: str):
        from tcct_tpu.train.state import save_checkpoint

        os.makedirs(path, exist_ok=True)
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(os.path.join(path, "state")),
            jax.device_get({"params": self.state.params, "batch_stats": self.state.batch_stats}),
            force=True,
        )
        ckptr.wait_until_finished()

    def load(self, path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(os.path.join(path, "state")),
            jax.device_get({"params": self.state.params, "batch_stats": self.state.batch_stats}),
        )
        self.state = self.state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )


def main(argv=None):
    """CLI mirroring the reference (task2/t2_train.py:26-34):
    ``python -m tcct_tpu.task2.train --net=res18 --lr=1e-5 --bs=8``."""
    import argparse

    p = argparse.ArgumentParser(description="GOALS Task-2 Argument")
    p.add_argument("--inc", type=str, default="")
    p.add_argument("--gpu", type=str, default="0", help="(ignored; jax devices)")
    p.add_argument("--net", type=str, default="res18", choices=["res18", "res34", "res50"])
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--epochs", type=int, default=99)
    p.add_argument("--root", type=str, default="goals_task2")
    p.add_argument("--data_root", type=str, default="", help="GOALS folder (else synthetic)")
    p.add_argument("--bug", action="store_true")
    args = p.parse_args(argv)

    from tcct_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    ds = None
    if args.data_root:
        ds = GoalClsSet.load(
            dataset_root=os.path.join(args.data_root, "Train", "Image"),
            label_file=os.path.join(args.data_root, "Train", "Train_GC_GT.xlsx"),
            img_size=args.img_size,
        )
    tr = ClsTrainer(
        net=args.net, lr=args.lr, bs=args.bs, root=args.root,
        img_size=args.img_size, dataset=ds, debug=args.bug,
    )
    scores = tr.fit(epochs=1 if args.bug else args.epochs)
    print("final:", scores)


if __name__ == "__main__":
    main()
