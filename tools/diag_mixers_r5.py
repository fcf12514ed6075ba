"""Mixer-health diagnostic (VERDICT r4 item 4): are the factor/hydra
linear-attention mixers *mis-recipe'd* (pathological gradient or
activation scales under the flagship recipe) or just slower to converge
than MetaPool on the synthetic set?

CPU, tiny shapes: step-0 gradients of the flagship loss (ds+udh+reg)
and forward activation scales, grouped by module region.  A healthy
mixer shows mixer-block gradient norms within ~1 order of magnitude of
MetaPool's; a mis-recipe shows vanishing/exploding mixer grads or
saturated activations.

Usage: python tools/diag_mixers_r5.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


REGIONS = (
    ("mixer", ("metapool", "factoratt", "hydra", "crpe", "mhca_blks")),
    ("vit-other", ("base_vit",)),
    ("cnn", ("base_cnn",)),
    ("fuse/dec", ("tran_", "dec", "aux", "fusion", "t32")),
)


def region_of(path: str) -> str:
    p = path.lower()
    for name, keys in REGIONS:
        if any(k in p for k in keys):
            return name
    return "other"


def main():
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.train import TrainConfig
    from tcct_tpu.train.state import create_train_state, make_optimizer
    from tcct_tpu.train.step import build_loss_fn

    hw, n_class, bs = (64, 64), 5, 2
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((bs, hw[0], hw[1], 3)).astype(np.float32))
    lab = rng.integers(0, n_class, (bs, hw[0], hw[1]))
    true_oh = jax.nn.one_hot(jnp.asarray(lab), n_class, dtype=jnp.float32)

    for mixer in ("metapool", "factor", "hydra"):
        model = RegNet(
            base=get_model("stc_tt", n_class, mixer=mixer), out_channels=n_class
        )
        cfg = TrainConfig(n_class=n_class, crop_hw=hw, ds=True, udh=True, reg=True)
        opt = make_optimizer(steps_per_epoch=4)
        state = create_train_state(
            model, opt, jax.random.PRNGKey(0),
            jnp.zeros((1, hw[0], hw[1], 3)), jnp.zeros((1, hw[0], hw[1], n_class)),
        )
        loss_fn = build_loss_fn(model, cfg)
        k = jax.random.PRNGKey(1)
        (los, (_, metrics)), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(
            state.params, state.batch_stats, state.prototypes, img, true_oh,
            {"gate": k, "droppath": k}, k,
        )

        # per-region grad RMS (norm / sqrt(count)) — scale-free comparison
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        agg = {}
        for path, g in flat:
            r = region_of(jax.tree_util.keystr(path))
            s, n = agg.get(r, (0.0, 0))
            agg[r] = (s + float(jnp.sum(g.astype(jnp.float64) ** 2)), n + g.size)
        print(f"\n=== {mixer}: loss {float(los):.4f} "
              f"(los {float(metrics['los']):.4f} udh {float(metrics['udh']):.4f} "
              f"reg {float(metrics['reg']):.4f})")
        for r, (s2, n) in sorted(agg.items()):
            print(f"  grad RMS {r:<10} {np.sqrt(s2 / n):.3e}  ({n} params)")

        # activation scale at the fusion inputs: forward with captured
        # intermediates, report the ViT pyramid RMS per stage
        variables = {"params": state.params, "batch_stats": state.batch_stats,
                     "prototypes": state.prototypes}
        pyr, _ = model.apply(
            variables, img, train=False,
            rngs={"gate": k, "droppath": k},
        )
        outs = pyr if isinstance(pyr, (list, tuple)) else [pyr]
        print("  head output RMS:", " ".join(
            f"{float(jnp.sqrt(jnp.mean(o.astype(jnp.float32)**2))):.3f}"
            for o in outs if o is not None))


if __name__ == "__main__":
    main()
