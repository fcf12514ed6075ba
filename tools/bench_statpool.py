"""A/B the packed BN-statistics lowering ('vector' [4C]-first vs
'reshape' [..,4,C]) and the phase-maxpool lowering ('slices' max tree vs
'reshape' + reduce) on the flagship train epoch — attribution for the
round-4 layout work.  All forms are exact (tests/test_packed_conv.py).

Run on the real TPU: python tools/bench_statpool.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), file=sys.stderr)

CONFIGS = [
    ("reshape", "reshape"),  # round-3 baseline forms
    ("vector", "reshape"),
    ("reshape", "slices"),
    ("vector", "slices"),
]


def main():
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.ops.packed_conv import stat_pool_lowering
    from tcct_tpu.train import TrainConfig
    from tcct_tpu.train.state import create_train_state, make_optimizer
    from tcct_tpu.train.step import build_train_epoch

    n_class, hw, bs = 5, (256, 256), 8
    model = RegNet(base=get_model("stc_tt", n_class), out_channels=n_class)
    cfg = TrainConfig(n_class=n_class, crop_hw=hw, ds=True, dtype=jnp.bfloat16, packed_cnn=True)
    opt = make_optimizer(steps_per_epoch=100)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (24, 300, 512, 3), dtype=np.uint8))
    labs = jnp.asarray(rng.integers(0, n_class, (24, 300, 512)).astype(np.uint8))
    idx = jnp.asarray(rng.integers(0, 24, (24, bs)))

    for stats, pool in CONFIGS:
        with stat_pool_lowering(stats=stats, pool=pool):
            state = create_train_state(model, opt, jax.random.PRNGKey(0),
                                       jnp.zeros((1, hw[0], hw[1], 3)),
                                       jnp.zeros((1, hw[0], hw[1], n_class)))
            epoch_fn = build_train_epoch(model, opt, cfg)
            t0 = time.time()
            state, losses = epoch_fn(state, imgs, labs, idx)
            jax.block_until_ready(losses)
            print(f"stats={stats} pool={pool}: compile+first {time.time()-t0:.1f}s",
                  file=sys.stderr, flush=True)
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                for _ in range(2):
                    state, losses = epoch_fn(state, imgs, labs, idx)
                jax.block_until_ready(losses)
                best = min(best, (time.time() - t0) / 48)
            print(f"train stats={stats:7s} pool={pool:7s}: {best*1e3:.2f} ms/step, "
                  f"final loss {float(losses['total'][-1]):.5f}", flush=True)


if __name__ == "__main__":
    main()
