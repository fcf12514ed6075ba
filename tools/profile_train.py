"""Capture a jax.profiler trace of the REAL train hot path (the epoch
lax.scan used by Trainer.fit / bench.py) on the current backend.

Usage:
    python tools/profile_train.py [trace_dir=/tmp/jaxtrace_r3]

Then read it with tools/summarize_profile.py <trace_dir>.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(trace_dir="/tmp/jaxtrace_r3", bs=8, hw=(256, 256)):
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.train import TrainConfig
    from tcct_tpu.train.state import create_train_state, make_optimizer
    from tcct_tpu.train.step import build_train_epoch

    n_class = 5
    model = RegNet(base=get_model("stc_tt", n_class), out_channels=n_class)
    cfg = TrainConfig(
        n_class=n_class, crop_hw=hw, ds=True, dtype=jnp.bfloat16, packed_cnn=True
    )
    opt = make_optimizer(steps_per_epoch=100)
    state = create_train_state(
        model,
        opt,
        jax.random.PRNGKey(0),
        jnp.zeros((1, hw[0], hw[1], 3)),
        jnp.zeros((1, hw[0], hw[1], n_class)),
    )
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (24, 300, 512, 3), dtype=np.uint8))
    labs = jnp.asarray(rng.integers(0, n_class, (24, 300, 512)).astype(np.uint8))
    steps_per_epoch = 24
    epoch_fn = build_train_epoch(model, opt, cfg)
    idx = jnp.asarray(rng.integers(0, 24, (steps_per_epoch, bs)))

    t0 = time.time()
    state, losses = epoch_fn(state, imgs, labs, idx)
    jax.block_until_ready(losses)
    print(f"compile+first epoch: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    state, losses = epoch_fn(state, imgs, labs, idx)
    jax.block_until_ready(losses)
    print(
        f"steady epoch: {time.time()-t0:.2f}s = "
        f"{(time.time()-t0)/steps_per_epoch*1e3:.2f} ms/step",
        flush=True,
    )

    with jax.profiler.trace(trace_dir):
        state, losses = epoch_fn(state, imgs, labs, idx)
        jax.block_until_ready(losses)
    print(f"trace written to {trace_dir}", flush=True)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/jaxtrace_r3"]))
