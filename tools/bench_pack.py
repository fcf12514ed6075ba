"""A/B the pack/unpack lowerings — 'reshape' (6-D reshape+transpose),
'conv' (constant 0/1 permutation kernel on the MXU), 'slice' (strided
phase slices + axis-interleave stacks, rank-4/5 intermediates) — full
flagship train-epoch and serving comparisons.  The forms are
bitwise-exact (tests/test_packed_conv.py::test_conv_pack_lowering_exact
/ test_slice_pack_lowering_exact), so this is purely a lowering choice.

Round-4 motivation: the train trace itemizes ~1.3 ms/step of XLA
relayout copies around the reshape form's 6-D intermediates
([8,64,64,2,2,C]{5,4,3,0,2,1:T(2,128)} chains at every level boundary).
Conv form: measured, training LOSES 29.17 vs 19.69 (dilated-conv path).

Run from the repo root on the real TPU:
    python tools/bench_pack.py [impl ...]     # default: reshape slice
(arms nothing permanently — toggles ops.packed_conv.pack_lowering).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMPLS = tuple(sys.argv[1:]) or ("reshape", "slice")

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), file=sys.stderr)


def timeit(fn, x, iters=30):
    y = fn(x); jax.block_until_ready(y)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            y = fn(y)
        jax.block_until_ready(y)
        best = min(best, (time.time() - t0) / iters)
    return best


def epoch_ab():
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.ops.packed_conv import pack_lowering
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

    for impl in IMPLS:
        with pack_lowering(impl):
            state = create_train_state(model, opt, jax.random.PRNGKey(0),
                                       jnp.zeros((1, hw[0], hw[1], 3)),
                                       jnp.zeros((1, hw[0], hw[1], n_class)))
            epoch_fn = build_train_epoch(model, opt, cfg)
            t0 = time.time()
            state, losses = epoch_fn(state, imgs, labs, idx)
            jax.block_until_ready(losses)
            print(f"{impl}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                for _ in range(2):
                    state, losses = epoch_fn(state, imgs, labs, idx)
                jax.block_until_ready(losses)
                best = min(best, (time.time() - t0) / 48)
            print(f"train {impl}: {best*1e3:.2f} ms/step, final loss {float(losses['total'][-1]):.5f}")


def infer_ab():
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.ops.packed_conv import ftc_forward_packed, pack_lowering
    from tcct_tpu.train.precision import cast_floating

    n_class, bs = 5, 8
    net = RegNet(base=get_model("stc_tt", n_class, variant="infer"), out_channels=n_class)
    x = jnp.ones((bs, 256, 256, 3), jnp.float32)
    variables = jax.jit(lambda: net.init({"params": jax.random.PRNGKey(0)}, x, train=False))()
    v = cast_floating(variables, jnp.bfloat16)
    for impl in IMPLS:
        with pack_lowering(impl):
            def step(x):
                pyr, _ = ftc_forward_packed(net, v, x.astype(jnp.bfloat16))
                return x + jnp.mean(pyr[0].astype(jnp.float32)) * 1e-12
            dt = timeit(jax.jit(step), x)
            print(f"infer {impl}: {dt*1e3:.2f} ms/step = {bs/dt:.0f} B-scans/s")


if __name__ == "__main__":
    infer_ab()
    epoch_ab()
