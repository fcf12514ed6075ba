"""A/B: Winograd F(2x2,3x3) vs the direct XLA conv — isolated micro
fwd/bwd at the hot shapes (the coarse packed [3,3,128,128] at the 128^2
coarse grid, and the unpacked deeper-level convs) plus the full flagship
train-epoch and serving comparisons.

Run from the repo root on the real TPU: python tools/bench_winograd.py
(arms nothing permanently — toggles ops.winograd.winograd_convs itself).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def micro(shape, cout=None, dtype=jnp.bfloat16):
    from tcct_tpu.ops.winograd import conv3x3_winograd

    rng = np.random.default_rng(0)
    B, H, W, C = shape
    cout = cout or C
    x0 = jnp.asarray(rng.normal(size=shape)).astype(dtype)
    k = (jnp.asarray(rng.normal(size=(3, 3, C, cout))) * 0.05).astype(dtype)

    def ref(x):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x + y.astype(x.dtype) * 1e-3  # chain (cout==C assumed for chain)

    def wino(x):
        return x + conv3x3_winograd(x, k).astype(x.dtype) * 1e-3

    fr = timeit(jax.jit(ref), x0)
    fw = timeit(jax.jit(wino), x0)

    def g_ref(x):
        return jax.grad(lambda x: jnp.sum(ref(x).astype(jnp.float32)))(x)

    def g_wino(x):
        return jax.grad(lambda x: jnp.sum(wino(x).astype(jnp.float32)))(x)

    br = timeit(jax.jit(g_ref), x0)
    bw = timeit(jax.jit(g_wino), x0)
    d = jnp.max(jnp.abs(jax.jit(wino)(x0).astype(jnp.float32) - jax.jit(ref)(x0).astype(jnp.float32)))
    rel = float(d) / float(jnp.max(jnp.abs(jax.jit(ref)(x0).astype(jnp.float32))) + 1e-9)
    print(f"{shape}->{cout} {dtype.__name__}: fwd xla {fr*1e3:.3f} ms, wino {fw*1e3:.3f} ms "
          f"({fr/fw:.2f}x) | fwd+bwd xla {br*1e3:.3f}, wino {bw*1e3:.3f} ({br/bw:.2f}x) | "
          f"maxrel {rel:.2e}")


def epoch_ab():
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.ops.winograd import winograd_convs
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

    for mode, label in ((False, "direct"), (True, "winograd")):
        with winograd_convs(mode):
            state = create_train_state(model, opt, jax.random.PRNGKey(0),
                                       jnp.zeros((1, hw[0], hw[1], 3)),
                                       jnp.zeros((1, hw[0], hw[1], n_class)))
            epoch_fn = build_train_epoch(model, opt, cfg)
            t0 = time.time()
            state, losses = epoch_fn(state, imgs, labs, idx)
            jax.block_until_ready(losses)
            print(f"{label}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                for _ in range(2):
                    state, losses = epoch_fn(state, imgs, labs, idx)
                jax.block_until_ready(losses)
                best = min(best, (time.time() - t0) / 48)
            print(f"train {label}: {best*1e3:.2f} ms/step, final loss {float(losses['total'][-1]):.5f}")


def infer_ab():
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.ops.packed_conv import ftc_forward_packed
    from tcct_tpu.ops.winograd import winograd_convs
    from tcct_tpu.train.precision import cast_floating

    n_class, bs = 5, 8
    net = RegNet(base=get_model("stc_tt", n_class, variant="infer"), out_channels=n_class)
    x = jnp.ones((bs, 256, 256, 3), jnp.float32)
    variables = jax.jit(lambda: net.init({"params": jax.random.PRNGKey(0)}, x, train=False))()
    v = cast_floating(variables, jnp.bfloat16)
    for mode, label in ((False, "infer direct"), (True, "infer winograd")):
        with winograd_convs(mode):
            def step(x):
                pyr, _ = ftc_forward_packed(net, v, x.astype(jnp.bfloat16))
                return x + jnp.mean(pyr[0].astype(jnp.float32)) * 1e-12
            dt = timeit(jax.jit(step), x)
            print(f"{label}: {dt*1e3:.2f} ms/step = {bs/dt:.0f} B-scans/s")


if __name__ == "__main__":
    micro((8, 128, 128, 128))   # the coarse packed [3,3] (block12_1) shape
    micro((8, 128, 128, 64))    # level-1 unpacked 3x3
    micro((8, 64, 64, 96))      # level-2
    infer_ab()
    epoch_ab()
