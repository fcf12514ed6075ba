"""Round-5 train-step A/B harness: time the REAL hot path (the epoch
lax.scan) under trace-time lowering variants, all in one process / one
TPU grant.  Timing methodology mirrors bench.py::bench_train (chained
epochs, min over 3 windows of 2 epochs, each window ending in a small
HOST READ — block_until_ready alone is not trustworthy on this stack).

Usage:
    python tools/bench_r5.py [variant ...]
Variants (default runs all):
    base         r4 default (exact GELU, reshape pack lowering)
    gelu         bf16 tanh-GELU (TCCT_GELU_BF16=tanh)
    slice        slice pack/unpack lowering (TCCT_PACK_IMPL=slice)
    gelu+slice   both
"""

import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def gelu_impl(impl: str):
    from tcct_tpu.models import layers

    prev = layers._GELU_BF16
    layers._GELU_BF16 = impl
    try:
        yield
    finally:
        layers._GELU_BF16 = prev


VARIANTS = {
    "base": dict(gelu="exact", pack="reshape"),
    "gelu": dict(gelu="tanh", pack="reshape"),
    "slice": dict(gelu="exact", pack="slice"),
    "gelu+slice": dict(gelu="tanh", pack="slice"),
    "pin": dict(gelu="exact", pack="reshape", pin=True),
    "gelu+pin": dict(gelu="tanh", pack="reshape", pin=True),
    # r5 second wave (gelu=tanh is the committed default; build on it)
    "flatopt": dict(gelu="tanh", pack="reshape", flat=True),
    "rdots": dict(gelu="tanh", pack="reshape", remat="dots"),
    "rdots_save": dict(gelu="tanh", pack="reshape", remat="dots_saveable"),
    "flatopt+rdots": dict(gelu="tanh", pack="reshape", flat=True, remat="dots"),
    # r5 third wave: fused act+BN-stats Pallas epilogue (VERDICT item 7)
    "pbn": dict(gelu="tanh", pack="reshape", pbn=True),
}


def infer_ab(names):
    """Serving-side A/B of the same lowerings: chained bf16+packed
    inference at bs=8 256^2 (the bench.py headline config)."""
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.models.layers import feats_gate
    from tcct_tpu.ops.packed_conv import ftc_forward_packed
    from tcct_tpu.train.precision import cast_floating
    from tcct_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    n_class, bs = 5, 8
    net = RegNet(
        base=get_model("stc_tt", n_class, variant="infer"), out_channels=n_class
    )
    x = jnp.ones((bs, 256, 256, 3), jnp.float32)
    variables = jax.jit(
        lambda: net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    )()

    results = {}
    for name in names:
        v = VARIANTS[name]

        def step(x):
            vv = cast_floating(variables, jnp.bfloat16)
            with feats_gate(False):
                pyr, _ = ftc_forward_packed(net, vv, x.astype(jnp.bfloat16))
            return x + jnp.mean(pyr[0].astype(jnp.float32)) * 1e-12

        chained = jax.jit(step)
        t0 = time.time()
        with gelu_impl(v["gelu"]):
            y = chained(x)
        _ = float(jnp.max(y))
        print(f"[infer {name}] compile+first: {time.time()-t0:.1f}s", flush=True)
        windows = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(30):
                y = chained(y)
            _ = float(jnp.max(y))
            windows.append((time.time() - t0) / 30)
        dt = min(windows)
        results[name] = dt
        print(
            f"[infer {name}] windows: {', '.join(f'{w*1e3:.2f}' for w in windows)}"
            f" -> {dt*1e3:.2f} ms ({bs/dt:.1f} B-scans/s)",
            flush=True,
        )
    return results


def main(names):
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.ops.packed_conv import pack_lowering
    from tcct_tpu.train import TrainConfig
    from tcct_tpu.train.state import create_train_state, make_optimizer
    from tcct_tpu.train.step import build_train_epoch
    from tcct_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    bs, hw, n_class = 8, (256, 256), 5
    model = RegNet(base=get_model("stc_tt", n_class), out_channels=n_class)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (24, 300, 512, 3), dtype=np.uint8))
    labs = jnp.asarray(rng.integers(0, n_class, (24, 300, 512)).astype(np.uint8))
    steps_per_epoch = 24
    idx = jnp.asarray(rng.integers(0, 24, (steps_per_epoch, bs)))

    results = {}
    from tcct_tpu.ops import packed_conv as pc

    state_cache = {}
    for name in names:
        v = VARIANTS[name]
        cfg = TrainConfig(
            n_class=n_class, crop_hw=hw, ds=True, dtype=jnp.bfloat16,
            packed_cnn=True, remat=bool(v.get("remat")),
            remat_policy=v.get("remat"),
        )
        flat = v.get("flat", False)
        if flat not in state_cache:
            opt = make_optimizer(steps_per_epoch=100, flat=flat)
            st0 = create_train_state(
                model, opt, jax.random.PRNGKey(0),
                jnp.zeros((1, hw[0], hw[1], 3)),
                jnp.zeros((1, hw[0], hw[1], n_class)),
            )
            state_cache[flat] = (opt, st0)
        opt, state = state_cache[flat]
        epoch_fn = build_train_epoch(model, opt, cfg)
        t0 = time.time()
        pc.set_pin_layout(v.get("pin", False))
        pc.set_pallas_bn(v.get("pbn", False))
        try:
            with gelu_impl(v["gelu"]), pack_lowering(v["pack"]):
                st, losses = epoch_fn(state, imgs, labs, idx)  # trace+compile here
        finally:
            pc.set_pin_layout(False)
            pc.set_pallas_bn(False)
        _ = float(jnp.max(jax.tree_util.tree_leaves(losses)[0]))
        print(f"[{name}] compile+first: {time.time()-t0:.1f}s", flush=True)
        windows = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(2):
                st, losses = epoch_fn(st, imgs, labs, idx)
            _ = float(jnp.max(jax.tree_util.tree_leaves(losses)[0]))
            windows.append((time.time() - t0) / (2 * steps_per_epoch))
        dt = min(windows)
        results[name] = dt
        print(
            f"[{name}] windows: {', '.join(f'{w*1e3:.2f}' for w in windows)} "
            f"ms/step -> {dt*1e3:.2f} ms ({bs/dt:.1f} B-scans/s)",
            flush=True,
        )
        # optional trace for the audit
        if os.environ.get("TCCT_R5_TRACE"):
            tdir = f"/tmp/jaxtrace_r5_{name.replace('+','_')}"
            with jax.profiler.trace(tdir):
                st, losses = epoch_fn(st, imgs, labs, idx)
                _ = float(jnp.max(jax.tree_util.tree_leaves(losses)[0]))
            print(f"[{name}] trace -> {tdir}", flush=True)

    print("\nsummary (ms/step):")
    for k, dt in results.items():
        print(f"  {k:<12} {dt*1e3:7.2f}")


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0] == "--infer":
        infer_ab(argv[1:] or ["base", "gelu"])
    else:
        main(argv or list(VARIANTS))
