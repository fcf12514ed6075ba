"""Headline benchmark — prints ONE JSON line for the driver.

Metric: GOALS stc_tt inference throughput, bs=8 at 3x256x256 (the train
crop resolution, reference task1/data/octgen.py:8).  Baseline: the
reference PyTorch implementation measured on this host's CPU at
1.10 B-scans/s for the identical config (BASELINE.md, [measured]).

Extra context (train-step throughput, compile times) goes to stderr so
stdout stays a single JSON line.
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_BSCANS_PER_SEC = 1.10  # reference torch-CPU, bs=8 3x256x256


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_inference(bs=8, hw=(256, 256), iters=30, dtype=None, cnn_impl="plain", mixer="metapool"):
    """Chained-dependency timing: each call's input depends on the previous
    call's output, so every iteration is a real sequential execution (the
    axon relay dedups independent identical calls, which reads 50-100x
    faster than physics allows — measured and rejected)."""
    from tcct_tpu.models import RegNet, get_model

    n_class = 5
    net = RegNet(
        base=get_model("stc_tt", n_class, variant="infer", mixer=mixer),
        out_channels=n_class,
    )
    x = jnp.ones((bs, hw[0], hw[1], 3), jnp.float32)
    t0 = time.time()
    variables = jax.jit(
        lambda: net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    )()
    jax.block_until_ready(variables)
    log(f"init: {time.time()-t0:.1f}s")

    def step(x):
        from tcct_tpu.models.layers import feats_gate
        from tcct_tpu.train.precision import cast_floating

        v = cast_floating(variables, dtype)
        xin = x.astype(dtype) if dtype else x
        # inference never reads the polarization feats — skip their chain
        # at trace time (r5; see models/layers.py::feats_gate)
        with feats_gate(False):
            if cnn_impl == "packed":
                from tcct_tpu.ops.packed_conv import ftc_forward_packed

                pyr, _ = ftc_forward_packed(net, v, xin)
            else:
                pyr, _ = net.apply(v, xin, train=False)
        return x + jnp.mean(pyr[0].astype(jnp.float32)) * 1e-12, pyr[0]

    chained = jax.jit(step)
    t0 = time.time()
    y, logits = chained(x)
    # warmup ends with the same small HOST READ the timing windows use
    # (block_until_ready can return before execution on some programs —
    # a straggling warmup would otherwise bleed into window 1)
    _ = float(jnp.max(y))
    log(f"forward compile+first: {time.time()-t0:.1f}s")
    y, _ = chained(y)
    _ = float(jnp.max(y))
    # min over independent windows (each window chained internally): a
    # single tunnel hiccup otherwise contaminates the whole measurement
    # each window ends with a 4-byte HOST READ of a reduction over the
    # final output: on some programs the relay's block_until_ready
    # returns before execution (goals-bucket predictor read 0.23 ms
    # "wall" vs 33 ms trace-verified) — real host bytes can't be spoofed
    windows = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            y, logits = chained(y)
        _ = float(jnp.max(y))
        windows.append((time.time() - t0) / iters)
    dt = min(windows)
    log(f"  windows: {', '.join(f'{w*1e3:.2f}' for w in windows)} ms (min taken)")
    return bs / dt, dt


# v5e single-chip peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM
V5E_PEAK_FLOPS = 197e12
V5E_PEAK_BW = 819e9


def bench_train(bs=8, hw=(256, 256), iters=20):
    import numpy as np

    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.train import TrainConfig, build_train_step
    from tcct_tpu.train.state import create_train_state, make_optimizer

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
    step = build_train_step(model, opt, cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (24, 300, 512, 3), dtype=np.uint8))
    labs = jnp.asarray(rng.integers(0, n_class, (24, 300, 512)).astype(np.uint8))

    # measure the trainer's ACTUAL hot path: the whole-epoch lax.scan
    # (Trainer.fit/train_epoch) — per-step dispatch overhead (~2.4 ms on
    # the axon tunnel) is amortized inside the compiled epoch
    from tcct_tpu.train.step import build_train_epoch

    steps_per_epoch = 24
    epoch_fn = build_train_epoch(model, opt, cfg)
    idx = jnp.asarray(rng.integers(0, 24, (steps_per_epoch, bs)))
    t0 = time.time()
    state, losses = epoch_fn(state, imgs, labs, idx)
    # host-read warmup sync (see bench_inference note)
    _ = float(jnp.max(jax.tree_util.tree_leaves(losses)[0]))
    log(f"train epoch compile+first: {time.time()-t0:.1f}s")
    # min over 2-epoch windows (48 chained steps each — dispatch
    # amortized inside the compiled scan; min de-noises tunnel hiccups)
    windows = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(2):
            state, losses = epoch_fn(state, imgs, labs, idx)
        # host read: see bench_inference note (losses is a metrics pytree)
        _ = float(jnp.max(jax.tree_util.tree_leaves(losses)[0]))
        windows.append((time.time() - t0) / (2 * steps_per_epoch))
    dt = min(windows)
    log(f"  train windows: {', '.join(f'{w*1e3:.2f}' for w in windows)} ms/step (min taken)")

    # MEASURED roofline (VERDICT r2 item 1): capture a profiler trace of
    # one epoch, sum per-op measured HBM bytes (BW x self time — the HLO
    # cost-analysis 'bytes accessed' overcounts fusion reuse and proves
    # nothing), and report attainable = max(compute, HBM) vs achieved.
    mfu_pct = mfu_useful_pct = attain = None
    try:
        ca = step.lower(state, imgs[:bs], labs[:bs]).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        mfu_pct = 100.0 * (flops / V5E_PEAK_FLOPS) / dt
        # useful-FLOP MFU (VERDICT r4 weak 3): the packed rewrite executes
        # ~2.3x structural-zero FLOPs on the CNN branch; the honest MFU an
        # outside reader expects counts only the fine model's FLOPs.  Lower
        # the SAME step unpacked and use its FLOP count as the numerator.
        try:
            fine_step = build_train_step(
                model, opt, dataclasses.replace(cfg, packed_cnn=False)
            )
            ca_f = fine_step.lower(state, imgs[:bs], labs[:bs]).compile().cost_analysis()
            if isinstance(ca_f, list):
                ca_f = ca_f[0]
            useful_flops = float(ca_f.get("flops", 0.0))
            mfu_useful_pct = 100.0 * (useful_flops / V5E_PEAK_FLOPS) / dt
            log(
                f"FLOPs/step: executed {flops/1e9:.1f} G (packed, incl. "
                f"structural zeros) vs useful {useful_flops/1e9:.1f} G (fine "
                f"model); MFU {mfu_pct:.1f}% executed / {mfu_useful_pct:.1f}% useful"
            )
        except Exception as e:
            log(f"useful-FLOP lowering failed: {e!r}")
        import shutil
        import tempfile

        from tcct_tpu.utils.profiling import measured_traffic

        tdir = tempfile.mkdtemp(prefix="benchtrace_")
        try:
            with jax.profiler.trace(tdir):
                state, losses = epoch_fn(state, imgs, labs, idx)
                jax.block_until_ready(losses)
            m = measured_traffic(tdir)
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
        hbm_per_step = m["hbm_bytes"] / steps_per_epoch
        self_per_step = m["self_time_s"] / steps_per_epoch
        t_compute = flops / V5E_PEAK_FLOPS
        t_hbm = hbm_per_step / V5E_PEAK_BW
        attain = max(t_compute, t_hbm)
        log(
            f"train roofline (measured): {flops/1e9:.1f} GFLOP/step "
            f"({t_compute*1e3:.2f} ms at peak MXU, MFU {mfu_pct:.1f}%), "
            f"{hbm_per_step/1e6:.0f} MB measured HBM/step "
            f"({t_hbm*1e3:.2f} ms at peak BW); attainable "
            f"{attain*1e3:.2f} ms vs device self {self_per_step*1e3:.2f} ms "
            f"(wall {dt*1e3:.2f} ms) -> {100.0*attain/self_per_step:.0f}% of "
            f"attainable; bound: {'HBM' if t_hbm > t_compute else 'compute'}"
        )
        top = sorted(m["categories"].items(), key=lambda kv: -kv[1])[:5]
        log(
            "  top op categories (ms/step): "
            + ", ".join(f"{k}={v/steps_per_epoch*1e3:.2f}" for k, v in top)
        )
        attain = (attain, self_per_step)
    except Exception as e:
        log(f"measured roofline failed: {e!r}")
    return bs / dt, dt, (mfu_pct, mfu_useful_pct), attain


def wait_for_tpu(budget_s=2700, poll_s=120, probe_timeout_s=300):
    """Bounded availability probe (VERDICT r3 weak 2).  The axon backend's
    documented failure mode is hang-then-UNAVAILABLE for multi-hour
    windows; a bare ``jax.devices()`` in this process would hang ~30 min
    and the driver would record a dead artifact (BENCH_r03).  Instead,
    probe backend init in a short-lived subprocess (killable on hang) and
    retry within a bounded budget; raise with the last error when the
    budget is exhausted.  No-op when jax is pinned to CPU."""
    import os
    import subprocess

    if (jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")).strip().lower() == "cpu":
        return
    budget_s = float(os.environ.get("TCCT_BENCH_PROBE_BUDGET_S", budget_s))
    deadline = time.time() + budget_s
    code = "import jax; print(len(jax.devices()), jax.devices()[0].platform)"
    last = None
    attempt = 0
    while True:
        attempt += 1
        try:
            res = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=probe_timeout_s,
            )
            if res.returncode == 0:
                log(f"tpu probe ok (attempt {attempt}): {res.stdout.strip()}")
                time.sleep(5)  # killed/finished probes release the grant in ~5 s
                return
            last = (res.stderr or res.stdout)[-400:]
        except subprocess.TimeoutExpired:
            last = f"probe hung > {probe_timeout_s}s (killed)"
        log(f"tpu probe attempt {attempt} failed: {last}")
        if time.time() + poll_s > deadline:
            raise RuntimeError(
                f"TPU backend unavailable after {budget_s:.0f}s probe budget; "
                f"last error: {last}"
            )
        time.sleep(poll_s)


def main():
    from tcct_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()  # a 20-min remote-compile window can't kill the run twice
    wait_for_tpu()
    log(f"devices: {jax.devices()}")
    # headline: packed CNN branch + the MXU-lowered metapool (shift-adds +
    # tridiag matmul, ops/pool.py — measured faster than both the
    # reduce_window form and the Pallas kernel)
    infer_tput, infer_dt = bench_inference(
        dtype=jnp.bfloat16, cnn_impl="packed", mixer="metapool"
    )
    log(f"inference bf16+packed+mxu-mixer bs=8 256^2: {infer_dt*1e3:.2f} ms/step = {infer_tput:.1f} B-scans/s")
    try:
        p_tput, p_dt = bench_inference(dtype=jnp.bfloat16, cnn_impl="plain")
        log(f"inference bf16 plain  bs=8 256^2: {p_dt*1e3:.2f} ms/step = {p_tput:.1f} B-scans/s")
    except Exception as e:
        log(f"plain inference bench failed: {e!r}")
    train_tput = train_mfu = train_attain = None
    try:
        train_tput, train_dt, train_mfu, train_attain = bench_train()
        log(f"train (aug+DS-dice+AdamW, packed) bs=8 256^2: {train_dt*1e3:.2f} ms/step = {train_tput:.1f} B-scans/s")
    except Exception as e:  # train bench is context, not the headline
        log(f"train bench failed: {e!r}")
    out = {
        "metric": "goals_stc_tt_infer_bs8_256x256_bscans_per_sec",
        "value": round(infer_tput, 2),
        "unit": "B-scans/s",
        "vs_baseline": round(infer_tput / BASELINE_BSCANS_PER_SEC, 2),
    }
    if train_tput is not None:
        out["train_bscans_per_sec"] = round(train_tput, 2)
    if train_mfu is not None:
        mfu_exec, mfu_useful = train_mfu
        if mfu_exec is not None:
            out["train_mfu_pct"] = round(mfu_exec, 1)
        if mfu_useful is not None:
            out["train_mfu_useful_pct"] = round(mfu_useful, 1)
    if train_attain is not None:
        attainable_s, self_s = train_attain
        out["train_attainable_ms"] = round(attainable_s * 1e3, 2)
        out["train_device_self_ms"] = round(self_s * 1e3, 2)
        out["train_pct_of_attainable"] = round(100.0 * attainable_s / self_s, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
