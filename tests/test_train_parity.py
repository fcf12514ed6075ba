"""Training-parity experiment vs torch (VERDICT r1 item 4).

The forward path is already golden-tested against the shipped checkpoints
(tests/test_checkpoint_parity.py); this validates the entire BACKWARD +
optimizer path the same way: identical initial weights, identical fixed
batch, 50 AdamW steps of the full training loss (deep-supervision dice +
feature polarization + boundary regression with pinned noise) in
torch-CPU (tools/make_golden.py::golden_train_parity) and here, with
bounded per-step loss drift and final-parameter agreement.

Reference composition being matched: task1/kite/loopback.py:62-73
(grad_calc) + task1/kite/loop_seg.py:146-171 (calc_loss) +
torch.optim.AdamW + clip_grad_norm_(12) (loop_seg.py:128).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcct_tpu.infer.importer import export_torch_state, import_torch_state
from tcct_tpu.models import RegNet, get_model
from tcct_tpu.train import TrainConfig, build_train_step
from tcct_tpu.train.state import create_train_state, make_optimizer
from tcct_tpu.train.step import build_loss_fn

N_CHECK = 50


@pytest.fixture(scope="module", params=["train_parity", "train_parity_gtc"])
def parity(request, golden):
    """Both model generations: stc_tt (simple fusion, ds+udh+reg) and
    gtc_tt (GateFusion with the pinned cross-framework alpha hash,
    ds+udh+reg+epl) — VERDICT r2 item 3."""
    return request.param, golden(request.param)


def _setup(fixture):
    name, g = fixture
    gated = name.endswith("_gtc")
    sd0 = {k[len("sd0::"):]: g[k] for k in g.files if k.startswith("sd0::")}
    net = RegNet(
        base=get_model(
            "gtc_tt" if gated else "stc_tt", 5, variant="train", drop_path_rate=0.0
        ),
        out_channels=5,
    )
    cfg = TrainConfig(
        n_class=5,
        crop_hw=(64, 64),
        ds=True,
        coff_ds=0.5,
        udh=True,
        coff_udh=1.0,
        reg=True,
        coff_reg=0.1,
        epl=gated,
        coff_epl=0.1,
        augment=False,
        pinned_reg_noise=True,
        pinned_gate_noise=gated,
    )
    opt = make_optimizer(steps_per_epoch=1, lr=1e-4, weight_decay=2e-4)
    state = create_train_state(
        net,
        opt,
        jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 5)),
    )
    variables, report = import_torch_state(sd0, state.variables())
    leftovers = [
        k for k in report.untouched_target if "kernel" in k or "/bn" in k
    ]
    assert not leftovers, leftovers[:8]
    state = state.replace(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        prototypes=variables["prototypes"],
    )
    imgs = jnp.asarray(np.moveaxis(g["x_u8"], 1, -1))  # NCHW u8 -> NHWC
    labs = jnp.asarray(g["labels"])
    return net, cfg, opt, state, sd0, imgs, labs


def test_gradient_parity_step0(parity):
    """Direct backward-path validation: raw step-0 gradients of the full
    training loss must match torch's per tensor."""
    _, g = parity
    net, cfg, opt, state, sd0, imgs, labs = _setup(parity)
    loss_fn = build_loss_fn(net, cfg)
    img = imgs.astype(jnp.float32) / 255.0
    true_oh = jax.nn.one_hot(labs.astype(jnp.int32), 5, dtype=jnp.float32)
    k = jax.random.PRNGKey(0)
    grads, _ = jax.jit(jax.grad(loss_fn, has_aux=True))(
        state.params, state.batch_stats, state.prototypes,
        img, true_oh, {"gate": k, "droppath": k}, None,
    )
    ours, _ = export_torch_state({"params": grads}, sd0)
    gnorm = np.sqrt(
        sum(
            float((g[key].astype(np.float64) ** 2).sum())
            for key in g.files
            if key.startswith("grad0::")
        )
    )
    checked = 0
    for key in g.files:
        if not key.startswith("grad0::"):
            continue
        tk = key[len("grad0::"):]
        ref = g[key].astype(np.float64)
        if tk not in ours or tk.endswith(("running_mean", "running_var")):
            continue
        mine = np.asarray(ours[tk], np.float64)
        scale = np.linalg.norm(ref)
        err = np.linalg.norm(mine - ref)
        # bound: 2e-3 relative per tensor, floored at 2e-4 of the global
        # gradient norm for tiny-gradient tensors (torch's own fp32-vs-f64
        # backward noise through this depth is ~2e-4 relative; the
        # polarization loss adds bin-assignment routing noise on
        # near-zero-gradient biases)
        assert err <= max(2e-3 * scale, 2e-4 * gnorm), (tk, err, scale, gnorm)
        checked += 1
    assert checked > 280, checked  # every conv/bn/dense gradient covered


@pytest.mark.slow
def test_training_parity_50_steps(parity):
    _, g = parity
    net, cfg, opt, state, sd0, imgs, labs = _setup(parity)
    step = build_train_step(net, opt, cfg)

    losses = []
    for _ in range(N_CHECK):
        state, metrics = step(state, imgs, labs)
        losses.append(float(metrics["total"]))
    losses = np.asarray(losses)
    ref = np.asarray(g["losses"][:N_CHECK])

    # per-step loss drift bound: fp32 reassociation noise compounds through
    # the parameter updates, so allow growth but demand tightness
    rel = np.abs(losses - ref) / np.abs(ref)
    assert rel[0] < 5e-4, (losses[0], ref[0])
    assert rel.max() < 5e-3, (rel.argmax(), rel.max())

    # both optimizers must have moved the weights the same total distance:
    # export back to torch naming and compare the global parameter L2 and
    # two specific final tensors
    final, _ = export_torch_state(state.variables(), sd0)
    l2 = np.sqrt(
        sum(
            float((v.astype(np.float64) ** 2).sum())
            for k, v in final.items()
            if np.ndim(v) > 0 and "running" not in k and "tracked" not in k
        )
    )
    np.testing.assert_allclose(l2, float(g["param_l2"]), rtol=1e-5)

    # global parameter drift bound: across ALL trained tensors, the
    # cross-framework disagreement stays a bounded fraction of the distance
    # the optimizer moved the weights.  (Per-element equality is not
    # meaningful after 50 Adam steps: the step-1 update is ±lr·sign(grad),
    # so fp32 noise on near-zero gradients flips full-size updates — the
    # tight per-tensor check is test_gradient_parity_step0.)
    sdN = {k[len("sdN::"):]: g[k] for k in g.files if k.startswith("sdN::")}
    moved2, drift2 = 0.0, 0.0
    for k, ref_final in sdN.items():
        ref_final = ref_final.astype(np.float64)
        moved2 += float(((ref_final - sd0[k].astype(np.float64)) ** 2).sum())
        drift2 += float(((final[k].astype(np.float64) - ref_final) ** 2).sum())
    ratio = np.sqrt(drift2 / moved2)
    assert ratio < 0.5, f"param drift {ratio:.4f} of total movement"
