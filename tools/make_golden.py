"""Generate golden parity fixtures from the reference PyTorch code.

Runs the reference (read-only, from /root/reference) on CPU with fixed
seeds and saves inputs/outputs to tests/golden/*.npz.  The test suite
then asserts the JAX reimplementation matches without ever importing
torch or the reference at test time.

Usage:  python tools/make_golden.py
"""

import importlib.util
import os
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF = "/root/reference/task1"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)

torch.manual_seed(0)


def stub_timm():
    """Minimal timm surface used by the reference (DropPath, trunc_normal_,
    imagenet constants)."""
    timm = types.ModuleType("timm")
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    layers.DropPath = DropPath
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    models.layers = layers
    timm.data = data
    timm.models = models
    sys.modules.update(
        {
            "timm": timm,
            "timm.data": data,
            "timm.models": models,
            "timm.models.layers": layers,
        }
    )


def load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def save(name, **arrs):
    path = os.path.join(OUT, name + ".npz")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrs.items()})
    print("wrote", path, {k: tuple(np.asarray(v).shape) for k, v in arrs.items()})


def golden_checkpoint_forward():
    """Full-model eval parity: shipped checkpoints into the submission FTC."""
    stub_timm()
    ref = load_module("ref_tcct_goals", f"{REF}/onnx/tcct_goals.py")
    for db, n_class in [("goals", 5), ("hcms", 9), ("heg", 8), ("duke", 9)]:
        torch.manual_seed(42)
        net = ref.stc_tt(n_class)
        net = ref.RegNet(net, out_channels=n_class)
        pt = torch.load(f"{REF}/onnx/tcct_{db}.pt", map_location="cpu")
        missing, unexpected = net.load_state_dict(pt, strict=False)
        assert not missing, f"{db}: missing keys {missing[:5]}"
        net.eval()
        g = torch.Generator().manual_seed(7)
        x = torch.rand(2, 3, 64, 128, generator=g)
        with torch.no_grad():
            ys = net(x)
            feats = net.base.feats
        save(
            f"ckpt_forward_{db}",
            x=x.numpy(),
            y0=ys[0].numpy(),
            y1=ys[1].numpy(),
            y2=ys[2].numpy(),
            y3=ys[3].numpy(),
            feat=feats[0].numpy(),
        )


def _load_ref_pkg():
    """Load the reference leaf modules by file path (the packages'
    __init__ imports gitignored modules and cannot be imported whole)."""
    import importlib.machinery

    pkg = types.ModuleType("refnets")
    pkg.__path__ = [f"{REF}/nets"]
    sys.modules.setdefault("refnets", pkg)
    mods = {}
    for name in ["fcs", "fcp", "reg"]:
        full = f"refnets.{name}"
        if full in sys.modules:
            mods[name] = sys.modules[full]
            continue
        spec = importlib.util.spec_from_file_location(
            full, f"{REF}/nets/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods


def golden_losses():
    loss_mod = load_module("ref_loss", f"{REF}/kite/losses/loss.py")
    miou_mod = load_module("ref_miou", f"{REF}/kite/losses/miou.py")
    get_loss = loss_mod.get_loss
    MDiceLoss, MIouLoss = miou_mod.MDiceLoss, miou_mod.MIouLoss

    g = torch.Generator().manual_seed(3)
    logits = torch.randn(3, 5, 16, 24, generator=g)
    labels = torch.randint(0, 5, (3, 16, 24), generator=g)
    onehot = torch.nn.functional.one_hot(labels, 5).permute(0, 3, 1, 2).float()
    ml = get_loss("di")
    loss_di = ml(logits, onehot)
    ml_mse = get_loss("mse")
    loss_mse = ml_mse(logits, onehot)
    pred_oh = torch.nn.functional.one_hot(logits.argmax(1), 5).permute(0, 3, 1, 2).float()
    save(
        "losses_seg",
        logits=logits.numpy(),
        labels=labels.numpy(),
        loss_di=loss_di.item(),
        loss_mse=loss_mse.item(),
        mdice_scorem=MDiceLoss.scorem(pred_oh, onehot, start_idx=1).item(),
        miou_scorem=MIouLoss.scorem(pred_oh, onehot, start_idx=1).item(),
        mdice_scores=np.array(MDiceLoss.scores(pred_oh, onehot)),
    )


def golden_binpool():
    fcs_mod = _load_ref_pkg()["fcs"]
    points_selection_bins = fcs_mod.points_selection_bins
    FeatConSuper = fcs_mod.FeatConSuper

    g = torch.Generator().manual_seed(5)
    P, L = 4096, 32
    feat = torch.randn(P, L, generator=g)
    prob = torch.rand(P, generator=g)
    true = (torch.rand(P, generator=g) > 0.6).float()
    f = points_selection_bins(feat, prob, true)
    fcs = FeatConSuper()
    q = torch.randn(32, 16, generator=g)
    k = torch.randn(32, 16, generator=g)
    save(
        "binpool",
        feat=feat.numpy(),
        prob=prob.numpy(),
        true=true.numpy(),
        bins_out=f.numpy(),
        cos_q=q.numpy(),
        cos_k=k.numpy(),
        cos_loss=fcs.cosinesim(q, k).item(),
    )


def golden_regular_losses():
    """Deterministic regular_reg / regular_udh goldens: torch.rand* pinned
    to 0.5 so the stochastic pieces are reproducible cross-framework."""
    stub_timm()
    regmod = _load_ref_pkg()["reg"]

    torch.manual_seed(11)
    base = regmod.BaseNet(out_channels=5, num_emb=32)
    net = regmod.RegNet(base, out_channels=5, con="cos")
    net.eval()

    real_rand_like = torch.rand_like

    def fixed_rand_like(t, **kw):
        return torch.full_like(t, 0.5)

    g = torch.Generator().manual_seed(13)
    x = torch.rand(2, 3, 32, 48, generator=g)
    pred = torch.randn(2, 5, 32, 48, generator=g)
    labels = torch.randint(0, 5, (2, 32, 48), generator=g)
    true = torch.nn.functional.one_hot(labels, 5).permute(0, 3, 1, 2).float()

    with torch.no_grad():
        _ = net(x)
        torch.rand_like = fixed_rand_like
        try:
            los_reg = net.regular_reg(pred, true)
        finally:
            torch.rand_like = real_rand_like
        los_udh = net.regular_udh(pred, true)

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    feat = base.feat.numpy()
    np.savez_compressed(
        os.path.join(OUT, "regnet_losses.npz"),
        x=x.numpy(),
        pred=pred.numpy(),
        true=true.numpy(),
        feat=feat,
        los_reg=los_reg.item(),
        los_udh=los_udh.item(),
        fcp_buf=sd["fcp.buf_grad"],
        **{f"w::{k}": v for k, v in sd.items() if k.startswith(("lap_reg", "lap_map", "lap_epl", "tau"))},
    )
    print("wrote regnet_losses.npz  los_reg=%.6f los_udh=%.6f" % (los_reg.item(), los_udh.item()))


def _pinned_alpha_nchw(B, C, h, w):
    """Deterministic [0,1) alpha pattern — MUST equal
    tcct_tpu/models/ftc.py::pinned_alpha_nchw (the cross-framework
    GateFusion noise hook)."""
    i = np.arange(B * C * h * w, dtype=np.float64).reshape(B, C, h, w)
    return ((np.sin(i * 12.9898) * 43758.5453) % 1.0).astype(np.float32)


def golden_train_parity(n_steps=50, gate=False, epl=False, name="train_parity"):
    """Training-parity experiment fixture (VERDICT r1 item 4 / r2 item 3):
    N optimizer steps of the FULL training loss (DS dice + polarization +
    boundary regression, optionally + edge-pixel) on the train-generation
    model in torch-CPU, with every stochastic piece removed or pinned:

    - fixed uint8 input batch (exactly representable both sides),
    - drop_path_rate=0 (torch DropPath noise is unpinnable cross-framework),
    - torch.rand_like pinned to 0.5 inside regular_reg (the jax side uses
      losses/boundary.py's rng=None deterministic variant),
    - with ``gate`` (the gtc_* generation): torch.rand patched with the
      deterministic ``_pinned_alpha_nchw`` hash, matching the jax side's
      ``pinned_gate()`` context (models/ftc.py) — GateFusion's alpha map
      (tcct.py:916-932) becomes identical cross-framework,
    - with ``epl``: the reference's --epl path calls a method that does
      not exist (loop_seg.py:166-169 -> AttributeError, SURVEY §2.3.3);
      the golden computes the documented-intent loss through the
      reference's OWN ``lap_epl`` head (reg.py:58-63) with the same math
      as tcct_tpu/models/regnet.py::regular_epl,
    - AdamW(1e-4, wd 2e-4) + grad-clip 12, constant LR.

    Saves the INITIAL state dict (imported by the jax side), the per-step
    total losses, and final-parameter checks.  Mirrors the reference hot
    loop composition: grad_calc DS sum (loopback.py:62-73) + coff_udh*udh +
    coff_reg*reg (+ coff_epl*epl) (loop_seg.py:146-171).
    """
    import torch.nn.functional as F

    stub_timm()
    tcct = load_module("ref_tcct_train", f"{REF}/nets/tcct.py")
    regmod = _load_ref_pkg()["reg"]
    lossmod = load_module("ref_kite_loss", f"{REF}/kite/losses/loss.py")

    torch.manual_seed(5)
    base = tcct.FTC(
        base_vit=tcct.mpvit_tiny(drop_path_rate=0.0),
        base_cnn=tcct.CrossResNet(flag_tiny=True),
        out_channels=5,
        flag_gate=gate,
    )
    net = regmod.RegNet(base, out_channels=5, con="cos")
    net.train()

    g = torch.Generator().manual_seed(17)
    x_u8 = torch.randint(0, 256, (2, 3, 64, 64), generator=g, dtype=torch.uint8)
    labels = torch.randint(0, 5, (2, 64, 64), generator=g)
    x = x_u8.float() / 255.0
    true = torch.nn.functional.one_hot(labels, 5).permute(0, 3, 1, 2).float()

    def regular_epl(pred, true):
        # documented-intent edge-pixel loss (see docstring): matches
        # tcct_tpu/models/regnet.py::regular_epl in NCHW
        prob = torch.softmax(pred, dim=1)
        edge_pred = net.lap_epl(prob)
        t = true[:, 1:]
        d = (t[:, :, 1:] - t[:, :, :-1]).abs()
        d = F.pad(d, (0, 0, 1, 0))  # H-axis top pad
        edge_true = d.sum(dim=1, keepdim=True).clamp(0, 1)
        return ((edge_pred - edge_true) ** 2).mean()

    sd0 = {k: v.detach().clone().numpy() for k, v in net.state_dict().items()}
    crit = lossmod.MultiLoss(lossmod.DiceLoss(bi=False))
    opt = torch.optim.AdamW(net.parameters(), lr=1e-4, weight_decay=2e-4)

    real_rand_like = torch.rand_like
    real_rand = torch.rand
    coff_ds, coff_udh, coff_reg, coff_epl = 0.5, 1.0, 0.1, 0.1
    losses = []
    grads0 = {}
    torch.rand_like = lambda t, **kw: torch.full_like(t, 0.5)
    if gate:
        torch.rand = lambda *s, **kw: torch.from_numpy(_pinned_alpha_nchw(*s))
    try:
        for step in range(n_steps):
            outs = net(x)
            los = 0
            for i in range(len(outs) - 1, 0, -1):  # loopback.py:62-73
                los = los + crit(outs[i], true) * coff_ds
            los = los + crit(outs[0], true)
            los = los + net.regular_udh(outs[0], true) * coff_udh
            los = los + net.regular_reg(outs[0], true) * coff_reg
            if epl:
                los = los + regular_epl(outs[0], true) * coff_epl
            opt.zero_grad()
            los.backward()
            if step == 0:
                # raw step-0 gradients (pre-clip): the direct backward-path
                # parity target
                grads0 = {
                    k: p.grad.detach().clone().numpy()
                    for k, p in net.named_parameters()
                    if p.grad is not None
                }
            torch.nn.utils.clip_grad_norm_(net.parameters(), 12)
            opt.step()
            losses.append(los.item())
    finally:
        torch.rand_like = real_rand_like
        torch.rand = real_rand

    sdN = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    param_l2 = np.sqrt(
        sum(
            float((v.astype(np.float64) ** 2).sum())
            for k, v in sdN.items()
            if v.ndim > 0 and "running" not in k and "tracked" not in k
        )
    )
    save(
        name,
        x_u8=x_u8.numpy(),
        labels=labels.numpy().astype(np.uint8),
        losses=np.asarray(losses, np.float64),
        param_l2=param_l2,
        **{f"sd0::{k}": v for k, v in sd0.items()},
        **{f"grad0::{k}": v for k, v in grads0.items()},
        **{
            f"sdN::{k}": v
            for k, v in sdN.items()
            if "running" not in k and "tracked" not in k
        },
    )


def golden_train_parity_gtc(n_steps=50):
    """gtc_tt (GateFusion) generation with ds+udh+reg+epl — VERDICT r2
    item 3."""
    golden_train_parity(n_steps, gate=True, epl=True, name="train_parity_gtc")


def golden_ops():
    g = torch.Generator().manual_seed(17)
    x = torch.randn(2, 7, 9, 5, generator=g)  # [B,H,W,C] stored; torch wants NCHW
    xt = x.permute(0, 3, 1, 2)
    import torch.nn.functional as F

    up_t = F.interpolate(xt, size=(14, 18), mode="bilinear", align_corners=True)
    up_f = F.interpolate(xt, size=(13, 20), mode="bilinear", align_corners=False)
    dn_f = F.interpolate(xt, size=(4, 5), mode="bilinear", align_corners=False)
    cub = F.interpolate(xt, size=(21, 27), mode="bicubic", align_corners=False)
    tok = torch.randn(2, 50, 24, generator=g)
    pool = nn.AvgPool2d(3, stride=1, padding=1, count_include_pad=False)
    meta = pool(tok) - tok
    save(
        "ops",
        x=x.numpy(),
        up_t=up_t.permute(0, 2, 3, 1).numpy(),
        up_f=up_f.permute(0, 2, 3, 1).numpy(),
        dn_f=dn_f.permute(0, 2, 3, 1).numpy(),
        cub=cub.permute(0, 2, 3, 1).numpy(),
        tok=tok.numpy(),
        meta=meta.numpy(),
    )


def golden_schedule():
    """torch CyclicLR(1e-6, 1e-4, up 4, down 60) per-epoch values
    (reference loopback.py:128)."""
    lin = nn.Linear(2, 2)
    opt = torch.optim.AdamW(lin.parameters(), lr=1e-2)
    sched = torch.optim.lr_scheduler.CyclicLR(
        opt, base_lr=1e-6, max_lr=1e-4, cycle_momentum=False,
        step_size_up=4, step_size_down=60,
    )
    lrs = []
    for _ in range(130):
        lrs.append(opt.param_groups[0]["lr"])
        sched.step()
    save("schedule", lrs=np.array(lrs, np.float64))


ALL = {
    "schedule": golden_schedule,
    "ops": golden_ops,
    "losses": golden_losses,
    "binpool": golden_binpool,
    "regular_losses": golden_regular_losses,
    "train_parity": golden_train_parity,
    "train_parity_gtc": golden_train_parity_gtc,
    "checkpoint_forward": golden_checkpoint_forward,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for n in names:
        ALL[n]()
    print("done")
