"""Round-trip a tcct_tpu-TRAINED checkpoint into the reference PyTorch
architecture and verify forward parity (VERDICT r2 item 2).

Loads the orbax ``val_top`` state from a training run, reverse-exports it
to a torch state dict shaped like the reference train-generation
``RegNet(FTC)`` (task1/nets/tcct.py:944-1046 + nets/reg.py), loads it
with ``strict=True`` into the reference modules, and compares eval-mode
logits on a fixed input — proving fit -> val -> best-ckpt -> export ->
reference-verify as one loop.

    python tools/verify_roundtrip.py [exp_root=exp_r3_goals] [db=goals] [net=stc_tt]

Runs on CPU (torch + jax); safe alongside a TPU job.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main(root="exp_r3_goals", db="goals", net_name="stc_tt"):
    from tcct_tpu.data.geometry import get_geometry
    from tcct_tpu.infer.importer import export_torch_state
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.train.state import create_train_state, make_optimizer, restore_checkpoint

    nc = get_geometry(db).out_channels
    net = RegNet(base=get_model(net_name, nc, variant="train"), out_channels=nc)
    opt = make_optimizer(steps_per_epoch=1)
    template = create_train_state(
        net, opt, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, nc)),
    )
    state = restore_checkpoint(root, template, "val_top")
    assert state is not None, f"no val_top under {root}"
    print(f"restored {root}/val_top at step {int(state.step)} epoch {int(state.epoch)}")

    # torch skeleton: the reference train-generation architecture
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    import make_golden as mg

    import torch

    mg.stub_timm()
    tcct = mg.load_module("ref_tcct_rt", f"{mg.REF}/nets/tcct.py")
    regmod = mg._load_ref_pkg()["reg"]
    torch.manual_seed(0)
    tnet = regmod.RegNet(
        tcct.FTC(
            base_vit=tcct.mpvit_tiny(),
            base_cnn=tcct.CrossResNet(flag_tiny=True),
            out_channels=nc,
            flag_gate=net_name.startswith("gtc"),
        ),
        out_channels=nc,
        con="cos",
    )
    skeleton = {k: v.numpy() for k, v in tnet.state_dict().items()}

    sd, report = export_torch_state(state.variables(), skeleton)
    print(
        f"export: {len(sd)} tensors, {len(report.passthrough)} passthrough, "
        f"{len(report.missing)} missing"
    )
    # the 'missing' keys must all be DEAD parameters (CRPE convs are
    # inert under the metapool mixer, the cls head is unused by FTC,
    # 'fuse' is the reference's own dead conv, tcct.py:982) — anything
    # else would break the forward-parity assertion below anyway
    live = [
        k for k in report.missing
        if not any(s in k for s in ("crpe", "cpe.", "cls_head", ".fuse."))
        and not k.startswith("base.fuse")
    ]
    assert not live, f"live weights missing from export: {live[:8]}"
    missing, unexpected = tnet.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected, (missing, unexpected)
    tnet.eval()

    # forward parity on a fixed batch
    g = torch.Generator().manual_seed(23)
    x_t = torch.rand(2, 3, 64, 64, generator=g)
    with torch.no_grad():
        ys_t = tnet(x_t)
    y0_t = ys_t[0].numpy().transpose(0, 2, 3, 1)

    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    variables = state.variables()
    ys_j, _ = jax.jit(lambda v, x: net.apply(v, x, train=False))(variables, x_j)
    y0_j = np.asarray(ys_j[0])

    rel = np.linalg.norm(y0_j - y0_t) / max(np.linalg.norm(y0_t), 1e-9)
    agree = float(np.mean(np.argmax(y0_j, -1) == np.argmax(y0_t, -1)))
    print(f"logit rel err {rel:.2e}; argmax agreement {agree*100:.3f}%")
    assert rel < 5e-3, rel
    assert agree > 0.999, agree

    out_pt = os.path.join(root, f"tcct_tpu_{db}_trained.pt")
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, out_pt
    )
    print(f"wrote {out_pt}")

    mpath = os.path.join(root, "metrics.jsonl")
    if os.path.exists(mpath):
        rows = [json.loads(l) for l in open(mpath)]
        vals = [r for r in rows if "val_f1s" in r]
        if vals:
            best = max(vals, key=lambda r: r["val_f1s"])
            print(
                f"best val dice {best['val_f1s']:.4f} at epoch {best['epoch']} "
                f"(scores {best.get('scores')})"
            )
    print("ROUNDTRIP OK")


if __name__ == "__main__":
    main(*(sys.argv[1:4] or ["exp_r3_goals"]))
