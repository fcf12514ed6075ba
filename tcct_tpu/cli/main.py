"""CLI — same surface as the reference (task1/kite/main.py:18-49) so the
README commands translate verbatim:

    python -m tcct_tpu.cli.main --bs=8 --net=stc_tt --los=di --db=goals

Differences from the reference (all deliberate):
- model dispatch via an explicit registry, not ``eval()`` (main.py:59);
- ``--wd`` is honoured (the reference silently drops it — set_superes is
  called without wd, loopback.py:102);
- ``--epl`` works (the reference crashes, SURVEY §2.3.3);
- extra: --data_root, --variant, --mixer, --synthetic, --stochastic_val.
"""

from __future__ import annotations

import argparse


def str2bool(v: str) -> bool:
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Unsupported value encountered.")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="tcct_tpu KiteOCT Argument")
    p.add_argument("--db", type=str, default="duke1",
                   choices=["duke", "duke1", "duke2", "duke3", "hcms", "hcms1", "heg", "goals", "odsgh"])
    p.add_argument("--lr", type=float, default=None, help="constant LR override (default: cyclic 1e-6..1e-4)")
    p.add_argument("--wd", type=float, default=2e-4, help="weight decay")
    p.add_argument("--inc", type=str, default="", help="instruction")
    p.add_argument("--gpu", type=str, default="0", help="(ignored; device = jax.devices())")
    p.add_argument("--los", type=str, default="dice", help="loss function (di/dice or mse)")
    p.add_argument("--net", type=str, default="stc_tt", help="network (see registry)")
    p.add_argument("--pth", type=str2bool, default=True,
                   help="parsed but unused — mirrors the reference's dead "
                        "'download weights' flag (task1/kite/main.py:26); "
                        "use --import_pt to load a torch checkpoint")
    p.add_argument("--bs", type=int, default=2, help="batch size")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--root", type=str, default="exp_tcct_tpu", help="experiment folder")
    p.add_argument("--resume", type=str2bool, default=False)
    p.add_argument("--reg", type=str2bool, default=False, help="boundary-regression loss")
    p.add_argument("--coff_reg", type=float, default=0.1)
    p.add_argument("--epl", type=str2bool, default=False, help="edge pixel loss")
    p.add_argument("--coff_epl", type=float, default=0.1)
    p.add_argument("--udh", type=str2bool, default=False, help="feature-polarization loss")
    p.add_argument("--coff_udh", type=float, default=1.0)
    p.add_argument("--type_udh", type=str, default="cos", choices=["cos", "mse"])
    p.add_argument("--ds", type=str2bool, default=False, help="deep supervision")
    p.add_argument("--coff_ds", type=float, default=1.0)
    p.add_argument("--pl", type=str2bool, default=True,
                   help="data-parallel over all devices (actually works here)")
    p.add_argument("--bug", type=str2bool, default=False, help="debug/smoke mode")
    # tcct_tpu extras
    p.add_argument("--data_root", type=str, default="", help="dataset root (else $TCCT_DATA_ROOT or synthetic)")
    p.add_argument("--variant", type=str, default="train", choices=["train", "infer"])
    p.add_argument("--mixer", type=str, default="metapool",
                   choices=["metapool", "metapool_pallas", "metapool2d", "factor", "hydra"])
    p.add_argument("--crop", type=int, default=256, help="train crop size")
    p.add_argument("--stochastic_val", type=str2bool, default=True,
                   help="reproduce the reference's random val-time flips (octgen.py:21-25)")
    p.add_argument("--import_pt", type=str, default="", help="torch .pt checkpoint to import before training")
    p.add_argument("--dtype", type=str, default="bf16", choices=["bf16", "f32"],
                   help="training compute dtype (bf16 = mixed precision: bf16 "
                        "compute copies, f32 masters + f32 BN statistics — the "
                        "TPU-first default; f32 for parity experiments)")
    p.add_argument("--packed_cnn", type=str2bool, default=None,
                   help="space-to-depth conv lowering in training (exact, ~2x with alignment alternation). "
                        "Default: auto — ON for FTC models with a CNN branch and crop %% 32 == 0 "
                        "(verified bit-close over 100 steps, tests/test_packed_conv.py)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import os

    if os.environ.get("JAX_PLATFORMS"):
        # this environment's sitecustomize force-selects its TPU backend
        # AFTER jax reads JAX_PLATFORMS; re-assert the user's choice so
        # e.g. JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count
        # gives a virtual multi-device CLI run
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from tcct_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()  # remote compiles become disk reads on reruns

    if os.environ.get("TCCT_COORDINATOR") or os.environ.get("TCCT_NUM_PROCESSES"):
        # multi-host launch (one process per host): bring up the
        # jax.distributed runtime before any device query so jax.devices()
        # is global and --pl's mesh spans hosts (parallel/distributed.py)
        from tcct_tpu.parallel import init_distributed

        init_distributed()

    import jax.numpy as jnp

    from tcct_tpu.data import EyeSet
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.train import TrainConfig, Trainer

    dataset = EyeSet.load(args.db, root=args.data_root)
    nc = dataset.out_channels
    print("OUT-CHANNELS:", nc, "| synthetic:", dataset.synthetic)

    base = get_model(args.net, nc, variant=args.variant, mixer=args.mixer)
    net = RegNet(base=base, out_channels=nc, con=args.type_udh)

    if args.packed_cnn is None:
        from tcct_tpu.models.ftc import FTC

        args.packed_cnn = (
            isinstance(base, FTC)
            and base.flag_cnn
            and args.crop % 32 == 0
        )
        if args.packed_cnn:
            print("PACKED-CONV training lowering: on (auto; --packed_cnn=0 to disable)")

    # --pl: data-parallel over the ('data',) mesh (the reference parses the
    # same flag and silently ignores it, task1/kite/main.py:47). The mesh
    # spans the largest device count that divides the global batch, so the
    # batch semantics are identical to single-device.
    mesh = None
    if args.pl:
        import jax

        from tcct_tpu.parallel import make_mesh, pick_dp_devices

        ndev = len(jax.devices())
        n = pick_dp_devices(args.bs, ndev)
        if n > 1:
            mesh = make_mesh(n)
            print(f"DATA-PARALLEL: bs={args.bs} over {n}/{ndev} devices")

    cfg = TrainConfig(
        loss="di" if args.los in ("di", "dice") else "mse",
        ds=args.ds,
        coff_ds=args.coff_ds,
        udh=args.udh,
        coff_udh=args.coff_udh,
        reg=args.reg,
        coff_reg=args.coff_reg,
        epl=args.epl,
        coff_epl=args.coff_epl,
        crop_hw=(args.crop, args.crop),
        n_class=nc,
        packed_cnn=args.packed_cnn,
        dtype={"bf16": jnp.bfloat16, "f32": jnp.float32}[args.dtype],
    )
    trainer = Trainer(
        net,
        dataset,
        cfg,
        root=args.root,
        bs=args.bs,
        lr=args.lr,
        weight_decay=args.wd,
        debug=args.bug,
        stochastic_val=args.stochastic_val,
        mesh=mesh,
    )
    if args.import_pt:
        from tcct_tpu.infer import import_torch_checkpoint

        variables, report = import_torch_checkpoint(
            args.import_pt, trainer.state.variables(), strict_shapes=False
        )
        trainer.state = trainer.state.replace(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            prototypes=variables["prototypes"],
        )
        trainer.place_state()
        print("imported:", report)
    if args.resume:
        print("resumed:", trainer.resume("val_top") or trainer.resume("last"))
    trainer.fit(epochs=1 if args.bug else args.epochs)


if __name__ == "__main__":
    main()
