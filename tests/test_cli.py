"""CLI surface: the reference README commands must parse verbatim."""

from tcct_tpu.cli.main import build_parser


def test_reference_readme_command_parses():
    # README.md:56-58 of the reference
    args = build_parser().parse_args(
        ["--bs=8", "--net=stc_tt", "--los=di", "--db=goals"]
    )
    assert args.bs == 8 and args.net == "stc_tt" and args.db == "goals"


def test_all_reference_flags_accepted():
    args = build_parser().parse_args(
        [
            "--db=hcms", "--lr=0.01", "--wd=5e-4", "--inc=x", "--gpu=0",
            "--los=dice", "--net=gtc_tt", "--pth=true", "--bs=2",
            "--epochs=100", "--root=exp", "--resume=false", "--reg=true",
            "--coff_reg=0.1", "--epl=true", "--coff_epl=0.1", "--udh=true",
            "--coff_udh=1", "--type_udh=cos", "--ds=true", "--coff_ds=1",
            "--pl=true", "--bug=true",
        ]
    )
    assert args.reg and args.udh and args.epl and args.ds and args.bug


def test_extended_flags():
    args = build_parser().parse_args(
        ["--variant=infer", "--mixer=hydra", "--crop=128",
         "--stochastic_val=false", "--import_pt=/x.pt", "--data_root=/d"]
    )
    assert args.variant == "infer" and args.mixer == "hydra"
    assert not args.stochastic_val
