"""Model zoo registry (replaces the reference's ``eval(args.net + '(...)')``
dispatch, task1/kite/main.py:59, with an explicit table).

Factory names mirror the reference (task1/nets/tcct.py:1050-1137):
stc_* simple fusion, gtc_* gated fusion, cnnu/pnnu/vitu branch ablations,
``tcct`` = stc_tt, plus ``relay`` (ReLayNet baseline, onnx/tcct_heg.py:29-151).

Every factory takes ``n_class`` and kwargs (``variant='train'|'infer'``,
``mixer=...``) and returns an unbound flax module whose ``__call__``
yields ``(pyramid_logits, feats)``.
"""

from __future__ import annotations

from typing import Callable, Dict

from tcct_tpu.models.ftc import FTC
from tcct_tpu.models.mpvit import (
    MPViTConfig,
    mpvit_base_config,
    mpvit_small_config,
    mpvit_tiny_config,
)

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def _ftc(vit_cfg, tiny, gate, n_class, plain=False, flag_cnn=True, flag_vit=True, **kw):
    return FTC(
        vit_cfg=vit_cfg,
        cnn_tiny=tiny,
        cnn_plain=plain,
        out_channels=n_class,
        flag_gate=gate,
        flag_cnn=flag_cnn,
        flag_vit=flag_vit,
        cnn_msca=kw.pop("cnn_msca", False),
        variant=kw.pop("variant", "train"),
    )


def _vit_cfg(size: str, kw: dict) -> MPViTConfig:
    mk = {"tiny": mpvit_tiny_config, "small": mpvit_small_config, "base": mpvit_base_config}[size]
    cfg_kw = {}
    if "mixer" in kw:
        cfg_kw["mixer"] = kw.pop("mixer")
    if "drop_path_rate" in kw:
        cfg_kw["drop_path_rate"] = kw.pop("drop_path_rate")
    return mk(**cfg_kw)


@register("stc_tt")
def stc_tt(n_class=8, **kw):
    return _ftc(_vit_cfg("tiny", kw), True, False, n_class, **kw)


@register("tcct")
def tcct(n_class=8, **kw):
    return stc_tt(n_class, **kw)


@register("stc_tb")
def stc_tb(n_class=8, **kw):
    return _ftc(_vit_cfg("tiny", kw), False, False, n_class, **kw)


@register("stc_st")
def stc_st(n_class=8, **kw):
    return _ftc(_vit_cfg("small", kw), True, False, n_class, **kw)


@register("stc_sb")
def stc_sb(n_class=8, **kw):
    return _ftc(_vit_cfg("small", kw), False, False, n_class, **kw)


@register("gtc_tt")
def gtc_tt(n_class=8, **kw):
    return _ftc(_vit_cfg("tiny", kw), True, True, n_class, **kw)


@register("gtc_tb")
def gtc_tb(n_class=8, **kw):
    return _ftc(_vit_cfg("tiny", kw), False, True, n_class, **kw)


@register("cnnu")
def cnnu(n_class=8, **kw):
    return _ftc(_vit_cfg("tiny", kw), True, False, n_class, flag_vit=False, **kw)


@register("pnnu")
def pnnu(n_class=8, **kw):
    return _ftc(_vit_cfg("tiny", kw), True, False, n_class, plain=True, flag_vit=False, **kw)


@register("vitu")
def vitu(n_class=8, **kw):
    return _ftc(_vit_cfg("tiny", kw), True, False, n_class, flag_cnn=False, **kw)


@register("msca")
def msca(n_class=8, **kw):
    """stc_tt with SegNeXt MSCA attention after every CrossCNN block —
    the reference's dead module (onnx/tcct_goals.py:803-834, commented
    hook at nets/tcct.py:824) made constructible."""
    return _ftc(_vit_cfg("tiny", kw), True, False, n_class, cnn_msca=True, **kw)


@register("tcct32")
def tcct32(n_class=8, **kw):
    """Dev variant from nets/tcct32.py (dimension-repaired, see FTC)."""
    kw.setdefault("variant", "t32")
    return _ftc(_vit_cfg("tiny", kw), True, False, n_class, **kw)


@register("relay")
def relay(n_class=8, **kw):
    from tcct_tpu.models.relaynet import ReLayNet

    # FTC-only knobs the CLI passes unconditionally (cli/main.py)
    kw.pop("variant", None)
    kw.pop("mixer", None)
    kw.pop("drop_path_rate", None)
    return ReLayNet(out_channels=n_class, **kw)


def get_model(name: str, n_class: int, **kw):
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](n_class, **kw)


def list_models():
    return sorted(_REGISTRY)
