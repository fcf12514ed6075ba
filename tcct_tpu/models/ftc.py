"""FTC fusion + decoder: the flagship dual-branch segmentation model.

Two architecture generations exist in the reference (SURVEY §2.3.1):

- ``variant='train'`` — task1/nets/tcct.py:944-1046: t321-t324 1x1
  projections feed both the aux heads (all on ``filters`` channels) and the
  polarization feats ``norm_add([y0,y1,y2])``; ``dec4`` takes skip ``x1``.
- ``variant='infer'`` — task1/onnx/tcct_goals.py (the architecture the
  shipped checkpoints match, 0 missing keys): aux heads act on the raw
  skip dims, ``dec4`` takes ``c1`` (raw CNN level 0), and
  ``feats = norm_add([x1,x2,x3,y0,y1,y2])``.

Unlike the reference, the forward pass is functional: it returns
``(pyramid_logits, feats)`` instead of stashing ``self.feats`` module
state (which would not survive jit).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcct_tpu.models.crosscnn import CrossResNet
from tcct_tpu.models.layers import batchnorm, conv2d, feats_wanted, leaky_relu
from tcct_tpu.models.mpvit import MPViT, MPViTConfig
from tcct_tpu.ops.resize import resize_bicubic, resize_bilinear


class MPUpBlock(nn.Module):
    """conv3-BN-LReLU -> 2x bilinear up (align_corners=True) -> +skip ->
    1x1 conv (reference tcct.py:887-914).

    ``packed_skip``: when given (a pack_nhwc'd skip at the UPSAMPLED
    resolution), the upsample is emitted directly in the packed layout
    (ops/resize.py::resize_bilinear_2x_packed), the skip-add and the 1x1
    conv run packed, and the PACKED output is returned — the caller owns
    the layout.  Exact reassociation of the plain path.

    ``packed_x1``: x1 itself arrives PACKED ([B,h,w,4C]) from the packed
    decoder chain (round 4): the prep conv / BN / act run on the packed
    layout (full lanes, no per-conv pack round trip) and x1 is unpacked
    only as the 2x-upsample input."""

    out_ch: int

    @nn.compact
    def __call__(
        self, x1, x2=None, train: bool = False, packed_skip=None,
        packed_x1: bool = False,
    ):
        if packed_x1:
            from tcct_tpu.models.layers import packed_io
            from tcct_tpu.ops.packed_conv import unpack_nhwc

            with packed_io():
                x1 = conv2d(self.out_ch, 3, 1, 1, name="prep_0")(x1)
            x1 = batchnorm(name="prep_1")(
                x1, use_running_average=not train, packed=True
            )
            x1 = leaky_relu(x1)
            x1 = unpack_nhwc(x1)
        else:
            x1 = conv2d(self.out_ch, 3, 1, 1, name="prep_0")(x1)
            x1 = batchnorm(name="prep_1")(x1, use_running_average=not train)
            x1 = leaky_relu(x1)
        if packed_skip is not None:
            from tcct_tpu.models.layers import packed_io
            from tcct_tpu.ops.resize import resize_bilinear_2x_packed

            yp = resize_bilinear_2x_packed(x1, align_corners=True)
            yp = yp + packed_skip
            with packed_io():
                return conv2d(self.out_ch, 1, 1, 0, name="post_0")(yp)
        H, W = x1.shape[1] * 2, x1.shape[2] * 2
        x1 = resize_bilinear(x1, (H, W), align_corners=True)
        if x2 is not None:
            x1 = x1 + x2
        return conv2d(self.out_ch, 1, 1, 0, name="post_0")(x1)


import contextlib

_PINNED_GATE = False


@contextlib.contextmanager
def pinned_gate(enable: bool = True):
    """Trace-time switch: GateFusion draws its alpha map from the
    deterministic ``pinned_alpha_nchw`` hash instead of the PRNG — the
    cross-framework noise hook for gated-fusion train parity (the torch
    golden generator patches ``torch.rand`` with the same pattern,
    tools/make_golden.py::golden_train_parity_gtc)."""
    global _PINNED_GATE
    prev = _PINNED_GATE
    _PINNED_GATE = bool(enable)
    try:
        yield
    finally:
        _PINNED_GATE = prev


def pinned_alpha_nchw(B: int, C: int, h: int, w: int):
    """Deterministic well-spread [0,1) alpha pattern, NCHW index order
    (the reference's ``torch.rand(B,C,h,w)`` layout, tcct.py:925) — both
    frameworks build the identical tensor from this."""
    import numpy as np

    i = np.arange(B * C * h * w, dtype=np.float64).reshape(B, C, h, w)
    return ((np.sin(i * 12.9898) * 43758.5453) % 1.0).astype(np.float32)


def gate_fusion(x1, x2, rng=None, train: bool = False):
    """Stochastic alpha-map gating (reference tcct.py:916-932).

    Train: random low-res alpha, bicubic-upsampled, clamped to [0,1]; the
    reference samples it on CPU per forward — here it is an explicit
    PRNG-key op inside the jitted step.  Eval: alpha = 0.5.
    """
    if train and (rng is not None or _PINNED_GATE):
        B, H, W, C = x1.shape
        h, w = max(3, H // 32), max(3, W // 32)
        if _PINNED_GATE:
            alpha = jnp.asarray(pinned_alpha_nchw(B, C, h, w)).transpose(0, 2, 3, 1)
        else:
            alpha = jax.random.uniform(rng, (B, h, w, C))
        alpha = resize_bicubic(alpha, (H, W), align_corners=False)
        alpha = jnp.clip(alpha, 0.0, 1.0)
    else:
        alpha = 0.5
    return x1 * alpha + x2 * (1.0 - alpha)


def simple_fusion(x1, x2, rng=None, train: bool = False):
    return x1 + x2


def norm_add(xs: List[jnp.ndarray]) -> jnp.ndarray:
    """L2-normalize each map over channels, resize to the first's spatial
    size, average (reference tcct.py:937-942).

    Under ``layers.feats_gate(False)`` (set by the train step when the
    polarization loss is off) this returns None at trace time: the r5 HBM
    audit showed the feats chain — including a full-res unpack of the
    packed decoder output that exists only to feed it — surviving in the
    compiled step even though its value is unused (XLA did not DCE it
    through the scan + jvp structure)."""
    from tcct_tpu.models.layers import feats_wanted

    if not feats_wanted():
        return None
    eps = 1e-12
    xs = [x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps) for x in xs]
    size = xs[0].shape[1:3]
    xs = [resize_bilinear(x, size, align_corners=False) for x in xs]
    return sum(xs) / len(xs)


class FTC(nn.Module):
    """Dual-branch fusion + U-decoder (reference tcct.py:944-1046 /
    onnx/tcct_goals.py for the ``infer`` variant)."""

    vit_cfg: MPViTConfig
    cnn_tiny: bool = True
    cnn_plain: bool = False
    # SegNeXt MSCA attention after each CNN block (the reference carries
    # this dead: commented ``self.att = MSCA(out_c)`` at tcct.py:824,
    # module at onnx/tcct_goals.py:803-834) — live here via --net=msca
    cnn_msca: bool = False
    out_channels: int = 5
    filters: int = 32
    flag_gate: bool = False
    flag_cnn: bool = True
    flag_vit: bool = True
    # 'train' (nets/tcct.py) | 'infer' (onnx/tcct_*.py) | 't32'
    # (nets/tcct32.py dev variant: every skip projected to a common
    # ``t32_filters`` width, every decoder stage 32ch — the published file
    # is dimensionally inconsistent (dec2 expects 64ch but receives dec1's
    # 32ch output and would crash in torch); repaired here with 1x1 skip
    # adapters, deviation documented)
    variant: str = "train"
    t32_filters: int = 64

    def setup(self):
        self.base_vit = MPViT(self.vit_cfg, name="base_vit")
        self.base_cnn = CrossResNet(
            tiny=self.cnn_tiny, plain=self.cnn_plain, msca=self.cnn_msca, name="base_cnn"
        )
        ld = self.base_cnn.layer_dims
        ed = self.vit_cfg.embed_dims
        t32 = self.variant == "t32"
        tran_dims = (self.t32_filters,) * 4 if t32 else (ld[1], ld[2], ld[3], ld[4])
        for i, l in enumerate(tran_dims):
            setattr(self, f"tran_vit{i}_0", conv2d(l, 1, 1, 0, name=f"tran_vit{i}_0"))
            setattr(self, f"tran_vit{i}_1", batchnorm(name=f"tran_vit{i}_1"))
            setattr(self, f"tran_cnn{i}_0", conv2d(l, 1, 1, 0, name=f"tran_cnn{i}_0"))
            setattr(self, f"tran_cnn{i}_1", batchnorm(name=f"tran_cnn{i}_1"))
        self.head_0 = conv2d(self.t32_filters if t32 else ld[-1], 3, 1, 1, name="head_0")
        self.head_1 = batchnorm(name="head_1")
        # `fuse` exists in the reference param tree but is unused in forward
        # (tcct.py:982) — kept for checkpoint-shape compatibility.
        self.fuse = conv2d(self.filters, 1, 1, 0, name="fuse")
        if t32:
            self.dec1 = MPUpBlock(32, name="dec1")
            self.dec2 = MPUpBlock(32, name="dec2")
            self.dec3 = MPUpBlock(32, name="dec3")
            self.dec4 = MPUpBlock(32, name="dec4")
            self.skip1 = conv2d(32, 1, 1, 0, name="skip1")
            self.skip2 = conv2d(32, 1, 1, 0, name="skip2")
            self.skip3 = conv2d(32, 1, 1, 0, name="skip3")
        else:
            self.dec1 = MPUpBlock(ld[-2], name="dec1")
            self.dec2 = MPUpBlock(ld[-3], name="dec2")
            self.dec3 = MPUpBlock(ld[-4], name="dec3")
            self.dec4 = MPUpBlock(self.filters, name="dec4")
        if self.variant == "train":
            self.t321 = conv2d(self.filters, 1, 1, 0, name="t321")
            self.t322 = conv2d(self.filters, 1, 1, 0, name="t322")
            self.t323 = conv2d(self.filters, 1, 1, 0, name="t323")
            self.t324 = conv2d(self.filters, 1, 1, 0, name="t324")
        nc = self.out_channels
        self.aux0 = conv2d(nc, 1, 1, 0, name="aux0")
        self.aux1 = conv2d(nc, 1, 1, 0, name="aux1")
        self.aux2 = conv2d(nc, 1, 1, 0, name="aux2")
        self.aux4 = conv2d(nc, 1, 1, 0, name="aux4")

    def _tran(self, prefix: str, i: int, x, train: bool):
        x = getattr(self, f"{prefix}{i}_0")(x)
        return getattr(self, f"{prefix}{i}_1")(x, use_running_average=not train)

    def __call__(self, x, train: bool = False, cnn_feats=None):
        gate = gate_fusion if self.flag_gate else simple_fusion
        # the 'gate' rng may be deliberately absent (pinned_gate() parity
        # mode draws the alpha pattern from a deterministic hash instead)
        need_rng = self.flag_gate and train and self.has_rng("gate")
        if self.flag_gate and train and not need_rng and not _PINNED_GATE:
            raise ValueError(
                "gated fusion in train mode without a 'gate' PRNG collection "
                "— stochastic gating would silently degrade to the eval "
                "alpha=0.5; pass rngs={'gate': key} to apply(), or wrap the "
                "trace in pinned_gate() for deterministic-parity alphas"
            )
        rngs = [self.make_rng("gate") if need_rng else None for _ in range(4)]

        # cnn_feats: externally computed CNN pyramid (e.g. the packed
        # space-to-depth path, ops/packed_conv.py) — lets the serving/
        # training paths swap the branch without touching the param tree.
        # Entries may be (fine, packed) pairs: the packed form feeds the
        # packed fusion/decoder without an unpack->repack round trip.
        cs = cnn_feats if cnn_feats is not None else self.base_cnn(x, train)
        split = lambda c: c if isinstance(c, tuple) else (c, None)
        (c1, c1pk), (c2, c2pk), (c3, _), (c4, _), (c5, _) = [split(c) for c in cs]
        x2pk = None  # packed form of the level-0 fused map, when available
        if self.flag_vit and self.flag_cnn:
            from tcct_tpu.models.layers import packed_io, packing_active
            from tcct_tpu.ops.packed_conv import pack_nhwc, unpack_nhwc

            vs = self.base_vit.forward_features(x, train)
            x2v, x3v, x4v, x5v = vs
            x1 = c1
            if (
                (packing_active() or c2pk is not None)
                and not self.flag_gate
                and x2v.shape[1] % 2 == 0
                and x2v.shape[2] % 2 == 0
                and c2.shape[1:3] == x2v.shape[1:3]
            ):
                # level-0 fusion (the big 128^2 grid) entirely on the
                # packed layout: one pack of the ViT feature (the CNN skip
                # arrives packed), phase-grouped BN statistics (exact),
                # one unpack of the fused map — instead of a pack/unpack
                # round trip inside every MaybePackedConv tran conv.
                a = pack_nhwc(x2v)
                with packed_io():
                    a = getattr(self, "tran_vit0_0")(a)
                a = getattr(self, "tran_vit0_1")(
                    a, use_running_average=not train, packed=True
                )
                b = c2pk if c2pk is not None else pack_nhwc(c2)
                with packed_io():
                    b = getattr(self, "tran_cnn0_0")(b)
                b = getattr(self, "tran_cnn0_1")(
                    b, use_running_average=not train, packed=True
                )
                x2pk = a + b
                # fine form for the gate-free consumers that still need it
                # (feats in the infer variant) — DCE'd when unused
                x2 = unpack_nhwc(x2pk)
            else:
                x2 = gate(self._tran("tran_vit", 0, x2v, train), self._tran("tran_cnn", 0, c2, train), rngs[0], train)
            x3 = gate(self._tran("tran_vit", 1, x3v, train), self._tran("tran_cnn", 1, c3, train), rngs[1], train)
            x4 = gate(self._tran("tran_vit", 2, x4v, train), self._tran("tran_cnn", 2, c4, train), rngs[2], train)
            x5 = gate(self._tran("tran_vit", 3, x5v, train), self._tran("tran_cnn", 3, c5, train), rngs[3], train)
        elif self.flag_cnn:
            # CNN-only ablation (cnnu/pnnu): the reference still *computes*
            # the ViT branch and discards it (tcct.py:1003) — we skip it.
            x1, x2, x3, x4, x5 = c1, c2, c3, c4, c5
        else:
            vs = self.base_vit.forward_features(x, train)
            x2v, x3v, x4v, x5v = vs
            x1 = c1
            x2 = self._tran("tran_vit", 0, x2v, train)
            x3 = self._tran("tran_vit", 1, x3v, train)
            x4 = self._tran("tran_vit", 2, x4v, train)
            x5 = self._tran("tran_vit", 3, x5v, train)

        y8 = self.head_0(x5)
        y8 = self.head_1(y8, use_running_average=not train)
        y8 = leaky_relu(y8)

        size = x.shape[1:3]
        if self.variant == "t32":
            # repaired tcct32 decoder: 1x1 skip adapters to the common
            # 32ch decoder width; feats likewise use the adapted skips
            # (the published file sums mismatched channel counts).
            y4 = self.dec1(y8, self.skip1(x4), train)
            y2 = self.dec2(y4, self.skip2(x3), train)
            y1 = self.dec3(y2, self.skip3(x2), train)
            y0 = self.dec4(y1, x1, train)
            feats = [
                norm_add([x1, self.skip3(x2), self.skip2(x3), y0, y1, y2])
                if feats_wanted()
                else None
            ]
            out0 = self.aux0(y0)
            out1 = resize_bilinear(self.aux1(y1), size, align_corners=False)
            out2 = resize_bilinear(self.aux2(y2), size, align_corners=False)
            out4 = resize_bilinear(self.aux4(y4), size, align_corners=False)
            return [out0, out1, out2, out4], feats
        y4 = self.dec1(y8, x4, train)
        y2 = self.dec2(y4, x3, train)

        from tcct_tpu.models.layers import (
            packed_heads_active,
            packed_io,
            packing_active,
        )
        from tcct_tpu.ops.packed_conv import pack_nhwc, unpack_nhwc

        # round 4: chain the WHOLE 128^2 decoder level on the packed
        # layout — dec3's upsample/add/1x1, dec4's prep conv/BN/act, the
        # t32x projections and the aux heads all run packed.  The only
        # fine materializations left at this level are dec4's upsample
        # input and the n_class-channel head outputs (cheap).  Removes
        # the per-conv pack/unpack round trips the round-4 train trace
        # itemized as ~4.5 ms/step of XLA relayout copies.  Exact
        # reassociation of the plain path.
        chain = (
            (packing_active() or c1pk is not None or c2pk is not None)
            and x2.shape[1] % 2 == 0
            and x2.shape[2] % 2 == 0
            and y2.shape[1] * 2 == x2.shape[1]
            and y2.shape[2] * 2 == x2.shape[2]
            and x1.shape[1] == 2 * x2.shape[1]
            and x1.shape[2] == 2 * x2.shape[2]
        )
        y1pk = None
        if chain:
            if x2pk is None:
                x2pk = pack_nhwc(x2)
            y1pk = self.dec3(y2, None, train, packed_skip=x2pk)
            # feats only; gated at trace time (the r5 audit caught these
            # unpacks alive — XLA does not DCE through scan+jvp)
            y1 = unpack_nhwc(y1pk) if feats_wanted() else None
        else:
            y1 = self.dec3(y2, x2, train)

        if self.variant == "train":
            if chain:
                x1pk = c1pk if c1pk is not None else pack_nhwc(x1)
                y0pk = self.dec4(
                    y1pk, None, train, packed_skip=x1pk, packed_x1=True
                )
                with packed_io():
                    y0pk = self.t324(x1pk + y0pk)
                    out0pk = self.aux0(y0pk)
                    y1p_pk = self.t323(x2pk + y1pk)
                    out1pk = self.aux1(y1p_pk)
                y0 = unpack_nhwc(y0pk) if feats_wanted() else None
                y1p = unpack_nhwc(y1p_pk) if feats_wanted() else None  # feats only
                out0_packed = out0pk
                out1 = resize_bilinear(
                    unpack_nhwc(out1pk), size, align_corners=False
                )
            elif (
                packing_active()
                and x1.shape[1] % 2 == 0
                and x1.shape[2] % 2 == 0
            ):
                # dec4-only packed tail (x2 level has odd dims)
                x1pk = c1pk if c1pk is not None else pack_nhwc(x1)
                y0pk = self.dec4(y1, None, train, packed_skip=x1pk)
                with packed_io():
                    y0pk = self.t324(x1pk + y0pk)
                    out0pk = self.aux0(y0pk)
                y0 = unpack_nhwc(y0pk) if feats_wanted() else None  # feats only
                out0_packed = out0pk
                y1p = self.t323(x2 + y1)
                out1 = resize_bilinear(self.aux1(y1p), size, align_corners=False)
            else:
                y0 = self.dec4(y1, x1, train)
                y0 = self.t324(x1 + y0)
                out0_packed = None
                y1p = self.t323(x2 + y1)
                out1 = resize_bilinear(self.aux1(y1p), size, align_corners=False)
            y2p = self.t322(x3 + y2)
            y4p = self.t321(x4 + y4)
            feats = [norm_add([y0, y1p, y2p])]
            if out0_packed is not None:
                if packed_heads_active():
                    # the packed-aware DS loss owns the layout; the fine
                    # unpack (and its backward re-pack) never materializes
                    out0 = out0_packed
                else:
                    out0 = unpack_nhwc(out0_packed)
            else:
                out0 = self.aux0(y0)
            out2 = resize_bilinear(self.aux2(y2p), size, align_corners=False)
            out4 = resize_bilinear(self.aux4(y4p), size, align_corners=False)
        else:
            if chain:
                x1pk = c1pk if c1pk is not None else pack_nhwc(c1)
                y0pk = self.dec4(
                    y1pk, None, train, packed_skip=x1pk, packed_x1=True
                )
                with packed_io():
                    out0pk = self.aux0(y0pk)
                    out1pk = self.aux1(y1pk)
                y0 = unpack_nhwc(y0pk) if feats_wanted() else None  # feats only
                out0 = out0pk if packed_heads_active() else unpack_nhwc(out0pk)
                out1 = resize_bilinear(
                    unpack_nhwc(out1pk), size, align_corners=False
                )
            elif c1pk is not None and y1.shape[1:3] == c1pk.shape[1:3]:
                # serving fast path: the skip arrives packed from
                # cross_resnet_packed — run dec4's upsample/add/1x1 and
                # aux0 on the packed layout (the fine full-res tail is
                # the infer profile's HBM hotspot).  Exact reassociation.
                y0pk = self.dec4(y1, None, train, packed_skip=c1pk)
                with packed_io():
                    out0pk = self.aux0(y0pk)
                y0 = unpack_nhwc(y0pk) if feats_wanted() else None  # feats only
                out0 = out0pk if packed_heads_active() else unpack_nhwc(out0pk)
                out1 = resize_bilinear(self.aux1(y1), size, align_corners=False)
            else:
                y0 = self.dec4(y1, c1, train)
                out0 = self.aux0(y0)
                out1 = resize_bilinear(self.aux1(y1), size, align_corners=False)
            feats = [norm_add([x1, x2, x3, y0, y1, y2])]
            out2 = resize_bilinear(self.aux2(y2), size, align_corners=False)
            out4 = resize_bilinear(self.aux4(y4), size, align_corners=False)
        return [out0, out1, out2, out4], feats
