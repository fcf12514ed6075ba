"""MPViT multi-path transformer branch, TPU-native (NHWC, flax linen).

Re-design of the reference backbone (task1/nets/tcct.py:29-800, itself of
MPViT/CoaT lineage).  Token mixers are configurable:

- ``metapool``   — reference-faithful: 3x3 average pool over the
  *(token, channel)* axes of the [B, N, C] tensor minus identity
  (tcct.py:405-415 applies nn.AvgPool2d to a 3-D tensor; this is what the
  shipped checkpoints were trained with).
- ``metapool2d`` — proper PoolFormer spatial pooling (what the code
  "meant"); not checkpoint compatible.
- ``factor``     — factorized linear attention, softmax(K)^T V then
  Q (K^T V), with convolutional relative position encoding
  (tcct.py:289-341; commented out at the reference call site, fully
  functional here).
- ``hydra``      — cosine-normalized hydra attention (tcct.py:343-403).

All mixers are O(N) in token count; the FLOPs live in 1x1 convs/Dense
layers that XLA maps straight onto the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcct_tpu.models.layers import (
    ConvBN,
    DWConvBN,
    DropPath,
    Mlp,
    ResBlock,
    batchnorm,
    conv2d,
    hardswish,
    layer_norm,
    trunc_normal_init,
)
from tcct_tpu.ops.pool import metapool_tokens, metapool_spatial


@dataclasses.dataclass(frozen=True)
class MPViTConfig:
    """Architecture hyperparameters (reference factories tcct.py:766-800)."""

    num_stages: int = 4
    num_path: Tuple[int, ...] = (1, 1, 1, 1)
    num_layers: Tuple[int, ...] = (1, 1, 1, 1)
    embed_dims: Tuple[int, ...] = (64, 96, 128, 160)
    mlp_ratios: Tuple[int, ...] = (1, 1, 1, 1)
    num_heads: Tuple[int, ...] = (4, 4, 4, 4)
    drop_path_rate: float = 0.1
    mixer: str = "metapool"  # metapool | metapool_pallas | metapool2d | factor | hydra
    # Reference crpe head-split table (tcct.py:482-486).  With metapool the
    # crpe params exist (for checkpoint compatibility) but are never applied.
    crpe_window: Tuple[Tuple[int, int], ...] = ((3, 2), (5, 3), (7, 3))


def mpvit_tiny_config(**kw) -> MPViTConfig:
    return MPViTConfig(**kw)


def mpvit_small_config(**kw) -> MPViTConfig:
    return MPViTConfig(
        num_path=(2, 3, 3, 3),
        num_layers=(1, 3, 6, 3),
        embed_dims=(64, 128, 216, 288),
        mlp_ratios=(4, 4, 4, 4),
        num_heads=(8, 8, 8, 8),
        **kw,
    )


def mpvit_base_config(**kw) -> MPViTConfig:
    return MPViTConfig(
        num_path=(2, 3, 3, 3),
        num_layers=(1, 3, 8, 3),
        embed_dims=(128, 224, 368, 480),
        mlp_ratios=(4, 4, 4, 4),
        num_heads=(8, 8, 8, 8),
        **kw,
    )


def dpr_schedule(drop_path_rate: float, num_layers: Sequence[int]) -> List[List[float]]:
    """Linear decay drop-path rates per stage (reference tcct.py:635-647)."""
    total = sum(num_layers)
    if total <= 1:
        flat = [0.0] * total
    else:
        flat = [drop_path_rate * i / (total - 1) for i in range(total)]
    out, cur = [], 0
    for n in num_layers:
        out.append(flat[cur : cur + n])
        cur += n
    return out


def _fit_crpe_window(window, num_heads: int):
    """Rescale a {win: head_split} table so splits sum to num_heads."""
    total = sum(hs for _, hs in window)
    if total == num_heads:
        return window
    raw = [(w, hs * num_heads / total) for w, hs in window]
    out = [(w, max(int(f), 0)) for w, f in raw]
    # distribute the remainder to the entries with the largest fractional part
    rem = num_heads - sum(hs for _, hs in out)
    order = sorted(range(len(raw)), key=lambda i: raw[i][1] - int(raw[i][1]), reverse=True)
    out = [list(x) for x in out]
    for i in range(rem):
        out[order[i % len(out)]][1] += 1
    return tuple((w, hs) for w, hs in out if hs > 0)


class ConvPosEnc(nn.Module):
    """Depthwise 3x3 conv positional encoding + residual, on tokens
    (reference tcct.py:197-217)."""

    dim: int
    k: int = 3

    @nn.compact
    def __call__(self, x, size):
        B, N, C = x.shape
        H, W = size
        feat = x.reshape(B, H, W, C)
        y = conv2d(self.dim, self.k, 1, self.k // 2, groups=self.dim, name="proj")(feat)
        y = y + feat
        return y.reshape(B, N, C)


class ConvRelPosEnc(nn.Module):
    """Convolutional relative position encoding: per-head-group depthwise
    convs over V, gated by Q (reference tcct.py:219-287)."""

    ch_per_head: int
    window: Tuple[Tuple[int, int], ...]

    @nn.compact
    def __call__(self, q, v, size):
        # q, v: [B, h, N, Ch]
        B, h, N, Ch = q.shape
        H, W = size
        v_img = v.transpose(0, 2, 1, 3).reshape(B, H, W, h * Ch)
        splits = [hs * Ch for _, hs in self.window]
        offs = [0]
        for s in splits:
            offs.append(offs[-1] + s)
        outs = []
        for i, (win, hs) in enumerate(self.window):
            chunk = v_img[..., offs[i] : offs[i + 1]]
            outs.append(
                conv2d(
                    hs * Ch, win, 1, win // 2, groups=hs * Ch, name=f"conv_list_{i}"
                )(chunk)
            )
        conv_v = jnp.concatenate(outs, axis=-1)
        conv_v = conv_v.reshape(B, N, h, Ch).transpose(0, 2, 1, 3)
        return q * conv_v


class FactorAttention(nn.Module):
    """Factorized attention: softmax(K)^T V then Q(K^T V) + CRPE
    (reference tcct.py:289-341).  Linear in token count; both einsums are
    MXU matmuls."""

    dim: int
    num_heads: int
    crpe: Optional[nn.Module] = None
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, size):
        B, N, C = x.shape
        h = self.num_heads
        ch = C // h
        scale = ch**-0.5
        qkv = nn.Dense(C * 3, use_bias=self.qkv_bias, kernel_init=trunc_normal_init, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, ch).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        k_softmax = jax.nn.softmax(k, axis=2)
        kv = jnp.einsum("bhnk,bhnv->bhkv", k_softmax, v)
        att = jnp.einsum("bhnk,bhkv->bhnv", q, kv)
        if self.crpe is not None:
            att = scale * att + self.crpe(q, v, size)
        else:
            att = scale * att
        att = att.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, kernel_init=trunc_normal_init, name="proj")(att)


class HydraAttention(nn.Module):
    """Hydra attention: cosine-normalized Q,K; kv = sum_n(k*v); out = q*kv
    (reference tcct.py:343-403)."""

    dim: int
    num_heads: int
    crpe: Optional[nn.Module] = None
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, size):
        B, N, C = x.shape
        h = self.num_heads
        ch = C // h
        scale = ch**-0.5
        qkv = nn.Dense(C * 3, use_bias=self.qkv_bias, kernel_init=trunc_normal_init, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, ch).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        kv = jnp.sum(k * v, axis=-2, keepdims=True)
        att = q * kv
        if self.crpe is not None:
            att = scale * att + self.crpe(q, v, size)
        else:
            att = scale * att
        att = att.transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, kernel_init=trunc_normal_init, name="proj")(att)


class MHCABlock(nn.Module):
    """Pre-norm mixer + MLP block with shared CPE/CRPE
    (reference tcct.py:417-469)."""

    dim: int
    num_heads: int
    mlp_ratio: int
    drop_path: float
    mixer: str
    cpe: nn.Module
    crpe: Optional[nn.Module]

    def setup(self):
        if self.mixer == "factor":
            self.att = FactorAttention(self.dim, self.num_heads, crpe=self.crpe, name="att")
        elif self.mixer == "hydra":
            self.att = HydraAttention(self.dim, self.num_heads, crpe=self.crpe, name="att")
        self.norm1 = layer_norm(name="norm1")
        self.norm2 = layer_norm(name="norm2")
        self.mlp = Mlp(self.dim * self.mlp_ratio, self.dim, name="mlp")
        self.drop = DropPath(self.drop_path, name="drop_path")

    def __call__(self, x, size, train: bool = False):
        x = self.cpe(x, size)
        cur = self.norm1(x)
        if self.mixer == "metapool":
            a = metapool_tokens(cur)
        elif self.mixer == "metapool_pallas":
            from tcct_tpu.ops.pallas import metapool_tokens_pallas

            a = metapool_tokens_pallas(cur)
        elif self.mixer == "metapool2d":
            a = metapool_spatial(cur, size)
        else:
            a = self.att(cur, size)
        x = x + self.drop(a, deterministic=not train)
        cur = self.norm2(x)
        x = x + self.drop(self.mlp(cur), deterministic=not train)
        return x


class MHCAEncoder(nn.Module):
    """Stack of MHCA blocks sharing one CPE and one CRPE
    (reference tcct.py:471-516)."""

    dim: int
    num_layers: int
    num_heads: int
    mlp_ratio: int
    drop_path_list: Tuple[float, ...]
    mixer: str
    crpe_window: Tuple[Tuple[int, int], ...]

    def setup(self):
        self.cpe = ConvPosEnc(self.dim, k=3, name="cpe")
        # CRPE params always exist (checkpoint compatibility) even when the
        # metapool mixer never applies them — mirrors the reference module
        # tree (tcct.py:492-494).  When factor/hydra is actually *enabled*,
        # the reference table {3:2,5:3,7:3} (8 heads) conflicts with tiny's
        # 4 heads — it would crash in the reference too (latent bug) — so
        # the split is refit proportionally to num_heads.
        window = self.crpe_window
        if self.mixer in ("factor", "hydra"):
            window = _fit_crpe_window(window, self.num_heads)
        self.crpe = ConvRelPosEnc(
            self.dim // self.num_heads, window, name="crpe"
        )
        self.layers = [
            MHCABlock(
                self.dim,
                self.num_heads,
                self.mlp_ratio,
                self.drop_path_list[i],
                self.mixer,
                cpe=self.cpe,
                crpe=self.crpe if self.mixer in ("factor", "hydra") else None,
                name=f"MHCA_layers_{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(self, x, size, train: bool = False):
        B = x.shape[0]
        H, W = size
        for layer in self.layers:
            x = layer(x, size, train=train)
        return x.reshape(B, H, W, -1)


class PatchEmbedStage(nn.Module):
    """Chained depthwise-conv patch embeds; first is stride-2 on pooling
    stages (reference tcct.py:149-195)."""

    embed_dim: int
    num_path: int
    is_pool: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for idx in range(self.num_path):
            stride = 2 if self.is_pool and idx == 0 else 1
            x = DWConvBN(
                self.embed_dim,
                kernel_size=3,
                stride=stride,
                act=hardswish,
                name=f"patch_embeds_{idx}_patch_conv",
            )(x, train)
            outs.append(x)
        return outs


class MHCAStage(nn.Module):
    """Parallel path encoders + local ResBlock, concat, 1x1 aggregate
    (reference tcct.py:574-616)."""

    embed_dim: int
    out_embed_dim: int
    num_layers: int
    num_heads: int
    mlp_ratio: int
    num_path: int
    drop_path_list: Tuple[float, ...]
    mixer: str
    crpe_window: Tuple[Tuple[int, int], ...]

    def setup(self):
        self.mhca_blks = [
            MHCAEncoder(
                self.embed_dim,
                self.num_layers,
                self.num_heads,
                self.mlp_ratio,
                tuple(self.drop_path_list),
                self.mixer,
                self.crpe_window,
                name=f"mhca_blks_{i}",
            )
            for i in range(self.num_path)
        ]
        self.inv_res = ResBlock(self.embed_dim, name="InvRes")
        self.aggregate = ConvBN(self.out_embed_dim, act=hardswish, name="aggregate")

    def __call__(self, inputs, train: bool = False):
        outs = [self.inv_res(inputs[0], train)]
        for x, enc in zip(inputs, self.mhca_blks):
            B, H, W, C = x.shape
            y = x.reshape(B, H * W, C)
            y = enc(y, (H, W), train=train)
            outs.append(y)
        cat = jnp.concatenate(outs, axis=-1)
        return self.aggregate(cat, train)


class MPViT(nn.Module):
    """Multi-path ViT backbone (reference tcct.py:649-753)."""

    cfg: MPViTConfig

    def setup(self):
        c = self.cfg
        self.stem_0 = ConvBN(
            c.embed_dims[0] // 2, kernel_size=3, stride=2, pad=1, act=hardswish, name="stem_0"
        )
        self.stem_1 = ConvBN(
            c.embed_dims[0], kernel_size=3, stride=1, pad=1, act=hardswish, name="stem_1"
        )
        dpr = dpr_schedule(c.drop_path_rate, c.num_layers)
        self.patch_stages = [
            PatchEmbedStage(
                c.embed_dims[i],
                c.num_path[i],
                is_pool=(i != 0),
                name=f"patch_embed_stages_{i}",
            )
            for i in range(c.num_stages)
        ]
        self.mhca_stages = [
            MHCAStage(
                c.embed_dims[i],
                c.embed_dims[i + 1] if i + 1 != c.num_stages else c.embed_dims[i],
                c.num_layers[i],
                c.num_heads[i],
                c.mlp_ratios[i],
                c.num_path[i],
                tuple(dpr[i]),
                c.mixer,
                c.crpe_window,
                name=f"mhca_stages_{i}",
            )
            for i in range(c.num_stages)
        ]
        self.cls_head = nn.Dense(
            1000, kernel_init=trunc_normal_init, name="cls_head_cls"
        )

    def forward_features(self, x, train: bool = False):
        x = self.stem_0(x, train)
        x = self.stem_1(x, train)
        xs = []
        for pe, st in zip(self.patch_stages, self.mhca_stages):
            att_inputs = pe(x, train)
            x = st(att_inputs, train)
            xs.append(x)
        return xs

    def __call__(self, x, train: bool = False):
        xs = self.forward_features(x, train)
        pooled = jnp.mean(xs[-1], axis=(1, 2))
        return self.cls_head(pooled)
