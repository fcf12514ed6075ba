"""Winograd F(2x2, 3x3) lowering for stride-1 SAME 3x3 convolutions.

VERDICT r3 item 6: the packed CrossCNN convs are FLOP-limited (top conv
fusions at 78-96% of peak MXU), so the remaining ~8.4 ms/step of conv
time only shrinks algorithmically.  Winograd F(2x2,3x3) computes each
2x2 output tile with 16 multiplies instead of 36 — a 2.25x MAC cut —
by moving the conv into a transform domain where it becomes 16
independent [tiles, Cin] x [Cin, Cout] matmuls (Lavin & Gray, 2015;
arXiv:1509.09308):

    Y = A^T [ (G w G^T) . (B^T d B) ] A        per 4x4 input tile d

Applied here to the reference's cross-conv stacks
(/root/reference/task1/nets/tcct.py:803-828 — the four 3x3 convs per
CrossCNNBlock) in their TPU forms: the alignment-preserving coarse
[3,3] packed conv (ops/packed_conv.py::_packed_block, the one conv per
block the alignment alternation could not reduce to [2,2]) and the
plain 3x3 convs of the deeper unpacked levels.

TPU-first details:

- tile extraction is PHASE-SPLIT: the padded input's even/odd rows and
  columns are separated once, after which every one of the 16 tap
  planes d[a][b] is a CONTIGUOUS slice — no stride-2 gathers, no
  lane-misaligned concats (a documented Mosaic landmine, CLAUDE.md).
- data/filter/output transforms are exact small-integer / half-integer
  linear combinations, done in f32 on the VPU (they are adds, not
  FLOP-relevant); only the 16-way batched matmul runs in the input
  dtype (bf16 on the hot path) with f32 accumulation —
  ``preferred_element_type`` keeps the MXU accumulator wide.
- the 16 matmuls are ONE einsum over a leading (a, b) = 4x4 axis pair,
  i.e. a single batched-matmul HLO that XLA tiles onto the MXU.

Numerics: exact in exact arithmetic; in floats the transform
re-association changes rounding vs the direct conv (tested ~1e-6 rel
f32, ~1e-2 bf16 — same order as bf16 conv rounding itself).  Therefore
DEFAULT OFF: arm with ``winograd_convs()`` / ``TCCT_WINOGRAD=1`` and
A/B on hardware (tools/bench_winograd.py) before flipping any default.

STATUS: MEASURED ON CHIP r4 (tools/bench_winograd.py, v5e) — LOSES
everywhere; stays gated OFF.  The anticipated risk was real: the
transform-domain tensors V and M are 16/4 = 4x the input/output bytes,
and through XLA that HBM traffic swamps the 2.25x MAC cut.  Numbers:
micro [8,128,128,128] bf16 fwd 3.727 vs direct 1.013 ms (0.27x),
fwd+bwd 4.871 vs 0.935 (0.19x); [8,64,64,96] the best case at 0.67x
fwd / 0.93x fwd+bwd; serving 14.13 vs 6.48 ms/step; train epoch 25.33
vs 19.67 ms/step.  The only remaining shape is a fused Pallas variant
keeping V/M in VMEM — blocked today by the documented Mosaic
restrictions (attic/crosscnn_fused.py) and deprioritized: the measured
loss margin means even a perfect fusion saves <2 ms/step.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp
import numpy as np

# Lavin & Gray F(2x2, 3x3) transform matrices (correlation convention —
# matches flax/torch convs, no kernel flip).
BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)
AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)

_WINOGRAD = os.environ.get("TCCT_WINOGRAD", "0") == "1"


@contextlib.contextmanager
def winograd_convs(enable: bool = True):
    """Trace-time switch: eligible 3x3 convs lower via Winograd."""
    global _WINOGRAD
    prev = _WINOGRAD
    _WINOGRAD = bool(enable)
    try:
        yield
    finally:
        _WINOGRAD = prev


def winograd_active() -> bool:
    return _WINOGRAD


def winograd_eligible(x_shape, kernel_shape, strides, padding) -> bool:
    """stride-1 SAME 3x3, ungrouped, even H and W (whole 2x2 tile grid)."""
    if len(x_shape) != 4 or tuple(kernel_shape[:2]) != (3, 3):
        return False
    if strides not in ((1, 1), 1, None):
        return False
    pad = tuple(map(tuple, padding)) if isinstance(padding, (tuple, list)) else None
    return (
        pad == ((1, 1), (1, 1))
        and x_shape[1] % 2 == 0
        and x_shape[2] % 2 == 0
        and x_shape[1] >= 2
        and x_shape[2] >= 2
    )


def transform_kernel(w):
    """HWIO [3,3,ci,co] -> transform-domain [4,4,ci,co] (f32): U = G w G^T."""
    g = jnp.asarray(G)
    return jnp.einsum("ak,klio,bl->abio", g, w.astype(jnp.float32), g)


def _phase_splits(xp, h2: int, w2: int):
    """Padded input [B,H+2,W+2,C] -> the 16 contiguous tap planes
    d[a][b][B,h2,w2,C] (tile (i,j) tap (a,b) = xp[:, 2i+a, 2j+b, :]),
    via one even/odd split per axis."""
    planes = {}
    row = {0: xp[:, 0::2], 1: xp[:, 1::2]}  # [B, h2+1, W+2, C]
    for a in range(4):
        r = row[a % 2][:, a // 2 : a // 2 + h2]
        col = {0: r[:, :, 0::2], 1: r[:, :, 1::2]}
        for b in range(4):
            planes[(a, b)] = col[b % 2][:, :, b // 2 : b // 2 + w2]
    return planes


def conv3x3_winograd(x, w, bias=None, precision=None):
    """NHWC stride-1 SAME 3x3 conv via Winograd F(2x2,3x3).

    Matches ``lax.conv_general_dilated(x, w, (1,1), ((1,1),(1,1)),
    NHWC/HWIO)`` up to float re-association.  Transforms run in f32;
    the 16-way batched matmul runs in ``x.dtype`` with f32 accumulation.
    """
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    co = w.shape[-1]
    h2, w2 = H // 2, W // 2
    bt = jnp.asarray(BT)
    at = jnp.asarray(AT)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    d = _phase_splits(xp, h2, w2)
    D = jnp.stack(
        [jnp.stack([d[(a, b)] for b in range(4)]) for a in range(4)]
    )  # [4,4,B,h2,w2,C]
    # data transform (adds only, f32 VPU): V = B^T d B per tile
    V = jnp.einsum("ak,bl,klnhwc->abnhwc", bt, bt, D.astype(jnp.float32))
    U = transform_kernel(w)  # [4,4,ci,co]
    # 16 batched matmuls in ONE einsum: MXU stage, f32 accumulation
    M = jnp.einsum(
        "abnhwc,abcd->abnhwd",
        V.astype(x.dtype),
        U.astype(x.dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    # output transform: Y = A^T M A, interleave 2x2 tiles back to H, W
    Y = jnp.einsum("pa,qb,abnhwd->nhpwqd", at, at, M)
    y = Y.reshape(B, H, W, co).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
