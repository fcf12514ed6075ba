"""Pallas TPU kernel for depthwise 3x3 convolutions (stride 1/2, SAME).

The MPViT branch is full of depthwise 3x3 convs — ConvPosEnc's ``proj``
(reference task1/nets/tcct.py:197-217), the DWConv2d_BN patch embeds
(tcct.py:99-147) and ResBlock's middle conv (tcct.py:518-572).  XLA has
no good TPU lowering for them: in the round-3 train trace they run at
2.2-2.6 GFLOP/s (~8x off the HBM roofline), 1.54 ms/step in aggregate,
and an XLA-level shift-add rewrite was measured-and-rejected because the
9-tap filter backward re-reads the activation nine times (BACKLOG.md).

This kernel fixes both ends at once:

- forward: one VMEM-resident pass — nine shifted multiply-accumulates in
  f32 (the same accumulation XLA's conv uses), read once, write once;
- backward: ONE fused kernel reads ``x`` and ``g`` a single time and
  produces BOTH ``dx`` (correlation with the index-flipped taps) and all
  nine ``dw`` tap sums — the data reuse XLA cannot express across its
  separate input/filter backprop convs.

Blocking: grid over (batch, H row-blocks).  The input's H axis is
zero-padded by one row on each side in XLA (the pad fuses into the
producer), so every row block is an in-range ``pl.Element(hb+2)``
window of the padded array — the only halo form this Mosaic stack
lowers (out-of-range Element windows fail with "low padding not
supported", and mixing Element with blocked dims in one BlockSpec is
rejected outright).  The border zeros are real memory, reproducing the
conv's SAME zero padding with no in-kernel masking.  The W axis stays
whole per block (padded by one column in-kernel) with f32 temporaries
chunked along W; channels ride the 128-wide lane axis so every tap
shift is a cheap sublane/address shift.

Semantics match ``lax.conv_general_dilated`` with kernel [3,3,1,C],
``feature_group_count=C``, stride 1 or 2, SAME zero padding (flax/torch
correlation — no kernel flip), with f32 accumulation.  Gated in
``models/layers.py::MaybePackedConv`` (TPU backend, single device,
block-size-eligible); everything else falls back to the plain conv.

STATUS: exact (tests/test_dwconv.py — forward, both grads, and full
vitu-model gradient parity at 2e-6 rel in interpreter mode), but NOT
yet Mosaic-compiled or timed on hardware: the round-3 TPU window closed
(multi-hour backend outage) before the A/B could run.  The routing gate
therefore DEFAULTS OFF (models/layers.py, ``TCCT_PALLAS_DW=1`` to arm);
measure with tools/bench_dwconv.py (micro fwd/bwd at
[8,128,128,64]+[8,64,64,96], stride-2 at [8,128,128,96], then the full
epoch A/B) and flip the default if it wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-block VMEM budget: the halo'd inputs, dx block and chunked f32
# temps must fit alongside the pipeline's double buffers.  4 MiB keeps
# the backward under the 16 MiB scoped-vmem limit (measured: hb=64 at
# [8,128,128,64] bf16 compiles to 16.45 MiB scoped and is rejected).
_VMEM_BUDGET_BYTES = 4 * 1024 * 1024
_W_CHUNK = 64
_HB_TARGET = 64  # preferred row-block height

def _params(*grid_semantics):
    """Shared Mosaic compiler params: the (batch, row-block) grid dims are
    independent, and the default 16 MiB scoped-vmem limit undercounts the
    relayout temporaries Mosaic materializes for the phase-split reshapes
    (s2 forward measured 20.3 MiB scoped at ob=16); v5e VMEM is far
    larger, so raise the cap and keep blocks small for pipelining."""
    return pltpu.CompilerParams(
        dimension_semantics=grid_semantics or ("parallel", "parallel"),
        vmem_limit_bytes=64 * 1024 * 1024,
    )


def on_tpu() -> bool:
    """True when the default backend is a real TPU (incl. the axon
    tunnel, whose platform name is 'axon' but whose device_kind is a TPU
    generation string)."""
    if jax.default_backend() == "tpu":
        return True
    try:
        return "tpu" in jax.devices()[0].device_kind.lower()
    except Exception:
        return False


def _wchunks(W: int):
    return [(w0, min(_W_CHUNK, W - w0)) for w0 in range(0, W, _W_CHUNK)]


def _block_bytes(hb: int, W: int, C: int, itemsize: int, n_tensors: int) -> int:
    tensors = n_tensors * (hb + 2) * (W + 2) * C * itemsize
    temps = 2 * hb * min(W, _W_CHUNK) * C * 4
    return tensors + temps


def _pick_hb(H: int, W: int, C: int, itemsize: int):
    """Largest divisor of H that is <= _HB_TARGET and fits the budget
    (3 halo'd tensors: worst case is the backward's x, g, dx)."""
    for hb in range(min(H, _HB_TARGET), 0, -1):
        if H % hb == 0 and _block_bytes(hb, W, C, itemsize, 3) <= _VMEM_BUDGET_BYTES:
            return hb
    return None


def _require_block(blk, fn_name: str, shape, itemsize: int):
    """Direct callers (bench tools, future users) bypass the
    MaybePackedConv/dwconv3x3_eligible gate; give them a readable error
    instead of an opaque NoneType arithmetic failure (ADVICE r3)."""
    if blk is None:
        raise ValueError(
            f"dwconv3x3 {fn_name}: no feasible row block fits the "
            f"{_VMEM_BUDGET_BYTES // (1 << 20)} MiB VMEM budget for input "
            f"shape {tuple(shape)} (itemsize {itemsize}); check "
            f"dwconv3x3_eligible() before calling"
        )
    return blk


def _padw(x):
    return jnp.pad(x, ((0, 0), (1, 1), (0, 0)))


def _padrows(x):
    """Zero-pad the H axis of [B, H, W, C] by one row on each side.

    Mosaic cannot express out-of-range Element windows ("low padding not
    supported"), so the SAME-conv row halo is materialized by this XLA
    pad instead: every halo'd row block is then a plain in-range Element
    window of the padded array, and the border zeros are real memory
    (no in-kernel masking).  XLA fuses the pad into the producing op,
    so the cost is two extra rows of HBM traffic, not a full copy."""
    return jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))


def _fwd_kernel(x_ref, w_ref, o_ref):
    xb = x_ref[0]  # [hb+2, W, C] halo'd rows of the pre-padded input
    hb = xb.shape[0] - 2
    W, C = xb.shape[1], xb.shape[2]
    xp = _padw(xb)  # [hb+2, W+2, C]
    w = w_ref[...].astype(jnp.float32)  # [3, 3, C]
    for w0, wn in _wchunks(W):
        acc = jnp.zeros((hb, wn, C), jnp.float32)
        for a in range(3):
            for b in range(3):
                sl = xp[a : a + hb, w0 + b : w0 + b + wn, :]
                acc += sl.astype(jnp.float32) * w[a, b][None, None, :]
        o_ref[0, :, w0 : w0 + wn, :] = acc.astype(o_ref.dtype)


def _bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dw_ref):
    xb = x_ref[0]  # halo'd rows of the pre-padded x
    gb = g_ref[0]  # halo'd rows of the pre-padded g
    hb = xb.shape[0] - 2
    W, C = xb.shape[1], xb.shape[2]
    xp = _padw(xb)
    gp = _padw(gb)
    w = w_ref[...].astype(jnp.float32)
    dw = [[None] * 3 for _ in range(3)]
    for w0, wn in _wchunks(W):
        dxacc = jnp.zeros((hb, wn, C), jnp.float32)
        gc = gb[1 : hb + 1, w0 : w0 + wn, :].astype(jnp.float32)
        for a in range(3):
            for b in range(3):
                # dx[p,q] = sum_{a,b} g[p-a+1, q-b+1] * w[a,b]
                gsl = gp[2 - a : 2 - a + hb, w0 + 2 - b : w0 + 2 - b + wn, :]
                dxacc += gsl.astype(jnp.float32) * w[a, b][None, None, :]
                # dw[a,b,c] = sum_{i,j} x[i+a-1, j+b-1] * g[i,j]
                xsl = xp[a : a + hb, w0 + b : w0 + b + wn, :].astype(jnp.float32)
                tap = jnp.sum(xsl * gc, axis=(0, 1))  # [C]
                dw[a][b] = tap if dw[a][b] is None else dw[a][b] + tap
        dx_ref[0, :, w0 : w0 + wn, :] = dxacc.astype(dx_ref.dtype)
    dw_ref[0, 0] = jnp.stack([jnp.stack(r) for r in dw]).astype(dw_ref.dtype)


def _specs(B, H, W, C, hb):
    # Halo'd row windows of the PRE-PADDED [B, H+2, W, C] array: window i
    # covers padded rows [i*hb, i*hb+hb+2) — always in range, so the
    # Element windows need no low/high padding (the only form this
    # Mosaic stack lowers).  A BlockSpec must be all-Element when any
    # dim is; batch blocks are size 1 so block index == element start.
    halo = pl.BlockSpec(
        (pl.Element(1, (0, 0)), pl.Element(hb + 2, (0, 0)),
         pl.Element(W, (0, 0)), pl.Element(C, (0, 0))),
        lambda b, i: (b, i * hb, 0, 0),
        memory_space=pltpu.VMEM,
    )
    wspec = pl.BlockSpec((3, 3, C), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, hb, W, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM)
    return halo, wspec, out


def _fwd_call(x, w, interpret):
    B, H, W, C = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    hb = _require_block(_pick_hb(H, W, C, itemsize), '_fwd_call', x.shape, itemsize)
    halo, wspec, out = _specs(B, H, W, C, hb)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(B, H // hb),
        in_specs=[halo, wspec],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        interpret=interpret,
        compiler_params=_params(),
    )(_padrows(x), w)


def _bwd_call(x, w, g, interpret):
    B, H, W, C = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    hb = _require_block(_pick_hb(H, W, C, itemsize), '_bwd_call', x.shape, itemsize)
    nH = H // hb
    halo, wspec, out = _specs(B, H, W, C, hb)
    dwspec = pl.BlockSpec(
        (1, 1, 3, 3, C), lambda b, i: (b, i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    dx, dwp = pl.pallas_call(
        _bwd_kernel,
        grid=(B, nH),
        in_specs=[halo, wspec, halo],
        out_specs=[out, dwspec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((B, nH, 3, 3, C), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_params(),
    )(_padrows(x), w, _padrows(g))
    return dx, jnp.sum(dwp, axis=(0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dw3x3(x, w, interpret):
    return _fwd_call(x, w, interpret)


def _dw3x3_fwd(x, w, interpret):
    return _fwd_call(x, w, interpret), (x, w)


def _dw3x3_bwd(interpret, res, g):
    x, w = res
    dx, dw = _bwd_call(x, w, g, interpret)
    return dx, dw.astype(w.dtype)


_dw3x3.defvjp(_dw3x3_fwd, _dw3x3_bwd)


# ---------------------------------------------------------------------------
# stride-2 variant (the DWCPatchEmbed pooling convs, tcct.py:149-195).
# XLA space-to-batches these — the [B,h,w,2,2,C] reshape/copy chains in
# the train trace.  Output rows/cols map to input taps 2i+a-1; row taps
# are strided reads of the halo block (H is the untiled leading dim, so
# stride-2 row slices are free); column taps split W into (pair, phase)
# with one reshape and pick phases — no strided lane access.
# ---------------------------------------------------------------------------


def _wpairs(x, W):
    """[hb, W+2, C] padded block -> tap views b=0,1,2 of shape [hb, W//2, C]."""
    r0 = x[:, 0:W, :].reshape(x.shape[0], W // 2, 2, x.shape[2])
    r2 = x[:, 2 : W + 2, :].reshape(x.shape[0], W // 2, 2, x.shape[2])
    return r0[:, :, 0, :], r0[:, :, 1, :], r2[:, :, 0, :]


def _row_phase(xp, a, ob):
    """Rows a, a+2, ..., a+2*ob-2 of a [2*ob+2, W', C] block.

    A strided leading-dim slice traces to a >2-D gather, which Mosaic
    rejects; splitting the (untiled) leading dim into (pairs, phase) and
    indexing the phase statically lowers as plain slices."""
    xr = xp.reshape(ob + 1, 2, xp.shape[1], xp.shape[2])
    if a < 2:
        return xr[0:ob, a]
    return xr[1 : ob + 1, 0]


def _fwd_kernel_s2(x_ref, w_ref, o_ref):
    xb = x_ref[0]  # [2*ob+2, W, C] halo'd rows of the pre-padded input
    ob = (xb.shape[0] - 2) // 2
    W, C = xb.shape[1], xb.shape[2]
    xp = _padw(xb)  # [2*ob+2, W+2, C]
    w = w_ref[...].astype(jnp.float32)
    acc = jnp.zeros((ob, W // 2, C), jnp.float32)
    for a in range(3):
        rows = _row_phase(xp, a, ob)  # [ob, W+2, C]
        taps = _wpairs(rows, W)
        for b in range(3):
            acc += taps[b].astype(jnp.float32) * w[a, b][None, None, :]
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel_s2(x_ref, w_ref, g_ref, dx_ref, dw_ref):
    """Fused stride-2 backward: dx (transposed conv, phase-interleaved)
    and the nine dw tap sums, one read of x and g."""
    xb = x_ref[0]  # [2*ob+2, W, C] halo'd rows of the pre-padded x
    gb = g_ref[0]  # [ob+1, W//2, C]: g rows i*ob .. i*ob+ob of the
    # trailing-row-padded g (the halo row is a real zero past the end)
    ob = gb.shape[0] - 1
    Wo, C = gb.shape[1], gb.shape[2]
    W = 2 * Wo
    xp = _padw(xb)
    w = w_ref[...].astype(jnp.float32)
    gf = gb[0:ob].astype(jnp.float32)

    # dw[a,b] = sum x[2i+a-1, 2j+b-1] * g[i,j]
    for a in range(3):
        rows = _row_phase(xp, a, ob)
        taps = _wpairs(rows, W)
        for b in range(3):
            # flatten to 2D before reducing: both the (0,1)
            # multi_reduction and the chained 3D->2D->1D reductions hit
            # Mosaic internal errors (offset "-2" layouts) on this stack;
            # a [rows*Wo, C] sublane reduction is the vanilla form
            prod = taps[b].astype(jnp.float32) * gf
            flat = prod.reshape(prod.shape[0] * prod.shape[1], C)
            dw_ref[0, 0, a, b] = jnp.sum(flat, axis=0).astype(dw_ref.dtype)

    # dx[p,q] = sum_{a,b | p=2i+a-1, q=2j+b-1} w[a,b] * g[i,j]
    # row phases: even p=2i -> only a=1 contributes (from g row i);
    # odd p=2i+1 -> a=0 (g row i+1: the block's halo row) + a=2 (g row
    # i).  Same split for columns (in-range via one column of padding).
    ge = gb[0:ob].astype(jnp.float32)  # g rows i
    gn = gb[1 : ob + 1].astype(jnp.float32)  # g rows i+1
    def col_expand(grow_w, a):
        # grow_w: [ob, Wo+2, C] row-selected, W-padded by 1 output col
        # even q=2j: b=1 -> g col j ; odd q=2j+1: b=0 -> col j+1, b=2 -> col j
        ce = grow_w[:, 1 : 1 + Wo, :] * w[a, 1][None, None, :]
        co = (
            grow_w[:, 2 : 2 + Wo, :] * w[a, 0][None, None, :]
            + grow_w[:, 1 : 1 + Wo, :] * w[a, 2][None, None, :]
        )
        return ce, co

    gep = jnp.pad(ge, ((0, 0), (1, 1), (0, 0)))
    gnp_ = jnp.pad(gn, ((0, 0), (1, 1), (0, 0)))
    ree, reo = col_expand(gep, 1)                      # row-even
    roe0, roo0 = col_expand(gnp_, 0)
    roe2, roo2 = col_expand(gep, 2)
    roe, roo = roe0 + roe2, roo0 + roo2                # row-odd
    # interleave columns: [ob, Wo, 2, C] -> [ob, W, C]
    row_even = jnp.stack([ree, reo], axis=2).reshape(ob, W, C)
    row_odd = jnp.stack([roe, roo], axis=2).reshape(ob, W, C)
    # interleave rows: [ob, 2, W, C] -> [2*ob, W, C]
    dx_ref[0] = (
        jnp.stack([row_even, row_odd], axis=1)
        .reshape(2 * ob, W, C)
        .astype(dx_ref.dtype)
    )


def _pick_ob(H: int, W: int, C: int, itemsize: int):
    """Output row-block for stride 2: input block is 2*ob+2 rows."""
    for ob in range(min(H // 2, _HB_TARGET), 0, -1):
        if (H // 2) % ob == 0 and _block_bytes(
            2 * ob, W, C, itemsize, 3
        ) <= _VMEM_BUDGET_BYTES:
            return ob
    return None


def _fwd_call_s2(x, w, interpret):
    B, H, W, C = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    ob = _require_block(_pick_ob(H, W, C, itemsize), '_fwd_call_s2', x.shape, itemsize)
    halo = pl.BlockSpec(
        (pl.Element(1, (0, 0)), pl.Element(2 * ob + 2, (0, 0)),
         pl.Element(W, (0, 0)), pl.Element(C, (0, 0))),
        lambda b, i: (b, i * 2 * ob, 0, 0),
        memory_space=pltpu.VMEM,
    )
    wspec = pl.BlockSpec((3, 3, C), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM)
    out = pl.BlockSpec(
        (1, ob, W // 2, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _fwd_kernel_s2,
        grid=(B, (H // 2) // ob),
        in_specs=[halo, wspec],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((B, H // 2, W // 2, C), x.dtype),
        interpret=interpret,
        compiler_params=_params(),
    )(_padrows(x), w)


def _bwd_call_s2(x, w, g, interpret):
    B, H, W, C = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    ob = _require_block(_pick_ob(H, W, C, itemsize), '_bwd_call_s2', x.shape, itemsize)
    nB = (H // 2) // ob
    halo = pl.BlockSpec(
        (pl.Element(1, (0, 0)), pl.Element(2 * ob + 2, (0, 0)),
         pl.Element(W, (0, 0)), pl.Element(C, (0, 0))),
        lambda b, i: (b, i * 2 * ob, 0, 0),
        memory_space=pltpu.VMEM,
    )
    wspec = pl.BlockSpec((3, 3, C), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec(
        (
            pl.Element(1, (0, 0)),
            pl.Element(ob + 1, (0, 0)),
            pl.Element(W // 2, (0, 0)),
            pl.Element(C, (0, 0)),
        ),
        lambda b, i: (b, i * ob, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dxspec = pl.BlockSpec(
        (1, 2 * ob, W, C), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
    )
    dwspec = pl.BlockSpec(
        (1, 1, 3, 3, C), lambda b, i: (b, i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    g_p = jnp.pad(g, ((0, 0), (0, 1), (0, 0), (0, 0)))  # real trailing halo row
    dx, dwp = pl.pallas_call(
        _bwd_kernel_s2,
        grid=(B, nB),
        in_specs=[halo, wspec, gspec],
        out_specs=[dxspec, dwspec],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((B, nB, 3, 3, C), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_params(),
    )(_padrows(x), w, g_p)
    return dx, jnp.sum(dwp, axis=(0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dw3x3_s2(x, w, interpret):
    return _fwd_call_s2(x, w, interpret)


def _dw3x3_s2_fwd(x, w, interpret):
    return _fwd_call_s2(x, w, interpret), (x, w)


def _dw3x3_s2_bwd(interpret, res, g):
    x, w = res
    dx, dw = _bwd_call_s2(x, w, g, interpret)
    return dx, dw.astype(w.dtype)


_dw3x3_s2.defvjp(_dw3x3_s2_fwd, _dw3x3_s2_bwd)


def dwconv3x3_eligible(x_shape, dtype, stride: int = 1, compiled: bool = False) -> bool:
    """A feasible row-block height must exist for the given shape.

    ``compiled=True`` (the Mosaic path, not the interpreter): stride-2 is
    EXCLUDED — its fused backward's dw-tap reduction crashes the Mosaic
    compiler on this stack regardless of form (multi_reduction over
    (0,1), chained single-axis, and flattened-2D all fail with an
    internal offset-layout ("-2") error because the phase-split slices
    carry sublane offsets).  The stride-2 kernels stay correct in
    interpreter mode (tests) and ready for a fixed Mosaic."""
    if len(x_shape) != 4:
        return False
    _, H, W, C = x_shape
    itemsize = jnp.dtype(dtype).itemsize
    if stride == 2:
        if compiled:
            return False
        return (
            H % 2 == 0
            and W % 2 == 0
            and _pick_ob(H, W, C, itemsize) is not None
        )
    return _pick_hb(H, W, C, itemsize) is not None


def dwconv3x3(x, kernel, interpret=None, stride: int = 1):
    """Depthwise 3x3, SAME (pad 1), stride 1 or 2 —
    [B,H,W,C] x [3,3,1,C] -> [B,H/s,W/s,C].

    Exact (f32-accumulated) replacement for the grouped-conv form;
    differentiable with the fused backward described in the module
    docstring.  ``interpret=None`` auto-selects interpreter mode off-TPU
    so the same code runs in CPU tests."""
    w = kernel.reshape(3, 3, kernel.shape[-1]).astype(x.dtype)
    if interpret is None:
        interpret = not on_tpu()
    if stride == 2:
        return _dw3x3_s2(x, w, interpret)
    return _dw3x3(x, w, interpret)
