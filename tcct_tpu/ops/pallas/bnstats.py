"""Pallas TPU fused BN-stats epilogue for the packed training path.

VERDICT r4 item 7 (stretch): FLOOR_r05.md itemizes the train step's
2.97 ms "loop fusion" bucket as BN statistics + elementwise passes,
fragmentation-bound (~1.27 us dispatch tax per sub-0.5 MB HLO exec).
This kernel fuses, per packed BN site
(ops/packed_conv.py::_bn_train_packed preceded by ``_lrelu``), the
activation, the phantom masking, the per-packed-channel sum/sumsq
reduction, the phase fold, and the normalize into TWO pallas launches:

  1. stats sweep: grid over batch, accumulating masked sum / sum-of-
     squares per PACKED channel ([4C] f32) into resident output blocks;
  2. normalize sweep: folds the phase groups with one (1,4C)x(4C,4C)
     MXU matmul against a constant phase-selection matrix (lane-split
     reshapes and lane-misaligned concats are documented Mosaic
     landmines - CLAUDE.md), then writes act(x)*inv + shift.

HBM traffic is IDENTICAL to the XLA lowering (2 reads + 1 write of the
activation - the statistics pass is inherently a separate sweep); the
hypothesis under test is purely the dispatch tax of the ~10 XLA
fragments each site otherwise emits.  The backward is plain-jnp
analytic BN+LReLU adjoints (custom_vjp) - the same reductions XLA's
autodiff emits, so training cost outside the fused forward is
unchanged.

Reference semantics: BatchNorm2d train mode, eps 1e-5, LeakyReLU(0.01)
(/root/reference/task1/nets/tcct.py:55-97 and the CrossResNet blocks at
tcct.py:149-213); packed-layout statistics mirror _bn_train_packed
exactly (fine-channel element set, phantom-masked, reassociated).

STATUS: MEASURED ON CHIP AND REJECTED (tools/bench_r5.py ``pbn`` vs the
``gelu`` control, v5e: 25.54 vs 18.61 ms/step).  The dispatch-tax
hypothesis was wrong-signed: replacing the XLA fragments with opaque
pallas calls breaks XLA's conv-epilogue fusion around every BN site and
the forced materializations cost ~7 ms/step.  Gated OFF by default;
TCCT_PALLAS_BN=1 (or packed_conv.set_pallas_bn(True)) arms it for
re-measurement on future stacks.  Numbers in BACKLOG.md / FLOOR_r05.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# largest per-grid-step activation block this kernel accepts (the
# training shapes top out at [1,129,129,128] bf16 = 4.3 MB; the f32
# temporaries are ~6x that, within the 64 MiB scoped-vmem cap proven
# viable on this chip by ops/pallas/dwconv.py)
_BLOCK_BUDGET_BYTES = 6 * 1024 * 1024
_VMEM_LIMIT = 64 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _fold_matrix_np(C: int):
    """[4C,4C] constant P with P[i,j] = (i % C == j % C): (s @ P)[j]
    sums s over the 4 phase groups of fine channel j%C, i.e. phase-fold
    AND re-tile in one MXU contraction."""
    i = np.arange(4 * C)
    return (np.equal.outer(i % C, i % C)).astype(np.float32)


def _act(x, leaky: bool):
    # max form, not where: Mosaic rejects bf16 vector compares ("Target
    # does not support this comparison").  Bitwise-equal to
    # where(x >= 0, x, 0.01x): 0.01x can't cross x under rounding.
    return jnp.maximum(x, x * jnp.asarray(0.01, x.dtype)) if leaky else x


def _stats_kernel(x_ref, mr_ref, mc_ref, s1_ref, s2_ref, *, leaky, masked):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    t = _act(x_ref[0], leaky)  # [S1,S2,C4], input dtype (matches XLA path)
    if masked:
        t = t * mr_ref[...][:, None, :].astype(t.dtype)
        t = t * mc_ref[...][None, :, :].astype(t.dtype)
    tf = t.astype(jnp.float32)
    # chained single-axis reductions (multi-axis reduces are a Mosaic
    # landmine on this stack - see ops/pallas/dwconv.py's backward)
    s1_ref[...] += jnp.sum(jnp.sum(tf, axis=0), axis=0, keepdims=True)
    s2_ref[...] += jnp.sum(jnp.sum(tf * tf, axis=0), axis=0, keepdims=True)


def _norm_kernel(
    x_ref, s1_ref, s2_ref, g4_ref, b4_ref, p_ref, o_ref, *, leaky, n, eps
):
    # fold + re-tile the phase groups on the MXU: (1,4C) @ (4C,4C)
    mean4 = jnp.dot(s1_ref[...], p_ref[...], preferred_element_type=jnp.float32) / n
    e2 = jnp.dot(s2_ref[...], p_ref[...], preferred_element_type=jnp.float32) / n
    var4 = e2 - mean4 * mean4
    inv4 = g4_ref[...] * jax.lax.rsqrt(var4 + eps)
    shift4 = b4_ref[...] - mean4 * inv4
    t = _act(x_ref[0], leaky)
    dt = o_ref.dtype
    # same rounding structure as the XLA path: f32 inv/shift cast to the
    # activation dtype, multiply-add in that dtype
    o_ref[0] = t * inv4.reshape(1, 1, -1).astype(dt) + shift4.reshape(
        1, 1, -1
    ).astype(dt)


def _run_fwd(xp, scale, bias, align, leaky, eps, interpret):
    from tcct_tpu.ops.packed_conv import _phantom_masks_np, tile4

    B, S1, S2, C4 = xp.shape
    C = C4 // 4
    n = B * 2 * (S1 - align[0]) * 2 * (S2 - align[1])
    masked = bool(align[0] or align[1])
    mr, mc = _phantom_masks_np(S1, S2, C, align)
    mr = jnp.asarray(mr if mr is not None else np.ones((S1, C4), np.float32))
    mc = jnp.asarray(mc if mc is not None else np.ones((S2, C4), np.float32))

    cp = pltpu.CompilerParams(
        dimension_semantics=("arbitrary",), vmem_limit_bytes=_VMEM_LIMIT
    )
    vec = lambda s: pl.BlockSpec((1, C4), lambda b: (0, 0), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec(
        (1, S1, S2, C4), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
    )
    s1, s2 = pl.pallas_call(
        functools.partial(_stats_kernel, leaky=leaky, masked=masked),
        grid=(B,),
        in_specs=[
            xspec,
            pl.BlockSpec((S1, C4), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S2, C4), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[vec("s1"), vec("s2")],
        out_shape=[
            jax.ShapeDtypeStruct((1, C4), jnp.float32),
            jax.ShapeDtypeStruct((1, C4), jnp.float32),
        ],
        compiler_params=cp,
        interpret=interpret,
    )(xp, mr, mc)

    g4 = tile4(scale.astype(jnp.float32)).reshape(1, C4)
    b4 = tile4(bias.astype(jnp.float32)).reshape(1, C4)
    P = jnp.asarray(_fold_matrix_np(C))
    y = pl.pallas_call(
        functools.partial(_norm_kernel, leaky=leaky, n=float(n), eps=eps),
        grid=(B,),
        in_specs=[xspec, vec("s1"), vec("s2"), vec("g"), vec("b"),
                  pl.BlockSpec((C4, C4), lambda b: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",), vmem_limit_bytes=_VMEM_LIMIT
        ),
        interpret=interpret,
    )(xp, s1, s2, g4, b4, P)

    # fine-channel mean/var for the EMA (tiny [C] vector math)
    s1f = jnp.sum(s1.reshape(4, C), axis=0)
    s2f = jnp.sum(s2.reshape(4, C), axis=0)
    mean = s1f / n
    var = s2f / n - mean * mean
    return y, mean, var, (s1, s2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _bn_act_pallas(xp, scale, bias, align, leaky, eps, interpret):
    y, mean, var, _ = _run_fwd(xp, scale, bias, align, leaky, eps, interpret)
    return y, mean, var


def _fwd(xp, scale, bias, align, leaky, eps, interpret):
    y, mean, var, (s1, s2) = _run_fwd(xp, scale, bias, align, leaky, eps, interpret)
    return (y, mean, var), (xp, scale, s1, s2)


def _bwd(align, leaky, eps, interpret, res, cts):
    """Analytic adjoint of y = BN_packed(act(x)); plain jnp (the same
    reductions XLA autodiff emits for the unfused form)."""
    from tcct_tpu.ops.packed_conv import mask_phantoms, tile4

    gy, gmean_in, gvar_in = cts
    xp, scale, s1, s2 = res
    B, S1, S2, C4 = xp.shape
    C = C4 // 4
    n = float(B * 2 * (S1 - align[0]) * 2 * (S2 - align[1]))
    fold = lambda v: jnp.sum(v.reshape(4, C), axis=0)

    t = _act(xp, leaky)
    mean_f = fold(s1[0]) / n
    var_f = fold(s2[0]) / n - mean_f * mean_f
    r_f = jax.lax.rsqrt(var_f + eps)
    inv_f = scale.astype(jnp.float32) * r_f
    mean4 = tile4(mean_f)
    inv4 = tile4(inv_f)

    gyf = gy.astype(jnp.float32)
    gsum4 = jnp.sum(gyf, axis=(0, 1, 2))                       # d(shift4)
    wsum4 = jnp.sum(gyf * t.astype(jnp.float32), axis=(0, 1, 2))
    ginv_f = fold(wsum4) - mean_f * fold(gsum4)                # d(inv) per fine ch
    dscale = ginv_f * r_f
    dbias = fold(gsum4)

    gvar_f = ginv_f * (-0.5) * scale.astype(jnp.float32) * r_f**3
    if gvar_in is not None:
        gvar_f = gvar_f + gvar_in.astype(jnp.float32)
    gmean_f = -inv_f * fold(gsum4) - 2.0 * mean_f * gvar_f
    if gmean_in is not None:
        gmean_f = gmean_f + gmean_in.astype(jnp.float32)

    # through the masked statistics: mean = fold(sum tm)/n, e2 = fold(sum tm^2)/n
    dtm = tile4(gmean_f / n) + tile4(gvar_f / n) * 2.0 * t.astype(jnp.float32)
    dtm = mask_phantoms(dtm, align)
    dt = gyf * inv4 + dtm
    if leaky:
        dt = dt * jnp.where(xp >= 0, 1.0, 0.01)
    return dt.astype(xp.dtype), dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_bn_act_pallas.defvjp(_fwd, _bwd)


def bn_act_train_packed_pallas(xp, scale, bias, align=(0, 0), leaky=False,
                               eps: float = 1e-5, interpret=None):
    """Fused act(+LeakyReLU)+BN train forward on the packed layout.
    Returns (y, fine mean [C], fine var [C]); numerics match
    ``_bn_train_packed(_lrelu(xp), ...)`` up to reassociation.
    Differentiable in (xp, scale, bias).  Returns None when the shape
    exceeds the per-block VMEM budget (caller falls back to XLA)."""
    B, S1, S2, C4 = xp.shape
    if C4 % 4 or C4 % 128 or S1 * S2 * C4 * xp.dtype.itemsize > _BLOCK_BUDGET_BYTES:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _bn_act_pallas(
        xp, scale, bias, tuple(align), bool(leaky), float(eps), bool(interpret)
    )
