"""Compiled train / eval steps.

One jitted program per step covering: on-device augmentation -> one-hot
-> forward (train-mode BN) -> deep-supervision Dice loss + optional
boundary-regression / polarization / edge-pixel losses -> grads ->
clip(12) -> AdamW -> cyclic LR.  The reference runs these as ~6 separate
CUDA launches + host syncs per batch (task1/kite/loop_seg.py:108-142);
here it is a single XLA executable.

Data parallelism: batches arrive sharded on the ('data',) mesh axis;
state is replicated.  XLA inserts the grad psum and makes BatchNorm's
batch reductions global — so DP training matches single-chip numerics
with a bigger batch.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tcct_tpu.data.augment import train_augment_batch, val_augment_batch
from tcct_tpu.losses.seg import (
    deep_supervision_loss,
    get_loss,
    mdice_scorem,
    mdice_scores,
    miou_scorem,
)
from tcct_tpu.train.precision import cast_floating, to_f32
from tcct_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Loss/step knobs mirroring the reference CLI (task1/kite/main.py:18-49)."""

    loss: str = "di"
    ds: bool = True
    coff_ds: float = 0.5
    udh: bool = False
    coff_udh: float = 1.0
    reg: bool = False
    coff_reg: float = 0.1
    epl: bool = False
    coff_epl: float = 0.1
    crop_hw: Tuple[int, int] = (256, 256)
    n_class: int = 5
    augment: bool = True
    dtype: Any = jnp.float32
    remat: bool = False  # rematerialize the forward in backward (trade
    #                      FLOPs for HBM; useful for big crops / batches)
    remat_policy: Optional[str] = None  # selective remat: with remat=True,
    #                      a jax.checkpoint_policies name ('dots' =
    #                      dots_with_no_batch_dims_saveable, 'dots_saveable',
    #                      'nothing' = full recompute). None = save nothing
    #                      (classic full remat). Measured A/Bs in BACKLOG.
    packed_cnn: bool = False  # space-to-depth CNN branch in training
    #                           (exact rewrite, phase-aware BN stats;
    #                           FTC models, crop divisible by 32)
    pinned_reg_noise: bool = False  # pin the boundary-loss Gumbel noise to
    #                                 its deterministic variant (uniforms =
    #                                 0.5) for cross-framework train-parity
    #                                 experiments
    pinned_gate_noise: bool = False  # draw GateFusion's alpha map from the
    #                                  deterministic cross-framework hash
    #                                  (models/ftc.py::pinned_alpha_nchw)
    #                                  instead of the PRNG — gated-fusion
    #                                  train-parity experiments


def _constrain_data(mesh, *arrays):
    """Pin the leading (batch) axis of each array to the ('data',) mesh axis.

    Runs at trace time (shapes are static under jit).  A batch whose size
    does not divide the mesh passes through replicated (streaming ragged
    tails, eval tail batches); the "training must actually shard" check
    lives in ``Trainer.__init__`` where bs is known.
    """
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    from tcct_tpu.parallel.mesh import data_sharding

    n = mesh.size
    out = []
    for a in arrays:
        if a.shape[0] % n == 0:
            out.append(
                jax.lax.with_sharding_constraint(a, data_sharding(mesh, a.ndim))
            )
        else:
            out.append(a)
    return tuple(out) if len(out) > 1 else out[0]


def build_loss_fn(model, cfg: TrainConfig) -> Callable:
    """The raw training-loss closure (params -> scalar), shared by the
    train step and the gradient-parity experiment
    (tests/test_train_parity.py)."""
    criterion = get_loss(cfg.loss)

    def loss_fn(params, batch_stats, prototypes, img, true_oh, rngs, rng_reg):
        # mixed precision: cast compute copies to cfg.dtype; masters stay
        # f32 and receive f32 grads through the casts
        variables = {
            "params": cast_floating(params, cfg.dtype),
            "batch_stats": cast_floating(batch_stats, cfg.dtype),
            "prototypes": cast_floating(prototypes, cfg.dtype),
        }
        def fwd(variables, img, true_oh):
            cnn_feats = None
            cnn_new_stats = None
            if cfg.packed_cnn:
                from tcct_tpu.ops.packed_conv import cross_resnet_packed_train

                # exact space-to-depth rewrite of the CNN branch; grads
                # flow to the same params, BN stats EMA-updated from the
                # f32 masters.  Skips are handed to FTC as (fine, packed)
                # pairs so the fusion/decoder consumes the packed form
                # without round trips (XLA DCEs the unused fine unpacks).
                fine, cnn_new_stats, packed = cross_resnet_packed_train(
                    img,
                    variables["params"]["base"]["base_cnn"],
                    batch_stats["base"]["base_cnn"],
                    return_packed=True,
                )
                cnn_feats = [(f, p) for f, p in zip(fine, packed)]
            out, updates = model.apply(
                variables,
                img,
                true_oh,
                rng_reg=rng_reg,
                train=True,
                use_udh=cfg.udh,
                use_reg=cfg.reg,
                use_epl=cfg.epl,
                cnn_feats=cnn_feats,
                method=type(model).forward_with_losses,
                mutable=["batch_stats"],
                rngs=rngs,
            )
            if cnn_new_stats is not None:
                bs = dict(updates.get("batch_stats", batch_stats))
                base = dict(bs["base"])
                base["base_cnn"] = cnn_new_stats
                bs["base"] = base
                updates = {**updates, "batch_stats": bs}
            return out, updates

        if cfg.remat:
            if cfg.remat_policy in (None, "nothing"):
                fwd = jax.checkpoint(fwd)
            else:
                pol = {
                    "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    "dots_saveable": jax.checkpoint_policies.dots_saveable,
                }[cfg.remat_policy]
                fwd = jax.checkpoint(fwd, policy=pol)
        from tcct_tpu.models.ftc import pinned_gate
        from tcct_tpu.models.layers import feats_gate, packed_convs, packed_heads
        from tcct_tpu.ops.resize import resize_impl

        # trace-time lowering choices: gather-form resizes differentiate
        # much faster than the matmul form (see ops/resize.py); with
        # packed_cnn the small-channel decoder/aux convs also lower to the
        # exact space-to-depth form (models/layers.py::MaybePackedConv);
        # feats (norm_add) are only traced when the polarization loss
        # consumes them (XLA does not DCE the chain through scan+jvp)
        with resize_impl("gather"), packed_convs(cfg.packed_cnn), packed_heads(
            cfg.packed_cnn
        ), pinned_gate(cfg.pinned_gate_noise), feats_gate(cfg.udh):
            (pyr, feats, aux), updates = fwd(variables, img, true_oh)
        pyr = [to_f32(p) for p in pyr]
        aux = to_f32(aux)
        true0 = None
        p0 = pyr[0]
        if (
            cfg.packed_cnn
            and p0.ndim == 4
            and p0.shape[-1] == 4 * cfg.n_class
            and p0.shape[1] * 2 == true_oh.shape[1]
        ):
            # main head arrives PACKED: group phases next to classes and
            # build the phase-grouped one-hot — dice sums over pixels are
            # permutation-invariant, so this is the fine loss reassociated,
            # with no full-res unpack in the graph
            from tcct_tpu.ops.packed_conv import pack_nhwc

            B, h, w, _ = p0.shape
            pyr = [p0.reshape(B, h, w, 4, cfg.n_class)] + pyr[1:]
            true0 = pack_nhwc(true_oh).reshape(B, h, w, 4, cfg.n_class)
        los = deep_supervision_loss(
            pyr, true_oh, criterion, ds=cfg.ds, coff_ds=cfg.coff_ds, true0=true0
        )
        metrics = {"los": los}
        if cfg.udh:
            metrics["udh"] = aux["udh"]
            los = los + aux["udh"] * cfg.coff_udh
        if cfg.reg:
            metrics["reg"] = aux["reg"]
            los = los + aux["reg"] * cfg.coff_reg
        if cfg.epl:
            metrics["epl"] = aux["epl"]
            los = los + aux["epl"] * cfg.coff_epl
        metrics["total"] = los
        new_bs = to_f32(updates.get("batch_stats", batch_stats))
        return los, (new_bs, metrics)

    return loss_fn


def build_train_step(
    model, optimizer, cfg: TrainConfig, jit: bool = True, mesh=None
) -> Callable:
    loss_fn = build_loss_fn(model, cfg)

    def train_step(state: TrainState, imgs_u8, labs_u8):
        # non-strict: a ragged tail batch (streaming epochs) runs replicated;
        # batch-size/mesh compatibility is validated at Trainer init
        imgs_u8, labs_u8 = _constrain_data(mesh, imgs_u8, labs_u8)
        k_aug, k_gate, k_dp, k_reg, k_next = jax.random.split(
            jax.random.fold_in(state.rng, state.step), 5
        )
        if cfg.augment:
            img, lab = train_augment_batch(imgs_u8, labs_u8, k_aug, cfg.crop_hw)
        else:
            img = imgs_u8.astype(jnp.float32) / 255.0
            lab = labs_u8.astype(jnp.int32)
        img = img.astype(cfg.dtype)
        true_oh = jax.nn.one_hot(lab, cfg.n_class, dtype=jnp.float32)

        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params,
            state.batch_stats,
            state.prototypes,
            img,
            true_oh,
            {"gate": k_gate, "droppath": k_dp},
            None if cfg.pinned_reg_noise else k_reg,
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, metrics

    return jax.jit(train_step) if jit else train_step


def build_train_epoch(model, optimizer, cfg: TrainConfig, mesh=None) -> Callable:
    """Whole-epoch training as ONE compiled program: ``lax.scan`` over the
    per-epoch shuffled index plan, gathering batches from the
    device-resident dataset.  Against the reference's per-batch
    DataLoader-fork + H2D + multi-launch loop (loop_seg.py:108-142), an
    epoch is a single XLA executable with zero host round-trips.

    With ``mesh``, the gathered batch is pinned to the ('data',) axis
    inside the scan body, so the compute is data-parallel while the
    dataset/state stay replicated (grads psum'd by XLA)."""
    step = build_train_step(model, optimizer, cfg, jit=False, mesh=mesh)
    # TCCT_EPOCH_UNROLL>1 unrolls the scan body (XLA may pipeline across
    # step boundaries at the cost of program size) — an A/B knob for the
    # per-op dispatch tax the r5 audit quantified (~1.3 us x ~3k ops/step)
    import os

    unroll = int(os.environ.get("TCCT_EPOCH_UNROLL", "1"))

    @jax.jit
    def train_epoch(state: TrainState, imgs_u8, labs_u8, idx_plan):
        def body(st, bi):
            st, metrics = step(
                st, jnp.take(imgs_u8, bi, 0), jnp.take(labs_u8, bi, 0)
            )
            # full metrics dict (total/los/udh/reg/epl) stacks through the
            # scan — every active loss term is observable from the fast
            # path, matching the reference's per-batch postfix
            # (task1/kite/loop_seg.py:133)
            return st, metrics

        state, metrics = jax.lax.scan(body, state, idx_plan, unroll=unroll)
        return state, metrics

    return train_epoch


def build_eval_step(
    model, cfg: TrainConfig, stochastic_val: bool = True, mesh=None
) -> Callable:
    """Jitted val pass: (stochastically flipped, per the reference's
    ALB_VALID quirk) forward -> argmax one-hot -> per-class Dice/IoU.
    Metric math matches task1/kite/losses/miou.py statics.  With ``mesh``,
    divisible batches are sharded over ('data',); ragged tails run
    replicated."""

    @partial(jax.jit, static_argnames=())
    def eval_step(state: TrainState, imgs_u8, labs_u8, key):
        imgs_u8, labs_u8 = _constrain_data(mesh, imgs_u8, labs_u8)
        img, lab = val_augment_batch(imgs_u8, labs_u8, key, stochastic=stochastic_val)
        true_oh = jax.nn.one_hot(lab, cfg.n_class, dtype=jnp.float32)
        variables = cast_floating(state.variables(), cfg.dtype)
        pyr, _ = model.apply(variables, img.astype(cfg.dtype), train=False)
        logits = pyr[0] if isinstance(pyr, (list, tuple)) else pyr
        logits = logits.astype(jnp.float32)
        pred_oh = jax.nn.one_hot(jnp.argmax(jax.nn.softmax(logits, -1), -1), cfg.n_class)
        return {
            "val_f1s": mdice_scorem(pred_oh, true_oh, start_idx=1),
            "val_iou": miou_scorem(pred_oh, true_oh, start_idx=1),
            "scores": mdice_scores(pred_oh, true_oh),
        }

    return eval_step


def build_eval_epoch(
    model, cfg: TrainConfig, stochastic_val: bool = True, mesh=None
) -> Callable:
    """The WHOLE val pass as one compiled program: ``lax.scan`` at bs=1
    over the device-resident split, metrics accumulated on device.

    Per-scan math (flip keys, argmax one-hot, per-class Dice/IoU) is
    identical to :func:`build_eval_step`'s host loop — same
    ``fold_in(key, i)`` sequence, same bs=1 statistics — but the up-to-256
    per-scan dispatches (+2 ``float()`` syncs each, ~2.4 ms apiece on the
    axon tunnel) collapse into ONE dispatch and one device_get.  The
    reference's val loop is a bs=1 DataLoader with per-batch host syncs
    (task1/kite/loop_seg.py:66-106, octgen.py:84-86)."""

    @jax.jit
    def eval_epoch(state: TrainState, imgs_u8, labs_u8, key):
        variables = cast_floating(state.variables(), cfg.dtype)

        def body(_, i):
            img_u8 = jax.lax.dynamic_index_in_dim(imgs_u8, i, 0, keepdims=True)
            lab_u8 = jax.lax.dynamic_index_in_dim(labs_u8, i, 0, keepdims=True)
            img, lab = val_augment_batch(
                img_u8, lab_u8, jax.random.fold_in(key, i), stochastic=stochastic_val
            )
            true_oh = jax.nn.one_hot(lab, cfg.n_class, dtype=jnp.float32)
            pyr, _ = model.apply(variables, img.astype(cfg.dtype), train=False)
            logits = pyr[0] if isinstance(pyr, (list, tuple)) else pyr
            logits = logits.astype(jnp.float32)
            pred_oh = jax.nn.one_hot(
                jnp.argmax(jax.nn.softmax(logits, -1), -1), cfg.n_class
            )
            return None, {
                "val_f1s": mdice_scorem(pred_oh, true_oh, start_idx=1),
                "val_iou": miou_scorem(pred_oh, true_oh, start_idx=1),
                "scores": mdice_scores(pred_oh, true_oh),
            }

        _, ms = jax.lax.scan(body, None, jnp.arange(imgs_u8.shape[0]))
        return {
            "val_f1s": jnp.mean(ms["val_f1s"]),
            "val_iou": jnp.mean(ms["val_iou"]),
            "scores": jnp.mean(ms["scores"], axis=0),
        }

    return eval_epoch


def build_predict(model, n_class: int) -> Callable:
    """Jitted predictor: softmax->argmax->one-hot (loop_seg.py:21-33)."""

    @jax.jit
    def predict(variables, img):
        pyr, _ = model.apply(variables, img, train=False)
        logits = pyr[0] if isinstance(pyr, (list, tuple)) else pyr
        return jax.nn.one_hot(jnp.argmax(jax.nn.softmax(logits, -1), -1), n_class)

    return predict
