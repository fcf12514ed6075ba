"""RegNet wrapper: base model + the paper's two auxiliary losses.

Reference task1/nets/reg.py.  The wrapper owns:

- ``lap_reg``  — learned grouped-conv Laplacian for the boundary-regression
  loss (reg.py:65-70; the shipped checkpoints carry a 3-conv variant, the
  published code a 2-conv one — depth is a config knob).
- ``lap_map``  — 1-channel smoothing head, note the reference's quirky
  ``nn.BatchNorm2d(1, 1)`` = BN with eps=1.0 (reg.py:71-76).
- ``lap_epl``  — edge-pixel head (reg.py:58-63, unused in the published
  loop; wired to a working ``regular_epl`` here — the reference's
  ``--epl`` flag crashes, SURVEY §2.3.3).
- ``fcp`` prototypes — fixed per-class unit vectors (nets/fcp.py); stored
  in a non-trainable ``prototypes`` collection.
- ``tau``      — learnable scalar (reg.py:77), kept for parity.

Loss math lives in tcct_tpu/losses/{boundary,polar}.py; this module binds
the learned convs/prototypes and is invoked with
``module.apply(vars, ..., method='regular_reg')`` etc.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tcct_tpu.losses.boundary import boundary_regression_loss
from tcct_tpu.losses.polar import feature_polarization_loss, polar_prototypes
from tcct_tpu.models.layers import ShiftConv3x3, batchnorm, conv2d


class RegNet(nn.Module):
    base: nn.Module
    out_channels: int = 5
    con: str = "cos"
    num_emb: int = 32
    lap_reg_depth: int = 2

    def setup(self):
        nc = self.out_channels
        self.lap_epl_0 = conv2d(1, 3, 1, 1, name="lap_epl_0")
        self.lap_epl_1 = conv2d(1, 3, 1, 1, name="lap_epl_1")
        dim_reg = nc - 1
        # depthwise 3x3s expressed as shifted FMAs — see ShiftConv3x3 for
        # why (XLA TPU space_to_batch backprop-filter compiler bug).
        self.lap_regs = [
            ShiftConv3x3(dim_reg, name=f"lap_reg_{i}")
            for i in range(self.lap_reg_depth)
        ]
        self.lap_map_0 = ShiftConv3x3(1, name="lap_map_0")
        self.lap_map_1 = batchnorm(name="lap_map_1", epsilon=1.0)
        self.lap_map_2 = ShiftConv3x3(1, name="lap_map_2")
        self.tau = self.param("tau", nn.initializers.constant(100.0), (1,))
        self.fcp_buf = self.variable(
            "prototypes",
            "fcp_buf_grad",
            lambda: polar_prototypes(jax.random.PRNGKey(0), nc, self.num_emb),
        )

    def __call__(self, x, train: bool = False, **kw):
        return self.base(x, train=train, **kw)

    # -- bound conv applications -------------------------------------------

    def _lap_reg(self, x):
        for conv in self.lap_regs:
            x = conv(x)
        return x

    def _lap_map(self, x, train: bool):
        x = self.lap_map_0(x)
        x = self.lap_map_1(x, use_running_average=not train)
        x = self.lap_map_2(x)
        return jax.nn.sigmoid(x)

    def _lap_epl(self, x):
        x = self.lap_epl_0(x)
        x = self.lap_epl_1(x)
        return jax.nn.sigmoid(x)

    # -- auxiliary losses ----------------------------------------------------

    def regular_reg(self, pred, true, rng=None, train: bool = False):
        """Boundary-regression loss (reference reg.py:109-156)."""
        return boundary_regression_loss(
            pred,
            true,
            lap_reg=self._lap_reg,
            lap_map=lambda x: self._lap_map(x, train),
            rng=rng,
        )

    def regular_udh(self, feats, pred, true):
        """Feature-polarization loss (reference reg.py:86-105)."""
        return feature_polarization_loss(
            feats, pred, true, self.fcp_buf.value, con=self.con
        )

    def forward_with_losses(
        self,
        x,
        true,
        rng_reg=None,
        train: bool = True,
        use_udh: bool = False,
        use_reg: bool = False,
        use_epl: bool = False,
        cnn_feats=None,
    ):
        """Single-apply forward + auxiliary losses (one traced graph, so
        XLA fuses everything into the train step — the reference's
        separate calc_loss round-trips, loop_seg.py:146-171, collapse).

        ``cnn_feats``: externally computed CNN pyramid (e.g. the packed
        space-to-depth path) injected into an FTC base."""
        kw = {"cnn_feats": cnn_feats} if cnn_feats is not None else {}
        pyr, feats = self.base(x, train=train, **kw)
        # under packed_heads() the main head arrives in the packed
        # space-to-depth layout; the spatial aux losses need the fine
        # form (XLA DCEs this unpack when none of them is enabled)
        p0 = pyr[0]
        from tcct_tpu.models.layers import packed_heads_active

        if packed_heads_active() and p0.shape[-1] == 4 * self.out_channels:
            from tcct_tpu.ops.packed_conv import unpack_nhwc

            p0 = unpack_nhwc(p0)
        aux = {}
        if use_udh:
            aux["udh"] = self.regular_udh(feats, p0, true)
        if use_reg:
            aux["reg"] = self.regular_reg(p0, true, rng=rng_reg, train=train)
        if use_epl:
            aux["epl"] = self.regular_epl(p0, true)
        return pyr, feats, aux

    def init_loss_heads(self, pred, true):
        """Materialize every auxiliary-loss parameter (flax creates params
        lazily on first call; use this as the init method when importing a
        full reference checkpoint)."""
        a = self.regular_reg(pred, true, rng=None, train=False)
        b = self.regular_epl(pred, true)
        return a + b

    def regular_epl(self, pred, true):
        """Edge-pixel loss: lap_epl(softmax(pred)) vs the GT boundary map.

        The reference's ``--epl`` path calls a method that does not exist
        (loop_seg.py:166-169 -> AttributeError); this is the working
        implementation of the evident intent.
        """
        prob = jax.nn.softmax(pred, axis=-1)
        edge_pred = self._lap_epl(prob)
        t = true.astype(jnp.float32)[..., 1:]
        d = jnp.abs(t[:, 1:] - t[:, :-1])
        d = jnp.pad(d, ((0, 0), (1, 0), (0, 0), (0, 0)))
        edge_true = jnp.clip(jnp.sum(d, axis=-1, keepdims=True), 0.0, 1.0)
        return jnp.mean((edge_pred - edge_true) ** 2)
