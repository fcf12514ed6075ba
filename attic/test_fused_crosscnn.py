"""Fused Pallas CrossCNNBlock / CrossResNet vs the flax modules
(interpret mode on CPU; exactness also holds compiled on TPU — verified
against the torch goldens through the full FTC).

Retired to attic/ with the kernel (measured 3-5x slower than XLA's conv
fusions — see crosscnn_fused.py docstring).  Run standalone from the
repo root: python -m pytest attic/test_fused_crosscnn.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_platforms", "cpu")

from tcct_tpu.models.crosscnn import CrossCNNBlock, CrossResNet
from crosscnn_fused import cross_resnet_fused, fused_cross_block


def _rand_stats(stats, rng):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape).astype(np.float32)) ** 2 + 0.5,
        stats,
    )


@pytest.mark.parametrize("ksize,tile", [(13, 32), (9, 32), (5, 16)])
def test_fused_block_matches_module(ksize, tile):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 32)).astype(np.float32))
    blk = CrossCNNBlock(32, ksize=ksize)
    v = blk.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    bs = _rand_stats(v["batch_stats"], rng)
    ref = blk.apply({"params": v["params"], "batch_stats": bs}, x, train=False)
    got = fused_cross_block(x, v["params"], bs, tile=tile, interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-4, atol=1e-4)


def test_fused_block_channel_change():
    # non-tiny blocks change channel count (32 -> 64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 32)).astype(np.float32))
    blk = CrossCNNBlock(64, ksize=11)
    v = blk.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    ref = blk.apply(v, x, train=False)
    got = fused_cross_block(x, v["params"], v["batch_stats"], tile=32, interpret=True)
    assert got.shape == (1, 32, 32, 64)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-4, atol=1e-4)


def test_fused_cross_resnet_pyramid():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 64, 128, 3)).astype(np.float32))
    net = CrossResNet(tiny=True)
    v = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    bs = _rand_stats(v["batch_stats"], rng)
    refs = net.apply({"params": v["params"], "batch_stats": bs}, x, train=False)
    gots = cross_resnet_fused(x, v["params"], bs, interpret=True)
    assert len(gots) == 5
    # accumulation-order divergence compounds through the 5-block chain
    # (measured: 2.6e-5 at level 0 -> 9.8e-4 at level 4)
    for r, g in zip(refs, gots):
        assert r.shape == g.shape
        np.testing.assert_allclose(np.asarray(r), np.asarray(g), rtol=2e-3, atol=2e-3)
