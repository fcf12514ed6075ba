"""The flagship parity test: shipped reference checkpoints loaded into the
JAX FTC (``variant='infer'``) must reproduce the torch forward pass.

Golden fixtures carry the exact torch outputs for a fixed random input
(tools/make_golden.py::golden_checkpoint_forward).  A single conv stack of
~60 layers accumulates fp32 reassociation noise, so tolerances are loose
in absolute logit terms but the argmax segmentation must match
essentially everywhere.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcct_tpu.infer.importer import import_torch_checkpoint
from tcct_tpu.models import RegNet, get_model

REF_CKPT = "/root/reference/task1/onnx/tcct_{db}.pt"
DBS = [("goals", 5), ("hcms", 9), ("heg", 8), ("duke", 9)]


def _nhwc(x):
    return jnp.asarray(np.moveaxis(x, 1, -1))


@pytest.mark.parametrize("db,nc", DBS)
def test_checkpoint_forward_parity(golden, db, nc):
    path = REF_CKPT.format(db=db)
    if not os.path.exists(path):
        pytest.skip("reference checkpoint unavailable")
    g = golden(f"ckpt_forward_{db}")
    net = RegNet(base=get_model("stc_tt", nc, variant="infer"), out_channels=nc)
    x = _nhwc(g["x"])
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    variables, report = import_torch_checkpoint(path, variables)
    # every conv/bn/dense the forward pass uses must come from the ckpt
    leftovers = [k for k in report.untouched_target if "bn" in k or "kernel" in k]
    assert not leftovers, leftovers[:10]

    ys, feats = jax.jit(lambda v, x: net.apply(v, x, train=False))(variables, x)

    for i, name in enumerate(["y0", "y1", "y2", "y3"]):
        ref = np.moveaxis(g[name], 1, -1)
        ours = np.asarray(ys[i])
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=5e-4)

    # end-to-end segmentation agreement
    seg_ref = np.argmax(np.moveaxis(g["y0"], 1, -1), -1)
    seg_ours = np.argmax(np.asarray(ys[0]), -1)
    agreement = (seg_ref == seg_ours).mean()
    assert agreement > 0.999, agreement

    ref_feat = np.moveaxis(g["feat"], 1, -1)
    np.testing.assert_allclose(np.asarray(feats[0]), ref_feat, rtol=1e-3, atol=5e-4)
