"""Golden tests: resize / pooling ops vs torch (fixtures from
tools/make_golden.py)."""

import jax.numpy as jnp
import numpy as np

from tcct_tpu.ops import (
    metapool_tokens,
    resize_bicubic,
    resize_bilinear,
)


def test_bilinear_align_corners_true(golden):
    g = golden("ops")
    out = resize_bilinear(jnp.asarray(g["x"]), (14, 18), align_corners=True)
    np.testing.assert_allclose(out, g["up_t"], rtol=1e-5, atol=1e-5)


def test_bilinear_align_corners_false(golden):
    g = golden("ops")
    out = resize_bilinear(jnp.asarray(g["x"]), (13, 20), align_corners=False)
    np.testing.assert_allclose(out, g["up_f"], rtol=1e-5, atol=1e-5)


def test_bilinear_downsample(golden):
    g = golden("ops")
    out = resize_bilinear(jnp.asarray(g["x"]), (4, 5), align_corners=False)
    np.testing.assert_allclose(out, g["dn_f"], rtol=1e-5, atol=1e-5)


def test_bicubic(golden):
    g = golden("ops")
    out = resize_bicubic(jnp.asarray(g["x"]), (21, 27), align_corners=False)
    np.testing.assert_allclose(out, g["cub"], rtol=1e-4, atol=1e-4)


def test_metapool_tokens(golden):
    g = golden("ops")
    out = metapool_tokens(jnp.asarray(g["tok"]))
    np.testing.assert_allclose(out, g["meta"], rtol=1e-5, atol=1e-5)


def test_metapool_fast_lowering_matches_reference():
    """The MXU-lowered metapool (shift-adds + tridiag matmul) must match
    the reduce_window reference formulation to reassociation noise."""
    from tcct_tpu.ops.pool import metapool_tokens, metapool_tokens_reference

    rng = np.random.default_rng(7)
    for shape in [(2, 196, 64), (1, 5, 3), (3, 64, 96), (2, 1024, 160)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(metapool_tokens(x)),
            np.asarray(metapool_tokens_reference(x)),
            atol=2e-6,
        )
