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
