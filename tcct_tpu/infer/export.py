"""Model export / serving artifacts — the ONNX path, the JAX way.

The reference exports opset-11 ONNX with dynamic B/H/W axes and serves it
via onnxruntime's C++ CPU EP (task1/onnx/onnx_save.py:4-15,
onnx_infer.py:14-30).  TPU-native serving wants ahead-of-time compiled
StableHLO instead:

- ``export_model``  — serialize the jitted forward to a portable
  ``jax.export`` artifact (StableHLO bytes).  Dynamic batch is expressed
  with symbolic shapes; H/W stay static per geometry bucket (dynamic
  spatial shapes would defeat TPU tiling — the bucketed predictor in
  tcct_tpu/infer/predictor.py is the serving answer to "dynamic H/W").
- ``load_exported`` — rehydrate and call on any JAX backend.
- ``save_params_npz`` / ``load_params_npz`` — flat-numpy weight exchange
  (the ``.pt``-file analogue, framework-neutral).
"""

from __future__ import annotations

import io
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tcct_tpu.infer.importer import _flatten, _unflatten


def export_model(
    model,
    variables,
    sample_input,
    path: str,
    dynamic_batch: bool = True,
):
    """Serialize ``model.apply(variables, x, train=False)`` to StableHLO."""
    from jax import export as jexport

    def fwd(x):
        pyr, _ = model.apply(variables, x, train=False)
        return pyr[0] if isinstance(pyr, (list, tuple)) else pyr

    if dynamic_batch:
        (b,) = jexport.symbolic_shape("b")
        shape = (b,) + tuple(sample_input.shape[1:])
    else:
        shape = tuple(sample_input.shape)
    spec = jax.ShapeDtypeStruct(shape, sample_input.dtype)
    exported = jexport.export(jax.jit(fwd))(spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_exported(path: str):
    """Load a serialized forward; returns a callable(x) -> logits."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda x: exported.call(x)


def save_params_npz(variables, path: str):
    flat = _flatten(variables)
    np.savez_compressed(
        path, **{"/".join(k): np.asarray(v) for k, v in flat.items()}
    )
    return path


def load_params_npz(path: str):
    data = np.load(path)
    flat = {tuple(k.split("/")): jnp.asarray(data[k]) for k in data.files}
    return _unflatten(flat)
