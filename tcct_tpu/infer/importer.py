"""Torch-checkpoint importer: reference ``.pt`` state dicts -> flax variables.

The flax module tree is named so torch attribute paths translate
mechanically (see tcct_tpu/models/layers.py docstring): numeric
Sequential/ModuleList indices merge into the preceding component
(``stem.0.conv.weight`` -> ``stem_0/conv/kernel``), and matching is done on
separator-stripped normalized names so nesting differences are irrelevant.

Leaf translation by tensor rank:
  4-D weight -> conv ``kernel``  (OIHW -> HWIO)
  2-D weight -> dense ``kernel`` (OI -> IO)
  1-D weight -> norm ``scale``
  running_mean/var -> batch_stats ``mean``/``var``
  num_batches_tracked, training-only extras (``aug.*``, ``fcp.vec_grad``,
  ``fcp.cos_dist``) -> skipped.

The reference loads everything ``strict=False`` (task1/kite/loopback.py:82)
— this importer is the explicit version: it returns a report of matched /
skipped-source / untouched-target keys so parity tests can assert
exactly what was mapped.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _normalize(path: str) -> str:
    return re.sub(r"[._/]", "", path).lower()


def _merge_numeric(key: str) -> str:
    """a.0.b.1.c -> a_0/b_1/c"""
    parts = key.split(".")
    out: List[str] = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = out[-1] + "_" + p
        else:
            out.append(p)
    return "/".join(out)


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    flat = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            flat.update(_flatten(v, prefix + (str(k),)))
    else:
        flat[prefix] = tree
    return flat


def _unflatten(flat: Dict[Tuple[str, ...], Any]):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


@dataclasses.dataclass
class ImportReport:
    matched: List[str]
    skipped_source: List[str]
    untouched_target: List[str]

    def __repr__(self):
        return (
            f"ImportReport(matched={len(self.matched)}, "
            f"skipped_source={len(self.skipped_source)}, "
            f"untouched_target={len(self.untouched_target)})"
        )


_SKIP_PATTERNS = (
    "num_batches_tracked",
    "aug.",
    "fcp.vec_grad",
    "fcp.cos_dist",
    "fcp.ies",
    "fcp.jes",
)


def translate_torch_key(key: str, arr: np.ndarray):
    """-> (collection, normalized_path, transformed_array) or None to skip."""
    for pat in _SKIP_PATTERNS:
        if pat in key:
            return None
    merged = _merge_numeric(key)
    head, _, leaf = merged.rpartition("/")
    if key == "tau":
        return ("params", _normalize("tau"), arr)
    if key == "fcp.buf_grad":
        return ("prototypes", _normalize("fcp_buf_grad"), arr)
    if leaf == "weight":
        if arr.ndim == 4:
            return ("params", _normalize(head + "/kernel"), arr.transpose(2, 3, 1, 0))
        if arr.ndim == 2:
            return ("params", _normalize(head + "/kernel"), arr.transpose(1, 0))
        if arr.ndim == 1:
            return ("params", _normalize(head + "/scale"), arr)
    if leaf == "bias":
        return ("params", _normalize(head + "/bias"), arr)
    if leaf == "running_mean":
        return ("batch_stats", _normalize(head + "/mean"), arr)
    if leaf == "running_var":
        return ("batch_stats", _normalize(head + "/var"), arr)
    return None


def import_torch_state(
    state_dict: Dict[str, np.ndarray], variables, strict_shapes: bool = True
):
    """Map a torch state dict (str -> np.ndarray) onto flax ``variables``.

    Returns (new_variables, ImportReport).
    """
    flat = {}
    norm_index: Dict[Tuple[str, str], Tuple[str, ...]] = {}
    for coll, tree in variables.items():
        f = _flatten(tree, (coll,))
        flat.update(f)
        for path in f:
            nk = (path[0], _normalize("/".join(path[1:])))
            if nk in norm_index:
                raise ValueError(f"normalized name collision: {nk} for {path}")
            norm_index[nk] = path

    matched, skipped = [], []
    touched = set()
    new_flat = dict(flat)
    for key, arr in state_dict.items():
        arr = np.asarray(arr)
        tr = translate_torch_key(key, arr)
        if tr is None:
            skipped.append(key)
            continue
        coll, norm, val = tr
        path = norm_index.get((coll, norm))
        if path is None:
            skipped.append(key)
            continue
        tgt = flat[path]
        if tuple(tgt.shape) != tuple(val.shape):
            if strict_shapes:
                raise ValueError(
                    f"shape mismatch for {key} -> {path}: {val.shape} vs {tgt.shape}"
                )
            skipped.append(key)
            continue
        new_flat[path] = jnp.asarray(val, dtype=tgt.dtype)
        matched.append(key)
        touched.add(path)

    untouched = ["/".join(p) for p in flat if p not in touched]
    report = ImportReport(matched, skipped, untouched)
    return _unflatten(new_flat), report


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``.pt`` checkpoint to numpy (torch-cpu only used as a
    file reader; no torch compute)."""
    import torch

    pt = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(pt, "state_dict"):
        pt = pt.state_dict()
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v) for k, v in pt.items()}


def import_torch_checkpoint(path: str, variables, strict_shapes: bool = True):
    return import_torch_state(load_torch_file(path), variables, strict_shapes)


# ---------------------------------------------------------------------------
# reverse direction: tcct_tpu variables -> torch state_dict
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ExportReport:
    filled: List[str]        # keys written from tcct_tpu variables
    passthrough: List[str]   # training-only keys copied from the skeleton
    missing: List[str]       # skeleton keys with no tcct_tpu counterpart

    def __repr__(self):
        return (
            f"ExportReport(filled={len(self.filled)}, "
            f"passthrough={len(self.passthrough)}, missing={len(self.missing)})"
        )


def export_torch_state(variables, skeleton: Dict[str, np.ndarray]):
    """Inverse of :func:`import_torch_state`: fill a torch state-dict
    skeleton (key -> array, e.g. a reference ``.pt``) from flax variables.

    This closes the interop loop the reference's ONNX path provides
    (task1/onnx/onnx_save.py:4-15): a tcct_tpu-trained model round-trips
    into the reference PyTorch tooling for independent verification.
    Transforms are the exact inverses of the importer's
    (HWIO -> OIHW conv kernels, IO -> OI dense, scale -> 1-D weight).
    Keys the importer skips (``aug.*``, ``num_batches_tracked``, dead fcp
    buffers) are copied through from the skeleton unchanged.

    Returns (state_dict of np.float32 arrays, ExportReport).
    """
    norm_index: Dict[Tuple[str, str], Tuple[str, ...]] = {}
    flat = {}
    for coll, tree in variables.items():
        f = _flatten(tree, (coll,))
        flat.update(f)
        for path in f:
            norm_index[(path[0], _normalize("/".join(path[1:])))] = path

    out: Dict[str, np.ndarray] = {}
    filled, passthrough, missing = [], [], []
    for key, skel in skeleton.items():
        skel = np.asarray(skel)
        tr = translate_torch_key(key, skel)
        if tr is None:
            out[key] = skel
            passthrough.append(key)
            continue
        coll, norm, _ = tr
        path = norm_index.get((coll, norm))
        if path is None and re.search(r"MHCA_layers\.\d+\.c?r?pe\.", key):
            # the reference SHARES cpe/crpe modules across blocks, so each
            # tensor appears under two state-dict keys; fill the
            # per-layer alias from the canonical (block-level) path too —
            # leaving it as skeleton would make load_state_dict's final
            # value depend on module-traversal order
            alt = translate_torch_key(
                re.sub(r"MHCA_layers\.\d+\.(?=c?r?pe\.)", "", key), skel
            )
            if alt is not None:
                path = norm_index.get((alt[0], alt[1]))
        if path is None:
            out[key] = skel
            missing.append(key)
            continue
        val = np.asarray(jax.device_get(flat[path]), np.float32)
        if val.ndim == 4:
            val = val.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif val.ndim == 2 and key.endswith("weight"):
            val = val.transpose(1, 0)  # IO -> OI
        if tuple(val.shape) != tuple(skel.shape):
            raise ValueError(
                f"export shape mismatch for {key}: {val.shape} vs skeleton {skel.shape}"
            )
        out[key] = val
        filled.append(key)
    return out, ExportReport(filled, passthrough, missing)


def export_torch_checkpoint(variables, skeleton_path: str, out_path: str):
    """Export flax ``variables`` to a torch ``.pt`` shaped like
    ``skeleton_path`` (typically the matching reference checkpoint)."""
    import torch

    skeleton = load_torch_file(skeleton_path)
    state, report = export_torch_state(variables, skeleton)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}, out_path)
    return report
