"""Jit-compiled batched volume predictor — replaces the reference's ONNX
export/serve path (task1/onnx/onnx_save.py, onnx_infer.py).

The reference serves one dynamic-shape B-scan at a time through
onnxruntime's CPU EP.  TPU-native serving wants static shapes and big
batches: each dataset geometry defines one compiled bucket
(tcct_tpu/data/geometry.py), whole OCT volumes stream through it in
fixed-size batches (padded on the last partial batch), and the argmax
segmentation is post-processed back to native resolution on the host.

Multi-chip: pass a mesh and batches are sharded over the 'data' axis —
full-volume inference scales linearly over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tcct_tpu.data.eyeset import EyeSet
from tcct_tpu.data.geometry import DatasetGeometry, get_geometry


@dataclasses.dataclass
class VolumePredictor:
    """Static-shape bucketed predictor for one dataset geometry."""

    model: object
    variables: dict
    geo: DatasetGeometry
    batch_size: int = 8
    mesh: Optional[object] = None
    dtype: object = jnp.bfloat16  # serving default: bf16 (HBM-bound model)
    # CNN-branch implementation: 'packed' (space-to-depth exact rewrite,
    # 2.35x faster, serving default for FTC models) or 'plain' (module
    # path, any model).  The experimental fused Pallas block kernel was
    # measured 3-5x slower and retired to attic/crosscnn_fused.py.
    cnn_impl: str = "plain"

    def __post_init__(self):
        from tcct_tpu.train.precision import cast_floating

        @jax.jit
        def _fwd(variables, x_u8):
            # uint8 in, normalize on device: host->device traffic is 4x
            # smaller than shipping f32 (this tunnel environment is
            # transfer-bound; real hosts still save PCIe bandwidth)
            from tcct_tpu.models.layers import feats_gate, packed_heads

            variables = cast_floating(variables, self.dtype)
            x = x_u8.astype(self.dtype or jnp.float32) / 255.0
            kw = {}
            if self.cnn_impl != "plain":
                p = variables["params"]
                s = variables["batch_stats"]
                if "base" in p:  # RegNet wrapper
                    p, s = p["base"], s["base"]
                if self.cnn_impl == "packed":
                    from tcct_tpu.ops.packed_conv import cross_resnet_packed

                    fine, pk = cross_resnet_packed(
                        x, p["base_cnn"], s["base_cnn"], return_packed=True
                    )
                    # (fine, packed) pairs: the FTC tail consumes the
                    # packed skips directly (packed dec4 + 1x1 heads)
                    kw["cnn_feats"] = [(f, q) for f, q in zip(fine, pk)]
                else:
                    raise ValueError(
                        f"unknown cnn_impl {self.cnn_impl!r}; the experimental "
                        "'fused_pallas' kernel lives in attic/crosscnn_fused.py "
                        "(measured 3-5x slower than the XLA conv fusions)"
                    )
            # feats_gate(False): the predictor never reads the polarization
            # feats; gating skips their whole chain at trace time (incl. a
            # full-res unpack of the packed decoder output that the r5 HBM
            # audit caught alive — XLA does not DCE it)
            with packed_heads(self.cnn_impl == "packed"), feats_gate(False):
                pyr, _ = self.model.apply(variables, x, train=False, **kw)
            logits = pyr[0] if isinstance(pyr, (list, tuple)) else pyr
            nc = self.geo.out_channels
            if logits.ndim == 4 and logits.shape[-1] == 4 * nc and logits.shape[1] * 2 == x.shape[1]:
                # main head still in the packed layout: argmax per phase
                # group, ship the CLASS MAP (uint8) in its packed
                # [B,h,w,py,px] order — 1/4 the unpack traffic of fine
                # logits, and the phase interleave happens on the HOST
                # (predict_scans): the device-side u8 transpose+reshape
                # spatialize cost ~0.5 ms/batch of lane-starved copies in
                # the duke serving trace (SERVTRACE_r05 itemization)
                B, h, w, _ = logits.shape
                cls = jnp.argmax(logits.reshape(B, h, w, 2, 2, nc), axis=-1)
                return cls.astype(jnp.uint8)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        self._fwd = _fwd

    def predict_scans(self, imgs_u8: np.ndarray) -> np.ndarray:
        """[N, H, W, 3] uint8 (already geometry-prepped) -> [N, H, W] uint8
        class maps.  N is arbitrary; the last batch is padded to the
        bucket size so only one executable exists per geometry."""
        n = imgs_u8.shape[0]
        bs = self.batch_size
        out = np.zeros(imgs_u8.shape[:3], np.uint8)
        # dispatch every batch asynchronously, fetch afterwards — keeps
        # host<->device transfers overlapped with compute
        pending = []
        for i in range(0, n, bs):
            j = min(i + bs, n)
            chunk = imgs_u8[i:j]
            if j - i < bs:  # pad the tail to the static bucket shape
                pad = np.zeros((bs - (j - i),) + chunk.shape[1:], chunk.dtype)
                chunk = np.concatenate([chunk, pad], 0)
            x = jnp.asarray(chunk)
            if self.mesh is not None:
                from tcct_tpu.parallel import shard_batch

                x = shard_batch(self.mesh, x)
            pending.append((i, j, self._fwd(self.variables, x)))
        for i, j, seg_dev in pending:
            seg = np.asarray(seg_dev)
            if seg.ndim == 5:
                # packed class map [B,h,w,py,px]: spatialize on the host
                # (fine[2y+py, 2x+px] = packed[y,x,py,px]) — a ~1 MB numpy
                # reindex vs ~0.5 ms/batch of device u8 relayout copies
                b, h, w = seg.shape[:3]
                seg = seg.transpose(0, 1, 3, 2, 4).reshape(b, 2 * h, 2 * w)
            out[i:j] = seg[: j - i]
        return out

    def predict_volume(
        self, volume_u8: np.ndarray, eyeset: Optional[EyeSet] = None,
        native_hw: Optional[Tuple[int, int]] = None,
    ) -> np.ndarray:
        """Full volume: prep each B-scan to the geometry bucket, batch
        through the compiled forward, postprocess to native resolution."""
        segs = self.predict_scans(volume_u8)
        if eyeset is not None and native_hw is not None:
            return np.stack([eyeset.postprocess(s, native_hw) for s in segs])
        return segs


def load_predictor(
    db: str,
    pt_path: Optional[str] = None,
    net: str = "stc_tt",
    variant: str = "infer",
    batch_size: int = 8,
    mesh=None,
    cnn_impl: str = "packed",
    mixer: str = "metapool_pallas",  # bit-identical, ~2% faster on-chip
) -> VolumePredictor:
    """Build a predictor for dataset ``db``, optionally importing a
    reference torch checkpoint (the tcct_{db}.pt files)."""
    from tcct_tpu.infer.importer import import_torch_checkpoint
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.utils.cache import enable_compile_cache

    # warm cold starts across processes: the bucket program's remote
    # compile (measured 23 s .. 6+ min) becomes a disk read on the
    # second process (measured 5.5 s end-to-end)
    enable_compile_cache()

    geo = get_geometry(db)
    model = RegNet(
        base=get_model(net, geo.out_channels, variant=variant, mixer=mixer),
        out_channels=geo.out_channels,
    )
    H, W = geo.prep_hw
    x = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    )()
    if pt_path:
        variables, _ = import_torch_checkpoint(pt_path, variables)
    return VolumePredictor(
        model, variables, geo, batch_size=batch_size, mesh=mesh, cnn_impl=cnn_impl
    )
