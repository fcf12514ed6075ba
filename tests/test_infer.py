"""Volume predictor + export round trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcct_tpu.data import EyeSet
from tcct_tpu.infer.export import (
    export_model,
    load_exported,
    load_params_npz,
    save_params_npz,
)
from tcct_tpu.infer.predictor import VolumePredictor
from tcct_tpu.models import RegNet, get_model


@pytest.fixture(scope="module")
def small_net():
    net = RegNet(base=get_model("relay", 5), out_channels=5)
    x = jnp.zeros((1, 64, 64, 3))
    v = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return net, v


def test_volume_predictor_padding(small_net):
    from tcct_tpu.data.geometry import DatasetGeometry

    net, v = small_net
    geo = DatasetGeometry("tiny", 5, 0, 64, "resize", (64, 64))
    pred = VolumePredictor(net, v, geo, batch_size=4, dtype=jnp.float32)
    vol = np.random.default_rng(0).integers(0, 255, (6, 64, 64, 3), dtype=np.uint8)
    seg = pred.predict_scans(vol)  # 6 scans through a bs=4 bucket (pad tail)
    assert seg.shape == (6, 64, 64)
    assert seg.dtype == np.uint8
    # same scans, different batching -> same result (padding is inert)
    pred1 = VolumePredictor(net, v, geo, batch_size=6, dtype=jnp.float32)
    np.testing.assert_array_equal(seg, pred1.predict_scans(vol))


def test_packed_predictor_matches_plain():
    """The serving configuration end-to-end: packed CNN branch + packed
    argmax head + HOST-side phase spatialize vs the plain module path.
    W=96 gives a duke-like non-128-aligned packed width."""
    from tcct_tpu.data.geometry import DatasetGeometry

    net = RegNet(base=get_model("stc_tt", 5, variant="infer"), out_channels=5)
    x = jnp.zeros((1, 64, 96, 3))
    v = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    geo = DatasetGeometry("tinyp", 5, 0, 64, "resize", (64, 96))
    vol = np.random.default_rng(3).integers(0, 255, (5, 64, 96, 3), dtype=np.uint8)
    plain = VolumePredictor(
        net, v, geo, batch_size=4, dtype=jnp.float32, cnn_impl="plain"
    ).predict_scans(vol)
    packed = VolumePredictor(
        net, v, geo, batch_size=4, dtype=jnp.float32, cnn_impl="packed"
    ).predict_scans(vol)
    assert packed.shape == (5, 64, 96) and packed.dtype == np.uint8
    # packed conv is an exact reassociation; random-init logits still
    # carry near-ties, so allow rare argmax flips.  A phase-ordering bug
    # in the host spatialize would scramble 3/4 of all pixels.
    assert (plain == packed).mean() > 0.95


def test_predictor_bf16_matches_f32_argmax(small_net):
    from tcct_tpu.data.geometry import DatasetGeometry

    net, v = small_net
    geo = DatasetGeometry("tiny", 5, 0, 64, "resize", (64, 64))
    vol = np.random.default_rng(1).integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)
    s32 = VolumePredictor(net, v, geo, 4, dtype=jnp.float32).predict_scans(vol)
    s16 = VolumePredictor(net, v, geo, 4, dtype=jnp.bfloat16).predict_scans(vol)
    # random-init logits are near-uniform so argmax flips are expected; on
    # real checkpoint weights agreement is 100% (measured vs tcct_goals.pt)
    assert (s32 == s16).mean() > 0.9


def test_export_roundtrip(small_net, tmp_path):
    net, v = small_net
    x = jnp.asarray(
        np.random.default_rng(2).random((2, 64, 64, 3)).astype(np.float32)
    )
    path = export_model(net, v, x, str(tmp_path / "model.stablehlo"))
    fn = load_exported(path)
    ref, _ = net.apply(v, x, train=False)
    got = fn(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref[0]), rtol=1e-5, atol=1e-5)
    # dynamic batch: a different batch size through the same artifact
    x3 = jnp.concatenate([x, x[:1]], 0)
    got3 = fn(x3)
    assert got3.shape[0] == 3


def test_params_npz_roundtrip(small_net, tmp_path):
    net, v = small_net
    p = str(tmp_path / "w.npz")
    save_params_npz(v, p)
    v2 = load_params_npz(p)
    a = jax.tree_util.tree_leaves(v)
    b = jax.tree_util.tree_leaves(v2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_export_torch_roundtrip():
    """Reverse exporter (interop with the reference tooling): import the
    shipped .pt, export back against the same skeleton, and diff — every
    filled tensor must be bit-identical (the mapping is rename+transpose
    only)."""
    import os

    import jax

    from tcct_tpu.infer.importer import (
        export_torch_state,
        import_torch_checkpoint,
        load_torch_file,
    )
    from tcct_tpu.models import RegNet, get_model

    path = "/root/reference/task1/onnx/tcct_goals.pt"
    if not os.path.exists(path):
        pytest.skip("reference checkpoint unavailable")
    net = RegNet(base=get_model("stc_tt", 5, variant="infer"), out_channels=5)
    x = jnp.zeros((1, 64, 64, 3))
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    variables, irep = import_torch_checkpoint(path, variables)

    skeleton = load_torch_file(path)
    state, erep = export_torch_state(variables, skeleton)
    assert set(state) == set(skeleton)
    # everything the importer matched must export back bit-identically;
    # the exporter additionally fills the per-layer ALIASES of shared
    # cpe modules (the reference registers the same Parameter under two
    # state-dict keys) so load_state_dict's final value can't depend on
    # module-traversal order
    extras = set(erep.filled) - set(irep.matched)
    assert set(irep.matched) <= set(erep.filled)
    assert all("MHCA_layers" in k and "pe." in k for k in extras), extras
    for k in erep.filled:
        np.testing.assert_array_equal(state[k], skeleton[k].astype(np.float32), err_msg=k)
    # passthrough keys (aug.*, num_batches_tracked, dead fcp buffers) are
    # preserved verbatim
    for k in erep.passthrough:
        np.testing.assert_array_equal(state[k], skeleton[k], err_msg=k)
    # keys with no flax counterpart (dead CRPE convs of the disabled
    # factor/hydra mixers) must be exactly the ones the importer skipped
    # for the same reason — and they're still carried through verbatim
    assert set(erep.missing) <= set(irep.skipped_source), erep.missing[:5]
    for k in erep.missing:
        np.testing.assert_array_equal(state[k], skeleton[k], err_msg=k)


def test_enable_compile_cache_respects_existing_config():
    """conftest already points jax at .jax_cache; the helper must not
    clobber it (an existing setting wins), must be idempotent, and must
    honor the TCCT_NO_COMPILE_CACHE opt-out."""
    import os

    import jax

    from tcct_tpu.utils.cache import enable_compile_cache

    before = jax.config.jax_compilation_cache_dir
    assert before  # set by tests/conftest.py
    got = enable_compile_cache("/tmp/should_not_be_used")
    assert got == before
    assert jax.config.jax_compilation_cache_dir == before
    os.environ["TCCT_NO_COMPILE_CACHE"] = "1"
    try:
        assert enable_compile_cache() is None
    finally:
        del os.environ["TCCT_NO_COMPILE_CACHE"]
