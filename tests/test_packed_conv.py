"""Space-to-depth packed conv transform: exactness vs fine convs, the
CrossResNet fast path, and checkpoint-golden parity through the full FTC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tcct_tpu.models.crosscnn import CrossResNet
from tcct_tpu.ops.packed_conv import (
    cross_resnet_packed,
    pack_nhwc,
    packed_conv,
    packed_maxpool2,
    unpack_nhwc,
)


def test_pack_roundtrip():
    x = jnp.arange(2 * 8 * 12 * 3, dtype=jnp.float32).reshape(2, 8, 12, 3)
    np.testing.assert_array_equal(unpack_nhwc(pack_nhwc(x)), x)


@pytest.mark.parametrize("kh,kw", [(3, 3), (1, 13), (13, 1), (1, 1), (1, 5)])
def test_packed_conv_exact(kh, kw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 8)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(kh, kw, 8, 16)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, W, (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    got = unpack_nhwc(packed_conv(pack_nhwc(x), W, b))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("ia", [(0, 0), (0, 1), (1, 0), (1, 1)])
@pytest.mark.parametrize("oa", [(0, 0), (1, 1)])
@pytest.mark.parametrize("kh,kw", [(3, 3), (1, 5), (5, 1)])
def test_packed_conv_alignments_exact(ia, oa, kh, kw):
    """Every alignment transition must reproduce the fine conv, including
    the zero-padding boundary semantics carried by the phantom phases."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 8)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(kh, kw, 8, 8)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, W, (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    xp = pack_nhwc(x, align=ia)
    got = unpack_nhwc(packed_conv(xp, W, b, in_align=ia, out_align=oa), align=oa)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-5)


def test_alignment_plan_kernel_geometry():
    """The FLOP win is the whole point: an alignment-FLIPPING 3x3 must
    assemble to a [2,2] coarse kernel (64C^2 MACs/coarse px), and only
    the alignment-preserving form pays [3,3] (144C^2).  Pin it so the
    block plan can't silently regress."""
    from tcct_tpu.ops.packed_conv import _pack_matrix

    def coarse_shape(aligns):
        M, _, _ = _pack_matrix(3, 3, aligns)
        return M.shape[2], M.shape[3]

    assert coarse_shape((0, 1, 0, 1)) == (2, 2)  # std -> off flip
    assert coarse_shape((1, 0, 1, 0)) == (2, 2)  # off -> std flip
    assert coarse_shape((0, 0, 0, 0)) == (3, 3)  # std preserve
    assert coarse_shape((1, 1, 1, 1)) == (3, 3)  # off preserve
    # per-axis mixing: flip rows only
    assert coarse_shape((0, 1, 0, 0)) == (2, 3)


def test_packed_conv_masks_phantom_junk():
    """Offset-aligned inputs carry bias/BN junk in the phantom border
    phases after elementwise ops; the consuming conv must read them as
    zero (the fine chain's SAME padding)."""
    from tcct_tpu.ops.packed_conv import mask_phantoms

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, 12, 12, 4)).astype(np.float32))
    W = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32)) * 0.1
    xp = pack_nhwc(x, align=(1, 1))
    # pollute exactly the phantom positions (everything the mask zeroes)
    junk = jnp.asarray(rng.normal(size=xp.shape).astype(np.float32))
    xp_junk = xp + (junk - mask_phantoms(junk, (1, 1)))
    clean = packed_conv(xp, W, None, in_align=(1, 1), out_align=(0, 0))
    dirty = packed_conv(xp_junk, W, None, in_align=(1, 1), out_align=(0, 0))
    np.testing.assert_allclose(np.asarray(clean), np.asarray(dirty), rtol=1e-6)


def test_bn_train_packed_offset_stats_exact():
    """Masked BN statistics on an offset tensor must equal fine-layout
    statistics (phantoms excluded from sums, real element count)."""
    from tcct_tpu.ops.packed_conv import _bn_train_packed

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(2, 12, 16, 4)).astype(np.float32))
    bn = {"scale": jnp.ones(4), "bias": jnp.zeros(4)}
    st = {"mean": jnp.zeros(4), "var": jnp.ones(4)}
    xp = pack_nhwc(x, align=(1, 1)) + 3.0  # uniform shift pollutes phantoms
    x_shift = x + 3.0
    _, ns = _bn_train_packed(xp, bn, st, align=(1, 1))
    want_mean = np.asarray(x_shift, np.float64).mean(axis=(0, 1, 2))
    want_var = np.asarray(x_shift, np.float64).var(axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(ns["mean"]), 0.1 * want_mean, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ns["var"]), 0.9 + 0.1 * want_var, rtol=1e-4)


def test_packed_2x_resize_both_lowerings_match_fine():
    """resize_bilinear_2x_packed == pack_nhwc(resize_bilinear(2x)) under
    BOTH trace-time lowerings (matmul = inference default, gather = the
    train trace's form)."""
    from tcct_tpu.ops.resize import (
        resize_bilinear,
        resize_bilinear_2x_packed,
        resize_impl,
    )

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 12, 20, 7)).astype(np.float32))
    ref = pack_nhwc(resize_bilinear(x, (24, 40), align_corners=True))
    with resize_impl("matmul"):
        got_m = resize_bilinear_2x_packed(x, align_corners=True)
    with resize_impl("gather"):
        got_g = resize_bilinear_2x_packed(x, align_corners=True)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_packed_maxpool_exact():
    from tcct_tpu.ops.pool import max_pool_2d

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 4)).astype(np.float32))
    ref = max_pool_2d(x, 2)
    got = packed_maxpool2(pack_nhwc(x))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.parametrize("n_packed", [1, 2, 3])
def test_cross_resnet_packed(n_packed):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 64, 128, 3)).astype(np.float32))
    net = CrossResNet(tiny=True)
    v = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    bs = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.normal(size=a.shape).astype(np.float32)) ** 2 + 0.5,
        v["batch_stats"],
    )
    refs = net.apply({"params": v["params"], "batch_stats": bs}, x, train=False)
    gots = cross_resnet_packed(x, v["params"], bs, n_packed=n_packed)
    for r, g in zip(refs, gots):
        assert r.shape == g.shape
        np.testing.assert_allclose(np.asarray(r), np.asarray(g), rtol=2e-3, atol=2e-3)


def test_packed_full_model_golden(golden):
    """Shipped-checkpoint parity through the full FTC with the packed CNN
    branch injected — the serving configuration."""
    import os

    from tcct_tpu.infer.importer import import_torch_checkpoint
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.ops.packed_conv import ftc_forward_packed

    path = "/root/reference/task1/onnx/tcct_goals.pt"
    if not os.path.exists(path):
        pytest.skip("reference checkpoint unavailable")
    g = golden("ckpt_forward_goals")
    net = RegNet(base=get_model("stc_tt", 5, variant="infer"), out_channels=5)
    x = jnp.asarray(np.moveaxis(g["x"], 1, -1))
    v = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v, _ = import_torch_checkpoint(path, v)
    ys, _ = ftc_forward_packed(net, v, x)
    ref = np.moveaxis(g["y0"], 1, -1)
    np.testing.assert_allclose(np.asarray(ys[0]), ref, rtol=1e-3, atol=5e-4)
    assert (np.argmax(np.asarray(ys[0]), -1) == np.argmax(ref, -1)).mean() > 0.999


def test_packed_training_matches_plain():
    """Two full optimizer steps with the packed CNN branch match the
    plain path bit-close (loss and BN running stats)."""
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.train import TrainConfig, build_train_step
    from tcct_tpu.train.state import create_train_state, make_optimizer

    model = RegNet(base=get_model("stc_tt", 5), out_channels=5)
    opt = make_optimizer(steps_per_epoch=4)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    labs = jnp.asarray(rng.integers(0, 5, (2, 64, 64)).astype(np.uint8))
    losses = {}
    for packed in [False, True]:
        cfg = TrainConfig(n_class=5, crop_hw=(64, 64), ds=True, packed_cnn=packed)
        state = create_train_state(
            model, opt, jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 5)),
        )
        step = build_train_step(model, opt, cfg)
        s1, m1 = step(state, imgs, labs)
        _, m2 = step(s1, imgs, labs)
        losses[packed] = (float(m1["total"]), float(m2["total"]))
    assert abs(losses[False][0] - losses[True][0]) < 1e-3
    assert abs(losses[False][1] - losses[True][1]) < 1e-3


@pytest.mark.slow
def test_packed_training_drift_100_steps():
    """Long-horizon bound for making packed_cnn a safe default: 100 full
    optimizer steps (DS dice, AdamW, augmentation off, fixed batch) with
    the packed lowering vs plain, loss drift bounded at every step."""
    from tcct_tpu.models import RegNet, get_model
    from tcct_tpu.train import TrainConfig, build_train_step
    from tcct_tpu.train.state import create_train_state, make_optimizer

    model = RegNet(base=get_model("stc_tt", 5), out_channels=5)
    opt = make_optimizer(steps_per_epoch=10)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8))
    labs = jnp.asarray(rng.integers(0, 5, (2, 64, 64)).astype(np.uint8))
    traj = {}
    for packed in [False, True]:
        cfg = TrainConfig(
            n_class=5, crop_hw=(64, 64), ds=True, augment=False,
            packed_cnn=packed,
        )
        state = create_train_state(
            model, opt, jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 5)),
        )
        step = build_train_step(model, opt, cfg)
        losses = []
        for _ in range(100):
            state, m = step(state, imgs, labs)
            losses.append(m["total"])
        traj[packed] = np.asarray(jax.device_get(losses), np.float64)
    rel = np.abs(traj[True] - traj[False]) / np.abs(traj[False])
    assert rel.max() < 1e-2, (rel.argmax(), rel.max())


def test_batchnorm_packed_matches_fine():
    """BatchNorm(packed=True) on the space-to-depth layout must equal the
    fine-layout module: identical stats (same element set, reassociated)
    and identical running-average updates."""
    from tcct_tpu.models.layers import BatchNorm
    from tcct_tpu.ops.packed_conv import pack_nhwc, unpack_nhwc

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    bn = BatchNorm()
    v = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
    y_fine, upd_fine = bn.apply(v, x, use_running_average=False, mutable=["batch_stats"])
    y_pk, upd_pk = bn.apply(
        v, pack_nhwc(x), use_running_average=False, packed=True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(unpack_nhwc(y_pk), y_fine, rtol=2e-5, atol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            upd_pk["batch_stats"][k], upd_fine["batch_stats"][k], rtol=2e-5
        )
    # eval mode too (running stats path, tiled affine)
    y_fine_e = bn.apply(v, x, use_running_average=True)
    y_pk_e = bn.apply(v, pack_nhwc(x), use_running_average=True, packed=True)
    np.testing.assert_allclose(unpack_nhwc(y_pk_e), y_fine_e, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("C,align", [(16, (0, 0)), (32, (1, 1)), (96, (1, 0))])
def test_conv_pack_lowering_exact(C, align):
    """The constant-kernel conv lowering of pack/unpack (round 4: kills
    the 6-D reshape relayout chains, ~1.3 ms/step of XLA copies) is
    bitwise-exact vs the reshape form — forward, roundtrip and grads —
    for f32 and bf16; integer inputs stay on the reshape path."""
    from tcct_tpu.ops.packed_conv import pack_lowering

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, C)).astype(np.float32))
    for dt in (jnp.float32, jnp.bfloat16):
        xd = x.astype(dt)
        with pack_lowering("reshape"):
            ref = pack_nhwc(xd, align)
            uref = unpack_nhwc(ref, align)
        with pack_lowering("conv"):
            got = pack_nhwc(xd, align)
            ugot = unpack_nhwc(ref, align)
        assert ref.shape == got.shape and jnp.array_equal(ref, got)
        assert jnp.array_equal(uref, ugot)

    def g(impl):
        with pack_lowering(impl):
            return jax.grad(
                lambda x: jnp.sum(jnp.sin(unpack_nhwc(pack_nhwc(x, align), align)))
            )(x)

    assert jnp.array_equal(g("reshape"), g("conv"))
    xu = jnp.asarray(rng.integers(0, 255, (2, 8, 8, C), dtype=np.uint8))
    assert pack_nhwc(xu).dtype == jnp.uint8  # auto keeps u8 on reshape


@pytest.mark.parametrize("C,align", [(16, (0, 0)), (32, (1, 1)), (96, (1, 0))])
def test_slice_pack_lowering_exact(C, align):
    """The strided-slice/stack lowering of pack/unpack (round 4: rank-4/5
    intermediates instead of the 6-D reshape form XLA relayouts around)
    is bitwise-exact vs the reshape form — forward, roundtrip, grads, and
    integer dtypes."""
    from tcct_tpu.ops.packed_conv import pack_lowering

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 16, 12, C)).astype(np.float32))
    for dt in (jnp.float32, jnp.bfloat16, jnp.uint8):
        xd = (x * 50 + 128).astype(dt) if dt == jnp.uint8 else x.astype(dt)
        with pack_lowering("reshape"):
            ref = pack_nhwc(xd, align)
            uref = unpack_nhwc(ref, align)
        with pack_lowering("slice"):
            got = pack_nhwc(xd, align)
            ugot = unpack_nhwc(got, align)
        assert ref.shape == got.shape and jnp.array_equal(ref, got)
        assert jnp.array_equal(uref, ugot)

    def g(impl):
        with pack_lowering(impl):
            return jax.grad(
                lambda x: jnp.sum(jnp.sin(unpack_nhwc(pack_nhwc(x, align), align)))
            )(x)

    assert jnp.array_equal(g("reshape"), g("slice"))
