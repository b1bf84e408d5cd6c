"""Pallas kernel tests (interpret mode on CPU) + device letterbox parity vs cv2."""

import numpy as np
import pytest

import jax.numpy as jnp

from yololite_tpu.ops.boxes import box_iou
from yololite_tpu.ops.nms import _greedy_keep
from yololite_tpu.ops.pallas_kernels import device_letterbox, greedy_nms_keep_pallas
from yololite_tpu.ops.letterbox import LetterBox


def test_pallas_nms_matches_scan():
    rng = np.random.default_rng(0)
    B, K = 2, 128
    centers = rng.uniform(20, 600, (B, K, 2))
    wh = rng.uniform(10, 120, (B, K, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = -np.sort(-rng.uniform(0, 1, (B, K)).astype(np.float32), axis=-1)  # sorted desc
    valid = scores > 0.1

    iou = np.stack([np.asarray(box_iou(jnp.asarray(b), jnp.asarray(b))) for b in boxes])
    keep_pallas = np.asarray(
        greedy_nms_keep_pallas(jnp.asarray(iou), jnp.asarray(valid), 0.45, interpret=True)
    )
    for b in range(B):
        # _greedy_keep takes the (K, 4) boxes and computes IoU slabs on the fly
        keep_scan = np.asarray(_greedy_keep(jnp.asarray(boxes[b]), jnp.asarray(valid[b]), 0.45))
        np.testing.assert_array_equal(keep_pallas[b] > 0, keep_scan)


@pytest.mark.parametrize("shape", [(480, 640), (640, 480), (417, 333)])
def test_device_letterbox_matches_cv2(shape):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (*shape, 3), np.uint8)
    host = LetterBox((320, 320))(img).astype(np.float32) / 255.0
    dev = np.asarray(device_letterbox(jnp.asarray(img)[None], imgsz=320))[0]
    assert dev.shape == host.shape
    # identical geometry; bilinear kernels agree to ~1 LSB of uint8
    assert np.abs(dev - host).max() < (2.0 / 255.0)
    # padding region (geometric) is exactly the fill value
    h0, w0 = shape
    r = min(320 / h0, 320 / w0)
    new_w, new_h = int(round(w0 * r)), int(round(h0 * r))
    top = int(round((320 - new_h) / 2 - 0.1))
    left = int(round((320 - new_w) / 2 - 0.1))
    if top > 0:
        np.testing.assert_allclose(dev[:top], 114 / 255.0, atol=1e-6)
    if left > 0:
        np.testing.assert_allclose(dev[:, :left], 114 / 255.0, atol=1e-6)


def test_decode_select_pallas_matches_decode():
    """Fused decode+select kernel == decode_detections + max/argmax (interpret mode)."""
    from yololite_tpu.ops.decode import decode_detections
    from yololite_tpu.ops.pallas_kernels import decode_select_pallas

    B = 2
    shapes = [(16, 16), (8, 8), (4, 4)]
    strides = [8, 16, 32]
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((B, h, w, 144), np.float32)) for h, w in shapes]

    boxes_ref, scores_ref = decode_detections(feats, strides, 80, 16, xywh=False)
    conf_ref = np.max(np.asarray(scores_ref), -1)
    cls_ref = np.argmax(np.asarray(scores_ref), -1)

    boxes, conf, cls = decode_select_pallas(feats, strides, 80, 16, conf_thres=0.25, interpret=True)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(boxes_ref), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(cls), cls_ref)
    gated = np.where(conf_ref > 0.25, conf_ref, -1.0)
    np.testing.assert_array_equal(np.asarray(conf) > 0, gated > 0)  # identical gating
    sel = gated > 0
    np.testing.assert_allclose(np.asarray(conf)[sel], gated[sel], atol=1e-6)


def test_fused_decode_nms_matches_reference_path():
    """fused_decode_nms == decode_detections + non_max_suppression end-to-end."""
    from yololite_tpu.ops.decode import decode_detections
    from yololite_tpu.ops.nms import fused_decode_nms, non_max_suppression

    B = 3
    shapes = [(16, 16), (8, 8), (4, 4)]
    strides = [8, 16, 32]
    rng = np.random.default_rng(4)
    feats = [jnp.asarray(rng.standard_normal((B, h, w, 144), np.float32)) for h, w in shapes]

    b, sc = decode_detections(feats, strides, 80, 16, xywh=False)
    ref = np.asarray(non_max_suppression(b, sc, conf_thres=0.25, iou_thres=0.6, max_det=50, max_cand=128))
    out = np.asarray(fused_decode_nms(feats, strides, 80, 16, conf_thres=0.25, iou_thres=0.6,
                                      max_det=50, max_cand=128, interpret=True))
    assert (ref[..., 4] > 0).sum() == (out[..., 4] > 0).sum()
    np.testing.assert_allclose(out, ref, atol=1e-3)


@pytest.mark.parametrize("shape", [(480, 640), (640, 480), (417, 333), (320, 320)])
def test_device_letterbox_s2d_matches_reshuffle(shape):
    """s2d letterbox == device_letterbox followed by a 2x2 space-to-depth."""
    from yololite_tpu.ops.pallas_kernels import device_letterbox_s2d

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (2, *shape, 3), np.uint8)
    full = np.asarray(device_letterbox(jnp.asarray(img), imgsz=320))  # (2,320,320,3)
    s2d = np.asarray(device_letterbox_s2d(jnp.asarray(img), imgsz=320))  # (2,160,160,12)
    assert s2d.shape == (2, 160, 160, 12)
    ref = full.reshape(2, 160, 2, 160, 2, 3).transpose(0, 1, 3, 2, 4, 5).reshape(2, 160, 160, 12)
    np.testing.assert_allclose(s2d, ref, atol=1e-6)


def test_stem_s2d_fold_matches_strided_conv():
    """Folded k2s1 conv on the s2d layout == fused k3s2 Conv on the full image,
    including the zero-pad border rows/cols."""
    from yololite_tpu.models.modules import Conv, KeyGen, fold_stem_s2d, stem_s2d_apply

    conv = Conv(3, 16, k=3, s=2)
    params, state = conv.init(KeyGen(5))
    rng = np.random.default_rng(6)
    # randomize BN so the fuse is non-trivial
    params["bn"]["scale"] = jnp.asarray(rng.uniform(0.5, 2, 16).astype(np.float32))
    params["bn"]["bias"] = jnp.asarray(rng.uniform(-1, 1, 16).astype(np.float32))
    state["bn"]["mean"] = jnp.asarray(rng.uniform(-1, 1, 16).astype(np.float32))
    state["bn"]["var"] = jnp.asarray(rng.uniform(0.5, 2, 16).astype(np.float32))
    fused = Conv.fuse(params, state)

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    import yololite_tpu.models.modules as M

    ref = conv(fused, {}, x, M.Ctx(train=False))  # fused path: conv + b + silu
    xs = jnp.asarray(
        np.asarray(x).reshape(2, 16, 2, 16, 2, 3).transpose(0, 1, 3, 2, 4, 5).reshape(2, 16, 16, 12)
    )
    out = stem_s2d_apply(conv, fused, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # the unused (0, 0) block taps must be exactly zero
    w2 = np.asarray(fold_stem_s2d(fused["conv"]["w"]))
    np.testing.assert_array_equal(w2[0, 0, :3], 0.0)
    np.testing.assert_array_equal(w2[0, 1, :3], 0.0)  # (dy=0 of block row 0) never read
    # tap (1,1) channel block (dy,dx)=(0,0) comes from the kernel center w[1,1]
    np.testing.assert_array_equal(w2[1, 1, 0:3], np.asarray(fused["conv"]["w"])[1, 1])


def test_predictor_s2d_stem_matches_default(tmp_path):
    """End-to-end predict with USE_S2D_STEM: same boxes as the default graph."""
    import yololite_tpu.engine.predictor as pred_mod
    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.modules import stem_s2d_apply, fuse_tree
    from yololite_tpu.ops.nms import nms_from_feats
    from yololite_tpu.ops.pallas_kernels import device_letterbox_s2d

    model = DetectionModel("yolo11n.yaml", nc=4)
    params, state = model.init(0)
    fp, fs = fuse_tree(params, state)
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (1, 97, 130, 3), np.uint8)

    # default graph: full letterbox + full apply
    from yololite_tpu.ops.pallas_kernels import device_letterbox

    x = device_letterbox(jnp.asarray(img), imgsz=64)
    feats_ref = model.apply(fp, fs, x, train=False)

    # s2d graph
    xs = device_letterbox_s2d(jnp.asarray(img), imgsz=64)
    y0 = stem_s2d_apply(model.rows[0].mod, fp["0"], xs)
    feats = model.apply(fp, fs, y0, train=False, start=1)
    assert 0 not in model.save
    for a, b in zip(feats, feats_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.parametrize("shape", [(480, 640), (417, 333), (320, 320)])
def test_device_letterbox_s4d_matches_double_s2d(shape):
    """s4d letterbox == 2x2 s2d of the s2d letterbox (same channel layout the
    stem fold expects)."""
    from yololite_tpu.ops.pallas_kernels import device_letterbox_s2d, device_letterbox_s4d

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (2, *shape, 3), np.uint8)
    s2d = np.asarray(device_letterbox_s2d(jnp.asarray(img), imgsz=320))  # (2,160,160,12)
    s4d = np.asarray(device_letterbox_s4d(jnp.asarray(img), imgsz=320))  # (2,80,80,48)
    assert s4d.shape == (2, 80, 80, 48)
    ref = s2d.reshape(2, 80, 2, 80, 2, 12).transpose(0, 1, 3, 2, 4, 5).reshape(2, 80, 80, 48)
    np.testing.assert_allclose(s4d, ref, atol=1e-6)


def test_stem_s4d_fold_matches_two_convs():
    """fold_stem_s4d + fold_stem_s2d pipeline == conv1(conv0(x)) on the full
    image (both fused k3s2 Convs), including all pad borders."""
    import yololite_tpu.models.modules as M
    from yololite_tpu.models.modules import Conv, KeyGen, stem_s4d_apply

    kg = KeyGen(11)
    conv0, conv1 = Conv(3, 16, k=3, s=2), Conv(16, 32, k=3, s=2)
    rng = np.random.default_rng(12)

    def fused(conv):
        p, s = conv.init(kg)
        p["bn"]["scale"] = jnp.asarray(rng.uniform(0.5, 2, conv.c2).astype(np.float32))
        p["bn"]["bias"] = jnp.asarray(rng.uniform(-1, 1, conv.c2).astype(np.float32))
        s["bn"]["mean"] = jnp.asarray(rng.uniform(-1, 1, conv.c2).astype(np.float32))
        s["bn"]["var"] = jnp.asarray(rng.uniform(0.5, 2, conv.c2).astype(np.float32))
        return Conv.fuse(p, s)

    p0, p1 = fused(conv0), fused(conv1)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ctx = M.Ctx(train=False)
    ref = conv1(p1, {}, conv0(p0, {}, x, ctx), ctx)  # (2, 8, 8, 32)

    xs4 = np.asarray(x).reshape(2, 8, 2, 2, 8, 2, 2, 3).transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(2, 8, 8, 48)
    out = stem_s4d_apply(conv0, conv1, p0, p1, jnp.asarray(xs4))
    assert out.shape == np.asarray(ref).shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_model_s4d_stem_feats_match(tmp_path):
    """Full model: s4d letterbox + fused stem + apply(start=2) == default path."""
    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.modules import fuse_tree, stem_s4d_apply
    from yololite_tpu.ops.pallas_kernels import device_letterbox, device_letterbox_s4d

    model = DetectionModel("yolo11n.yaml", nc=4)
    params, state = model.init(0)
    fp, fs = fuse_tree(params, state)
    rng = np.random.default_rng(13)
    img = rng.integers(0, 255, (1, 150, 100, 3), np.uint8)

    x = device_letterbox(jnp.asarray(img), imgsz=64)
    feats_ref = model.apply(fp, fs, x, train=False)

    xs = device_letterbox_s4d(jnp.asarray(img), imgsz=64)
    y1 = stem_s4d_apply(model.rows[0].mod, model.rows[1].mod, fp["0"], fp["1"], xs)
    feats = model.apply(fp, fs, y1, train=False, start=2)
    assert 0 not in model.save and 1 not in model.save
    for a, b in zip(feats, feats_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_fused_stem_pallas_matches_s4d_apply():
    """fused_stem_s4d_pallas (interpret mode) == stem_s4d_apply (XLA convs),
    including the conv1-pads-conv0-output border semantics and band seams."""
    import yololite_tpu.models.modules as M
    from yololite_tpu.models.modules import Conv, KeyGen, stem_s4d_apply, stem_s4d_apply_pallas

    kg = KeyGen(21)
    conv0, conv1 = Conv(3, 16, k=3, s=2), Conv(16, 32, k=3, s=2)
    rng = np.random.default_rng(22)

    def fused(conv):
        p, s = conv.init(kg)
        p["bn"]["scale"] = jnp.asarray(rng.uniform(0.5, 2, conv.c2).astype(np.float32))
        p["bn"]["bias"] = jnp.asarray(rng.uniform(-1, 1, conv.c2).astype(np.float32))
        s["bn"]["mean"] = jnp.asarray(rng.uniform(-1, 1, conv.c2).astype(np.float32))
        s["bn"]["var"] = jnp.asarray(rng.uniform(0.5, 2, conv.c2).astype(np.float32))
        return Conv.fuse(p, s)

    p0, p1 = fused(conv0), fused(conv1)
    # H4=16 with th=8 -> 2 bands (exercises the seam and band-0 halo zeroing)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    xs4 = np.asarray(x).reshape(2, 16, 2, 2, 16, 2, 2, 3).transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(2, 16, 16, 48)
    xs4 = jnp.asarray(xs4)

    ref = stem_s4d_apply(conv0, conv1, p0, p1, xs4)
    out = stem_s4d_apply_pallas(conv0, conv1, p0, p1, xs4, th=8, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # sumtap variant (no lane-dim concatenate): same math as sum of tap matmuls
    out2 = stem_s4d_apply_pallas(conv0, conv1, p0, p1, xs4, th=8, interpret=True, sumtap=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-4)


def test_fused_stem_pallas_single_band():
    """One-band case (th == H4): the i==0 halo row zeroing plus no seams."""
    from yololite_tpu.models.modules import Conv, KeyGen, stem_s4d_apply, stem_s4d_apply_pallas

    kg = KeyGen(31)
    conv0, conv1 = Conv(3, 16, k=3, s=2), Conv(16, 32, k=3, s=2)
    p0, s0 = conv0.init(kg)
    p1, s1 = conv1.init(kg)
    p0, p1 = Conv.fuse(p0, s0), Conv.fuse(p1, s1)
    rng = np.random.default_rng(32)
    x = np.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    xs4 = x.reshape(1, 8, 2, 2, 8, 2, 2, 3).transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(1, 8, 8, 48)
    xs4 = jnp.asarray(xs4)

    ref = stem_s4d_apply(conv0, conv1, p0, p1, xs4)
    out = stem_s4d_apply_pallas(conv0, conv1, p0, p1, xs4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("hw,th", [((8, 16), 4), ((24, 8), 6), ((12, 12), 12)])
def test_fused_stem_pallas_shape_fuzz(hw, th):
    """Rectangular s4d grids and non-default band heights, fp32 path."""
    from yololite_tpu.models.modules import Conv, KeyGen, stem_s4d_apply, stem_s4d_apply_pallas

    kg = KeyGen(41)
    conv0, conv1 = Conv(3, 16, k=3, s=2), Conv(16, 32, k=3, s=2)
    p0, s0 = conv0.init(kg)
    p1, s1 = conv1.init(kg)
    p0, p1 = Conv.fuse(p0, s0), Conv.fuse(p1, s1)
    H4, W4 = hw
    rng = np.random.default_rng(H4 * 100 + W4)
    x = np.asarray(rng.standard_normal((2, H4 * 4, W4 * 4, 3)).astype(np.float32))
    xs4 = (x.reshape(2, H4, 2, 2, W4, 2, 2, 3).transpose(0, 1, 4, 2, 5, 3, 6, 7)
           .reshape(2, H4, W4, 48))
    xs4 = jnp.asarray(xs4)

    ref = stem_s4d_apply(conv0, conv1, p0, p1, xs4)
    out = stem_s4d_apply_pallas(conv0, conv1, p0, p1, xs4, th=th, interpret=True)
    assert out.shape == ref.shape == (2, H4, W4, 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    out2 = stem_s4d_apply_pallas(conv0, conv1, p0, p1, xs4, th=th, interpret=True, sumtap=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-4)
