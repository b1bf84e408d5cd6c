"""Loss parity vs the reference v8DetectionLoss on identical feats + targets."""

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

import jax.numpy as jnp

from yololite_tpu.utils.loss import build_targets, v8DetectionLoss


@pytest.mark.skipif(not reference_available(), reason="reference mount not present")
def test_loss_parity_vs_reference():
    import sys

    sys.path.insert(0, str(REFERENCE))
    import torch
    from types import SimpleNamespace
    from yololite.utils.loss import v8DetectionLoss as RefLoss
    from tests.test_model_parity import _build_reference_model

    tm = _build_reference_model("n")
    tm.args = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    tm.train()
    ref_loss = RefLoss(tm)

    B, S = 2, 128
    rng = np.random.default_rng(5)
    img = rng.standard_normal((B, 3, S, S), dtype=np.float32)

    # ragged targets: 3 + 1 boxes, normalized xywh
    batch_idx = np.array([0, 0, 0, 1], np.float32)
    cls = np.array([[1.0], [3.0], [7.0], [2.0]], np.float32)
    bboxes = np.array(
        [[0.5, 0.5, 0.4, 0.3], [0.3, 0.2, 0.2, 0.2], [0.7, 0.7, 0.25, 0.4], [0.4, 0.6, 0.5, 0.5]], np.float32
    )
    t_batch = {
        "batch_idx": torch.from_numpy(batch_idx),
        "cls": torch.from_numpy(cls),
        "bboxes": torch.from_numpy(bboxes),
    }
    with torch.no_grad():
        feats_t = tm.model[:-1] if False else None
        preds = tm(torch.from_numpy(img))  # train mode -> list of 3 feature maps
        t_total, t_items = ref_loss(preds, t_batch)

    # our loss on the same feature maps (converted to NHWC)
    feats_j = [jnp.asarray(f.detach().numpy().transpose(0, 2, 3, 1)) for f in preds]
    loss = v8DetectionLoss(nc=80, strides=[8, 16, 32], hyp=SimpleNamespace(box=7.5, cls=0.5, dfl=1.5))
    targets = build_targets(
        {"batch_idx": batch_idx, "cls": cls, "bboxes": bboxes}, B, (S, S), max_gt=8
    )
    j_total, j_items = loss(feats_j, {k: jnp.asarray(v) for k, v in targets.items()})

    np.testing.assert_allclose(np.asarray(j_items), t_items.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(j_total), float(t_total), rtol=1e-4)


def test_loss_gradients_finite():
    """Grad of the full loss wrt feature maps is finite with and without GT."""
    import jax

    loss = v8DetectionLoss(nc=4, strides=[8, 16, 32])
    B, S = 1, 64
    shapes = [(S // s, S // s) for s in (8, 16, 32)]
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((B, h, w, 4 + 64), dtype=np.float32)) for h, w in shapes]

    targets = build_targets(
        {"batch_idx": np.array([0.0]), "cls": np.array([[1.0]]), "bboxes": np.array([[0.5, 0.5, 0.5, 0.5]])},
        B, (S, S), max_gt=4,
    )
    targets = {k: jnp.asarray(v) for k, v in targets.items()}

    def f(feats):
        return loss(feats, targets)[0]

    grads = jax.grad(f)(feats)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()

    # empty-GT batch
    targets0 = {k: jnp.zeros_like(v) for k, v in targets.items()}
    grads0 = jax.grad(lambda fs: loss(fs, targets0)[0])(feats)
    for g in grads0:
        assert np.isfinite(np.asarray(g)).all()


def test_build_targets_truncation_warns(caplog):
    """Overflowing the static max_gt cap must warn, not silently drop (VERDICT r1 weak#6)."""
    import logging

    from yololite_tpu.utils import loss as L

    L._TRUNC_WARNED = False
    n = 12
    batch = {
        "batch_idx": np.zeros(n, np.float32),
        "cls": np.zeros((n, 1), np.float32),
        "bboxes": np.tile(np.array([[0.5, 0.5, 0.2, 0.2]], np.float32), (n, 1)),
    }
    from yololite_tpu.utils import LOGGER

    LOGGER.propagate = True  # let caplog's root handler see the record
    try:
        with caplog.at_level(logging.WARNING, logger="yololite_tpu"):
            t = L.build_targets(batch, 1, (64, 64), max_gt=8)
    finally:
        LOGGER.propagate = False
    assert t["mask_gt"].sum() == 8
    assert any("max_gt" in r.message for r in caplog.records)


def test_bce_sum_custom_vjp_matches_autodiff():
    """bce_sum: forward == sum(optax_sigmoid_bce) exactly; backward == autodiff
    in fp32; on the amp (bf16-logits) path the gradient is emitted in bf16."""
    import jax
    import jax.numpy as jnp

    from yololite_tpu.utils.loss import bce_sum, optax_sigmoid_bce

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 50, 7)) * 3, jnp.float32)
    labels = jnp.asarray(rng.random((4, 50, 7)), jnp.float32)

    f_ref = lambda x: optax_sigmoid_bce(x, labels).sum()
    f_new = lambda x: bce_sum(x, labels)
    np.testing.assert_allclose(float(f_new(logits)), float(f_ref(logits)), rtol=1e-6)
    g_ref = jax.grad(f_ref)(logits)
    g_new = jax.grad(f_new)(logits)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), rtol=1e-5, atol=1e-6)

    lb16 = logits.astype(jnp.bfloat16)
    g16 = jax.grad(lambda x: bce_sum(x, labels))(lb16)
    assert g16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(g16, np.float32), np.asarray(g_ref),
                               rtol=0.05, atol=0.05)


def test_dfl_ce_custom_vjp_matches_autodiff():
    """dfl_ce_mean: forward bit-equal to the autodiff body; backward == autodiff
    in fp32 (weighted, like the loss uses it); bf16 logits -> bf16 gradient."""
    import jax
    import jax.numpy as jnp

    from yololite_tpu.utils.loss import v8DetectionLoss, dfl_ce_mean

    L = v8DetectionLoss(80, [8, 16, 32], 16)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 37, 64)) * 2, jnp.float32)
    t = jnp.asarray(rng.random((2, 37, 4)) * 15.5, jnp.float32)
    w = jnp.asarray(rng.random((2, 37)), jnp.float32)

    np.testing.assert_array_equal(np.asarray(dfl_ce_mean(x, t)),
                                  np.asarray(L._df_loss_autodiff(x, t)))
    f_new = lambda xx: (dfl_ce_mean(xx, t)[..., 0] * w).sum()
    f_ref = lambda xx: (L._df_loss_autodiff(xx, t)[..., 0] * w).sum()
    g_new = jax.grad(f_new)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), rtol=1e-5, atol=1e-6)

    g16 = jax.grad(lambda xx: (dfl_ce_mean(xx, t)[..., 0] * w).sum())(x.astype(jnp.bfloat16))
    assert g16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(g16, np.float32), np.asarray(g_ref),
                               rtol=0.05, atol=0.05)

    # boundary targets (0 and reg_max-1-eps) stay finite through both paths
    tb = jnp.concatenate([jnp.zeros((2, 37, 2)), jnp.full((2, 37, 2), 14.99)], -1)
    gb = jax.grad(lambda xx: (dfl_ce_mean(xx, tb)[..., 0] * w).sum())(x)
    assert bool(jnp.isfinite(gb).all())


def test_dfl_expectation_mm_custom_vjp_matches_autodiff():
    """dfl_expectation_mm: forward bit-equal to the autodiff body; backward ==
    autodiff under an arbitrary cotangent; bf16 logits -> bf16 gradient."""
    import jax
    import jax.numpy as jnp

    from yololite_tpu.ops.decode import dfl_expectation_mm, dfl_expectation_mm_ad

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 41, 64)) * 2, jnp.float32)
    ct = jnp.asarray(rng.standard_normal((3, 41, 4)), jnp.float32)

    np.testing.assert_array_equal(np.asarray(dfl_expectation_mm(x, 16)),
                                  np.asarray(dfl_expectation_mm_ad(x, 16)))
    g_new = jax.grad(lambda xx: (dfl_expectation_mm(xx, 16) * ct).sum())(x)
    g_ref = jax.grad(lambda xx: (dfl_expectation_mm_ad(xx, 16) * ct).sum())(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), rtol=1e-4, atol=1e-5)

    g16 = jax.grad(lambda xx: (dfl_expectation_mm(xx, 16) * ct).sum())(x.astype(jnp.bfloat16))
    assert g16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(g16, np.float32), np.asarray(g_ref),
                               rtol=0.05, atol=0.08)


def test_compact_box_loss_matches_dense():
    """COMPACT_BOX_LOSS gathers only the <= topk*M fg rows; loss values and
    feature gradients must match the dense masked form (same math, rows with
    weight 0 dropped)."""
    import jax

    import yololite_tpu.utils.loss as loss_mod

    loss = v8DetectionLoss(nc=7, strides=[8, 16, 32])
    B, S = 3, 96
    shapes = [(S // s, S // s) for s in (8, 16, 32)]
    rng = np.random.default_rng(3)
    feats = [jnp.asarray(rng.standard_normal((B, h, w, 7 + 64), dtype=np.float32)) for h, w in shapes]
    n = 5
    targets = build_targets(
        {
            "batch_idx": np.repeat(np.arange(B, dtype=np.float32), n),
            "cls": rng.integers(0, 7, (B * n, 1)).astype(np.float32),
            "bboxes": np.clip(rng.random((B * n, 4)) * 0.4 + 0.3, 0.05, 0.95).astype(np.float32),
        },
        B, (S, S), max_gt=8,
    )
    targets = {k: jnp.asarray(v) for k, v in targets.items()}

    def run(compact):
        old = loss_mod.COMPACT_BOX_LOSS
        loss_mod.COMPACT_BOX_LOSS = compact
        try:
            total, items = jax.jit(lambda fs: loss(fs, targets))(feats)
            grads = jax.grad(lambda fs: loss(fs, targets)[0])(feats)
        finally:
            loss_mod.COMPACT_BOX_LOSS = old  # restore the shipped default, not False
        return np.asarray(total), np.asarray(items), [np.asarray(g) for g in grads]

    td, id_, gd = run(False)
    tc, ic, gc = run(True)
    np.testing.assert_allclose(tc, td, rtol=1e-6)
    np.testing.assert_allclose(ic, id_, rtol=1e-6)
    for a, b in zip(gc, gd):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
