"""TAL assigner parity vs the reference torch implementation on synthetic scenes."""

import numpy as np
import pytest

from tests.conftest import REFERENCE, reference_available

import jax.numpy as jnp

from yololite_tpu.utils.tal import TaskAlignedAssigner


def _scene(seed=0, B=2, A=84, nc=4, M=6, n_real=(4, 2)):
    """Random predictions + a few real GT boxes per image, padded to M."""
    rng = np.random.default_rng(seed)
    # anchor grid 1.0-stride over a "virtual" image of ~9x9 + extra points
    side = int(np.ceil(np.sqrt(A)))
    xs, ys = np.meshgrid(np.arange(side) + 0.5, np.arange(side) + 0.5)
    anc = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)[:A].astype(np.float32)

    pd_scores = rng.uniform(0, 1, (B, A, nc)).astype(np.float32)
    centers = anc[None].repeat(B, 0) + rng.uniform(-0.3, 0.3, (B, A, 2))
    wh = rng.uniform(0.5, 4, (B, A, 2))
    pd_bboxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)

    gt_bboxes = np.zeros((B, M, 4), np.float32)
    gt_labels = np.zeros((B, M, 1), np.int64)
    mask_gt = np.zeros((B, M, 1), np.float32)
    for b in range(B):
        for m in range(n_real[b]):
            cx, cy = rng.uniform(2, side - 2, 2)
            w, h = rng.uniform(1.5, 4, 2)
            gt_bboxes[b, m] = [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]
            gt_labels[b, m] = rng.integers(0, nc)
            mask_gt[b, m] = 1.0
    return pd_scores, pd_bboxes, anc, gt_labels, gt_bboxes, mask_gt


@pytest.mark.skipif(not reference_available(), reason="reference mount not present")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tal_parity(seed):
    import sys

    sys.path.insert(0, str(REFERENCE))
    import torch
    from yololite.utils.tal import TaskAlignedAssigner as RefTAL

    pd_scores, pd_bboxes, anc, gt_labels, gt_bboxes, mask_gt = _scene(seed)

    ref = RefTAL(topk=10, num_classes=pd_scores.shape[-1], alpha=0.5, beta=6.0)
    with torch.no_grad():
        r_labels, r_bboxes, r_scores, r_fg, r_idx = ref(
            torch.from_numpy(pd_scores),
            torch.from_numpy(pd_bboxes),
            torch.from_numpy(anc),
            torch.from_numpy(gt_labels),
            torch.from_numpy(gt_bboxes),
            torch.from_numpy(mask_gt),
        )

    ours = TaskAlignedAssigner(topk=10, num_classes=pd_scores.shape[-1], alpha=0.5, beta=6.0)
    j_labels, j_bboxes, j_scores, j_fg, j_idx = ours(
        jnp.asarray(pd_scores), jnp.asarray(pd_bboxes), jnp.asarray(anc),
        jnp.asarray(gt_labels), jnp.asarray(gt_bboxes), jnp.asarray(mask_gt),
    )

    # anchors whose best align-metric over all GTs is exactly 0 are tie-ambiguous:
    # top-k picks arbitrary zero-metric candidates there (torch and XLA may differ)
    with torch.no_grad():
        ref2 = RefTAL(topk=10, num_classes=pd_scores.shape[-1], alpha=0.5, beta=6.0)
        ref2.bs, ref2.n_max_boxes = pd_scores.shape[0], gt_bboxes.shape[1]
        _, r_align, _ = ref2.get_pos_mask(
            torch.from_numpy(pd_scores), torch.from_numpy(pd_bboxes), torch.from_numpy(gt_labels),
            torch.from_numpy(gt_bboxes), torch.from_numpy(anc), torch.from_numpy(mask_gt),
        )
    unambiguous = r_align.numpy().max(axis=1) > 0  # (B, A)

    j_fg_np, r_fg_np = np.asarray(j_fg), r_fg.numpy()
    diff = j_fg_np != r_fg_np
    assert not (diff & unambiguous).any(), "fg_mask differs at non-tie anchors"
    fg = r_fg_np & j_fg_np & unambiguous
    np.testing.assert_array_equal(np.asarray(j_idx)[fg], r_idx.numpy()[fg], err_msg="target_gt_idx")
    np.testing.assert_allclose(np.asarray(j_bboxes)[fg], r_bboxes.numpy()[fg], atol=1e-5, err_msg="target_bboxes")
    np.testing.assert_allclose(
        np.asarray(j_scores)[unambiguous], r_scores.numpy()[unambiguous], atol=1e-5, err_msg="target_scores"
    )


@pytest.mark.parametrize("shape,block", [((2, 6, 8400), 128), ((3, 700), 64), ((4, 4, 1000), 128)])
def test_topk_blockmax_gather_bit_identical(shape, block):
    """blockgather top-k == lax.top_k exactly — values AND indices, ties included."""
    import jax

    from yololite_tpu.utils.tal import topk_blockmax_gather

    rng = np.random.default_rng(0)
    k = 13
    cases = [
        rng.uniform(0, 1, shape).astype(np.float32),  # continuous
        rng.integers(0, 4, shape).astype(np.float32),  # heavy value ties across blocks
        np.zeros(shape, np.float32),  # all-tie at zero (masked assigner rows)
        np.where(rng.uniform(size=shape) < 0.98, 0.0, rng.uniform(0, 1, shape)).astype(np.float32),
    ]
    for m in cases:
        v_ref, i_ref = jax.lax.top_k(jnp.asarray(m), k)
        v, i = topk_blockmax_gather(jnp.asarray(m), k, block=block)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_pow_const_matches_pow():
    from yololite_tpu.utils.tal import _pow_const

    x = jnp.asarray(np.random.default_rng(1).uniform(0, 2, (257,)).astype(np.float32))
    for p in (0.5, 1.0, 2.0, 3.0, 6.0, 8.0, 2.5):
        np.testing.assert_allclose(np.asarray(_pow_const(x, p)), np.asarray(x**p), rtol=2e-6)


def test_assigner_topk_modes_agree():
    """Both TOPK_MODE settings produce identical assignments on a real scene."""
    from yololite_tpu.utils import tal

    # A large enough that blockgather takes its real path (nblk=66 > k)
    pd_scores, pd_bboxes, anc, gt_labels, gt_bboxes, mask_gt = _scene(3, A=8400, M=8)
    ours = TaskAlignedAssigner(topk=10, num_classes=pd_scores.shape[-1], alpha=0.5, beta=6.0)
    args = (jnp.asarray(pd_scores), jnp.asarray(pd_bboxes), jnp.asarray(anc),
            jnp.asarray(gt_labels), jnp.asarray(gt_bboxes), jnp.asarray(mask_gt))
    old = tal.TOPK_MODE
    try:
        tal.TOPK_MODE = "hier"
        a = ours(*args)
        tal.TOPK_MODE = "blockgather"
        b = ours(*args)
    finally:
        tal.TOPK_MODE = old
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_tal_no_gt():
    pd_scores, pd_bboxes, anc, gt_labels, gt_bboxes, mask_gt = _scene(0)
    mask_gt[:] = 0
    ours = TaskAlignedAssigner(topk=10, num_classes=pd_scores.shape[-1], alpha=0.5, beta=6.0)
    labels, bboxes, scores, fg, idx = ours(
        jnp.asarray(pd_scores), jnp.asarray(pd_bboxes), jnp.asarray(anc),
        jnp.asarray(gt_labels), jnp.asarray(gt_bboxes), jnp.asarray(mask_gt),
    )
    assert not np.asarray(fg).any()
    assert np.asarray(scores).sum() == 0
