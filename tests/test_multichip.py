"""Multi-chip (virtual 8-device CPU mesh) sharding tests + driver entry checks."""

import numpy as np

import jax
import jax.numpy as jnp


def test_mesh_helpers():
    from yololite_tpu.parallel.mesh import batch_sharding, make_mesh, mesh_size, replicate_tree, shard_batch

    n = len(jax.devices())
    assert n == 8, f"conftest should force 8 virtual CPU devices, got {n}"
    mesh = make_mesh()
    assert mesh_size(mesh) == 8
    x = np.zeros((16, 4), np.float32)
    xs = shard_batch(mesh, x)
    assert xs.sharding.is_equivalent_to(batch_sharding(mesh), ndim=2)
    tree = replicate_tree(mesh, {"w": np.ones(3, np.float32)})
    assert tree["w"].sharding.is_fully_replicated


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(jax.block_until_ready(out))
    assert out.shape == (1, 300, 6)


def test_dataparallel_grads_match_single_device():
    """Sharded-batch gradients == single-device gradients (XLA psum correctness)."""
    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models import modules as M
    from yololite_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from yololite_tpu.utils.loss import build_targets, v8DetectionLoss

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    loss_fn = v8DetectionLoss(model.nc, model.strides, model.reg_max)

    B, S = 8, 64
    rng = np.random.default_rng(0)
    images = rng.random((B, S, S, 3)).astype(np.float32)
    batch = {
        "batch_idx": np.arange(B, dtype=np.float32),
        "cls": np.ones((B, 1), np.float32),
        "bboxes": np.tile(np.array([[0.5, 0.5, 0.5, 0.5]], np.float32), (B, 1)),
    }
    t = build_targets(batch, B, (S, S), 4)

    def lossf(p, images, gl, gb, mg):
        feats = model.apply(p, state, images, train=False)
        return loss_fn(feats, {"gt_labels": gl, "gt_bboxes": gb, "mask_gt": mg})[0]

    grad_fn = jax.jit(jax.grad(lossf))
    g1 = grad_fn(params, jnp.asarray(images), *(jnp.asarray(t[k]) for k in ("gt_labels", "gt_bboxes", "mask_gt")))

    mesh = make_mesh()
    with mesh:
        pd = replicate_tree(mesh, params)
        im_d = shard_batch(mesh, jnp.asarray(images))
        td = [shard_batch(mesh, jnp.asarray(t[k])) for k in ("gt_labels", "gt_bboxes", "mask_gt")]
        g8 = grad_fn(pd, im_d, *td)

    l1, l8 = jax.tree.leaves(g1), jax.tree.leaves(g8)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)
