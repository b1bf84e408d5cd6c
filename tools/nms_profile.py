"""Profile the yolo11n decode+NMS tail variants on the real chip (bs=128, 640px).

Stages and e2e variants are timed with the scan-chained method (docs/PERF.md:
the relay can report completion early, so every iteration is data-chained and
the chain forced by one scalar fetch). Run detached; prints one line per
variant as it lands so a partial run still yields data.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.modules import fuse_tree
    from yololite_tpu.ops.decode import decode_detections
    from yololite_tpu.ops.nms import nms_from_feats, non_max_suppression

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    params, state = fuse_tree(params, state)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    params = jax.device_put(cast(params))
    state = jax.device_put(cast(state))

    BS, ITERS = 128, 20
    images = jax.device_put(jnp.asarray(np.random.default_rng(0).random((BS, 640, 640, 3)), jnp.bfloat16))

    def timed(name, step_fn):
        """step_fn(images, salt) -> scalar f32; chained ITERS times inside jit."""

        @jax.jit
        def loop(params, state, images, salt):
            def body(c, _):
                return step_fn(params, state, images, c), None

            out, _ = jax.lax.scan(body, salt, None, length=ITERS)
            return out

        try:
            t0 = time.perf_counter()
            float(loop(params, state, images, jnp.float32(0)))  # compile + first chain
            tc = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(loop(params, state, images, jnp.float32(0)))
                best = min(best, time.perf_counter() - t0)
            ms = best / ITERS * 1e3
            print(f"{name}: {ms:.2f} ms/batch  ({BS / ms * 1e3:.1f} img/s)  [compile+1 {tc:.0f}s]",
                  flush=True)
            return ms
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {e}", flush=True)
            return None

    salt_of = lambda dets: (jnp.sum(dets) * 1e-12).astype(jnp.float32)

    def fwd_only(params, state, images, c):
        feats = model.apply(params, state, images + c.astype(images.dtype), train=False)
        return (sum(jnp.sum(f) for f in feats) * 1e-12).astype(jnp.float32)

    def e2e_current(mc):
        def f(params, state, images, c):
            feats = model.apply(params, state, images + c.astype(images.dtype), train=False)
            boxes, scores = decode_detections(feats, model.strides, model.nc, model.reg_max, xywh=False)
            dets = non_max_suppression(boxes.astype(jnp.float32), scores, conf_thres=0.25,
                                       iou_thres=0.7, max_det=300, max_cand=mc)
            return salt_of(dets)
        return f

    def e2e_late(mc):
        def f(params, state, images, c):
            feats = model.apply(params, state, images + c.astype(images.dtype), train=False)
            dets = nms_from_feats(feats, model.strides, model.nc, model.reg_max, conf_thres=0.25,
                                  iou_thres=0.7, max_det=300, max_cand=mc, half=True)
            return salt_of(dets)
        return f

    def decode_plus_select(params, state, images, c):
        """forward + decode + select only (no IoU/suppress/finalize)."""
        feats = model.apply(params, state, images + c.astype(images.dtype), train=False)
        boxes, scores = decode_detections(feats, model.strides, model.nc, model.reg_max, xywh=False)
        conf = jnp.max(scores, axis=-1)
        cls = jnp.argmax(scores, axis=-1)
        gated = jnp.where(conf > 0.25, conf, -1.0)
        vals, bidx = jax.lax.top_k(gated, 512)
        cand = jax.vmap(lambda b, i: b[i])(boxes, bidx)
        return (jnp.sum(vals.astype(jnp.float32)) * 1e-12 + jnp.sum(cand.astype(jnp.float32)) * 1e-12
                + jnp.sum(cls[:, :1].astype(jnp.float32)) * 1e-12)

    def late_select_only(params, state, images, c):
        """forward + per-level max/argmax + topk + gathers + K-row decode (no IoU)."""
        from yololite_tpu.ops.boxes import dist2bbox, make_anchors
        from yololite_tpu.ops.decode import dfl_expectation

        feats = model.apply(params, state, images + c.astype(images.dtype), train=False)
        B = feats[0].shape[0]
        confs, clss = [], []
        for f in feats:
            s = jax.nn.sigmoid(f[..., 64:])
            confs.append(jnp.max(s, -1).reshape(B, -1))
            clss.append(jnp.argmax(s, -1).reshape(B, -1))
        conf = jnp.concatenate(confs, 1)
        cls = jnp.concatenate(clss, 1)
        bl = jnp.concatenate([f[..., :64].reshape(B, -1, 64) for f in feats], 1)
        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors, stride_t = make_anchors(shapes, model.strides, 0.5)
        gated = jnp.where(conf > 0.25, conf, -1.0)
        vals, bidx = jax.lax.top_k(gated, 512)
        blk = jax.vmap(lambda b, i: b[i])(bl, bidx)
        dist = dfl_expectation(blk, 16)
        boxes_k = (dist2bbox(dist, anchors[bidx], xywh=False) * stride_t[bidx]).astype(jnp.float32)
        return (jnp.sum(vals.astype(jnp.float32)) * 1e-12 + jnp.sum(boxes_k) * 1e-12)

    results = {}
    results["fwd_only"] = timed("fwd_only", fwd_only)
    results["e2e_greedy_512"] = timed("e2e_greedy_512 (current)", e2e_current(512))
    results["e2e_greedy_256"] = timed("e2e_greedy_256", e2e_current(256))
    results["e2e_late_512"] = timed("e2e_late_512", e2e_late(512))
    results["e2e_late_256"] = timed("e2e_late_256", e2e_late(256))
    results["fwd_decode_select"] = timed("fwd+decode+select_512 (no suppress)", decode_plus_select)
    results["fwd_late_select"] = timed("fwd+late_select_512 (no suppress)", late_select_only)
    print("RESULTS", {k: (round(v, 2) if v else None) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
