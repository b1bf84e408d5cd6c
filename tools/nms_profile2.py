"""Round-2 NMS tail micro-stages on the real chip (see nms_profile.py for method)."""

from __future__ import annotations

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.modules import fuse_tree
    from yololite_tpu.ops.boxes import dist2bbox, make_anchors
    from yololite_tpu.ops.decode import dfl_expectation
    from yololite_tpu.ops.nms import _fast_keep, _finalize, _greedy_keep, MAX_WH

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
        @jax.jit
        def loop(params, state, images, salt):
            def body(c, _):
                return step_fn(params, state, images, c), None

            out, _ = jax.lax.scan(body, salt, None, length=ITERS)
            return out

        try:
            t0 = time.perf_counter()
            float(loop(params, state, images, jnp.float32(0)))
            tc = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(loop(params, state, images, jnp.float32(0)))
                best = min(best, time.perf_counter() - t0)
            ms = best / ITERS * 1e3
            print(f"{name}: {ms:.2f} ms/batch  ({BS / ms * 1e3:.1f} img/s)  [c {tc:.0f}s]", flush=True)
            return ms
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {e}", flush=True)
            return None

    def levels(params, state, images, c):
        return model.apply(params, state, images + c.astype(images.dtype), train=False)

    def reduce_only(params, state, images, c):
        feats = levels(params, state, images, c)
        B = feats[0].shape[0]
        confs, clss = [], []
        for f in feats:
            s = jax.nn.sigmoid(f[..., 64:])
            confs.append(jnp.max(s, -1).reshape(B, -1))
            clss.append(jnp.argmax(s, -1).reshape(B, -1))
        conf = jnp.concatenate(confs, 1)
        cls = jnp.concatenate(clss, 1)
        return (jnp.sum(conf.astype(jnp.float32)) * 1e-12 + jnp.sum(cls[:, :1]).astype(jnp.float32) * 1e-12)

    def max_topk(k):
        def f(params, state, images, c):
            feats = levels(params, state, images, c)
            B = feats[0].shape[0]
            confs = [jnp.max(jax.nn.sigmoid(f[..., 64:]), -1).reshape(B, -1) for f in feats]
            conf = jnp.concatenate(confs, 1)
            gated = jnp.where(conf > 0.25, conf, -1.0)
            vals, bidx = jax.lax.top_k(gated, k)
            return (jnp.sum(vals.astype(jnp.float32)) * 1e-12 + jnp.sum(bidx[:, :1]).astype(jnp.float32) * 1e-12)
        return f

    def perlevel_topk(k):
        def f(params, state, images, c):
            feats = levels(params, state, images, c)
            B = feats[0].shape[0]
            vs, ids = [], []
            off = 0
            for f_ in feats:
                s = jnp.max(jax.nn.sigmoid(f_[..., 64:]), -1).reshape(B, -1)
                kl = min(k, s.shape[1])
                v, i = jax.lax.top_k(jnp.where(s > 0.25, s, -1.0), kl)
                vs.append(v)
                ids.append(i + off)
                off += s.shape[1]
            vcat = jnp.concatenate(vs, 1)
            icat = jnp.concatenate(ids, 1)
            vals, j = jax.lax.top_k(vcat, k)
            bidx = jnp.take_along_axis(icat, j, 1)
            return (jnp.sum(vals.astype(jnp.float32)) * 1e-12 + jnp.sum(bidx[:, :1]).astype(jnp.float32) * 1e-12)
        return f

    def _select_late(feats, k):
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
        vals, bidx = jax.lax.top_k(gated, k)
        blk = jax.vmap(lambda b, i: b[i])(bl, bidx)
        cls_k = jax.vmap(lambda cc, i: cc[i])(cls, bidx).astype(jnp.float32)
        dist = dfl_expectation(blk, 16)
        boxes_k = (dist2bbox(dist, anchors[bidx], xywh=False) * stride_t[bidx]).astype(jnp.float32)
        valid = vals > 0.25
        return boxes_k, vals, cls_k, valid

    def finalize_compact(cand_boxes, vals, keep, cls, max_det):
        """Order-preserving compaction (candidates already score-descending)."""
        k = vals.shape[0]
        pos = jnp.cumsum(keep) - 1
        pos = jnp.where(keep & (pos < max_det), pos, max_det)
        oh = jax.nn.one_hot(pos, max_det + 1, dtype=jnp.float32)  # (K, max_det+1)
        rows = jnp.concatenate(
            [cand_boxes, vals.astype(jnp.float32)[:, None], cls[:, None]], axis=-1
        )  # (K, 6)
        out = oh[:, :max_det].T @ rows
        return out

    def e2e_variant(k, chunk=32, compact=False, perlevel=False):
        def f(params, state, images, c):
            feats = levels(params, state, images, c)
            boxes_k, vals, cls_k, valid = _select_late(feats, k)
            shifted = boxes_k + (cls_k * MAX_WH)[..., None]
            keep = jax.vmap(functools.partial(_greedy_keep, iou_thres=0.7, chunk=chunk))(shifted, valid)
            if compact:
                dets = jax.vmap(functools.partial(finalize_compact, max_det=300))(
                    boxes_k, vals, keep, cls_k)
            else:
                dets = jax.vmap(functools.partial(_finalize, max_det=300))(boxes_k, vals, cls_k, keep)
            return (jnp.sum(dets) * 1e-12).astype(jnp.float32)
        return f

    r = {}
    r["reduce_only"] = timed("fwd+sigmoid/max/argmax", reduce_only)
    r["max_topk_256"] = timed("fwd+max+topk256", max_topk(256))
    r["perlevel_topk_256"] = timed("fwd+max+perlevel_topk256", perlevel_topk(256))
    r["late_sel_256"] = timed("fwd+late_select_256", lambda p, s, i, c: (
        (lambda b, v, cl, va: (jnp.sum(b) * 1e-12 + jnp.sum(v.astype(jnp.float32)) * 1e-12).astype(jnp.float32))(
            *_select_late(levels(p, s, i, c), 256))))
    r["e2e_256_c32"] = timed("e2e_late_256 chunk32 (ref)", e2e_variant(256, 32))
    r["e2e_256_c64"] = timed("e2e_late_256 chunk64", e2e_variant(256, 64))
    r["e2e_256_compact"] = timed("e2e_late_256 compact-finalize", e2e_variant(256, 32, compact=True))
    r["e2e_128"] = timed("e2e_late_128", e2e_variant(128, 32))
    print("RESULTS", {kk: (round(v, 2) if v else None) for kk, v in r.items()}, flush=True)


if __name__ == "__main__":
    main()
