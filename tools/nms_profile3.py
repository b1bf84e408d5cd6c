"""Round-3 NMS tail experiments: gather alternatives + exact fixpoint suppression.

Findings so far (nms_profile2): sigmoid/max/argmax+topk fuse to ~0.2 ms; the
(K,64) row-gather of box logits costs ~3.7 ms (TPU gather pathology); greedy
scan suppression ~1.8 ms; compact-finalize saves 0.65 ms. Here: (a) one-hot
matmul gather with arithmetic anchors, (b) decode-all via segment-matmul DFL
(keeps the 64-wide lane layout, no (...,4,16) reshape) + narrow (K,4) gather,
(c) exact fixpoint suppression instead of the sequential scan.
"""

from __future__ import annotations

import functools
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from yololite_tpu.models.model import DetectionModel
    from yololite_tpu.models.modules import fuse_tree
    from yololite_tpu.ops.boxes import box_iou, make_anchors
    from yololite_tpu.ops.nms import MAX_WH

    model = DetectionModel("yolo11n.yaml")
    params, state = model.init(0)
    params, state = fuse_tree(params, state)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    params = jax.device_put(cast(params))
    state = jax.device_put(cast(state))
    print(f"device: {jax.devices()[0]}", flush=True)

    BS, ITERS, K = 128, 20, 256
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

    # ---- shared pieces ----

    def perlevel_select(feats, k):
        """-> conf-sorted (vals, global bidx) + per-anchor cls/bl kept per level."""
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
        vals, j = jax.lax.top_k(jnp.concatenate(vs, 1), k)
        bidx = jnp.take_along_axis(jnp.concatenate(ids, 1), j, 1)
        return vals, bidx

    def anchors_from_bidx(bidx, shapes, strides):
        """Arithmetic anchor/stride reconstruction (no gather)."""
        offs, Ws, Ss = [], [], []
        off = 0
        for (h, w), s in zip(shapes, strides):
            offs.append(off)
            Ws.append(w)
            Ss.append(s)
            off += h * w
        lvl = jnp.zeros_like(bidx)
        for i in range(1, len(offs)):
            lvl = jnp.where(bidx >= offs[i], i, lvl)
        off_l = sum(jnp.where(lvl == i, offs[i], 0) for i in range(len(offs)))
        W_l = sum(jnp.where(lvl == i, Ws[i], 0) for i in range(len(offs)))
        S_l = sum(jnp.where(lvl == i, Ss[i], 0) for i in range(len(offs))).astype(jnp.float32)
        local = bidx - off_l
        ax = (local % W_l).astype(jnp.float32) + 0.5
        ay = (local // W_l).astype(jnp.float32) + 0.5
        return ax, ay, S_l

    def dfl_segment_matmul(bl):
        """(.., A, 64) -> (.., A, 4) expectation via two (64->4) segment matmuls.

        Keeps the native 64-wide lane layout (no (...,4,16) reshape): exp on VPU,
        then exp@S and exp@(S*proj) on the MXU. No max-subtraction: Detect logits
        are small and f32 exp is safe to ~88.
        """
        e = jnp.exp(bl.astype(jnp.float32))
        seg = jnp.repeat(jnp.eye(4, dtype=jnp.float32), 16, axis=0)  # (64, 4) block indicator
        proj = jnp.tile(jnp.arange(16, dtype=jnp.float32), 4)[:, None] * seg
        den = e @ seg
        num = e @ proj
        return num / den

    def decode_from_bidx(feats, vals, bidx, shapes, strides, gather="onehot"):
        """boxes (B,K,4) f32 + cls (B,K) for the selected anchors."""
        B = feats[0].shape[0]
        cls_all = jnp.concatenate(
            [jnp.argmax(f[..., 64:], -1).reshape(B, -1) for f in feats], 1
        ).astype(jnp.float32)
        bl = jnp.concatenate([f[..., :64].reshape(B, -1, 64) for f in feats], 1)
        if gather == "onehot":
            payload = jnp.concatenate([bl, cls_all[..., None].astype(bl.dtype)], -1)  # (B, A, 65)
            G = (bidx[..., None] == jnp.arange(payload.shape[1])[None, None, :]).astype(bl.dtype)
            got = jnp.einsum("bka,baf->bkf", G, payload,
                             preferred_element_type=jnp.float32)  # (B, K, 65)
            blk, cls_k = got[..., :64], got[..., 64]
        elif gather == "fancy":
            blk = jax.vmap(lambda b, i: b[i])(bl, bidx).astype(jnp.float32)
            cls_k = jax.vmap(lambda cc, i: cc[i])(cls_all, bidx)
        else:  # decode-all then narrow gather
            dist_all = dfl_segment_matmul(bl)  # (B, A, 4)
            ax, ay, S_l = anchors_from_bidx(bidx, shapes, strides)
            dist = jax.vmap(lambda d, i: d[i])(dist_all, bidx)  # (B, K, 4) narrow gather
            cls_k = jax.vmap(lambda cc, i: cc[i])(cls_all, bidx)
            x1 = (ax - dist[..., 0]) * S_l
            y1 = (ay - dist[..., 1]) * S_l
            x2 = (ax + dist[..., 2]) * S_l
            y2 = (ay + dist[..., 3]) * S_l
            return jnp.stack([x1, y1, x2, y2], -1), cls_k
        dist = dfl_segment_matmul(blk)
        ax, ay, S_l = anchors_from_bidx(bidx, shapes, strides)
        x1 = (ax - dist[..., 0]) * S_l
        y1 = (ay - dist[..., 1]) * S_l
        x2 = (ax + dist[..., 2]) * S_l
        y2 = (ay + dist[..., 3]) * S_l
        return jnp.stack([x1, y1, x2, y2], -1), cls_k

    def fixpoint_keep(shifted, valid, iou_thres):
        """Exact greedy keep via fixpoint of k -> g(k) (batched, materialized IoU)."""
        iou = jax.vmap(box_iou)(shifted, shifted)  # (B, K, K)
        k = shifted.shape[1]
        tri = jnp.arange(k)[:, None] < jnp.arange(k)[None, :]  # i < j (i suppresses j)
        sup = (iou > iou_thres) & tri[None]  # (B, K, K)

        def body(carry):
            keep, _ = carry
            suppressed = jnp.any(sup & keep[:, :, None], axis=1)  # (B, K)
            new = valid & ~suppressed
            return new, jnp.any(new != keep)

        def cond(carry):
            return carry[1]

        keep, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(True)))
        return keep

    def compact_finalize(cand_boxes, vals, keep, cls, max_det=300):
        k = vals.shape[0]
        pos = jnp.cumsum(keep) - 1
        pos = jnp.where(keep & (pos < max_det), pos, max_det)
        oh = jax.nn.one_hot(pos, max_det + 1, dtype=jnp.float32)
        rows = jnp.concatenate([cand_boxes, vals.astype(jnp.float32)[:, None], cls[:, None]], -1)
        return oh[:, :max_det].T @ rows

    def e2e(gather, supp="scan", k=K):
        def f(params, state, images, c):
            from yololite_tpu.ops.nms import _greedy_keep

            feats = model.apply(params, state, images + c.astype(images.dtype), train=False)
            shapes = [(f_.shape[1], f_.shape[2]) for f_ in feats]
            vals, bidx = perlevel_select(feats, k)
            boxes_k, cls_k = decode_from_bidx(feats, vals, bidx, shapes, model.strides, gather)
            valid = vals > 0.25
            shifted = boxes_k + (cls_k * MAX_WH)[..., None]
            if supp == "fix":
                keep = fixpoint_keep(shifted, valid, 0.7)
            else:
                keep = jax.vmap(functools.partial(_greedy_keep, iou_thres=0.7, chunk=64))(shifted, valid)
            dets = jax.vmap(compact_finalize)(boxes_k, vals, keep, cls_k)
            return (jnp.sum(dets) * 1e-12).astype(jnp.float32)
        return f

    r = {}
    r["onehot_scan"] = timed("e2e onehot-gather + scan-suppress", e2e("onehot", "scan"))
    r["onehot_fix"] = timed("e2e onehot-gather + fixpoint", e2e("onehot", "fix"))
    r["decall_fix"] = timed("e2e decode-all-segmm + narrow-gather + fixpoint", e2e("decall", "fix"))
    r["fancy_fix"] = timed("e2e fancy-gather + fixpoint", e2e("fancy", "fix"))
    r["onehot_fix_192"] = timed("e2e onehot + fixpoint K=192", e2e("onehot", "fix", 192))
    print("RESULTS", {kk: (round(v, 2) if v else None) for kk, v in r.items()}, flush=True)


if __name__ == "__main__":
    main()
