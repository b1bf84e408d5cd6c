"""On-device batched non-max suppression (fixed shapes, jit/vmap-friendly).

Replaces the reference's host round-trip through torchvision.ops.nms
(utils/ops.py:138-273): candidate gating, class-offset trick, greedy suppression
and max_det capping all run on device and return a padded (B, max_det, 6) tensor
[x1, y1, x2, y2, conf, cls] with conf==0 marking empty slots.

Greedy order matches torchvision (score-descending, suppress IoU > threshold), so
mAP parity holds; a fast matrix variant ("fast" mode) trades exactness for a
single pass when throughput matters more than tie-level parity.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from yololite_tpu.ops.boxes import box_iou

MAX_WH = 7680  # class-offset magnitude (reference ops.py:151)


def _greedy_keep(shifted: jnp.ndarray, valid: jnp.ndarray, iou_thres: float, chunk: int = 32) -> jnp.ndarray:
    """Sequential greedy suppression over score-sorted candidates (exact).

    shifted: (K, 4) class-offset boxes, valid: (K,) initial mask.
    keep[j] survives unless some earlier kept i has iou(i, j) > threshold.

    Chunked to amortize lax.scan's per-step cost: the scan walks K/chunk blocks,
    computing a (chunk, K) IoU slab on the fly (the full (K, K) matrix never
    touches HBM) and unrolling the chunk's sequential updates as trace-time
    vector ops (measured 3.3x faster than a K-step scan at K=512; the on-the-fly
    slab is bit-identical to the materialized matrix and saves its r+w traffic).
    """
    k = shifted.shape[0]
    chunk = min(chunk, k)
    while k % chunk:  # K not divisible: fall back to the largest divisor
        chunk //= 2
    idx = jnp.arange(k)

    def body(keep, ci):
        base = ci * chunk
        rows = box_iou(jax.lax.dynamic_slice(shifted, (base, 0), (chunk, 4)), shifted)  # (chunk, K)
        for j in range(chunk):
            i = base + j
            kv = jax.lax.dynamic_index_in_dim(keep, i, keepdims=False)
            suppress = (rows[j] > iou_thres) & kv & (idx > i)
            keep = keep & ~suppress
        return keep, None

    keep, _ = jax.lax.scan(body, valid, jnp.arange(k // chunk))
    return keep


def _fast_keep_batched(shifted: jnp.ndarray, valid: jnp.ndarray, iou_thres: float) -> jnp.ndarray:
    """One-shot matrix NMS on a materialized (B, K, K) IoU (K <= ~1024).

    Same Fast-NMS semantics as _fast_keep (suppressed boxes still suppress),
    one dense sweep instead of a scan -- the serve-mode analogue of
    _fixpoint_keep's materialized form.
    """
    iou = jax.vmap(box_iou)(shifted.astype(jnp.float32), shifted.astype(jnp.float32))
    k = shifted.shape[1]
    tri = jnp.arange(k)[:, None] < jnp.arange(k)[None, :]
    max_iou = jnp.max(jnp.where(tri[None] & valid[:, :, None], iou, 0.0), axis=1)
    return valid & (max_iou <= iou_thres)


def _fast_keep(shifted: jnp.ndarray, valid: jnp.ndarray, iou_thres: float, chunk: int = 64) -> jnp.ndarray:
    """One-shot matrix NMS (Fast-NMS): suppressed boxes still suppress others.

    Slab-wise column-max accumulation: IoU rows are computed on the fly per
    chunk, so the (K, K) matrix is never materialized in HBM.
    """
    k = shifted.shape[0]
    chunk = min(chunk, k)
    while k % chunk:
        chunk //= 2
    idx = jnp.arange(k)

    def body(max_iou, ci):
        base = ci * chunk
        rows = box_iou(jax.lax.dynamic_slice(shifted, (base, 0), (chunk, 4)), shifted)  # (chunk, K)
        vmask = jax.lax.dynamic_slice(valid, (base,), (chunk,))
        row_ids = base + jnp.arange(chunk)
        triu = (row_ids[:, None] < idx[None, :]) & vmask[:, None]
        return jnp.maximum(max_iou, jnp.max(jnp.where(triu, rows, 0.0), axis=0)), None

    max_iou, _ = jax.lax.scan(body, jnp.zeros((k,), shifted.dtype), jnp.arange(k // chunk))
    return valid & (max_iou <= iou_thres)


def _fixpoint_keep(shifted: jnp.ndarray, valid: jnp.ndarray, iou_thres: float) -> jnp.ndarray:
    """Exact greedy keep via fixpoint iteration (batched; materialized IoU).

    The greedy recurrence keep[j] = valid[j] and no kept i<j suppresses j has a
    unique solution; iterating g(k)[j] = valid[j] & !any(i<j: k[i] & iou>thr)
    makes at least one more prefix index final per sweep, so the while_loop
    converges to exactly the sequential-greedy mask — in practice in ~3-6
    sweeps of cheap (B, K, K) masked reductions instead of K serial scan steps
    (measured 1.8 -> ~0.9 ms at K=256, bs=128; docs/PERF.md round 3). Only used
    when the (B, K, K) IoU fits comfortably in HBM (K <= ~1024).
    """
    iou = jax.vmap(box_iou)(shifted.astype(jnp.float32), shifted.astype(jnp.float32))
    k = shifted.shape[1]
    tri = jnp.arange(k)[:, None] < jnp.arange(k)[None, :]  # i suppresses j only if i < j
    sup = (iou > iou_thres) & tri[None]

    def body(carry):
        keep, _ = carry
        new = valid & ~jnp.any(sup & keep[:, :, None], axis=1)
        return new, jnp.any(new != keep)

    keep, _ = jax.lax.while_loop(lambda c: c[1], body, (valid, jnp.bool_(True)))
    return keep


def _fixpoint_keep_chunked(shifted: jnp.ndarray, valid: jnp.ndarray, iou_thres: float,
                           chunk: int = 512) -> jnp.ndarray:
    """Exact greedy keep via fixpoint sweeps with on-the-fly IoU slabs (large K).

    Same fixpoint as _fixpoint_keep — iterate g(k)[j] = valid[j] & !any(i<j:
    k[i] & iou(i,j) > thr) until stationary — but each sweep evaluates the
    "any" by scanning (chunk, K) IoU slabs like _fast_keep, so the (K, K)
    matrix never materializes. For the validator's K=8192 multi-label path
    this trades ~sweeps x slab recompute for ~K/chunk x less serialization
    vs _greedy_keep's 256-step scan (real detection data converges in a
    handful of sweeps; adversarial alternating chains degrade toward K
    sweeps, which the while_loop still terminates). Batched over B.
    """
    b, k = shifted.shape[0], shifted.shape[1]
    chunk = min(chunk, k)
    while k % chunk:
        chunk //= 2
    idx = jnp.arange(k)
    shifted32 = shifted.astype(jnp.float32)

    def sweep(keep):
        def body(max_iou, ci):
            base = ci * chunk
            slab = jax.lax.dynamic_slice(shifted32, (0, base, 0), (b, chunk, 4))
            rows = jax.vmap(box_iou)(slab, shifted32)  # (B, chunk, K)
            kmask = jax.lax.dynamic_slice(keep, (0, base), (b, chunk))
            row_ids = base + jnp.arange(chunk)
            tri = (row_ids[:, None] < idx[None, :])[None] & kmask[:, :, None]
            return jnp.maximum(max_iou, jnp.max(jnp.where(tri, rows, 0.0), axis=1)), None

        max_iou, _ = jax.lax.scan(body, jnp.zeros((b, k), jnp.float32), jnp.arange(k // chunk))
        return valid & (max_iou <= iou_thres)

    def body(carry):
        keep, _ = carry
        new = sweep(keep)
        return new, jnp.any(new != keep)

    keep, _ = jax.lax.while_loop(lambda c: c[1], body, (valid, jnp.bool_(True)))
    return keep


def _blocked_keep(shifted: jnp.ndarray, valid: jnp.ndarray, iou_thres: float,
                  block: int = 1024) -> jnp.ndarray:
    """Exact greedy keep for large K via score-ordered blocks (batched).

    Candidates arrive score-sorted, so greedy decomposes exactly: resolve one
    `block`-sized prefix with the batched fixpoint (exact greedy given the
    incoming alive mask), then mask every LATER candidate suppressed by this
    block's kept items with ONE dense (block, K_rest) IoU pass, and move on.
    ~K/block sequential units of dense MXU/VPU work instead of _greedy_keep's
    K/32 serial scan steps (the round-3 large-K pain: 27.7 ms/batch at K=8192,
    B=8). Each block is wrapped in lax.cond so fully-suppressed tails cost one
    predicate reduce instead of a fixpoint + cross pass (real validation data
    rarely has > ~1-2k alive candidates at conf=0.001).
    """
    b, k = valid.shape
    block = min(block, k)
    while k % block:
        block //= 2
    nb = k // block
    shifted32 = shifted.astype(jnp.float32)
    keep = jnp.zeros_like(valid)
    alive = valid
    for bi in range(nb):
        seg = shifted32[:, bi * block:(bi + 1) * block]
        alive_seg = alive[:, bi * block:(bi + 1) * block]

        def do(seg=seg, alive_seg=alive_seg, bi=bi):
            kb = _fixpoint_keep(seg, alive_seg, iou_thres)  # (B, block) exact
            if bi + 1 < nb:
                rest = shifted32[:, (bi + 1) * block:]
                cross = jax.vmap(box_iou)(seg, rest)  # (B, block, K_rest)
                supp = jnp.any(kb[:, :, None] & (cross > iou_thres), axis=1)
                return kb, supp
            return kb, jnp.zeros((b, 0), bool)

        def skip(bi=bi):
            return (jnp.zeros((b, block), bool),
                    jnp.zeros((b, k - (bi + 1) * block if bi + 1 < nb else 0), bool))

        kb, supp = jax.lax.cond(jnp.any(alive_seg), do, skip)
        keep = keep.at[:, bi * block:(bi + 1) * block].set(kb)
        if bi + 1 < nb:
            alive = alive.at[:, (bi + 1) * block:].set(alive[:, (bi + 1) * block:] & ~supp)
    return keep


# Large-K (> 1024) exact-greedy strategy: "scan" = per-image chunked serial scan
# (_greedy_keep), "fixpoint" = batched chunked fixpoint sweeps, "blocked" =
# score-ordered block fixpoint + dense cross-suppression passes. All three are
# bit-identical to sequential greedy. "blocked" replaces ~256 serial scan steps
# with ~K/1024 dense units and skips dead tails via lax.cond — measured on the
# validator workload before flipping (docs/PERF.md round 4). Read at TRACE time:
# set before the first NMS call of the process.
LARGE_K_MODE = "blocked"

# Candidate-logit gather strategy for nms_from_feats step 3 (trace-time
# constants; all three forms emit bit-identical detections — gated by
# tests/test_ops.py::test_nms_from_feats_gather_modes_identical):
#   "blocked" two-level one-hot gather (decode.take_rows_blocked) + K-row DFL:
#             idx = hi*block + lo keeps the one-hot at (K, A/block) and the
#             intermediate at (K, block, 4R) — ~2x less HBM traffic than "ohg".
#             Measured fastest e2e at bs=128/K=300: blk8 16.56 vs blk16 16.75 /
#             blk32 17.86 / ohg 17.08 / dfl_all 17.06 ms/batch
#             (docs/r4_queue5_results.log) -> default, block=8
#   "ohg"     flat one-hot (K, A) MXU matmul of the box logits + K-row DFL
#   "dfl_all" DFL expectation for ALL anchors (segment matmuls) + narrow (K,4)
#             gathers — the only form that scales to validator-sized K, so K >
#             OHG_MAX_K always uses it (a (B, 8192, 8400) one-hot is ~HBM-sized)
# A sixth formulation — a Pallas VMEM row-gather (stream each image's (A, 4R)
# slab into VMEM, gather rows with aligned 8-sublane windows + arithmetic
# one-hots) — was built and measured SLOWER in r5: 18.41 vs blk8's 16.68
# ms/batch e2e at bs=128/K=300 (docs/PERF.md round 5; the serialized per-row
# VMEM loop loses to the MXU-dense blocked one-hot contractions), so it was
# deleted by the flip-or-delete rule.
# YLT_GATHER_MODE env lets the benchmark queue A/B modes on the unmodified
# artifact (trace-time read, like the constant itself).
GATHER_MODE = os.environ.get("YLT_GATHER_MODE", "blocked")
OHG_MAX_K = 1024
GATHER_BLOCK = 8


def _keep_large_k(shifted: jnp.ndarray, valid: jnp.ndarray, iou_thres: float) -> jnp.ndarray:
    if LARGE_K_MODE == "fixpoint":
        return _fixpoint_keep_chunked(shifted, valid, iou_thres)
    if LARGE_K_MODE == "blocked":
        return _blocked_keep(shifted, valid, iou_thres)
    return jax.vmap(functools.partial(_greedy_keep, iou_thres=iou_thres))(shifted, valid)


def _select_candidates(boxes, scores, conf_thres, max_cand, multi_label, class_mask):
    """Per-image: gate + top-K candidate selection -> (vals, boxes_k, cls, valid).

    """
    a, nc = scores.shape
    if class_mask is not None:
        scores = jnp.where(class_mask[None, :], scores, 0.0)
    if multi_label and nc > 1:
        k = min(max_cand, a * nc)
        flat = scores.reshape(-1)
        gated = jnp.where(flat > conf_thres, flat, -1.0)
        vals, fidx = jax.lax.top_k(gated, k)
        bidx = fidx // nc
        cls = (fidx % nc).astype(jnp.float32)
    else:
        k = min(max_cand, a)
        conf = jnp.max(scores, axis=-1)
        cls_i = jnp.argmax(scores, axis=-1)
        gated = jnp.where(conf > conf_thres, conf, -1.0)
        vals, bidx = jax.lax.top_k(gated, k)
        # note: argmax over all anchors beats a per-candidate row gather on TPU
        # (XLA row-gather of (K, nc) from (A, nc) lowers worse than the dense reduce)
        cls = cls_i[bidx].astype(jnp.float32)
    cand_boxes = boxes[bidx]
    valid = vals > jnp.maximum(conf_thres, 0.0)
    return vals, cand_boxes, cls, valid


def _finalize(cand_boxes, vals, cls, keep, max_det):
    """Per-image: emit the kept candidates as a padded (max_det, 6) block.

    Candidates arrive score-descending from selection, and suppression never
    reorders, so ranking reduces to an order-preserving compaction: each kept
    row scatters to rank cumsum(keep)-1 via a tiny one-hot matmul (no second
    top_k sort; measured -0.65 ms at bs=128, docs/PERF.md round 3). Output is
    identical to the previous top_k-based ranking, including tie order and the
    all-zero padding rows.
    """
    keep = keep & (vals > 0)
    pos = jnp.cumsum(keep) - 1
    pos = jnp.where(keep & (pos < max_det), pos, max_det)  # overflow -> dropped row
    oh = jax.nn.one_hot(pos, max_det + 1, dtype=jnp.float32)  # (K, max_det+1)
    rows = jnp.concatenate(
        [cand_boxes.astype(jnp.float32), vals.astype(jnp.float32)[:, None],
         cls.astype(jnp.float32)[:, None]],
        axis=-1,
    )
    return oh[:, :max_det].T @ rows


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "max_det", "max_cand", "multi_label", "agnostic", "mode"),
)
def non_max_suppression(
    boxes: jnp.ndarray,  # (B, A, 4) xyxy, input-image pixels
    scores: jnp.ndarray,  # (B, A, nc) sigmoid probabilities
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_cand: int = 1024,
    multi_label: bool = False,
    agnostic: bool = False,
    class_mask: Optional[jnp.ndarray] = None,
    mode: str = "greedy",
) -> jnp.ndarray:
    """Batched class-aware NMS -> (B, max_det, 6) padded detections.

    mode: 'greedy' (exact torchvision semantics), 'pallas' (VMEM kernel, exact),
    'fast' (one-shot matrix NMS, slightly over-suppresses). A fourth 'serve'
    mode (approx_max_k + Fast-NMS) was deleted in round 4: after the
    select-first rework it LOST to exact greedy at bs=128 throughput (7,076 vs
    7,411 img/s, BENCH_r03) and won <=2% at bs=1 latency
    (docs/r4_latency_results.log) — not worth a mode.
    """
    vals, cand_boxes, cls, valid = jax.vmap(
        functools.partial(
            _select_candidates,
            conf_thres=conf_thres,
            max_cand=max_cand,
            multi_label=multi_label,
            class_mask=class_mask,
        )
    )(boxes, scores)

    offset = jnp.zeros_like(cls) if agnostic else cls * MAX_WH
    shifted = cand_boxes + offset[..., None]

    if mode == "pallas":
        from yololite_tpu.ops.pallas_kernels import greedy_nms_keep_pallas

        iou = jax.vmap(box_iou)(shifted, shifted)
        keep = greedy_nms_keep_pallas(iou, valid, iou_thres) > 0
    elif mode == "fast":
        keep = (_fast_keep_batched(shifted, valid, iou_thres) if shifted.shape[1] <= 1024 else
                jax.vmap(functools.partial(_fast_keep, iou_thres=iou_thres))(shifted, valid))
    elif shifted.shape[1] <= 1024:  # exact greedy: fixpoint sweeps beat the serial scan
        keep = _fixpoint_keep(shifted, valid, iou_thres)
    else:  # large K (validator max_cand=8192): (B,K,K) IoU won't fit
        keep = _keep_large_k(shifted, valid, iou_thres)

    return jax.vmap(functools.partial(_finalize, max_det=max_det))(cand_boxes, vals, cls, keep)


def nms_from_feats(
    feats,
    strides,
    nc: int,
    reg_max: int = 16,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_cand: int = 512,
    agnostic: bool = False,
    class_mask: Optional[jnp.ndarray] = None,
    mode: str = "greedy",
    half: bool = False,
    multi_label: bool = False,
) -> jnp.ndarray:
    """Fused select-first NMS over raw Detect maps -> padded (B, max_det, 6).

    The measured-fastest exact pipeline on v5e (docs/PERF.md round 3; 21.6 ->
    16.4 ms/batch e2e at bs=128 vs decode_detections + non_max_suppression):

    1. per-level sigmoid(max(logits)) + argmax, fused into the head epilogues
       (no 144-wide feature concat; sigmoid(max) == max(sigmoid) bitwise);
    2. exact per-level top-k then a merge top-k (each global top-K element is
       in its level's top-K, and level-major merge order preserves lax.top_k's
       lowest-index tie rule) — same (vals, bidx) as one 8400-row top_k;
    3. candidate box logits via a one-hot MXU matmul (K <= OHG_MAX_K) feeding a
       K-row DFL, or DFL-all (decode.dfl_expectation_mm) + narrow (K,4) gathers
       at validator-sized K — either way no wide (K,64) row-gather, the TPU
       pathology (~3.7 ms);
    4. anchor centers/strides rebuilt arithmetically from the candidate index
       (level offsets are static) instead of gathered;
    5. fixpoint-sweep greedy suppression + compaction finalize (_finalize).

    Matches decode_detections + non_max_suppression(multi_label=False) to
    ~1e-6 relative (the segment-matmul DFL rounds differently); selection
    order, suppression and ranking are exactly equivalent. Replaces the
    reference hot loop's decode-everything-then-host-NMS (predictor.py:149-225,
    head.py:95-126, utils/ops.py:138-273).

    multi_label=True selects over the flattened (anchor x class) axis instead
    (one candidate per above-threshold class, the validator semantics of
    reference ops.py:225-233): per-level top-k over (H*W*nc) gated scores with
    level-major flat indices, then the same merge/decode/suppression — tie
    order identical to non_max_suppression(multi_label=True)'s single flat
    top_k (each global top-K element is in its level's top-K; level-major
    concat preserves lax.top_k's lowest-index tie rule).
    """
    from yololite_tpu.ops.decode import dfl_expectation_mm

    B = feats[0].shape[0]
    shapes = [(f.shape[1], f.shape[2]) for f in feats]

    # 1+2: per-level gate/reduce/top-k, then merge. The max/argmax run over the
    # sigmoid (not raw logits): bf16 sigmoid is not strictly monotone, so this
    # keeps bit-identical class/tie decisions with the decode_detections path.
    ml = multi_label and nc > 1
    k = min(max_cand, sum(h * w for h, w in shapes) * (nc if ml else 1))
    vs, ids, clss = [], [], []
    off = 0
    for f in feats:
        cl = f[..., 4 * reg_max:]
        s_full = jax.nn.sigmoid(cl if half else cl.astype(jnp.float32))
        if class_mask is not None:
            s_full = jnp.where(class_mask, s_full, 0.0)
        if ml:  # flat (anchor x class) selection; global flat idx = (off + a) * nc + c
            s = s_full.reshape(B, -1)  # (B, H*W*nc)
            kl = min(k, s.shape[1])
            v, i = jax.lax.top_k(jnp.where(s > conf_thres, s, -1.0), kl)
            vs.append(v)
            ids.append(i + off * nc)
        else:
            s = jnp.max(s_full, axis=-1).reshape(B, -1)  # (B, H*W)
            clss.append(jnp.argmax(s_full, axis=-1).reshape(B, -1))
            kl = min(k, s.shape[1])
            v, i = jax.lax.top_k(jnp.where(s > conf_thres, s, -1.0), kl)
            vs.append(v)
            ids.append(i + off)
        off += f.shape[1] * f.shape[2]
    vals, j = jax.lax.top_k(jnp.concatenate(vs, axis=1), k)  # (B, K)
    sel = jnp.take_along_axis(jnp.concatenate(ids, axis=1), j, axis=1)
    if ml:
        bidx = sel // nc
        cls_k = (sel % nc).astype(jnp.float32)
    else:
        bidx = sel

    # 3: candidate box logits -> DFL expectation, by GATHER_MODE (see the
    # constants above; all forms bit-identical, picked by measurement).
    box_logits = jnp.concatenate(
        [f[..., : 4 * reg_max].reshape(B, -1, 4 * reg_max) for f in feats], axis=1
    )
    gm = GATHER_MODE if k <= OHG_MAX_K else "dfl_all"
    if gm == "ohg":
        A = box_logits.shape[1]
        oh = jax.nn.one_hot(bidx, A, dtype=box_logits.dtype)  # (B, K, A)
        cand_logits = jnp.einsum("bka,bar->bkr", oh, box_logits)
        dist = dfl_expectation_mm(cand_logits, reg_max)  # (B, K, 4) f32
    elif gm == "blocked":
        from yololite_tpu.ops.decode import take_rows_blocked

        cand_logits = take_rows_blocked(box_logits, bidx, GATHER_BLOCK)
        dist = dfl_expectation_mm(cand_logits, reg_max)  # (B, K, 4) f32
    else:
        dist_all = dfl_expectation_mm(box_logits, reg_max)  # (B, A, 4) f32
        dist = jax.vmap(lambda d, i: d[i])(dist_all, bidx)  # narrow (K, 4) gather
    if not ml:
        cls_all = jnp.concatenate(clss, axis=1).astype(jnp.float32)
        if gm == "blocked":
            from yololite_tpu.ops.decode import take_rows_blocked

            cls_k = take_rows_blocked(cls_all[..., None], bidx, GATHER_BLOCK)[..., 0]
        else:
            cls_k = jax.vmap(lambda c, i: c[i])(cls_all, bidx)

    # 4: arithmetic anchors (grid x/y + 0.5, per-level stride) from bidx
    offs, Ws, Ss = [], [], []
    o = 0
    for (h, w), s_ in zip(shapes, strides):
        offs.append(o)
        Ws.append(w)
        Ss.append(int(s_))
        o += h * w
    lvl = jnp.zeros_like(bidx)
    for i in range(1, len(offs)):
        lvl = jnp.where(bidx >= offs[i], i, lvl)
    off_l = sum(jnp.where(lvl == i, offs[i], 0) for i in range(len(offs)))
    W_l = sum(jnp.where(lvl == i, Ws[i], 0) for i in range(len(offs)))
    S_l = sum(jnp.where(lvl == i, Ss[i], 0) for i in range(len(offs))).astype(jnp.float32)
    local = bidx - off_l
    ax = (local % W_l).astype(jnp.float32) + 0.5
    ay = (local // W_l).astype(jnp.float32) + 0.5
    cand_boxes = jnp.stack(
        [(ax - dist[..., 0]) * S_l, (ay - dist[..., 1]) * S_l,
         (ax + dist[..., 2]) * S_l, (ay + dist[..., 3]) * S_l],
        axis=-1,
    )
    valid = vals > jnp.maximum(conf_thres, 0.0)

    # 5: suppression + compaction
    offset = jnp.zeros_like(cls_k) if agnostic else cls_k * MAX_WH
    shifted = cand_boxes + offset[..., None]
    if mode == "fast":
        keep = (_fast_keep_batched(shifted, valid, iou_thres) if k <= 1024 else
                jax.vmap(functools.partial(_fast_keep, iou_thres=iou_thres))(shifted, valid))
    elif k <= 1024:
        keep = _fixpoint_keep(shifted, valid, iou_thres)
    else:
        keep = _keep_large_k(shifted, valid, iou_thres)
    return jax.vmap(functools.partial(_finalize, max_det=max_det))(cand_boxes, vals, cls_k, keep)


