"""Post-training int8 quantization for the serving path.

The bf16 forward is HBM-bandwidth-bound on TPU (docs/PERF.md); int8 weights AND
int8 activations between convs halve the traffic and run the MXU at its higher
int8 rate. Design:

- Symmetric per-output-channel int8 weights, folded AFTER Conv+BN fusion.
- One global activation scale (`s_act`) for every int8 edge, calibrated as the
  max post-activation absmax over a few representative batches. A single scale
  makes residual adds (saturating int16) and concats free of rescaling.
- bf16 islands: attention (PSABlock/Attention) and the Detect logits stay
  bf16 — quantized convs at island boundaries quantize on the fly (sin) or skip
  the output requant (no `sout`), and excluded convs carry `deq_s` so an int8
  edge into them dequantizes inline.

The reference has no quantized path (pure fp32/fp16 torch); this is TPU-native
serving infrastructure beyond parity. Accuracy is validated against the bf16
path on coco8 (tests/test_quant.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yololite_tpu.models import modules as M
from yololite_tpu.models import zoo as Z


def calibrate(model, params, state, batches) -> Dict:
    """Run bf16 forwards with calibration taps; return {'s_act', 'per_path'} scales.

    `batches`: iterable of (B, H, W, 3) float arrays in [0, 1].
    """
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    p_h, s_h = cast(params), cast(state)
    per_path: Dict[Tuple[str, ...], float] = {}
    for images in batches:
        ctx = M.Ctx(train=False, calibrate=True)
        model.apply(p_h, s_h, jnp.asarray(images, jnp.bfloat16), train=False, ctx=ctx)
        for path, v in ctx.act_absmax.items():
            v = float(v)
            per_path[path] = max(per_path.get(path, 0.0), v)
    s_act = max(per_path.values()) / 127.0
    return {"s_act": s_act, "per_path": {k: v / 127.0 for k, v in per_path.items()}}


def _quantize_conv(mod: M.Conv, fused: Dict, s_act: float, sin: float, requant: bool) -> Dict:
    """Fused Conv params {'conv': {'w','b'}} -> quantized params with a 'q' entry."""
    w = np.asarray(fused["conv"]["w"], np.float32)
    sw = np.abs(w).reshape(-1, w.shape[-1]).max(0) / 127.0  # per-output-channel
    sw = np.maximum(sw, 1e-12)
    wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
    q = {
        "w": jnp.asarray(wq),
        "sw": jnp.asarray(sw, jnp.float32),
        "sin": jnp.float32(sin),
    }
    if requant:
        q["sout"] = jnp.float32(s_act)
    return {"conv": {"b": jnp.asarray(np.asarray(fused["conv"]["b"], np.float32))}, "q": q}


def quantize_tree(model, fused_params: Dict, scales: Dict) -> Dict:
    """Walk the module graph and quantize every eligible Conv's fused params.

    Exclusions (stay bf16, get `deq_s` for inline dequant of int8 inputs):
      - everything under Attention / PSABlock (the C2PSA bf16 island)
      - Detect's final Conv2d logit layers
      - the Conv feeding a bf16 island loses its output requant (`sout` absent)
    """
    s_act = float(scales["s_act"])

    def conv_sin(path) -> float:
        # One global activation scale for every int8 edge, by design: YOLO's
        # concat/residual junction density means per-edge scales would need a
        # rescale op at every junction (extra elementwise HBM passes on a
        # bandwidth-bound model), while a single scale makes the int16
        # saturating adds and concats free. The per-path absmaxes in `scales`
        # quantify the spread (tools/int8_acc.py measures the mAP cost of the
        # shared scale against bf16).
        return s_act

    def walk(mod, params, path, quantize_ok: bool, requant: bool):
        if isinstance(mod, (M.Attention, M.PSABlock)):
            quantize_ok = False
        if isinstance(mod, M.Conv):  # includes DWConv
            if quantize_ok and "q" not in params and "b" in params.get("conv", {}):
                return _quantize_conv(mod, params, s_act, conv_sin(path), requant)
            out = dict(params)
            out["deq_s"] = jnp.float32(s_act)
            return out
        if isinstance(mod, M.Conv2d):
            out = dict(params)
            out["deq_s"] = jnp.float32(s_act)
            return out
        if isinstance(mod, M.Detect):
            out = dict(params)
            for branch in ("cv2", "cv3"):
                ml: M.ModList = mod.sub[branch]
                bp = dict(out.get(branch, {}))
                for i, seq in enumerate(ml.mods):
                    sp = dict(bp.get(str(i), {}))
                    mods = seq.mods
                    for j, sub in enumerate(mods):
                        feeds_logits = j == len(mods) - 2  # conv before the Conv2d head
                        sp[str(j)] = walk(sub, sp.get(str(j), {}), path + (branch, str(i), str(j)),
                                          quantize_ok, requant=not feeds_logits)
                    bp[str(i)] = sp
                out[branch] = bp
            return out
        if isinstance(mod, M.C2PSA):
            out = dict(params)
            # cv1 feeds the attention island: quantized math, bf16 output
            out["cv1"] = walk(mod.sub["cv1"], out.get("cv1", {}), path + ("cv1",), quantize_ok, requant=False)
            out["m"] = walk(mod.sub["m"], out.get("m", {}), path + ("m",), False, requant)
            out["cv2"] = walk(mod.sub["cv2"], out.get("cv2", {}), path + ("cv2",), quantize_ok, requant)
            return out
        if isinstance(mod, (M.Seq, M.ModList)) or (hasattr(mod, "mods") and isinstance(getattr(mod, "mods"), list)):
            out = dict(params)
            for i, sub in enumerate(mod.mods):
                out[str(i)] = walk(sub, out.get(str(i), {}), path + (str(i),), quantize_ok, requant)
            return out
        if hasattr(mod, "sub"):
            out = dict(params)
            for name, sub in mod.sub.items():
                out[name] = walk(sub, out.get(name, {}), path + (name,), quantize_ok, requant)
            return out
        return params

    new = {}
    for row in model.rows:
        key = str(row.i)
        new[key] = walk(row.mod, fused_params.get(key, {}), (key,), True, True)
    return new


def quantize_model(model, params, state, calib_batches):
    """fuse -> calibrate -> quantize. Returns (q_params, fused_state, scales)."""
    from yololite_tpu.models.modules import fuse_tree

    fused_p, fused_s = fuse_tree(params, state)
    scales = calibrate(model, fused_p, fused_s, calib_batches)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)
    q_params = quantize_tree(model, fused_p, scales)
    return q_params, cast(fused_s), scales
