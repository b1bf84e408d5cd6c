"""Graph builder: YOLO architecture DSL -> functional JAX model.

Replaces the reference's eval()-driven `parse_model` (nn/tasks.py:525-664) with an
explicit registry. The spec is resolved once at build time into a static Python
list of module objects; the jitted forward is a trace-time loop over that list
with skip-buffer wiring, so XLA sees one flat graph.
"""

from __future__ import annotations

import math
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from yololite_tpu.utils import LOGGER, ROOT, yaml_load
from yololite_tpu.models import modules as M

# Registry of spec-name -> (module class, kind). Kinds drive arg rewriting:
#   'ch'      : args = [c1, c2_scaled, *rest]
#   'repeat'  : additionally insert repeat count n after c2
#   'plain'   : args used as-is
def _registry() -> Dict[str, Tuple[type, str]]:
    from yololite_tpu.models import transformer as T
    from yololite_tpu.models import zoo as Z

    reg = {
        # YOLO11 path
        "Conv": (M.Conv, "ch"),
        "DWConv": (M.DWConv, "ch"),
        "Bottleneck": (M.Bottleneck, "ch"),
        "SPPF": (M.SPPF, "ch"),
        "C2f": (M.C2f, "repeat"),
        "C3": (M.C3, "repeat"),
        "C3k2": (M.C3k2, "repeat"),
        "C2PSA": (M.C2PSA, "repeat"),
        "Concat": (M.Concat, "plain"),
        "nn.Upsample": (M.Upsample, "plain"),
        "Upsample": (M.Upsample, "plain"),
        "Detect": (M.Detect, "detect"),
        # extended zoo (reference nn/modules, SURVEY.md §2 #35)
        "Focus": (Z.Focus, "ch"),
        "GhostConv": (Z.GhostConv, "ch"),
        "GhostBottleneck": (Z.GhostBottleneck, "ch"),
        "ConvTranspose": (Z.ConvTranspose, "ch"),
        "RepConv": (Z.RepConv, "ch"),
        "LightConv": (Z.LightConv, "ch"),
        "SPP": (Z.SPP, "ch"),
        "SPPELAN": (Z.SPPELAN, "ch"),
        "RepNCSPELAN4": (Z.RepNCSPELAN4, "ch"),
        "ELAN1": (Z.ELAN1, "ch"),
        "AConv": (Z.AConv, "ch"),
        "ADown": (Z.ADown, "ch"),
        "SCDown": (Z.SCDown, "ch"),
        "PSA": (Z.PSA, "ch"),
        "C1": (Z.C1, "repeat"),
        "C2": (Z.C2, "repeat"),
        "C3x": (Z.C3x, "repeat"),
        "C3Ghost": (Z.C3Ghost, "repeat"),
        "C3TR": (T.C3TR, "repeat"),
        "RepC3": (Z.RepC3, "repeat"),
        "RepCSP": (Z.RepCSP, "repeat"),
        "BottleneckCSP": (Z.BottleneckCSP, "repeat"),
        "C2fCIB": (Z.C2fCIB, "repeat"),
        "C2fPSA": (Z.C2fPSA, "repeat"),
        "C3f": (Z.C3f, "repeat"),
        "CIB": (Z.CIB, "ch"),
        "RepVGGDW": (Z.RepVGGDW, "plainch"),
        "CBAM": (Z.CBAM, "plainch"),
        "ChannelAttention": (Z.ChannelAttention, "plainch"),
        "HGStem": (Z.HGStem, "hg"),
        "HGBlock": (Z.HGBlock, "hg"),
        "ResNetLayer": (Z.ResNetLayer, "resnet"),
        "CBLinear": (Z.CBLinear, "cblinear"),
        "CBFuse": (Z.CBFuse, "cbfuse"),
        "AIFI": (T.AIFI, "aifi"),
        "TransformerBlock": (T.TransformerBlock, "ch"),
        "Proto": (Z.Proto, "ch"),
        "Conv2": (Z.Conv2, "ch"),
        "DWConvTranspose2d": (Z.DWConvTranspose2d, "ch"),
        "MaxSigmoidAttnBlock": (Z.MaxSigmoidAttnBlock, "ch"),
        "C2fAttn": (Z.C2fAttn, "repeat"),
        "ImagePoolingAttn": (Z.ImagePoolingAttn, "imgpool"),
        "ContrastiveHead": (Z.ContrastiveHead, "plain"),
        "BNContrastiveHead": (Z.BNContrastiveHead, "plainch"),
    }
    return reg


REGISTRY: Dict[str, Tuple[type, str]] = _registry()


def make_divisible(x, divisor=8):
    """Round channel count up to the nearest multiple of divisor."""
    return math.ceil(x / divisor) * divisor


def guess_model_scale(model_path) -> str:
    """Extract the scale letter from a name like yolo11n.yaml / yolo11s.pt."""
    m = re.search(r"yolo[v]?\d+([nslmx])", Path(str(model_path)).stem)
    return m.group(1) if m else ""


def yaml_model_load(path) -> Dict:
    """Load an architecture yaml, resolving the scale from the filename."""
    path = Path(str(path))
    stem = path.stem
    scale = guess_model_scale(stem)
    unified = re.sub(r"(\d+)([nslmx])(.+)?$", r"\1\3", stem)  # yolo11n -> yolo11
    candidates = [path, ROOT / "cfg" / path.name, ROOT / "cfg" / f"{unified}{path.suffix or '.yaml'}"]
    for p in candidates:
        if p.exists():
            d = yaml_load(p, append_filename=True)
            d["scale"] = scale or d.get("scale") or tuple(d.get("scales", {"n": 0}).keys())[0]
            return d
    raise FileNotFoundError(f"Model yaml '{path}' not found (searched {candidates})")


class Row:
    """One resolved spec row: module instance + graph wiring."""

    def __init__(self, i: int, f: Union[int, List[int]], mod: M.Module, name: str, args):
        self.i = i
        self.f = f
        self.mod = mod
        self.name = name
        self.args = args


def _check_stride(sp, layer_idx: int) -> int:
    """Validate a Detect input's cumulative downscale: positive integer power of two."""
    s = int(sp)
    if s != sp or s <= 0 or (s & (s - 1)) != 0:
        raise ValueError(f"invalid Detect stride {sp!r} inferred for layer {layer_idx}; "
                         "a module in the chain is missing a `downsample` declaration")
    return s


def parse_spec(d: Dict, ch_in: int = 3, verbose: bool = False) -> Tuple[List[Row], List[int], int, List[int]]:
    """Resolve a model dict into rows, save-list, nc, and detect strides.

    Applies the reference's compound scaling (nn/tasks.py:593-624): depth gain on
    repeats, width gain + max_channels clamp on output channels, c3k=True for
    m/l/x C3k2 blocks.
    """
    nc = d.get("nc", 80)
    scales = d.get("scales")
    depth, width, max_channels = 1.0, 1.0, float("inf")
    scale = d.get("scale")
    if scales:
        if not scale:
            scale = tuple(scales.keys())[0]
        depth, width, max_channels = scales[scale]

    ch = [ch_in]
    spatial = [1]  # cumulative downscale per produced layer (input=1)
    rows: List[Row] = []
    save: List[int] = []
    detect_strides: List[int] = []

    for i, (f, n, name, args) in enumerate(d["backbone"] + d["head"]):
        args = list(args)
        for j, a in enumerate(args):
            if a == "nc":
                args[j] = nc
        cls, kind = REGISTRY[name]
        n_scaled = max(round(n * depth), 1) if n > 1 else n

        prev = f if isinstance(f, int) else f[0]
        if kind in ("ch", "repeat"):
            c1, c2 = ch[prev], args[0]
            if c2 != nc:
                c2 = make_divisible(min(c2, max_channels) * width, 8)
            margs = [c1, c2, *args[1:]]
            if kind == "repeat":
                margs.insert(2, n_scaled)
                n_scaled = 1
            if name == "C2fAttn" and len(margs) > 4:
                # embed-channel + head-count width scaling (reference tasks.py:597-601)
                margs[3] = make_divisible(min(margs[3], max_channels // 2) * width, 8)
                margs[4] = int(max(round(min(margs[4], max_channels // 2 // 32)) * width, 1) if margs[4] > 1 else margs[4])
            if name == "C3k2" and scale in "mlx":
                # c3k flag is margs[3] ([c1, c2, n, c3k, ...])
                if len(margs) > 3:
                    margs[3] = True
                else:
                    margs.append(True)
            mod = cls(*margs)
            sp = None  # resolved below from mod.downsample (after any Seq wrap)
        elif kind == "plain":
            mod = cls(*args)
            if name == "Concat":
                c2 = sum(ch[x] for x in f)
                sp = spatial[f[0]]
            else:  # Upsample
                c2 = ch[prev]
                sp = spatial[prev] * mod.downsample
            margs = args
        elif kind == "detect":
            in_ch = [ch[x] for x in f]
            # optional second yaml arg flips the NMS-free one-to-one branch pair
            # (reference head.py:22 `end2end` class attr, set by v10-style heads)
            e2e = bool(args[1]) if len(args) > 1 else False
            mod = cls(nc, in_ch, end2end=e2e)
            mod.stride = [_check_stride(spatial[x], x) for x in f]
            detect_strides = mod.stride
            c2 = 0
            sp = 0
            margs = [nc, in_ch]
        elif kind == "imgpool":  # ImagePoolingAttn: ch list appended (reference tasks.py:640)
            margs = [*args, [ch[x] for x in f]]
            mod = cls(*margs)
            c2 = 512  # output is the text embedding (ct, default 512; yaml passes only ec)
            sp = spatial[f[0] if isinstance(f, (list, tuple)) else f]
        elif kind == "plainch":  # module(c1, *args): RepVGGDW / CBAM / ChannelAttention
            c2 = ch[prev]
            margs = [c2, *args]
            mod = cls(*margs)
            sp = None
        elif kind == "hg":  # HGStem / HGBlock: (c1, cm, c2, ...)
            c1, cm, c2 = ch[prev], args[0], args[1]
            margs = [c1, cm, c2, *args[2:]]
            if name == "HGBlock":
                margs.insert(4, n_scaled)  # repeats after k
                n_scaled = 1
            mod = cls(*margs)
            sp = None
        elif kind == "resnet":  # yaml args are the full (c1, c2, s, is_first, n) signature
            margs = list(args)
            is_first = margs[3] if len(margs) > 3 else False
            c2 = margs[1] if is_first else margs[1] * 4  # reference tasks.py:634
            mod = cls(*margs)
            sp = spatial[prev] * (4 if is_first else (margs[2] if len(margs) > 2 else 1))
        elif kind == "cblinear":
            c2 = args[0]  # list of split channel counts
            margs = [ch[prev], *args]
            mod = cls(*margs)
            sp = spatial[prev]
        elif kind == "cbfuse":
            c2 = ch[f[-1]]
            margs = args
            mod = cls(*margs)
            sp = spatial[f[-1]]
        elif kind == "aifi":
            c2 = ch[prev]
            margs = [c2, *args]
            mod = cls(*margs)
            sp = spatial[prev]
        else:  # pragma: no cover
            raise KeyError(name)

        if n_scaled > 1:
            mod = M.Seq(*[cls(*margs) for _ in range(n_scaled)])
        if sp is None:  # generic: every module declares its spatial reduction factor
            sp = spatial[prev] * getattr(mod, "downsample", 1)

        rows.append(Row(i, f, mod, name, margs))
        save.extend(x % i for x in ([f] if isinstance(f, int) else f) if x != -1)
        if i == 0:
            ch = []
            spatial = []
        ch.append(c2)
        spatial.append(sp)
        if verbose:
            LOGGER.info(f"{i:>3} {str(f):>18} {n_scaled:>3}  {name:<12} {margs}")

    return rows, sorted(set(save)), nc, detect_strides


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


class DetectionModel:
    """Functional YOLO detection model.

    Holds the static graph (rows + wiring); parameters/state are explicit pytrees:
        
        feats = model.apply(params, state, x_nhwc, train=False)   # list of 3 NHWC maps
    Raw per-level maps carry 4*reg_max + nc channels; box decoding lives in
    yololite_tpu.ops.decode (device-side, shared by predict/val/loss paths).
    """

    def __init__(self, cfg: Union[str, Dict] = "yolo11n.yaml", ch: int = 3, nc: Optional[int] = None, verbose=False):
        self.yaml = yaml_model_load(cfg) if isinstance(cfg, (str, Path)) else dict(cfg)
        if nc and nc != self.yaml.get("nc"):
            self.yaml["nc"] = nc
        self.rows, self.save, self.nc, self.strides = parse_spec(self.yaml, ch, verbose=verbose)
        self.detect: M.Detect = self.rows[-1].mod
        self.reg_max = self.detect.reg_max
        self.no = self.detect.no
        self.names = {i: f"class{i}" for i in range(self.nc)}
        self.args: Dict = {}

    # ---- parameter lifecycle ----

    def init(self, seed=0) -> Tuple[Dict, Dict]:
        kg = seed if isinstance(seed, M.KeyGen) else M.KeyGen(seed if isinstance(seed, int) else 0)
        params = {}
        state = {}
        for row in self.rows:
            p, s = row.mod.init(kg)
            params[str(row.i)] = p
            state[str(row.i)] = s
        params[str(self.rows[-1].i)] = self.detect.bias_init(params[str(self.rows[-1].i)])
        return params, state

    # ---- forward ----

    def apply(self, params, state, x, train: bool = False, ctx: Optional[M.Ctx] = None,
              start: int = 0):
        """Run the graph. x: (B, H, W, 3) NHWC. Returns list of per-level maps.

        start > 0 resumes mid-graph: x is then the output of row start-1
        (used by the s2d-stem predict path, which runs layer 0 itself on the
        space-to-depth layout; only valid when no skipped row is in the
        save list, which the caller checks).
        """
        ctx = ctx or M.Ctx(train=train)
        saved: Dict[int, jnp.ndarray] = {}
        y = x
        for row in self.rows[start:]:
            if isinstance(row.f, int):
                inp = y if row.f == -1 else saved[row.f]
            else:
                inp = [y if j == -1 else saved[j] for j in row.f]
            k = str(row.i)
            # .get: parameterless rows (Upsample/Concat) have empty dicts that a
            # flatten/unflatten round-trip (npz checkpoints) legitimately drops
            y = row.mod(params.get(k, {}), state.get(k, {}), inp, ctx, (k,))
            if row.i in self.save:
                saved[row.i] = y
            if row.i in ctx.capture and not isinstance(y, (list, tuple)):
                ctx.features[row.i] = y
        return y  # Detect output: list of (B, H, W, no) maps

    def profile_layers(self, params, state, x, n_warmup: int = 1, n_iter: int = 3):
        """Eager per-layer timing table (counterpart of reference tasks.py:155-177).

        Returns [(index, name, ms)]; each row timed with block_until_ready.
        """
        import time

        ctx = M.Ctx(train=False)
        results = []
        saved: Dict[int, jnp.ndarray] = {}
        y = x
        for row in self.rows:
            inp = (
                (y if row.f == -1 else saved[row.f])
                if isinstance(row.f, int)
                else [y if j == -1 else saved[j] for j in row.f]
            )
            k = str(row.i)
            fn = jax.jit(lambda p, s, i, row=row, k=k: row.mod(p.get(k, {}), s.get(k, {}), i, M.Ctx(False), (k,)))
            out = jax.block_until_ready(fn(params, state, inp))
            t0 = time.perf_counter()
            for _ in range(n_iter):
                out = fn(params, state, inp)
            jax.block_until_ready(out)
            results.append((row.i, row.name, (time.perf_counter() - t0) / n_iter * 1e3))
            y = out
            if row.i in self.save:
                saved[row.i] = y
        for i, name, ms in results:
            LOGGER.info(f"{i:>3} {name:<14} {ms:8.3f} ms")
        return results

    def num_params(self, params) -> int:
        return count_params(params)

    def gflops(self, params, state, imgsz: int = 640) -> float:
        """Analytic GFLOPs of one forward at imgsz (counts conv/dot MACs*2).

        Counterpart of the reference's thop-based profile (nn/tasks.py:155-177);
        computed by tracing the jaxpr, so it needs no device or extra deps.
        """
        import jax.numpy as jnp

        x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
        jaxpr = jax.make_jaxpr(lambda p, s, x: self.apply(p, s, x))(params, state, x)

        flops = 0.0

        def walk(jp):
            nonlocal flops
            for eqn in jp.eqns:
                if eqn.primitive.name == "conv_general_dilated":
                    out = eqn.outvars[0].aval.shape
                    rhs = eqn.invars[1].aval.shape  # HWIO
                    kh, kw, cin_g, _ = rhs
                    flops += 2.0 * np.prod(out) * cin_g * kh * kw
                elif eqn.primitive.name in ("dot_general",):
                    lhs = eqn.invars[0].aval.shape
                    out = eqn.outvars[0].aval.shape
                    (lc, _), _ = eqn.params["dimension_numbers"]
                    k = np.prod([lhs[i] for i in lc])
                    flops += 2.0 * np.prod(out) * k
                for sub in eqn.params.values():
                    if hasattr(sub, "jaxpr"):
                        walk(sub.jaxpr)

        walk(jaxpr.jaxpr)
        return float(flops) / 1e9


class EnsembleModel:
    """Multi-model NMS ensemble (reference nn/tasks.py:448-459).

    Members run independently on the same input; their decoded (boxes, scores)
    concatenate along the anchor axis pre-NMS — the TPU-native form of the
    reference Ensemble.forward's `torch.cat(y, 2)` over (B, C, HW) outputs.
    Parameter/state trees are keyed "m0", "m1", ... per member, so fuse_tree /
    dtype casts / mesh replication treat the ensemble as one pytree.
    """

    def __init__(self, members: Sequence["DetectionModel"]):
        if not members:
            raise ValueError("EnsembleModel needs at least one member")
        ncs = {m.nc for m in members}
        if len(ncs) != 1:
            raise ValueError(f"ensemble members disagree on class count: {sorted(ncs)}")
        self.members: List[DetectionModel] = list(members)
        last = self.members[-1]
        self.nc = last.nc
        self.reg_max = last.reg_max
        self.strides = last.strides
        self.names = last.names
        self.args: Dict = {}

    def decode_concat(self, params, state, x, half: bool = False):
        """x NHWC -> (boxes (B, sum_A, 4) fp32 xyxy, scores (B, sum_A, nc)).

        Shared by the predictor's ensemble graph; feeds non_max_suppression
        exactly like the single-model decode-all path.
        """
        from yololite_tpu.ops.decode import decode_detections

        all_boxes, all_scores = [], []
        for i, m in enumerate(self.members):
            key = f"m{i}"
            feats = m.apply(params[key], state.get(key, {}), x, train=False)
            if not half:
                feats = [f.astype(jnp.float32) for f in feats]
            boxes, scores = decode_detections(feats, m.strides, m.nc, m.reg_max, xywh=False)
            all_boxes.append(boxes.astype(jnp.float32))
            all_scores.append(scores)
        return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_scores, axis=1)

    def num_params(self, params) -> int:
        return count_params(params)


def guess_model_task(model) -> str:
    """Task of a model/spec: this framework is detection-only (reference tasks.py:701-703)."""
    return "detect"
