"""Checkpoint import/export.

Import: reads reference-format `.pt` checkpoints (a pickled dict holding a full
torch DetectionModel under 'ema'/'model', cf. reference nn/tasks.py:406-519 and
engine/trainer.py:360-388) WITHOUT importing any reference code: unknown classes
unpickle into generic stub containers, tensors rebuild through torch's own
reducers, and the state_dict is walked out of the stub module tree. Weights map
mechanically onto our pytrees (torch OIHW conv -> HWIO; bn weight/bias ->
scale/bias params; running stats -> state).

Export: native checkpoints are msgpack-free simple `.npz` + json sidecar so a
round-trip needs no torch at all.
"""

from __future__ import annotations

import io
import json
import os
import pickle
import zipfile
from pathlib import Path
from types import SimpleNamespace
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yololite_tpu.utils import LOGGER
from yololite_tpu.models.model import DetectionModel, guess_model_scale


class _Stub:
    """Generic unpickle target for unknown (reference) classes."""

    def __new__(cls, *args, **kwargs):
        return object.__new__(cls)

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, d):
        if isinstance(d, dict):
            self.__dict__.update(d)
        else:  # pragma: no cover - exotic setstate payloads
            self.__dict__["_state"] = d


class _StubUnpickler(pickle.Unpickler):
    _SAFE_ROOTS = {"torch", "collections", "builtins", "numpy", "argparse", "pathlib", "types", "copyreg"}

    def find_class(self, module, name):
        if module.split(".")[0] in self._SAFE_ROOTS:
            try:
                return super().find_class(module, name)
            except (AttributeError, ModuleNotFoundError):
                pass
        return type(name, (_Stub,), {"__module__": module})


def _torch_load_stubbed(path):
    """torch.load with stubbed class resolution (weights land as real tensors)."""
    import torch

    stub_pickle = SimpleNamespace(
        __name__="stub_pickle",
        Unpickler=_StubUnpickler,
        load=pickle.load,
        loads=pickle.loads,
        dump=pickle.dump,
        dumps=pickle.dumps,
    )
    return torch.load(path, map_location="cpu", pickle_module=stub_pickle, weights_only=False)


def _walk_module(obj, prefix="") -> Dict[str, np.ndarray]:
    """Extract a state_dict from a (stubbed or real) torch module tree."""
    out: Dict[str, np.ndarray] = {}
    d = getattr(obj, "__dict__", {})
    for name, t in (d.get("_parameters") or {}).items():
        if t is not None:
            out[prefix + name] = np.asarray(t.detach().to("cpu").float().numpy())
    for name, t in (d.get("_buffers") or {}).items():
        if t is not None and hasattr(t, "numpy"):
            out[prefix + name] = np.asarray(t.detach().to("cpu").float().numpy())
    for name, child in (d.get("_modules") or {}).items():
        if child is not None:
            out.update(_walk_module(child, f"{prefix}{name}."))
    return out


def _ensemble_members(net, path):
    """Member list of a reference `Ensemble` (nn.ModuleList of models,
    tasks.py:448-459), or None if `net` is a plain model."""
    d = getattr(net, "__dict__", {})
    mods = d.get("_modules") or {}
    own_params = d.get("_parameters") or {}
    if mods and not own_params and all(str(k).isdigit() for k in mods):
        members = [m for m in mods.values() if m is not None]
        if not members:
            raise ValueError(f"checkpoint {path}: empty Ensemble")
        return members
    return None


def _sd_is_fused(sd: Dict[str, np.ndarray]) -> bool:
    """True if the state_dict has folded BN (conv bias present, no bn entries)."""
    has_bn = any(".bn." in f".{k}" for k in sd)
    has_conv_bias = any(k.endswith("conv.bias") for k in sd)
    return has_conv_bias and not has_bn


def _net_sd_meta(net, ckpt, path) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Extract (state_dict, meta) from one unpickled model object."""
    sd = _walk_module(net)
    # strip the outer DetectionModel 'model.' prefix
    sd = {k[len("model."):] if k.startswith("model.") else k: v for k, v in sd.items()}

    meta: Dict[str, Any] = {}
    nd = getattr(net, "__dict__", {})
    meta["yaml"] = nd.get("yaml")
    args = ckpt.get("train_args") or nd.get("args")
    if args is not None and not isinstance(args, dict):
        args = vars(args) if hasattr(args, "__dict__") or isinstance(args, SimpleNamespace) else None
    meta["args"] = args or {}
    meta["names"] = nd.get("names")
    meta["epoch"] = ckpt.get("epoch", -1)
    meta["best_fitness"] = ckpt.get("best_fitness")
    meta["scale"] = (meta["yaml"] or {}).get("scale") or guess_model_scale(path)
    meta["nc"] = (meta["yaml"] or {}).get("nc")
    if meta["nc"] is None and meta["names"]:
        meta["nc"] = len(meta["names"])
    return sd, meta


def read_pt_members(path) -> List[Tuple[Dict[str, np.ndarray], Dict[str, Any]]]:
    """Read a reference .pt checkpoint -> [(state_dict, meta), ...] per model.

    A plain checkpoint yields one entry; a multi-member `Ensemble` (reference
    tasks.py:448-459) yields one entry per member, in ensemble order.
    """
    ckpt = _torch_load_stubbed(str(path))
    if not isinstance(ckpt, dict):
        ckpt = {"model": ckpt}
    net = ckpt.get("ema") or ckpt.get("model")  # EMA preferred (reference tasks.py:503)
    if net is None:
        raise ValueError(f"checkpoint {path} has no 'model' or 'ema' entry")
    members = _ensemble_members(net, path) or [net]
    return [_net_sd_meta(m, ckpt, path) for m in members]


def read_pt_checkpoint(path) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Read a reference .pt checkpoint -> (state_dict, meta) of the (last) model.

    meta keys: 'yaml' (arch dict if present), 'args' (train args dict), 'names',
    'scale', 'nc', 'epoch', 'best_fitness'.
    """
    return read_pt_members(path)[-1]


def _navigate(tree: Dict, parts):
    node = tree
    for p in parts[:-1]:
        if p not in node:
            raise KeyError(f"path {'.'.join(parts)}: no key '{p}' (have {list(node)})")
        node = node[p]
    return node


def _set_nested(tree: Dict, parts, value, filled, strict=True):
    try:
        node = _navigate(tree, parts)
    except KeyError:
        if strict:
            raise
        return False
    leaf = parts[-1]
    if leaf not in node:
        if strict:
            raise KeyError(f"path {'.'.join(parts)}: no leaf '{leaf}' (have {list(node)})")
        return False
    expect = node[leaf]
    if tuple(expect.shape) != tuple(value.shape):
        if strict:
            raise ValueError(f"shape mismatch at {'.'.join(parts)}: {expect.shape} vs {value.shape}")
        return False  # intersect semantics (reference torch_utils.py:intersect_dicts)
    # copy=True: on CPU jnp.asarray may alias the numpy buffer, which can alias a
    # live torch tensor -- later in-place torch updates would leak into our tree
    node[leaf] = jnp.array(value, dtype=jnp.float32, copy=True)
    filled.add(tuple(parts))
    return True


def state_dict_to_pytree(sd: Dict[str, np.ndarray], model: DetectionModel, strict: bool = True) -> Tuple[Dict, Dict]:
    """Map a torch state_dict (names relative to the Sequential) onto params/state trees.

    Handles both the stock layout and fused-conv checkpoints (BN folded into the
    conv, like ultralytics' model.fuse() output): a fused state_dict is mapped
    onto a fuse_tree'd template so every leaf is accounted for.
    """
    params, state = model.init(0)
    sd = {(k[len("model."):] if k.startswith("model.") else k): v for k, v in sd.items()}
    if _sd_is_fused(sd):
        from yololite_tpu.models.modules import fuse_tree

        params, state = fuse_tree(params, state)
    return map_state_dict_into(sd, params, state, strict=strict)


def map_state_dict_into(sd: Dict[str, np.ndarray], params: Dict, state: Dict, strict: bool = True) -> Tuple[Dict, Dict]:
    """Fill (params, state) trees from torch-named arrays.

    strict=True verifies full leaf coverage and raises on any mismatch.
    strict=False implements the reference's `intersect_dicts` transfer semantics
    (tasks.py:197-210): shape-mismatched or unknown entries are skipped and the
    un-transferred leaves keep their fresh-init values (used when fine-tuning a
    checkpoint onto a dataset with a different class count).
    """
    filled: set = set()
    for name, v in sd.items():
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked" or "dfl" in parts:
            continue
        parent = parts[-2] if len(parts) > 1 else ""
        # BN detection is template-based, not name-based: any parent node carrying a
        # 'scale' leaf is a batchnorm (covers 'bn' and e.g. BNContrastiveHead's 'norm')
        if parent != "bn" and leaf in ("weight", "bias", "running_mean", "running_var"):
            try:
                pnode = _navigate(params, parts)
                if isinstance(pnode, dict) and "scale" in pnode:
                    parent = "bn"
            except KeyError:
                pass
        if parent == "bn":
            if leaf == "weight":
                _set_nested(params, parts[:-1] + ["scale"], v, filled, strict)
            elif leaf == "bias":
                _set_nested(params, parts[:-1] + ["bias"], v, filled, strict)
            elif leaf == "running_mean":
                _set_nested(state, parts[:-1] + ["mean"], v, filled, strict)
            elif leaf == "running_var":
                _set_nested(state, parts[:-1] + ["var"], v, filled, strict)
        elif leaf == "weight" and v.ndim == 4:
            try:
                node = _navigate(params, parts)
            except KeyError:
                if strict:
                    raise
                continue
            if "wt" in node:  # transposed conv: (c_in, c_out/g, kh, kw) -> flipped HWIO
                tmpl = node["wt"]
                vf = v[:, :, ::-1, ::-1]
                if getattr(tmpl, "ndim", 4) == 5:  # grouped (DWConvTranspose2d): g from template
                    kh, kw, cing, g, outg = tmpl.shape
                    w = vf.reshape(g, cing, outg, kh, kw).transpose(3, 4, 1, 0, 2).copy()
                else:
                    w = vf.transpose(2, 3, 0, 1).copy()
                _set_nested(params, parts[:-1] + ["wt"], w, filled, strict)
            else:  # conv: OIHW -> HWIO
                _set_nested(params, parts[:-1] + ["w"], v.transpose(2, 3, 1, 0), filled, strict)
        elif leaf == "weight" and v.ndim in (1, 2):  # Linear (torch orientation) / LayerNorm
            _set_nested(params, parts[:-1] + ["weight"], v, filled, strict)
        elif leaf in ("in_proj_weight", "in_proj_bias"):  # nn.MultiheadAttention packed proj
            _set_nested(params, parts, v, filled, strict)
        elif leaf == "bias":
            try:
                node = _navigate(params, parts)
            except KeyError:
                if strict:
                    raise
                continue
            _set_nested(params, parts[:-1] + ["b" if "b" in node else "bias"], v, filled, strict)
        else:
            # generic fallback: a same-named leaf in the template (scalar side-params
            # like ContrastiveHead.logit_scale)
            if not _set_nested(params, parts, v, filled, strict=False):
                LOGGER.warning(f"checkpoint import: skipping unrecognized entry '{name}' {v.shape}")

    # verify full coverage of param leaves
    missing = []

    def _check(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                _check(v, prefix + (k,))
            elif prefix + (k,) not in filled:
                missing.append(".".join(prefix + (k,)))

    _check(params, ())
    _check(state, ())
    if missing and strict:
        raise ValueError(f"checkpoint import left {len(missing)} leaves unfilled, e.g. {missing[:5]}")
    if not strict:
        total = len(filled) + len(missing)
        LOGGER.info(f"Transferred {len(filled)}/{total} items from pretrained weights")
    return params, state


def load_pt(path, nc: Optional[int] = None) -> Tuple[DetectionModel, Dict, Dict, Dict]:
    """Load a reference .pt checkpoint into (model, params, state, meta).

    When `nc` differs from the checkpoint's class count (fine-tuning onto a new
    dataset), the transfer switches to intersect semantics: shape-matching
    leaves load, the class head keeps its fresh init (reference tasks.py:197-210).
    """
    members = read_pt_members(path)

    def build_one(sd, meta):
        scale = meta.get("scale") or "n"
        model = DetectionModel(f"yolo11{scale}.yaml", nc=nc or meta.get("nc"))
        if meta.get("names") and len(meta["names"]) == model.nc:
            model.names = meta["names"]
        model.args = meta.get("args", {})
        strict = nc is None or meta.get("nc") in (None, nc)
        p, s = state_dict_to_pytree(sd, model, strict=strict)
        return model, p, s

    if len(members) == 1:
        sd, meta = members[0]
        model, params, state = build_one(sd, meta)
        return model, params, state, meta

    # multi-member Ensemble: every member loads; forwards concatenate pre-NMS
    # (reference tasks.py:448-459 `torch.cat(y, 2)` — the "NMS ensemble")
    from yololite_tpu.models.model import EnsembleModel

    models, ptree, stree = [], {}, {}
    for i, (sd, meta_i) in enumerate(members):
        m, p, s = build_one(sd, meta_i)
        models.append(m)
        ptree[f"m{i}"] = p
        stree[f"m{i}"] = s
    ens = EnsembleModel(models)
    meta = members[-1][1]
    ens.args = meta.get("args", {})
    LOGGER.info(f"checkpoint {path}: loaded Ensemble of {len(models)} models (pre-NMS concat)")
    return ens, ptree, stree, meta


def pytree_to_state_dict(params: Dict, state: Dict, prefix: str = "model.") -> Dict[str, np.ndarray]:
    """Inverse of map_state_dict_into: our pytrees -> torch-named numpy arrays.

    Lets a trained JAX checkpoint be loaded back into the reference torch model
    (used by the end-to-end mAP parity harness).
    """
    out: Dict[str, np.ndarray] = {}

    def walk_params(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk_params(v, path + (k,))
                continue
            v = np.asarray(v)
            name = ".".join(path)
            if k == "w":
                out[f"{prefix}{name}.weight" if name else f"{prefix}weight"] = v.transpose(3, 2, 0, 1)
            elif k == "wt":
                if v.ndim == 5:  # grouped: (kh, kw, c1/g, g, c2/g) -> torch (c1, c2/g, kh, kw)
                    kh, kw, cing, g, outg = v.shape
                    w = v.transpose(3, 2, 4, 0, 1).reshape(g * cing, outg, kh, kw)
                else:
                    w = v.transpose(2, 3, 0, 1)
                out[f"{prefix}{name}.weight"] = w[:, :, ::-1, ::-1].copy()
            elif k == "b":
                out[f"{prefix}{name}.bias"] = v
            elif k == "scale":  # bn scale lives under a 'bn' path component
                out[f"{prefix}{name}.weight"] = v
            elif k in ("bias", "weight", "in_proj_weight", "in_proj_bias"):
                out[f"{prefix}{name}.{k}"] = v
            else:  # pragma: no cover
                raise KeyError(f"unmapped param leaf '{k}' at {name}")

    def walk_state(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk_state(v, path + (k,))
                continue
            name = ".".join(path)
            if k == "mean":
                out[f"{prefix}{name}.running_mean"] = np.asarray(v)
            elif k == "var":
                out[f"{prefix}{name}.running_var"] = np.asarray(v)

    walk_params(params, ())
    walk_state(state, ())
    return out


# ---- native checkpoint format (.npz + json header) ----


def _flatten(tree: Dict, prefix=()) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[".".join(prefix + (k,))] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for name, v in flat.items():
        parts = name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def conform_tree(template: Dict, loaded: Dict) -> Dict:
    """Re-insert empty subtrees dropped by flatten/unflatten so pytree structures
    match a freshly-initialized template (needed before jax.tree.map across both)."""
    if not isinstance(template, dict):
        return loaded
    out = {}
    for k, tv in template.items():
        if k in loaded:
            out[k] = conform_tree(tv, loaded[k])
        elif isinstance(tv, dict) and not _has_leaves(tv):
            out[k] = {}  # structurally-empty subtree (Upsample/Concat rows, bias-free convs)
        elif isinstance(tv, dict):
            out[k] = conform_tree(tv, {})
        else:
            raise KeyError(f"checkpoint missing leaf '{k}'")
    return out


def _has_leaves(tree) -> bool:
    if not isinstance(tree, dict):
        return True
    return any(_has_leaves(v) for v in tree.values())


def _fetch_tree_packed(flat: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Device->host fetch of many leaves in ONE transfer per dtype.

    Fetching each leaf separately costs a round-trip per leaf (~700 RPCs for a
    yolo11 training state); concatenating raveled leaves on device first makes
    checkpoint saves latency-bound by O(dtypes) transfers instead.
    """
    jax_leaves = {k: v for k, v in flat.items() if isinstance(v, jnp.ndarray)}
    out = {k: np.asarray(v) for k, v in flat.items() if not isinstance(v, jnp.ndarray)}
    by_dtype: Dict[Any, list] = {}
    for k, v in jax_leaves.items():
        by_dtype.setdefault(v.dtype, []).append(k)
    CHUNK = 128  # leaves per device-concat: keeps each concat's compile small/cacheable
    for dtype, keys in by_dtype.items():
        for i in range(0, len(keys), CHUNK):
            chunk = keys[i : i + CHUNK]
            packed = (
                jnp.concatenate([jax_leaves[k].ravel() for k in chunk]) if len(chunk) > 1
                else jax_leaves[chunk[0]].ravel()
            )
            host = np.asarray(packed)  # one transfer per chunk
            off = 0
            for k in chunk:
                n = int(np.prod(jax_leaves[k].shape)) if jax_leaves[k].shape else 1
                out[k] = host[off : off + n].reshape(jax_leaves[k].shape)
                off += n
    return out


def save_native(path, params: Dict, state: Dict, meta: Optional[Dict] = None):
    """Save params/state (+ json meta) to a single .npz container.

    Atomic: writes to a sibling .tmp file then os.replace()s it into place, so
    an abrupt exit mid-write (the trainer saves from a daemon thread) can never
    leave a truncated last.npz that would break resume.
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = {f"params.{k}": v for k, v in _flatten_keep(params).items()}
    flat.update({f"state.{k}": v for k, v in _flatten_keep(state).items()})
    flat = _fetch_tree_packed(flat)
    flat["__meta__"] = np.frombuffer(json.dumps(meta or {}, default=str).encode(), dtype=np.uint8)
    tmp = path.with_suffix(path.suffix + ".tmp")
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    finally:
        if tmp.exists():
            tmp.unlink(missing_ok=True)


def _flatten_keep(tree: Dict, prefix=()) -> Dict[str, Any]:
    """Like _flatten but keeps jax arrays as-is (no per-leaf host transfer)."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten_keep(v, prefix + (k,)))
        else:
            out[".".join(prefix + (k,))] = v
    return out


def strip_optimizer(path, out_path=None) -> Path:
    """Strip training state from a native checkpoint, keeping EMA weights only.

    Counterpart of reference torch_utils.py:355-399 (model<-EMA swap, optimizer
    nulled). Returns the written path.
    """
    params, state, meta = load_native(path)
    slim_state = state.get("model_state", state)
    meta = dict(meta)
    meta.pop("ema_updates", None)
    meta["epoch"] = -1
    out = Path(out_path or path)
    save_native(out, params, slim_state, meta)
    LOGGER.info(f"Optimizer stripped from {path} -> {out}")
    return out


def attempt_load_one_weight(path, nc: Optional[int] = None):
    """Load one checkpoint of either format -> (model, params, state, meta).

    Counterpart of reference nn/tasks.py:499-519 (EMA preferred, args attached).
    """
    path = str(path)
    if path.endswith(".pt"):
        return load_pt(path, nc=nc)
    params, state, meta = load_native(path)
    model = DetectionModel(meta.get("cfg", "yolo11n.yaml"), nc=nc or meta.get("nc"))
    if meta.get("names"):
        model.names = {int(k): v for k, v in meta["names"].items()}
    model.args = meta.get("args", {})
    if "model_state" in state:
        state = state["model_state"]
    return model, params, state, meta


def load_native(path) -> Tuple[Dict, Dict, Dict]:
    """Load a native .npz checkpoint -> (params, state, meta)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
    pflat = {k[len("params."):]: z[k] for k in z.files if k.startswith("params.")}
    sflat = {k[len("state."):]: z[k] for k in z.files if k.startswith("state.")}
    return _unflatten(pflat), _unflatten(sflat), meta
