"""Normalized line-overlap + difflib sequence-similarity scan vs the reference.

Reproduces the judge's independent check (VERDICT r3 "Copy-paste findings"):
for each repo<->reference pairing -- including the renamed pairings a
same-name detector cannot see -- report
  (a) normalized line overlap: |shared normalized lines| / |repo lines|
  (b) difflib.SequenceMatcher ratio over the normalized line sequences
Lines are normalized by stripping whitespace/comments and dropping blanks.
Keep every pair < 0.6 (VERDICT r3 directive #9).

Usage: python tools/simscan.py
"""

from __future__ import annotations

import difflib
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference/yololite")

PAIRS = [
    ("yololite_tpu/models/zoo.py", "nn/modules/block.py"),
    ("yololite_tpu/models/modules.py", "nn/modules/block.py"),
    ("yololite_tpu/models/modules.py", "nn/modules/conv.py"),
    ("yololite_tpu/models/model.py", "nn/tasks.py"),
    ("yololite_tpu/models/checkpoint.py", "nn/tasks.py"),
    ("yololite_tpu/models/transformer.py", "nn/modules/transformer.py"),
    ("yololite_tpu/models/deformable.py", "nn/modules/transformer.py"),
    ("yololite_tpu/engine/model.py", "engine/model.py"),
    ("yololite_tpu/engine/predictor.py", "engine/predictor.py"),
    ("yololite_tpu/engine/trainer.py", "engine/trainer.py"),
    ("yololite_tpu/engine/validator.py", "engine/validator.py"),
    ("yololite_tpu/engine/results.py", "engine/results.py"),
    ("yololite_tpu/data/dataset.py", "data/dataset.py"),
    ("yololite_tpu/data/augment.py", "data/augment.py"),
    ("yololite_tpu/data/loaders.py", "data/loaders.py"),
    ("yololite_tpu/data/build.py", "data/build.py"),
    ("yololite_tpu/data/utils.py", "data/utils.py"),
    ("yololite_tpu/utils/loss.py", "utils/loss.py"),
    ("yololite_tpu/utils/tal.py", "utils/tal.py"),
    ("yololite_tpu/utils/metrics.py", "utils/metrics.py"),
    ("yololite_tpu/utils/instance.py", "utils/instance.py"),
    ("yololite_tpu/utils/misc.py", "utils/__init__.py"),
    ("yololite_tpu/utils/cocoeval.py", "utils/metrics.py"),
    ("yololite_tpu/utils/plotting.py", "utils/plotting.py"),
    ("yololite_tpu/utils/checks.py", "utils/checks.py"),
    ("yololite_tpu/utils/patches.py", "utils/patches.py"),
    ("yololite_tpu/ops/nms.py", "utils/ops.py"),
    ("yololite_tpu/ops/boxes.py", "utils/ops.py"),
    ("yololite_tpu/ops/decode.py", "nn/modules/head.py"),
    ("yololite_tpu/cfg/__init__.py", "cfg/__init__.py"),
]


def norm_lines(path: Path) -> list[str]:
    out = []
    for raw in path.read_text(errors="replace").splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if "#" in line:
            line = line.split("#", 1)[0].rstrip()
        out.append(line)
    return out


def main():
    worst = 0.0
    print(f"{'repo file':<40} {'ref file':<28} {'overlap':>8} {'seq':>6}")
    for repo_rel, ref_rel in PAIRS:
        rp, fp = REPO / repo_rel, REF / ref_rel
        if not rp.exists() or not fp.exists():
            print(f"{repo_rel:<40} {ref_rel:<28} {'MISSING':>8}")
            continue
        a, b = norm_lines(rp), norm_lines(fp)
        if not a:
            continue
        overlap = len(set(a) & set(b)) / len(set(a))
        seq = difflib.SequenceMatcher(a=a, b=b).ratio()
        flag = "  <-- OVER 0.6" if max(overlap, seq) >= 0.6 else ""
        print(f"{repo_rel:<40} {ref_rel:<28} {overlap:>8.2f} {seq:>6.2f}{flag}")
        worst = max(worst, overlap, seq)
    print(f"\nworst pair score: {worst:.2f} (threshold 0.6)")
    return 0 if worst < 0.6 else 1


if __name__ == "__main__":
    raise SystemExit(main())
