"""Model ensembling: concat decoded candidates of several checkpoints pre-NMS.

Counterpart of reference nn/tasks.py:448-497 (Ensemble + attempt_load_weights):
the torch version concatenates raw outputs along the anchor axis ("nms ensemble");
here each member decodes to (boxes, scores) and candidates concatenate before the
shared NMS, which is the same semantics with static shapes.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from yololite_tpu.models.checkpoint import attempt_load_one_weight
from yololite_tpu.ops.nms import non_max_suppression
from yololite_tpu.utils import LOGGER


class Ensemble:
    """Holds several (model, params, state) members; callable like one model."""

    def __init__(self):
        self.members: List[Tuple] = []

    def append(self, model, params, state):
        self.members.append((model, params, state))

    @property
    def names(self):
        return self.members[0][0].names

    def decode(self, images: jnp.ndarray):
        """Run every member, concat (boxes, scores) along anchors."""
        from yololite_tpu.models.model import EnsembleModel

        em = EnsembleModel([m for m, _, _ in self.members])
        params = {f"m{i}": p for i, (_, p, _) in enumerate(self.members)}
        state = {f"m{i}": s for i, (_, _, s) in enumerate(self.members)}
        return em.decode_concat(params, state, images, half=False)

    def __call__(self, images, conf_thres=0.25, iou_thres=0.45, max_det=300):
        boxes, scores = self.decode(images)
        return non_max_suppression(boxes, scores, conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det)


def attempt_load_weights(weights: Sequence[str], nc: Optional[int] = None) -> Ensemble:
    """Load one or more checkpoints into an Ensemble (reference tasks.py:461-497)."""
    ens = Ensemble()
    for w in [weights] if isinstance(weights, (str,)) else list(weights):
        model, params, state, _ = attempt_load_one_weight(w, nc=nc)
        ens.append(model, params, state)
    if len(ens.members) > 1:
        LOGGER.info(f"Ensemble of {len(ens.members)} models created")
    return ens
