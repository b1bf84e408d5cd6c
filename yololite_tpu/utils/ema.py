"""EMA of model weights as a pytree transform (reference torch_utils.py:317-352)."""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def ema_decay(updates, decay: float = 0.9999, tau: float = 2000.0):
    """Ramped decay d(t) = decay * (1 - exp(-t / tau))."""
    return decay * (1 - jnp.exp(-updates.astype(jnp.float32) / tau))


def ema_update(ema_tree: Dict, new_tree: Dict, updates) -> Dict:
    """ema = d*ema + (1-d)*new, elementwise over the pytree (fp leaves only)."""
    d = ema_decay(updates)

    def upd(e, p):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return e * d + (1.0 - d) * p.astype(e.dtype)
        return p

    return jax.tree.map(upd, ema_tree, new_tree)


class ModelEMA:
    """Host-side convenience holder; the actual update runs inside the jitted step."""

    def __init__(self, params: Dict, state: Dict, updates: int = 0):
        self.ema_params = jax.tree.map(jnp.copy, params)
        self.ema_state = jax.tree.map(jnp.copy, state)
        self.updates = updates

    def update(self, params: Dict, state: Dict):
        self.updates += 1
        u = jnp.asarray(self.updates)
        self.ema_params = ema_update(self.ema_params, params, u)
        self.ema_state = ema_update(self.ema_state, state, u)
