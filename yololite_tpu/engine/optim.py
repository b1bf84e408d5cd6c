"""Optimizers with torch-matching update math, as pure JAX pytree transforms.

The reference builds 3 param groups (decay weights / no-decay BN / no-decay bias,
engine/trainer.py:622-675). Here groups are identified by leaf key: conv kernels
('w') decay; BN scale ('scale'), BN bias ('bias') and conv bias ('b') do not.
Learning rate and momentum are *traced* scalars so per-iteration warmup
interpolation (trainer.py:243-253) costs no recompiles. Per-group LRs are a
3-vector [bias_lr, weight_lr, bn_lr] matching the reference's group order.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

GROUP_WEIGHT, GROUP_BN, GROUP_BIAS = 1, 2, 0  # indices into the lr vector


def group_of(path: Tuple[str, ...]) -> int:
    """Map a pytree leaf path to its optimizer group (reference trainer.py:648-655)."""
    leaf = path[-1]
    if leaf in ("bias", "b"):  # BN bias + conv bias
        return GROUP_BIAS
    if leaf == "scale":  # BN weight
        return GROUP_BN
    return GROUP_WEIGHT  # conv kernels and any other weight


def build_group_labels(params: Dict):
    """Pytree of int group ids aligned with params."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return group_of(path)

    return walk(params, ())


class OptState(NamedTuple):
    step: jnp.ndarray
    mu: Dict  # first moment / momentum buffers
    nu: Dict  # second moment (adam family) or unused


def init_state(params: Dict) -> OptState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return OptState(step=jnp.zeros((), jnp.int32), mu=zeros, nu=jax.tree.map(jnp.zeros_like, params))


def sgd_update(params, grads, state: OptState, labels, lr_vec, momentum, weight_decay, nesterov=True):
    """Torch SGD: g += wd*p (decay group); buf = mu*buf + g; nesterov: g += mu*buf; p -= lr*g."""

    def upd(p, g, buf, gid):
        g = g + weight_decay * p * (gid == GROUP_WEIGHT)
        buf = momentum * buf + g
        step_dir = g + momentum * buf if nesterov else buf
        lr = lr_vec[gid]
        return p - lr * step_dir, buf

    flat = jax.tree.map(upd, params, grads, state.mu, labels)
    new_params = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, OptState(step=state.step + 1, mu=new_mu, nu=state.nu)


def adamw_update(params, grads, state: OptState, labels, lr_vec, beta1, weight_decay,
                 beta2=0.999, eps=1e-8):
    """Torch AdamW: decoupled decay on the decay group, bias-corrected moments."""
    step = state.step + 1
    b1t = 1 - beta1**step.astype(jnp.float32)
    b2t = 1 - beta2**step.astype(jnp.float32)

    def upd(p, g, m, v, gid):
        lr = lr_vec[gid]
        p = p * (1 - lr * weight_decay * (gid == GROUP_WEIGHT))
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * g * g
        mhat = m / b1t
        vhat = v / b2t
        return p - lr * mhat / (jnp.sqrt(vhat) + eps), m, v

    flat = jax.tree.map(upd, params, grads, state.mu, state.nu, labels)
    is_t = lambda x: isinstance(x, tuple)
    return (
        jax.tree.map(lambda t: t[0], flat, is_leaf=is_t),
        OptState(
            step=step,
            mu=jax.tree.map(lambda t: t[1], flat, is_leaf=is_t),
            nu=jax.tree.map(lambda t: t[2], flat, is_leaf=is_t),
        ),
    )


def adam_update(params, grads, state: OptState, labels, lr_vec, beta1, weight_decay,
                beta2=0.999, eps=1e-8):
    """Torch Adam with L2-style weight decay folded into the gradient."""
    step = state.step + 1
    b1t = 1 - beta1**step.astype(jnp.float32)
    b2t = 1 - beta2**step.astype(jnp.float32)

    def upd(p, g, m, v, gid):
        g = g + weight_decay * p * (gid == GROUP_WEIGHT)
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * g * g
        return p - lr_vec[gid] * (m / b1t) / (jnp.sqrt(v / b2t) + eps), m, v

    flat = jax.tree.map(upd, params, grads, state.mu, state.nu, labels)
    is_t = lambda x: isinstance(x, tuple)
    return (
        jax.tree.map(lambda t: t[0], flat, is_leaf=is_t),
        OptState(
            step=step,
            mu=jax.tree.map(lambda t: t[1], flat, is_leaf=is_t),
            nu=jax.tree.map(lambda t: t[2], flat, is_leaf=is_t),
        ),
    )


def rmsprop_update(params, grads, state: OptState, labels, lr_vec, momentum, weight_decay,
                   alpha=0.99, eps=1e-8):
    """Torch RMSprop with momentum buffer."""

    def upd(p, g, buf, sq, gid):
        g = g + weight_decay * p * (gid == GROUP_WEIGHT)
        sq = alpha * sq + (1 - alpha) * g * g
        avg = g / (jnp.sqrt(sq) + eps)
        buf = momentum * buf + avg
        return p - lr_vec[gid] * buf, buf, sq

    flat = jax.tree.map(upd, params, grads, state.mu, state.nu, labels)
    is_t = lambda x: isinstance(x, tuple)
    return (
        jax.tree.map(lambda t: t[0], flat, is_leaf=is_t),
        OptState(
            step=state.step + 1,
            mu=jax.tree.map(lambda t: t[1], flat, is_leaf=is_t),
            nu=jax.tree.map(lambda t: t[2], flat, is_leaf=is_t),
        ),
    )


UPDATES = {
    "SGD": sgd_update,
    "Adam": adam_update,
    "Adamax": adam_update,  # adamax's infinity norm approximated by adam (rare path)
    "AdamW": adamw_update,
    "NAdam": adam_update,
    "RAdam": adam_update,
    "RMSProp": rmsprop_update,
}


def clip_by_global_norm(grads, max_norm: float):
    """Torch clip_grad_norm_ semantics (total l2 norm over all leaves)."""
    leaves = jax.tree.leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), total
