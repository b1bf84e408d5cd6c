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
import numpy as np

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


def _ones_like(labels):
    """All-trainable mask matching the labels tree."""
    return jax.tree.map(lambda _: 1.0, labels)


class OptState(NamedTuple):
    step: jnp.ndarray
    mu: Dict  # first moment / momentum buffers
    nu: Dict  # second moment (adam family), infinity norm (adamax), or unused
    extra: jnp.ndarray = None  # scalar side-state: NAdam's running mu_product


def init_state(params: Dict) -> OptState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return OptState(step=jnp.zeros((), jnp.int32), mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                    extra=jnp.ones((), jnp.float32))


def nadam_mu_product(step: int, beta1: float, momentum_decay: float = 0.004) -> float:
    """Closed-loop recompute of NAdam's mu_product after `step` updates (for resume)."""
    i = np.arange(1, int(step) + 1, dtype=np.float64)
    return float(np.prod(beta1 * (1 - 0.5 * 0.96 ** (i * momentum_decay)))) if step else 1.0


def sgd_update(params, grads, state: OptState, labels, lr_vec, momentum, weight_decay, nesterov=True,
               trainable=None):
    """Torch SGD: g += wd*p (decay group); buf = mu*buf + g; nesterov: g += mu*buf; p -= lr*g.

    `trainable` (optional pytree of 0/1 floats) excludes frozen leaves from both the
    decay term and the update — torch skips grad-less params entirely.
    """
    trainable = _ones_like(labels) if trainable is None else trainable

    def upd(p, g, buf, gid, tr):
        g = g + weight_decay * p * ((gid == GROUP_WEIGHT) * tr)
        buf = momentum * buf + g
        step_dir = g + momentum * buf if nesterov else buf
        lr = lr_vec[gid]
        return p - (lr * tr) * step_dir, buf

    flat = jax.tree.map(upd, params, grads, state.mu, labels, trainable)
    new_params = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, OptState(step=state.step + 1, mu=new_mu, nu=state.nu, extra=state.extra)


def adamw_update(params, grads, state: OptState, labels, lr_vec, beta1, weight_decay,
                 beta2=0.999, eps=1e-8, trainable=None):
    """Torch AdamW: decoupled decay on the decay group, bias-corrected moments."""
    step = state.step + 1
    b1t = 1 - beta1**step.astype(jnp.float32)
    b2t = 1 - beta2**step.astype(jnp.float32)
    trainable = _ones_like(labels) if trainable is None else trainable

    def upd(p, g, m, v, gid, tr):
        lr = lr_vec[gid]
        p = p * (1 - lr * weight_decay * ((gid == GROUP_WEIGHT) * tr))
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * g * g
        mhat = m / b1t
        vhat = v / b2t
        return p - (lr * tr) * mhat / (jnp.sqrt(vhat) + eps), m, v

    flat = jax.tree.map(upd, params, grads, state.mu, state.nu, labels, trainable)
    is_t = lambda x: isinstance(x, tuple)
    return (
        jax.tree.map(lambda t: t[0], flat, is_leaf=is_t),
        OptState(
            step=step,
            mu=jax.tree.map(lambda t: t[1], flat, is_leaf=is_t),
            nu=jax.tree.map(lambda t: t[2], flat, is_leaf=is_t),
            extra=state.extra,
        ),
    )


def adam_update(params, grads, state: OptState, labels, lr_vec, beta1, weight_decay,
                beta2=0.999, eps=1e-8, trainable=None):
    """Torch Adam with L2-style weight decay folded into the gradient."""
    step = state.step + 1
    b1t = 1 - beta1**step.astype(jnp.float32)
    b2t = 1 - beta2**step.astype(jnp.float32)
    trainable = _ones_like(labels) if trainable is None else trainable

    def upd(p, g, m, v, gid, tr):
        g = g + weight_decay * p * ((gid == GROUP_WEIGHT) * tr)
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * g * g
        return p - (lr_vec[gid] * tr) * (m / b1t) / (jnp.sqrt(v / b2t) + eps), m, v

    flat = jax.tree.map(upd, params, grads, state.mu, state.nu, labels, trainable)
    is_t = lambda x: isinstance(x, tuple)
    return (
        jax.tree.map(lambda t: t[0], flat, is_leaf=is_t),
        OptState(
            step=step,
            mu=jax.tree.map(lambda t: t[1], flat, is_leaf=is_t),
            nu=jax.tree.map(lambda t: t[2], flat, is_leaf=is_t),
            extra=state.extra,
        ),
    )


def rmsprop_update(params, grads, state: OptState, labels, lr_vec, momentum, weight_decay,
                   alpha=0.99, eps=1e-8, trainable=None):
    """Torch RMSprop with momentum buffer."""
    trainable = _ones_like(labels) if trainable is None else trainable

    def upd(p, g, buf, sq, gid, tr):
        g = g + weight_decay * p * ((gid == GROUP_WEIGHT) * tr)
        sq = alpha * sq + (1 - alpha) * g * g
        avg = g / (jnp.sqrt(sq) + eps)
        buf = momentum * buf + avg
        return p - (lr_vec[gid] * tr) * buf, buf, sq

    flat = jax.tree.map(upd, params, grads, state.mu, state.nu, labels, trainable)
    is_t = lambda x: isinstance(x, tuple)
    return (
        jax.tree.map(lambda t: t[0], flat, is_leaf=is_t),
        OptState(
            step=state.step + 1,
            mu=jax.tree.map(lambda t: t[1], flat, is_leaf=is_t),
            nu=jax.tree.map(lambda t: t[2], flat, is_leaf=is_t),
            extra=state.extra,
        ),
    )


def adamax_update(params, grads, state: OptState, labels, lr_vec, beta1, weight_decay,
                  beta2=0.999, eps=1e-8, trainable=None):
    """Torch Adamax: infinity-norm second moment, L2 decay folded into the gradient."""
    step = state.step + 1
    b1t = 1 - beta1**step.astype(jnp.float32)
    trainable = _ones_like(labels) if trainable is None else trainable

    def upd(p, g, m, u, gid, tr):
        g = g + weight_decay * p * ((gid == GROUP_WEIGHT) * tr)
        m = beta1 * m + (1 - beta1) * g
        u = jnp.maximum(beta2 * u, jnp.abs(g) + eps)
        return p - (lr_vec[gid] * tr / b1t) * m / u, m, u

    flat = jax.tree.map(upd, params, grads, state.mu, state.nu, labels, trainable)
    is_t = lambda x: isinstance(x, tuple)
    return (
        jax.tree.map(lambda t: t[0], flat, is_leaf=is_t),
        OptState(
            step=step,
            mu=jax.tree.map(lambda t: t[1], flat, is_leaf=is_t),
            nu=jax.tree.map(lambda t: t[2], flat, is_leaf=is_t),
            extra=state.extra,
        ),
    )


def nadam_update(params, grads, state: OptState, labels, lr_vec, beta1, weight_decay,
                 beta2=0.999, eps=1e-8, momentum_decay=0.004, trainable=None):
    """Torch NAdam: Nesterov-momentum Adam with ramped mu schedule and mu_product state."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    mu_t = beta1 * (1 - 0.5 * 0.96 ** (t * momentum_decay))
    mu_next = beta1 * (1 - 0.5 * 0.96 ** ((t + 1) * momentum_decay))
    mu_prod = (jnp.ones(()) if state.extra is None else state.extra) * mu_t
    b2t = 1 - beta2**t
    trainable = _ones_like(labels) if trainable is None else trainable

    def upd(p, g, m, v, gid, tr):
        g = g + weight_decay * p * ((gid == GROUP_WEIGHT) * tr)
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * g * g
        denom = jnp.sqrt(v / b2t) + eps
        num = (1 - mu_t) / (1 - mu_prod) * g + mu_next / (1 - mu_prod * mu_next) * m
        return p - (lr_vec[gid] * tr) * num / denom, m, v

    flat = jax.tree.map(upd, params, grads, state.mu, state.nu, labels, trainable)
    is_t = lambda x: isinstance(x, tuple)
    return (
        jax.tree.map(lambda t: t[0], flat, is_leaf=is_t),
        OptState(
            step=step,
            mu=jax.tree.map(lambda t: t[1], flat, is_leaf=is_t),
            nu=jax.tree.map(lambda t: t[2], flat, is_leaf=is_t),
            extra=mu_prod,
        ),
    )


def radam_update(params, grads, state: OptState, labels, lr_vec, beta1, weight_decay,
                 beta2=0.999, eps=1e-8, trainable=None):
    """Torch RAdam: variance-rectified Adam (SGD-momentum warmup while rho_t <= 5)."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    b1t = 1 - beta1**t
    b2t = 1 - beta2**t
    rho_inf = 2.0 / (1 - beta2) - 1.0
    rho_t = rho_inf - 2.0 * t * beta2**t / b2t
    rect = jnp.sqrt(jnp.maximum((rho_t - 4) * (rho_t - 2) * rho_inf
                                / ((rho_inf - 4) * (rho_inf - 2) * rho_t), 0.0))
    use_rect = rho_t > 5.0
    trainable = _ones_like(labels) if trainable is None else trainable

    def upd(p, g, m, v, gid, tr):
        g = g + weight_decay * p * ((gid == GROUP_WEIGHT) * tr)
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * g * g
        mhat = m / b1t
        # torch applies sqrt(b2t) outside: adaptive_lr = sqrt(b2t) / (sqrt(v) + eps)
        adaptive = rect * mhat * jnp.sqrt(b2t) / (jnp.sqrt(v) + eps)
        return p - (lr_vec[gid] * tr) * jnp.where(use_rect, adaptive, mhat), m, v

    flat = jax.tree.map(upd, params, grads, state.mu, state.nu, labels, trainable)
    is_t = lambda x: isinstance(x, tuple)
    return (
        jax.tree.map(lambda t: t[0], flat, is_leaf=is_t),
        OptState(
            step=step,
            mu=jax.tree.map(lambda t: t[1], flat, is_leaf=is_t),
            nu=jax.tree.map(lambda t: t[2], flat, is_leaf=is_t),
            extra=state.extra,
        ),
    )


UPDATES = {
    "SGD": sgd_update,
    "Adam": adam_update,
    "Adamax": adamax_update,
    "AdamW": adamw_update,
    "NAdam": nadam_update,
    "RAdam": radam_update,
    "RMSProp": rmsprop_update,
}


def clip_by_global_norm(grads, max_norm: float):
    """Torch clip_grad_norm_ semantics (total l2 norm over all leaves)."""
    leaves = jax.tree.leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), total
