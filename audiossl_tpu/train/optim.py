"""Optimizers & LR schedules as optax transforms.

Replaces the reference's mix of torch.optim.SGD/Adam/AdamW, the hand-rolled
LARS (extras/delores-s/multi_proc.py:4-43), apex LARC (extras/decar-v2/main.py:111)
and the warmup+cosine schedules (multi_proc.py:45-58, decar-v2/main.py:118-122).

torch-SGD semantics note: weight decay is *coupled* (g += wd * p before the
momentum buffer), so `sgd_torch` chains add_decayed_weights before trace.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _is_1d(p: jax.Array) -> bool:
    # LARS.exclude_bias_and_norm: biases and norm scales have ndim == 1
    return p.ndim == 1


def sgd_torch(lr, momentum: float = 0.9, weight_decay: float = 1e-4) -> optax.GradientTransformation:
    """torch.optim.SGD(lr, momentum, weight_decay) equivalent."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.trace(decay=momentum, nesterov=False) if momentum else optax.identity(),
        optax.scale_by_learning_rate(lr),
    )


def adam_torch(lr, weight_decay: float = 0.0) -> optax.GradientTransformation:
    # torch.optim.Adam couples weight decay INTO the gradient before the
    # moment updates (unlike AdamW's decoupled decay)
    return optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(lr),
    )


def adamw_torch(lr, weight_decay: float = 1e-4, b1=0.9, b2=0.999) -> optax.GradientTransformation:
    return optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay)


def lars(
    lr,
    weight_decay: float = 1e-6,
    momentum: float = 0.9,
    eta: float = 0.001,
    weight_decay_filter: bool = True,
    lars_adaptation_filter: bool = True,
    weights_lr_scale: float = 0.2,
    biases_lr_scale: float = 0.0048,
) -> optax.GradientTransformation:
    """LARS matching extras/delores-s (multi_proc.py:4-43 + main.py:81-93):

    1-D params (biases/norm scales) skip weight decay and trust-ratio
    adaptation; the two param groups get distinct LR multipliers (the 0.2 /
    0.0048 factors of adjust_learning_rate).
    """

    def init(params):
        return {"mu": jax.tree.map(jnp.zeros_like, params)}

    def update(grads, state, params):
        def one(g, p, mu):
            dp = g
            if not (weight_decay_filter and _is_1d(p)):
                dp = dp + weight_decay * p
            if not (lars_adaptation_filter and _is_1d(p)):
                p_norm = jnp.linalg.norm(p)
                u_norm = jnp.linalg.norm(dp)
                q = jnp.where(p_norm > 0.0, jnp.where(u_norm > 0.0, eta * p_norm / u_norm, 1.0), 1.0)
                dp = dp * q
            new_mu = momentum * mu + dp
            scale = biases_lr_scale if _is_1d(p) else weights_lr_scale
            return new_mu, -scale * new_mu

        flat_g, treedef = jax.tree.flatten(grads)
        flat_p = treedef.flatten_up_to(params)
        flat_mu = treedef.flatten_up_to(state["mu"])
        new_mus, updates = zip(*[one(g, p, mu) for g, p, mu in zip(flat_g, flat_p, flat_mu)])
        return treedef.unflatten(updates), {"mu": treedef.unflatten(new_mus)}

    return optax.chain(
        optax.GradientTransformation(init, update), optax.scale_by_learning_rate(lr)
    )


def larc(
    lr,
    momentum: float = 0.9,
    weight_decay: float = 1e-6,
    trust_coefficient: float = 0.001,
    clip: bool = True,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """apex.parallel.LARC semantics: per-param adaptive LR clipped at the
    base LR (clip=True), wrapped around coupled-decay SGD (decar-v2/main.py:93-111)."""

    def init(params):
        del params
        return {"count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params):
        # clip against the CURRENT step's LR (apex LARC semantics) — a
        # warmup schedule's lr(0)=0 must not freeze the clip base
        base = lr(state["count"]) if callable(lr) else jnp.asarray(lr, jnp.float32)

        def one(g, p):
            p_norm = jnp.linalg.norm(p)
            g_norm = jnp.linalg.norm(g)
            adaptive = trust_coefficient * p_norm / (g_norm + p_norm * weight_decay + eps)
            if clip:
                scale = jnp.minimum(adaptive / jnp.maximum(base, 1e-12), 1.0)
            else:
                scale = adaptive
            ok = (p_norm > 0) & (g_norm > 0)
            return jnp.where(ok, scale, 1.0) * (g + weight_decay * p)

        return jax.tree.map(one, grads, params), {"count": state["count"] + 1}

    return optax.chain(
        optax.GradientTransformation(init, update),
        optax.trace(decay=momentum),
        optax.scale_by_learning_rate(lr),
    )


def warmup_cosine(
    base_lr: float,
    total_steps: int,
    warmup_steps: int,
    end_lr_factor: float = 0.001,
) -> optax.Schedule:
    """extras warmup+cosine (multi_proc.py:45-58): linear 0->base over warmup,
    then cosine from base to base * end_lr_factor."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        s = step - warmup_steps
        m = jnp.maximum(total_steps - warmup_steps, 1)
        q = 0.5 * (1.0 + jnp.cos(jnp.pi * s / m))
        cos = base_lr * q + base_lr * end_lr_factor * (1.0 - q)
        return jnp.where(step < warmup_steps, warm, cos)

    return sched


def build_optimizer(name: str, lr, **kw) -> optax.GradientTransformation:
    name = name.lower()
    if name == "sgd":
        return sgd_torch(lr, kw.get("momentum", 0.9), kw.get("weight_decay", 1e-4))
    if name == "adam":
        return adam_torch(lr, kw.get("weight_decay", 0.0))
    if name == "adamw":
        return adamw_torch(lr, kw.get("weight_decay", 1e-4))
    if name == "lars":
        return lars(lr, **kw)
    if name == "larc":
        return larc(lr, **kw)
    raise KeyError(f"unknown optimizer {name!r}")
