"""Layer-wise Relevance Propagation (epsilon rule), experimental.

The reference wires Captum LRP but keeps it disabled everywhere
(`/root/reference/explain.py:515-550` behind comments;
`explainations_evaluation_metrics.py:836,870` hard-disabled) — implemented
here anyway to close the inventory line.

Epsilon-LRP as modified backprop: every Dense/Conv layer's VJP is replaced
(via ``flax.linen.intercept_methods`` + ``jax.custom_vjp``) with

    s   = R_out / (y + eps * sign(y))
    R_x = x * vjp_layer(s)

and ReLUs pass relevance through unchanged.  The attribution of the input is
then simply the "gradient" of the target logit under this modified backward.
For a single linear layer this satisfies the LRP conservation property up to
the epsilon absorption.
"""

from __future__ import annotations

import functools
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

LRP_EPS = 1e-6


def _lrp_wrap(fn: Callable, x, eps: float):
    """custom_vjp around y = fn(x) implementing the epsilon rule."""

    @jax.custom_vjp
    def layer(x):
        return fn(x)

    def fwd(x):
        y, vjp = jax.vjp(fn, x)
        return y, (x, y, vjp)

    def bwd(res, g):
        x, y, vjp = res
        stab = y + eps * jnp.where(y >= 0, 1.0, -1.0)
        s = g / stab
        (r,) = vjp(s)
        return (x * r,)

    layer.defvjp(fwd, bwd)
    return layer(x)


def lrp_interceptor(eps: float = LRP_EPS):
    """flax method interceptor applying the epsilon rule to Dense/Conv."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if isinstance(mod, (nn.Dense, nn.Conv)) and args:
            x = args[0]
            return _lrp_wrap(lambda xx: next_fun(xx, *args[1:], **kwargs), x, eps)
        return next_fun(*args, **kwargs)

    return interceptor


def lrp_attribution(model_apply, variables, x, target=None, eps: float = LRP_EPS,
                    **apply_kwargs):
    """Input relevance map for the (argmax or given) target class.

    ``model_apply(variables, x, train=False, ...) -> (logits, aux)``.
    Returns (relevance (H, W, C) numpy for batch item 0, target).
    """
    import numpy as np

    def score(xx):
        with nn.intercept_methods(lrp_interceptor(eps)):
            logits, _aux = model_apply(variables, xx, train=False, **apply_kwargs)
        t = jnp.argmax(logits[0]) if target is None else target
        return logits[0, t], t

    (score_val, t), rel = jax.value_and_grad(score, has_aux=True)(x)
    del score_val
    return np.asarray(rel[0]), int(t)
