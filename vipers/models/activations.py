"""Activation indirection enabling guided backprop.

Captum's GuidedGradCam (used at `/root/reference/explain.py:446-473`)
rewrites every ReLU's backward to pass only positive gradients at positive
inputs.  Here that's a ``custom_vjp`` ReLU that models opt into via this
module's ``relu``; the ``guided_backprop()`` context flips the behavior for
code traced inside it (explain code uses fresh jits per context, so the
trace picks up the flag).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

_GUIDED = False


@jax.custom_vjp
def guided_relu(x):
    return jnp.maximum(x, 0.0)


def _fwd(x):
    return jnp.maximum(x, 0.0), x


def _bwd(x, g):
    # pass gradient only where input was positive AND gradient is positive
    return (jnp.where((x > 0) & (g > 0), g, 0.0),)


guided_relu.defvjp(_fwd, _bwd)


def relu(x):
    """ReLU that becomes guided_relu inside a guided_backprop() context."""
    if _GUIDED:
        return guided_relu(x)
    return jax.nn.relu(x)


@contextmanager
def guided_backprop():
    global _GUIDED
    prev = _GUIDED
    _GUIDED = True
    try:
        yield
    finally:
        _GUIDED = prev
