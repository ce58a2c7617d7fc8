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


def is_guided() -> bool:
    """Whether relu() currently traces as guided_relu — call sites that jit
    a model fn should assert this at TRACE time (see guided_backprop)."""
    return _GUIDED


@contextmanager
def guided_backprop():
    """Trace-time flag: code TRACED inside this context gets guided ReLUs.

    CAVEAT (round-1 review): the flag is consulted when ``relu`` runs during
    tracing, not when a compiled function executes.  A consumer that jits a
    model fn BEFORE entering the context silently keeps un-guided gradients
    (the cached executable was traced with the flag off).  The shipped
    explain drivers build fresh (un-jitted or freshly-jitted) closures per
    context; new call sites should assert ``is_guided()`` inside the traced
    function body or avoid pre-built jits.
    """
    global _GUIDED
    prev = _GUIDED
    _GUIDED = True
    try:
        yield
    finally:
        _GUIDED = prev
