"""Masked optimizer transform: pruned weights stay exactly zero.

The reference gets this invariant for free from torch's reparametrization
(optimizer steps update ``weight_orig``; the effective weight is re-masked on
every forward — `/root/reference/train.py:317`).  In optax we instead zero
the *update* (which already folds in weight decay and momentum) for pruned
slots, so ``w == 0`` is preserved through arbitrarily long fine-tuning.

Applied as the last link of the optax chain:
    optax.chain(clip, adamw(...), masked_updates(masks_fn))
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import optax
from flax import traverse_util


def masked_updates(get_masks: Callable[[], dict]) -> optax.GradientTransformation:
    """Zero updates at pruned positions. ``get_masks`` is called at each
    update so the mask tree can change between pruning iterations without
    rebuilding the optimizer state."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        masks = get_masks()
        if masks:
            flat = dict(traverse_util.flatten_dict(updates))
            for path, mask in masks.items():
                if path in flat:
                    u = flat[path]
                    flat[path] = jnp.where(mask, u, jnp.zeros((), u.dtype))
            updates = traverse_util.unflatten_dict(flat)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def mask_gradients(grads, masks: dict):
    """Zero gradients at pruned positions (useful before global clipping so
    pruned slots don't contribute to the norm — matches reference, where
    masked weights produce zero grads through the reparametrized graph)."""
    if not masks:
        return grads
    flat = dict(traverse_util.flatten_dict(grads))
    for path, mask in masks.items():
        if path in flat:
            g = flat[path]
            flat[path] = jnp.where(mask, g, jnp.zeros((), g.dtype))
    return traverse_util.unflatten_dict(flat)
