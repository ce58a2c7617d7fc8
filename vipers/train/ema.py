"""Exponential moving average of model state (params + batch stats).

Counterpart of `/root/reference/utils.py:159-170`
(``ema = decay*ema + (1-decay)*param``, buffers included) with the
world-size/batch/steps decay adjustment from
`/root/reference/train.py:637-640`.
"""

from __future__ import annotations

import jax


def ema_decay_for(
    model_ema_decay: float,
    world_size: int,
    batch_size: int,
    model_ema_steps: int,
    epochs: int,
) -> float:
    adjust = world_size * batch_size * model_ema_steps / epochs
    alpha = 1.0 - model_ema_decay
    alpha = min(1.0, alpha * adjust)
    return 1.0 - alpha


def ema_update(ema_tree, new_tree, decay: float):
    """ema <- decay*ema + (1-decay)*new, elementwise over the pytree."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema_tree, new_tree)


def ema_reset(ema_tree, new_tree):
    """Copy weights (used during warmup: `/root/reference/train.py:69-73`
    resets the average count so EMA keeps tracking exactly)."""
    del ema_tree
    return jax.tree.map(lambda p: p, new_tree)
