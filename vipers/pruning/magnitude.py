"""Iterative global L1 magnitude pruning ("LRR" schedule).

Reference semantics (`/root/reference/train.py:322-344`, which calls torch's
``prune.global_unstructured(L1Unstructured, amount)``):

  * candidates = weights still *unpruned* under the current masks
    (torch's ``PruningContainer._combine_masks`` restricts the new method to
    slots where the default mask is 1),
  * prune exactly ``k = round(amount * n_remaining)`` of them — the k with
    the smallest |w| (torch uses ``topk(|w|, k, largest=False)``),
  * compose: new_mask = old_mask AND keep.

So each iteration removes ``amount`` of the *remaining* weights and the
control loop (`/root/reference/train.py:656-708`) repeats
train -> prune 20% -> recount until global sparsity crosses the target:
sparsity after n rounds = 1 - (1-amount)^n.

Exact-k selection here is a deterministic argsort over (|w|, flat index), so
ties at the cutoff magnitude are broken by position — stable across runs and
backends.
"""

from __future__ import annotations

import jax.numpy as jnp

from vipers.pruning import masks as M


def magnitude_prune(params, masks: dict, amount: float = 0.2) -> dict:
    """One global L1 pruning round over the currently-unpruned weights."""
    if not 0.0 <= amount <= 1.0:
        raise ValueError(f"amount must be in [0,1], got {amount}")
    flat_p = M._flat(params)

    abs_w = {p: jnp.abs(flat_p[p].astype(jnp.float32)) for p in masks}
    vec, layout = M.concat_masked_scores(abs_w)
    mvec, _ = M.concat_masked_scores({p: masks[p] for p in masks})

    n_remaining = int(jnp.sum(mvec))
    k = int(round(amount * n_remaining))
    if k <= 0:
        return dict(masks)

    # Rank remaining weights by |w|; pruned slots get +inf so they never
    # re-enter the candidate pool (matches torch's slc-restriction).
    ranked = jnp.where(mvec, vec, jnp.inf)
    order = jnp.argsort(ranked, stable=True)  # ascending |w|, ties by index
    prune_idx = order[:k]
    keep = jnp.ones(vec.shape, dtype=bool).at[prune_idx].set(False)
    new_vec = mvec & keep

    return M.split_vector(new_vec, layout)
