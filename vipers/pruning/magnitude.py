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


def magnitude_prune(params, masks: dict, amount: float = 0.2,
                    scope: str = "all") -> dict:
    """One global L1 pruning round over the currently-unpruned weights.

    ``scope``: "all" (train.py semantics) | "conv" | "linear" — the legacy
    recipe prunes only Conv2d weights for resnets and only Linear weights
    for transformers (`/root/reference/original_train.py:206-227`).
    """
    if not 0.0 <= amount <= 1.0:
        raise ValueError(f"amount must be in [0,1], got {amount}")
    flat_p = M._flat(params)

    if scope == "conv":
        in_scope = {p for p in masks if flat_p[p].ndim == 4}
    elif scope == "linear":
        in_scope = {p for p in masks if flat_p[p].ndim == 2}
    elif scope == "all":
        in_scope = set(masks)
    else:
        raise ValueError(f"unknown scope {scope!r}")
    if in_scope != set(masks):
        scoped = magnitude_prune(
            params, {p: masks[p] for p in sorted(in_scope)}, amount, "all"
        )
        out = dict(masks)
        out.update(scoped)
        return out

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
