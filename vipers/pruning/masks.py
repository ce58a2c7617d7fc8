"""Pruning masks as explicit pytrees.

The reference relies on torch's mask reparametrization
(``prune.custom_from_mask`` => hidden ``weight_orig``/``weight_mask`` buffers
plus C++ autograd hooks — `/root/reference/train.py:312-317`), which forces
every downstream consumer into a try/identity/load/remove "dance"
(`/root/reference/main_lost.py:137-162`, `/root/reference/evaluate_models.py:391-403`).

Here masks are plain boolean arrays in a flat ``{path: mask}`` dict keyed by
the parameter path.  The effective weight is ``w * mask``, fused by XLA into
the conv/matmul that consumes it; optimizers mask both gradients and updates
(see ``masked_optim``) so pruned weights stay exactly zero through
fine-tuning — the invariant the reference gets from reparametrization.

Prunable selection mirrors `/root/reference/train.py:264-268`
(``isinstance(m, (nn.Conv2d, nn.Linear))`` => the ``weight`` only, never
biases/norms/embeddings): in flax terms, any leaf named ``kernel`` with
ndim 2 (Dense) or 4 (Conv), minus per-model exclusions (ViT attention
in-projection — see ``core.registry.ModelSpec.prune_exclude``).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

Path = Tuple[str, ...]
MaskTree = Dict[Path, jax.Array]


def _flat(params):
    return traverse_util.flatten_dict(params)


def prunable_paths(params, exclude: Sequence[str] = ()) -> list:
    """Paths of prunable kernels, in deterministic (sorted) order."""
    out = []
    for path, leaf in sorted(_flat(params).items()):
        if path[-1] != "kernel":
            continue
        if leaf.ndim not in (2, 4):
            continue
        joined = "/".join(path)
        if any(pat in joined for pat in exclude):
            continue
        out.append(path)
    return out


def init_masks(params, exclude: Sequence[str] = ()) -> MaskTree:
    """All-ones (keep everything) masks for every prunable kernel."""
    flat = _flat(params)
    return {p: jnp.ones(flat[p].shape, dtype=bool) for p in prunable_paths(params, exclude)}


def apply_masks(params, masks: MaskTree):
    """Return params with masked kernels zeroed: ``w_eff = where(mask, w, 0)``.

    Pure and cheap — under jit, XLA fuses the select into the consuming
    conv/matmul, so the masked model costs the same as the dense one.
    """
    if not masks:
        return params
    flat = dict(_flat(params))
    for path, mask in masks.items():
        w = flat[path]
        flat[path] = jnp.where(mask, w, jnp.zeros((), w.dtype))
    return traverse_util.unflatten_dict(flat)


def _is_conv(path: Path, leaf) -> bool:
    return leaf.ndim == 4


def _is_linear(path: Path, leaf) -> bool:
    return leaf.ndim == 2


def compute_sparsity_global(params, masks: MaskTree) -> float:
    """Global % of zero weights over conv+dense kernels.

    Counterpart of `/root/reference/train.py:347-369` — which counts
    ``weight == 0`` on the *effective* weight; we count mask zeros plus any
    genuinely zero kept weights to match exactly.
    """
    return _sparsity(params, masks, lambda p, l: True)


def compute_sparsity_conv(params, masks: MaskTree) -> float:
    """Conv-only sparsity (`/root/reference/evaluate_models.py:166-170`)."""
    return _sparsity(params, masks, _is_conv)


def compute_sparsity_linear(params, masks: MaskTree) -> float:
    """Dense-only sparsity (`/root/reference/evaluate_models.py:171-173`)."""
    return _sparsity(params, masks, _is_linear)


def _sparsity(params, masks, pred) -> float:
    flat = _flat(params)
    total = 0
    zeros = 0
    for path, mask in masks.items():
        leaf = flat[path]
        if not pred(path, leaf):
            continue
        w_eff = jnp.where(mask, leaf, 0)
        total += w_eff.size
        zeros += int(jnp.sum(w_eff == 0))
    if total == 0:
        return 0.0
    return 100.0 * zeros / total


def count_parameters(params, masks: MaskTree = None) -> Tuple[int, int]:
    """(total params, nonzero params) over the whole tree.

    Analog of `/root/reference/lost_performance_plot.py:43-46`.
    """
    total = sum(l.size for l in jax.tree.leaves(params))
    nonzero = total
    if masks:
        for m in masks.values():
            nonzero -= int(m.size - jnp.sum(m))
    return total, nonzero


def sparsity_report(params, masks: MaskTree) -> Dict[str, float]:
    return {
        "global": compute_sparsity_global(params, masks),
        "conv": compute_sparsity_conv(params, masks),
        "linear": compute_sparsity_linear(params, masks),
    }


def concat_masked_scores(scores: MaskTree):
    """Flatten score arrays into one vector (deterministic sorted-path
    order). Returns (vector, layout) where layout = [(path, shape, size)]
    for scattering results back."""
    vec = []
    layout = []
    for path in sorted(scores):
        s = scores[path].reshape(-1)
        vec.append(s)
        layout.append((path, scores[path].shape, s.size))
    return jnp.concatenate(vec), layout


def split_vector(vec, layout) -> MaskTree:
    out = {}
    off = 0
    for path, shape, size in layout:
        out[path] = vec[off : off + size].reshape(shape)
        off += size
    return out
