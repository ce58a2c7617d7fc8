"""SNIP single-shot pruning as one jitted saliency pass.

Reference semantics (`/root/reference/train.py:241-319`):
  * run one batch forward+backward,
  * per prunable weight, saliency = |w| * |dL/dw|,
  * concatenate all saliencies, sort, threshold = k-th smallest where
    ``k = int(N * target_sparsity)`` (edge cases: k<=0 => keep all,
    k>=N => prune all),
  * mask = (saliency > threshold)  — strict, so ties at the threshold are
    pruned.

The whole thing here is a single ``jax.value_and_grad`` + one ``lax.top_k``-
style threshold pass under jit — no hooks, no host round trips.  The mask is
bit-matchable against the reference because the threshold is an
order-independent order statistic and the comparison is strict; saliencies
are accumulated in float32.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from vipers.pruning import masks as M


def snip_saliency(loss_fn: Callable, params, batch, masks=None):
    """Per-weight |w|*|g| saliencies for every prunable kernel.

    ``loss_fn(params, batch) -> scalar`` must run the model in train mode with
    the masks already applied internally if ``masks`` is given (so gradients
    flow to the raw params, like torch's reparametrized backward).
    """
    keys = list(masks.keys()) if masks else M.prunable_paths(params)

    @jax.jit
    def saliency(params, batch):
        grads = jax.grad(loss_fn)(params, batch)
        flat_p = M._flat(params)
        flat_g = M._flat(grads)
        # at least f32 accumulation; f64 params (x64 parity harnesses)
        # keep their full precision
        def acc_t(path):
            return jnp.promote_types(flat_p[path].dtype, jnp.float32)

        return {
            path: jnp.abs(flat_p[path].astype(acc_t(path)))
            * jnp.abs(flat_g[path].astype(acc_t(path)))
            for path in keys
        }

    return saliency(params, batch)


def snip_threshold(saliencies: dict, target_sparsity: float):
    """k-th-smallest global threshold (`/root/reference/train.py:294-307`)."""
    vec, _ = M.concat_masked_scores(saliencies)
    n = vec.size
    k = int(n * float(target_sparsity))
    if k >= n:
        return jnp.asarray(jnp.inf, vec.dtype)
    if k <= 0:
        return jnp.asarray(-1.0, vec.dtype)
    sorted_scores = jnp.sort(vec)
    return sorted_scores[k - 1]


def snip_prune(
    loss_fn: Callable,
    params,
    batch,
    target_sparsity: float,
    exclude: Sequence[str] = (),
) -> dict:
    """One-shot SNIP: returns boolean masks for all prunable kernels."""
    base = M.init_masks(params, exclude)
    sal = snip_saliency(loss_fn, params, batch, masks=base)
    thr = snip_threshold(sal, target_sparsity)
    return {path: s > thr for path, s in sal.items()}
