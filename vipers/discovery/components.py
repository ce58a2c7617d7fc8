"""Connected components on TPU: jittable replacements for
``scipy.ndimage.label`` (`/root/reference/object_discovery.py:104,161`).

scipy's default structure is 4-connectivity
(``generate_binary_structure(2, 1)``); both kernels below use exactly that
and are exactness-tested against scipy on random masks.

Two primitives:
  * ``flood_fill_from_seed`` — LOST only needs *the component containing the
    seed* (`object_discovery.py:107-117`), which is a monotone dilation from
    the seed: O(diameter) fused VPU iterations inside ``lax.while_loop``.
  * ``label_components`` — full labeling via iterative min-label propagation
    (for ``dino_seg``'s biggest-component selection, `:161-171`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _dilate4(x):
    """One 4-connected binary dilation step via shifts (VPU-only, fusable)."""
    up = jnp.pad(x[1:, :], ((0, 1), (0, 0)))
    down = jnp.pad(x[:-1, :], ((1, 0), (0, 0)))
    left = jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
    right = jnp.pad(x[:, :-1], ((0, 0), (1, 0)))
    return x | up | down | left | right


@jax.jit
def flood_fill_from_seed(mask, seed_rc):
    """Boolean (H, W) component of ``mask`` containing ``seed_rc``.

    If the seed itself is background, returns all-False (the caller mirrors
    the reference's "seed in background" error — `object_discovery.py:110-111`).
    """
    h, w = mask.shape
    seed = jnp.zeros((h, w), bool).at[seed_rc[0], seed_rc[1]].set(True)
    seed = seed & mask

    def cond(state):
        cur, prev = state
        return jnp.any(cur != prev)

    def body(state):
        cur, _ = state
        return (_dilate4(cur) & mask, cur)

    out, _ = jax.lax.while_loop(cond, body, (_dilate4(seed) & mask, seed))
    return out


@jax.jit
def label_components(mask):
    """Full 4-connected labeling of a boolean (H, W) mask.

    Returns int32 (H, W): 0 = background, components carry distinct positive
    ids (the minimum flat index + 1 inside each component — deterministic,
    but not scipy's 1..N numbering; compare by membership, not id).
    """
    h, w = mask.shape
    idx = jnp.arange(1, h * w + 1, dtype=jnp.int32).reshape(h, w)
    big = jnp.int32(h * w + 2)
    labels = jnp.where(mask, idx, big)

    def prop(lbl):
        up = jnp.pad(lbl[1:, :], ((0, 1), (0, 0)), constant_values=big)
        down = jnp.pad(lbl[:-1, :], ((1, 0), (0, 0)), constant_values=big)
        left = jnp.pad(lbl[:, 1:], ((0, 0), (0, 1)), constant_values=big)
        right = jnp.pad(lbl[:, :-1], ((0, 0), (1, 0)), constant_values=big)
        nmin = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
        return jnp.where(mask, jnp.minimum(lbl, nmin), big)

    def cond(state):
        cur, prev = state
        return jnp.any(cur != prev)

    def body(state):
        cur, _ = state
        return (prop(cur), cur)

    out, _ = jax.lax.while_loop(cond, body, (prop(labels), labels))
    return jnp.where(mask, out, 0)


@jax.jit
def largest_component_mask(mask):
    """Boolean mask of the largest 4-connected component (ties -> the one
    with the smallest label id, i.e. earliest flat index)."""
    labels = label_components(mask)
    flat = labels.reshape(-1)
    n = flat.shape[0]
    # histogram over possible ids (1..n); id 0 = background excluded
    counts = jnp.zeros((n + 2,), jnp.int32).at[flat].add(1)
    counts = counts.at[0].set(0)
    best = jnp.argmax(counts)  # argmax takes first max -> smallest id
    return labels == best


def component_bbox(mask):
    """(ymin, ymax_excl, xmin, xmax_excl) of True cells — the reference's
    min/max+1 convention (`object_discovery.py:114-118`). All-False input
    yields an empty (0,0,0,0) box."""
    any_at_all = jnp.any(mask)
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    h, w = mask.shape
    ridx = jnp.arange(h)
    cidx = jnp.arange(w)
    ymin = jnp.min(jnp.where(rows, ridx, h))
    ymax = jnp.max(jnp.where(rows, ridx, -1)) + 1
    xmin = jnp.min(jnp.where(cols, cidx, w))
    xmax = jnp.max(jnp.where(cols, cidx, -1)) + 1
    z = jnp.int32(0)
    return jax.lax.cond(
        any_at_all,
        lambda: (ymin.astype(jnp.int32), ymax.astype(jnp.int32),
                 xmin.astype(jnp.int32), xmax.astype(jnp.int32)),
        lambda: (z, z, z, z),
    )
