"""MixUp / CutMix as one jitted batch transform.

Reference: `/root/reference/transforms.py:10-206` — RandomChoice between
RandomMixUp and RandomCutMix applied in the collate fn
(`/root/reference/train.py:567-574`).  Semantics reproduced:
  * each is applied with probability p (default 1.0 when chosen by the
    RandomChoice; the reference constructs them with p=1.0 via
    get_mixup_cutmix),
  * pairing by rolling the batch by one,
  * mixup: lambda ~ Beta(alpha, alpha); x = l*x + (1-l)*roll(x);
    y = l*y + (1-l)*roll(y) on one-hot targets,
  * cutmix: rectangle of half-extent 0.5*sqrt(1-lambda) around a uniform
    center, clipped; lambda recomputed from the clipped area.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _beta(rng, alpha: float):
    a = jax.random.gamma(rng, alpha)
    rng2 = jax.random.fold_in(rng, 1)
    b = jax.random.gamma(rng2, alpha)
    return a / (a + b)


@functools.partial(
    jax.jit, static_argnames=("num_classes", "mixup_alpha", "cutmix_alpha")
)
def mixup_cutmix_batch(
    rng,
    images,  # (N, H, W, C) float
    labels,  # (N,) int or (N, K) soft
    num_classes: int,
    mixup_alpha: float = 0.2,
    cutmix_alpha: float = 1.0,
):
    """Randomly choose mixup or cutmix (50/50 when both enabled), apply it."""
    if labels.ndim == 1:
        labels = jax.nn.one_hot(labels, num_classes, dtype=images.dtype)
    k_choice, k_lam, k_box = jax.random.split(rng, 3)
    use_mixup = mixup_alpha > 0
    use_cutmix = cutmix_alpha > 0
    if not use_mixup and not use_cutmix:
        return images, labels

    x_roll = jnp.roll(images, 1, axis=0)
    y_roll = jnp.roll(labels, 1, axis=0)

    def do_mixup(_):
        lam = _beta(k_lam, mixup_alpha)
        return images * lam + x_roll * (1 - lam), labels * lam + y_roll * (1 - lam)

    def do_cutmix(_):
        lam = _beta(k_lam, cutmix_alpha)
        n, h, w, _ = images.shape
        kx, ky = jax.random.split(k_box)
        r_x = jax.random.randint(kx, (), 0, w)
        r_y = jax.random.randint(ky, (), 0, h)
        r = 0.5 * jnp.sqrt(1.0 - lam)
        r_w_half = (r * w).astype(jnp.int32)
        r_h_half = (r * h).astype(jnp.int32)
        x1 = jnp.clip(r_x - r_w_half, 0, w)
        y1 = jnp.clip(r_y - r_h_half, 0, h)
        x2 = jnp.clip(r_x + r_w_half, 0, w)
        y2 = jnp.clip(r_y + r_h_half, 0, h)
        cols = jnp.arange(w)[None, :]
        rows = jnp.arange(h)[:, None]
        inside = (rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2)
        mixed = jnp.where(inside[None, :, :, None], x_roll, images)
        lam_adj = 1.0 - ((x2 - x1) * (y2 - y1)).astype(images.dtype) / (w * h)
        return mixed, labels * lam_adj + y_roll * (1 - lam_adj)

    if use_mixup and use_cutmix:
        choice = jax.random.bernoulli(k_choice)
        return jax.lax.cond(choice, do_mixup, do_cutmix, None)
    if use_mixup:
        return do_mixup(None)
    return do_cutmix(None)
