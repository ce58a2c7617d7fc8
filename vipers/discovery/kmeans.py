"""Jitted k-means (Lloyd) + whitening.

Replaces ``scipy.cluster.vq.kmeans2`` / ``whiten`` used for pseudo-labeling
discovered boxes (`/root/reference/cluster_for_OD.py:26,188-196`).  Fixed
iteration count under ``lax.scan`` (static shapes, MXU distance matmuls);
empty clusters keep their previous centroid (scipy kmeans2 minit='points'
+ missing='warn' behavior).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def whiten(x, eps: float = 1e-8):
    """Divide each feature by its std (scipy.cluster.vq.whiten)."""
    std = jnp.std(x, axis=0)
    return x / jnp.maximum(std, eps)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans2(rng, x, k: int, iters: int = 10):
    """x: (N, D). Returns (centroids (k, D), labels (N,)).

    Init = k random distinct points (minit='points'); distance = squared
    euclidean via the |a|^2 - 2ab + |b|^2 expansion (one MXU matmul per
    iteration).
    """
    n, d = x.shape
    idx = jax.random.permutation(rng, n)[:k]
    return kmeans2_init(x, x[idx], iters=iters)


@functools.partial(jax.jit, static_argnames=("iters",))
def kmeans2_init(x, cent, iters: int = 10):
    """Lloyd iterations from EXPLICIT initial centroids — scipy
    ``kmeans2(data, init, minit='matrix')`` semantics: ``iters``
    label+update rounds, empty clusters keep their previous centroid.
    Like scipy, the returned labels are the LAST assignment — the one the
    final centroids were computed from (NOT a re-assignment under the
    final centroids, which can differ for boundary points)."""
    if iters < 1:
        raise ValueError("iters must be >= 1 (scipy kmeans2 semantics)")
    k = cent.shape[0]
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)  # (N, 1)

    def step(cent, _):
        c_sq = jnp.sum(cent * cent, axis=1)[None, :]  # (1, K)
        d2 = x_sq - 2.0 * (x @ cent.T) + c_sq
        labels = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # (N, K)
        counts = jnp.sum(one_hot, axis=0)  # (K,)
        sums = one_hot.T @ x  # (K, D)
        new_cent = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), cent
        )
        return new_cent, labels

    cent, labels_seq = jax.lax.scan(step, cent, None, length=iters)
    return cent, labels_seq[-1]
