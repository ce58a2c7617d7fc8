"""Integrated Gradients + SmoothGrad noise tunnel, jitted.

Replaces Captum's ``IntegratedGradients`` / ``NoiseTunnel`` usage at
`/root/reference/explain.py:552-578` (nt_samples=2, nt_type='smoothgrad')
and `/root/reference/explainations_evaluation_metrics.py:969-983`.

Captum-default semantics reproduced:
  * baseline = zeros, n_steps = 50, method = "gausslegendre"
    (Gauss-Legendre nodes rescaled from [-1,1] to [0,1]),
  * attribution = (x - baseline) * sum_i w_i * grad(f_target)(baseline +
    a_i * (x - baseline)),
  * SmoothGrad: average attributions over inputs + N(0, stdev^2) noise,
    stdev = nt_stdev * (max(x) - min(x)) (captum scales by input range).

The step loop is a ``lax.scan`` over precomputed nodes — one compiled
program regardless of n_steps; steps batch through vmap-free scan to bound
memory at ViT scale.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _gauss_legendre_01(n_steps: int):
    xs, ws = np.polynomial.legendre.leggauss(n_steps)
    # rescale from [-1, 1] to [0, 1]
    return (0.5 * (xs + 1)).astype(np.float32), (0.5 * ws).astype(np.float32)


def _riemann_trapezoid_01(n_steps: int):
    xs = np.linspace(0.0, 1.0, n_steps, dtype=np.float32)
    ws = np.full((n_steps,), 1.0 / (n_steps - 1), dtype=np.float32)
    ws[0] *= 0.5
    ws[-1] *= 0.5
    return xs, ws


def make_integrated_gradients(
    score_fn: Callable,
    n_steps: int = 50,
    method: str = "gausslegendre",
):
    """score_fn(x, target) -> scalar per example score (e.g. logit of the
    target class). Returns jitted ig(x, target, baseline=None) -> attribution
    with x's shape."""
    if method == "gausslegendre":
        alphas, weights = _gauss_legendre_01(n_steps)
    elif method == "riemann_trapezoid":
        alphas, weights = _riemann_trapezoid_01(n_steps)
    else:
        raise ValueError(f"unknown IG method {method!r}")
    alphas = jnp.asarray(alphas)
    weights = jnp.asarray(weights)
    grad_fn = jax.grad(lambda x, t: jnp.sum(score_fn(x, t)))

    @jax.jit
    def ig(x, target, baseline=None):
        if baseline is None:
            baseline = jnp.zeros_like(x)
        delta = x - baseline

        def body(acc, aw):
            a, w = aw
            g = grad_fn(baseline + a * delta, target)
            return acc + w * g, None

        total, _ = jax.lax.scan(body, jnp.zeros_like(x), (alphas, weights))
        return delta * total

    return ig


def make_smoothgrad(
    attr_fn: Callable,
    nt_samples: int = 2,
    nt_stdev: float = 1.0,
):
    """Captum NoiseTunnel(smoothgrad): mean of attr_fn over noisy inputs;
    noise stdev scales with the per-example input range."""

    @jax.jit
    def sg(rng, x, target):
        spread = (jnp.max(x) - jnp.min(x)) * nt_stdev

        def body(acc, key):
            noise = jax.random.normal(key, x.shape, x.dtype) * spread
            return acc + attr_fn(x + noise, target), None

        keys = jax.random.split(rng, nt_samples)
        total, _ = jax.lax.scan(body, jnp.zeros_like(x), keys)
        return total / nt_samples

    return sg


def integrated_gradients(score_fn, x, target, n_steps=50, method="gausslegendre"):
    return make_integrated_gradients(score_fn, n_steps, method)(x, target)


def smoothgrad(score_fn, rng, x, target, nt_samples=2, nt_stdev=1.0, n_steps=50):
    ig = make_integrated_gradients(score_fn, n_steps)
    return make_smoothgrad(ig, nt_samples, nt_stdev)(rng, x, target)
