"""A/B the fused LN->fc1->GELU Pallas kernel vs the XLA sequence at the
LOST bench shape (M = 128*896 rows, 384 -> 1536), bf16, on the real chip.

Chained in-jit repetitions amortize the tunneled per-dispatch overhead.

    python tools/bench_fused_mlp.py [--iters 12]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

M, D, F = 128 * 896, 384, 1536
FLOPS = 2 * M * D * F


def timed(run, x, iters):
    out = jax.block_until_ready(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(x))
        best = min(best, (time.perf_counter() - t0) / iters)
    float(jnp.asarray(out).reshape(-1)[0])
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    from vipers.ops.fused_mlp import _gelu_tanh_f32, fused_ln_dense_gelu

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, D)).astype(np.float32), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1 + 1,
                    jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(D,)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    W = jnp.asarray((rng.normal(size=(D, F)) / np.sqrt(D)).astype(np.float32),
                    jnp.bfloat16)
    bb = jnp.asarray(rng.normal(size=(F,)).astype(np.float32) * 0.1,
                     jnp.bfloat16)
    # back-projection to keep the chain shape-stable (F -> D)
    Wb = jnp.asarray((rng.normal(size=(F, D)) / np.sqrt(F)).astype(np.float32),
                     jnp.bfloat16)

    def xla_seq(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
        z = ((g.astype(jnp.float32) * ((xf - mu) * lax.rsqrt(var + 1e-6)))
             + b.astype(jnp.float32)).astype(x.dtype)
        y = z @ W + bb
        return _gelu_tanh_f32(y.astype(jnp.float32)).astype(x.dtype)

    def fused(x):
        return fused_ln_dense_gelu(x, g, b, W, bb)

    for name, f in (("xla", xla_seq), ("fused", fused)):
        @jax.jit
        def run(x, f=f):
            def body(_, acc):
                return f(acc) @ Wb
            return lax.fori_loop(0, args.iters, body, x)

        dt = timed(run, x, args.iters)
        print(f"{name:6s} {dt*1e3:7.3f} ms/app  "
              f"{FLOPS/dt/1e12:6.1f} TFLOP/s (fc1 matmul only)")


if __name__ == "__main__":
    main()
