"""Sweep library flash-attention block sizes at the LOST bench shape.

Times jax.experimental.pallas.ops.tpu.flash_attention forward (and
optionally fwd+bwd) at (B, H, T, hd) = (128, 6, 896, 64) bf16 — the shape
the shipped LOST pipeline runs — across legal (block_q, block_k) pairs,
plus the XLA einsum+softmax for reference. Run on the real chip:

    python tools/sweep_flash_blocks.py [--grad]

Inputs are function ARGUMENTS (not closures) so XLA cannot constant-fold
them; still, trust the full-pipeline bench for final numbers.
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, T, HD = 128, 6, 896, 64
FLOPS = 4 * B * H * T * T * HD  # QK^T + AV, 2 MACs each


def timeit(fn, args, iters=8):
    """Times `iters` data-dependent applications of fn INSIDE one jitted
    program (call i+1's first arg is call i's output), so the tunneled
    chip's per-dispatch overhead (~4-9 ms on this host) is paid once and
    amortized out; reports per-application time."""
    import jax.lax as lax

    q = args[0]

    @jax.jit
    def run(q, *rest):
        def body(_, acc):
            out = fn(acc, *rest)
            first = out[0] if isinstance(out, tuple) else out
            if getattr(first, "shape", None) == acc.shape:
                return first.astype(acc.dtype)
            # WARNING: x.sum()*0 is algebraically removable — XLA folds it
            # and DCEs the whole body (see tools/bench_splash.py's note),
            # so this fallback must never carry the timed computation.
            # Today every timed fn is q-shaped and takes the branch above.
            return acc + first.astype(acc.dtype).sum() * 0
        return lax.fori_loop(0, iters, body, q)

    out = jax.block_until_ready(run(*((q,) + args[1:])))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*((q,) + args[1:]))
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    float(jnp.asarray(out).reshape(-1)[0])
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grad", action="store_true", help="time fwd+bwd too")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from jax.experimental.pallas.ops.tpu import flash_attention as ofa

    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.normal(size=(B, H, T, HD)).astype(np.float32), jnp.bfloat16
    )
    q, k, v = mk(), mk(), mk()
    scale = HD ** -0.5

    # legal block sizes: divide T=896; kv blocks must be 128-multiples
    bqs = [x for x in (224, 448, 896) if T % x == 0]
    bks = [x for x in (448, 896) if T % x == 0 and x % 128 == 0]

    print(f"shape=({B},{H},{T},{HD}) bf16  flops/call={FLOPS/1e9:.1f} G")
    rows = []
    for bq in bqs:
        for bk in bks:
            bs = ofa.BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bk,
                block_q_dkv=bq, block_k_dkv=bk,
                block_q_dq=bq, block_k_dq=bk, block_k_major_dq=bk,
            )
            f = jax.jit(
                functools.partial(
                    ofa.flash_attention, sm_scale=scale, block_sizes=bs
                )
            )
            try:
                dt = timeit(f, (q, k, v), args.iters)
            except Exception as e:  # illegal config
                print(f"bq={bq:4d} bk={bk:4d}  FAILED {type(e).__name__}")
                continue
            tfs = FLOPS / dt / 1e12
            rows.append((tfs, bq, bk))
            print(f"bq={bq:4d} bk={bk:4d}  {dt*1e3:7.2f} ms  {tfs:6.1f} TFLOP/s")

            if args.grad:
                def loss(q, k, v):
                    return ofa.flash_attention(
                        q, k, v, sm_scale=scale, block_sizes=bs
                    ).astype(jnp.float32).sum()

                g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
                dtg = timeit(g, (q, k, v), max(2, args.iters // 2))
                print(f"      fwd+bwd: {dtg*1e3:7.2f} ms  "
                      f"{3.5 * FLOPS / dtg / 1e12:6.1f} TFLOP/s-equiv")

    # XLA einsum+softmax reference (materializes T x T)
    def einsum_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    f = jax.jit(einsum_attn)
    dt = timeit(f, (q, k, v), args.iters)
    print(f"XLA einsum       {dt*1e3:7.2f} ms  {FLOPS/dt/1e12:6.1f} TFLOP/s")

    if not rows:
        print("\nno legal (block_q, block_k) config ran — wrong platform "
              "or incompatible libtpu?")
        return 1
    rows.sort(reverse=True)
    best = rows[0]
    print(f"\nbest: bq={best[1]} bk={best[2]} at {best[0]:.1f} TFLOP/s")


if __name__ == "__main__":
    sys.exit(main())
