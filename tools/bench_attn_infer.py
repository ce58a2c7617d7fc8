"""A/B the single-block fused attention kernel (ops/attention_train.py,
forward only) against the shipped library flash kernel at LOST inference
shapes (B=32, H=6, T=896, hd=64, bf16).

Motivation: the flash custom-calls are 39% of LOST device time at
~54 TFLOP/s and were shown softmax-VPU-bound (docs/PERF.md splash A/B).
The single-block kernel computes the exact softmax in ONE pass with no
online-rescale bookkeeping (no running max/sum corrections, no extra
rescale multiplies per block) — if the VPU work is the bound, removing
the online-softmax overhead is the only remaining lever at these shapes.
Run on the real chip: `python tools/bench_attn_infer.py`.
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B, H, T, HD = 32, 6, 896, 64
VALID_T = 769


def _time(fn, q, k, v, iters=20):
    """Dependency-chained scan timing (see tools/bench_splash.py)."""

    @jax.jit
    def chained(q, k, v):
        def body(qc, _):
            out = fn(qc, k, v)
            return out.astype(qc.dtype), ()

        qf, _ = jax.lax.scan(body, q, None, length=iters)
        return qf

    out = chained(q, k, v)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = chained(q, k, v)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _tflops(sec):
    return 2 * B * H * T * T * HD * 2 / sec / 1e12


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, HD)), jnp.bfloat16)
    valid = jnp.broadcast_to(jnp.arange(T)[None, :] < VALID_T, (B, T))
    scale = HD ** -0.5

    from vipers.ops.flash_attention import flash_attention_official

    lib = jax.jit(lambda q, k, v: flash_attention_official(
        q, k, v, valid, scale))
    t_lib = _time(lib, q, k, v)
    print(f"library flash + segids : {t_lib*1e3:8.3f} ms  "
          f"{_tflops(t_lib):6.1f} TFLOP/s")

    import vipers.ops.attention_train as at

    for bb in (1, 2, 4, 8):
        orig = at._pick_block_b
        at._pick_block_b = lambda b, t, _g=bb: _g
        try:
            fn = jax.jit(lambda q, k, v: at._attn(
                q, k, v, valid[:, None, :].astype(jnp.int8), scale, False))
            t = _time(fn, q, k, v)
            print(f"single-block  bb={bb}    : {t*1e3:8.3f} ms  "
                  f"{_tflops(t):6.1f} TFLOP/s")
        except Exception as e:
            print(f"single-block bb={bb}: FAIL {type(e).__name__}: {e}")
        finally:
            at._pick_block_b = orig

    # correctness vs masked f32 einsum on valid-query rows
    out = jax.jit(lambda q, k, v: at.attention_train(
        q, k, v, valid=valid, scale=scale))(q, k, v)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = jnp.where(valid[:, None, None, :], s, -1e9)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1),
                     v.astype(jnp.float32))
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref)[:, :, :VALID_T])
    print(f"single-block max abs err vs f32 einsum (valid rows): {err:.4f}")


if __name__ == "__main__":
    main()
