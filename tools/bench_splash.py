"""A/B the splash-attention kernel against the shipped library flash kernel
at LOST shapes (B=32, H=6, T=896, hd=64, bf16).

The flash custom-calls are 39% of LOST device time at ~54 TFLOP/s
(docs/PERF.md "Remaining ceiling"); splash is the newer TPU kernel
generation with head-minor layout options that may lift the hd=64 lane
ceiling. Run on the real chip: `python tools/bench_splash.py`.
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
VALID_T = 769  # real token count before seq_pad_multiple


def _time(fn, q, k, v, *extra, iters=20):
    """Dependency-chained scan timing: iteration i's q depends on i-1's
    output, so the runtime cannot elide, dedupe, or overlap the calls
    (isolated same-args dispatch loops measured impossible TFLOP/s)."""

    @jax.jit
    def chained(q, k, v):
        def body(qc, _):
            # feed the output back as the next q: fully serializes and is
            # not algebraically removable (q + out*0 would be folded+DCE'd)
            out = fn(qc, k, v, *extra)
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
    flops = 2 * B * H * T * T * HD * 2  # qk^T + pv
    return flops / sec / 1e12


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, HD)), jnp.bfloat16)
    valid = jnp.arange(T)[None, :] < VALID_T
    valid = jnp.broadcast_to(valid, (B, T))
    scale = HD ** -0.5

    from vipers.ops.flash_attention import flash_attention_official

    lib = jax.jit(functools.partial(flash_attention_official, scale=scale))
    t_lib = _time(lib, q, k, v, valid)
    print(f"library flash + segids : {t_lib*1e3:8.3f} ms  {_tflops(t_lib):6.1f} TFLOP/s")

    lib_nomask = jax.jit(
        lambda q, k, v: flash_attention_official(q, k, v, None, scale))
    t_ln = _time(lib_nomask, q, k, v)
    print(f"library flash no mask  : {t_ln*1e3:8.3f} ms  {_tflops(t_ln):6.1f} TFLOP/s")

    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    def make_splash(block_q, block_kv, q_layout=sk.QKVLayout.HEAD_DIM_MINOR,
                    k_layout=sk.QKVLayout.HEAD_DIM_MINOR,
                    v_layout=sk.QKVLayout.HEAD_DIM_MINOR):
        mask = sm.MultiHeadMask([sm.FullMask((T, T)) for _ in range(H)])
        bs = sk.BlockSizes(block_q=block_q, block_kv=block_kv,
                           q_layout=q_layout, k_layout=k_layout,
                           v_layout=v_layout)
        kern = sk.make_splash_mha(mask, block_sizes=bs, head_shards=1,
                                  q_seq_shards=1)

        @jax.jit
        def run(q, k, v):
            qs = (q * scale).astype(q.dtype)
            return jax.vmap(kern)(qs, k, v)

        return run

    for bq, bkv in [(448, 896), (896, 896), (448, 448), (256, 896),
                    (128, 896), (896, 448)]:
        try:
            fn = make_splash(bq, bkv)
            t = _time(fn, q, k, v)
            print(f"splash bq={bq:4d} bkv={bkv:4d}: {t*1e3:8.3f} ms  "
                  f"{_tflops(t):6.1f} TFLOP/s")
        except Exception as e:
            print(f"splash bq={bq} bkv={bkv}: FAIL {type(e).__name__}: {e}")

    # seq-minor layouts (lane dim = sequence, not head) — the hd=64 fix
    for ql, kl, vl, name in [
        (sk.QKVLayout.SEQ_MINOR, sk.QKVLayout.SEQ_MINOR,
         sk.QKVLayout.SEQ_MINOR, "all-seq-minor"),
        (sk.QKVLayout.HEAD_DIM_MINOR, sk.QKVLayout.SEQ_MINOR,
         sk.QKVLayout.HEAD_DIM_MINOR, "k-seq-minor"),
    ]:
        try:
            fn = make_splash(448, 896, ql, kl, vl)
            t = _time(fn, q, k, v)
            print(f"splash 448/896 {name:14s}: {t*1e3:8.3f} ms  "
                  f"{_tflops(t):6.1f} TFLOP/s")
        except Exception as e:
            print(f"splash {name}: FAIL {type(e).__name__}: {e}")

    # correctness vs einsum reference on the valid region
    ref_s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
    ref_p = jax.nn.softmax(ref_s, axis=-1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", ref_p, v.astype(jnp.float32))
    out = make_splash(448, 896)(q, k, v)
    err = jnp.max(jnp.abs(out.astype(jnp.float32) - ref)[:, :, :VALID_T])
    print(f"splash max abs err vs f32 einsum (valid rows, unmasked): {err:.4f}")


if __name__ == "__main__":
    main()
