"""A/B: reduced-precision in-kernel softmax in the fused train attention
(VERDICT round-4 item 4 — the named "next real lever").

Variants at the ViT-S bf16 train shape (B=128, H=6, T=256, hd=64),
fwd+bwd wall time on the real chip:

  f32      — shipped kernel: f32 exp on the (T, T) scores, cast to bf16
             for the P@V / P^T@dO dots (two VPU passes over (T, T)).
  bf16exp  — subtract the row max in f32, cast ONCE to bf16, exp on
             bf16 lanes (if Mosaic packs 2x lanes for bf16
             transcendentals this halves the dominant VPU pass and
             absorbs the cast); row-sum accumulates f32 from bf16.

Both backward variants recompute p the same way from the saved lse.

Run: python tools/bench_softmax_prec.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG_INF = -1e9
B, H, T, HD = 128, 6, 256, 64
BB = 8  # _pick_block_b(128, 256) -> 8


def fwd_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref, lse_ref, *,
               scale, block_b, variant):
    for g in range(block_b):
        q = q_ref[g, 0] * q_ref.dtype.type(scale)
        k = k_ref[g, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ok = valid_ref[g]
        s = jnp.where(ok != 0, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        if variant == "bf16exp":
            p = jnp.exp((s - m).astype(jnp.bfloat16))
            l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
            pb = p
        else:
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            pb = p.astype(v_ref.dtype)
        if variant == "normP":
            # pre-round-5 form: divide the (T, T) matrix before the dot
            pb = (p / l).astype(v_ref.dtype)
            o = jax.lax.dot_general(
                pb, v_ref[g, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[g, 0] = o.astype(o_ref.dtype)
        else:
            o = jax.lax.dot_general(
                pb, v_ref[g, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[g, 0] = (o / l).astype(o_ref.dtype)
        lse_ref[g, 0] = (m + jnp.log(l))[:, 0][None, :]


def bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref, valid_ref,
               dq_ref, dk_ref, dv_ref, *, scale, block_b, variant):
    dt = q_ref.dtype
    for g in range(block_b):
        q = q_ref[g, 0] * dt.type(scale)
        k = k_ref[g, 0]
        v = v_ref[g, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ok = valid_ref[g]
        s = jnp.where(ok != 0, s, NEG_INF)
        do = do_ref[g, 0]
        o = o_ref[g, 0]
        d = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=1, keepdims=True)
        if variant == "bf16exp":
            pb = jnp.exp((s - lse_ref[g, 0][0][:, None]).astype(jnp.bfloat16))
            p32 = pb  # keep (dp - d) * p in mixed precision below
        else:
            p = jnp.exp(s - lse_ref[g, 0][0][:, None])
            pb = p.astype(dt)
            p32 = p
        dv_ref[g, 0] = jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = ((dp - d) * p32).astype(dt)
        dq_ref[g, 0] = (jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dq_ref.dtype)
        dk_ref[g, 0] = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def build(variant):
    scale = HD ** -0.5
    qkv_spec = pl.BlockSpec((BB, 1, T, HD), lambda i, j: (i, j, 0, 0))
    lse_spec = pl.BlockSpec((BB, 1, 1, T), lambda i, j: (i, j, 0, 0))
    ok_spec = pl.BlockSpec((BB, 1, T), lambda i, j: (i, 0, 0))

    def fwd(q, k, v, ok):
        return pl.pallas_call(
            functools.partial(fwd_kernel, scale=scale, block_b=BB,
                              variant=variant),
            grid=(B // BB, H),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, ok_spec],
            out_specs=[qkv_spec, lse_spec],
            out_shape=[
                jax.ShapeDtypeStruct((B, H, T, HD), q.dtype),
                jax.ShapeDtypeStruct((B, H, 1, T), jnp.float32),
            ],
        )(q, k, v, ok)

    def bwd(q, k, v, o, lse, do, ok):
        return pl.pallas_call(
            functools.partial(bwd_kernel, scale=scale, block_b=BB,
                              variant=variant),
            grid=(B // BB, H),
            in_specs=[qkv_spec, qkv_spec, qkv_spec, qkv_spec, lse_spec,
                      qkv_spec, ok_spec],
            out_specs=[qkv_spec, qkv_spec, qkv_spec],
            out_shape=[jax.ShapeDtypeStruct((B, H, T, HD), q.dtype)] * 3,
        )(q, k, v, o, lse, do, ok)

    @jax.jit
    def step(q, k, v, do, ok):
        o, lse = fwd(q, k, v, ok)
        dq, dk, dv = bwd(q, k, v, o, lse, do, ok)
        return o, dq, dk, dv

    return step


def main():
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(
        rng.normal(size=(B, H, T, HD)), jnp.bfloat16)
    q, k, v, do = mk(), mk(), mk(), mk()
    ok = jnp.ones((B, 1, T), jnp.int8)

    results = {}
    outs = {}
    for name in ("normP", "f32", "bf16exp"):
        step = build(name)
        out = step(q, k, v, do, ok)
        jax.block_until_ready(out)
        outs[name] = [np.asarray(x, np.float32) for x in out]
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(20):
                out = step(q, k, v, do, ok)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / 20)
        results[name] = best * 1e3
        print(f"{name}: {best * 1e3:.3f} ms fwd+bwd", flush=True)

    # numeric deltas vs the f32-softmax kernel (bf16 IO in both cases)
    for i, tag in enumerate(("o", "dq", "dk", "dv")):
        a, b = outs["f32"][i], outs["bf16exp"][i]
        denom = np.abs(a).max() or 1.0
        print(f"  {tag}: max-abs-delta {np.abs(a - b).max():.3e} "
              f"(rel {np.abs(a - b).max() / denom:.3e})")
    print(f"speedup: {results['f32'] / results['bf16exp']:.3f}x")


if __name__ == "__main__":
    main()
