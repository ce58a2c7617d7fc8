"""Profile the LOST bench pipeline: forward vs LOST split, f32 vs bf16.

Run on the real TPU:  python tools/profile_lost.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

import jax.numpy as jnp
import numpy as np

from vipers.core.registry import build_model
from vipers.pruning import init_masks, magnitude_prune
from vipers.pruning.masks import apply_masks

H, W, PATCH, BATCH = 512, 384, 16, 8
GH, GW = H // PATCH, W // PATCH


def build(dtype):
    spec = build_model("vit_s_16", num_classes=1000, image_size=(H, W))
    rng = jax.random.PRNGKey(0)
    variables = spec.module.init(rng, jnp.zeros((1, H, W, 3), jnp.float32), train=False)
    params = variables["params"]
    masks = magnitude_prune(params, init_masks(params, spec.prune_exclude), 0.5)
    params = apply_masks(params, masks)
    params = jax.tree.map(lambda x: x.astype(dtype), params)
    nh = spec.extra["num_heads"]

    @jax.jit
    def fwd(params, images):
        _logits, aux = spec.module.apply(
            {"params": params}, images.astype(dtype), train=False, need_attn=False
        )
        return aux["qkv_input"]

    def lost_one(feats):
        feats = feats.astype(jnp.float32)
        A = jnp.dot(feats, feats.T, preferred_element_type=jnp.float32)
        T = A.shape[0]
        Ac = jnp.maximum(A * (1.0 - jnp.eye(T, dtype=A.dtype)), 0.0)
        cent = -jnp.sum(Ac > 0, axis=1).astype(jnp.float32)
        order = jnp.argsort(-cent, stable=True)
        seed = order[0]
        potentials = order[:100]
        pot_ok = A[seed, potentials] > 0.0
        M = jnp.sum(jnp.where(pot_ok[:, None], A[potentials, :], 0.0), axis=0)
        fg = (M > 0.0).reshape(GH, GW)
        seed_rc = jnp.stack([seed // GW, seed % GW])
        comp = jnp.zeros((GH, GW), bool).at[seed_rc[0], seed_rc[1]].set(True) & fg

        def dilate(c, _):
            up = jnp.pad(c[1:, :], ((0, 1), (0, 0)))
            down = jnp.pad(c[:-1, :], ((1, 0), (0, 0)))
            left = jnp.pad(c[:, 1:], ((0, 0), (0, 1)))
            right = jnp.pad(c[:, :-1], ((0, 0), (1, 0)))
            return (c | up | down | left | right) & fg, None

        comp, _ = jax.lax.scan(dilate, comp, None, length=2 * (GH + GW))
        rows = jnp.any(comp, axis=1)
        cols = jnp.any(comp, axis=0)
        ri = jnp.arange(GH)
        ci = jnp.arange(GW)
        return jnp.stack([
            jnp.min(jnp.where(cols, ci, GW)), jnp.min(jnp.where(rows, ri, GH)),
            jnp.max(jnp.where(cols, ci, -1)) + 1, jnp.max(jnp.where(rows, ri, -1)) + 1,
        ]) * PATCH

    @jax.jit
    def lost_part(x):
        def feats_of(xi):
            t, d = xi.shape
            dump = jnp.concatenate([xi] * 3, axis=0).reshape(3, t, d)
            qkv = dump.reshape(1, t, 3, nh, -1).transpose(2, 0, 3, 1, 4)
            return qkv[1].transpose(0, 2, 1, 3).reshape(1, t, d)[0][1:]

        return jax.vmap(lambda xi: lost_one(feats_of(xi)))(x)

    return fwd, lost_part, params


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000, out


def main():
    images = jax.random.normal(jax.random.PRNGKey(1), (BATCH, H, W, 3), jnp.float32)
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        fwd, lost_part, params = build(dtype)
        t_f, x = timeit(fwd, params, images)
        t_l, _ = timeit(lost_part, x)
        total = t_f + t_l
        print(f"{name}: fwd {t_f:.2f} ms  lost {t_l:.2f} ms  "
              f"-> {BATCH / (total / 1000):.0f} img/s")


if __name__ == "__main__":
    main()
